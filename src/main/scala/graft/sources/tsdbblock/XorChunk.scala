package graft.sources.tsdbblock

import Binary.BitReader

/** Decoder for Prometheus XOR chunks (Gorilla compression: Facebook's
  * "Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB'15;
  * format per prometheus/tsdb chunkenc/xor.go, consumed by the reference
  * at hello.go:489-497 via `it.Next() == chunkenc.ValFloat`).
  *
  * Layout: uint16 BE sample count, then a MSB-first bit stream:
  *   t0: zigzag varint; v0: raw 64 bits.
  *   t1: uvarint delta; v1+: XOR scheme.
  *   t2+: delta-of-delta with prefix codes
  *        0 → dod=0, 10 → 14-bit, 110 → 17-bit, 1110 → 20-bit,
  *        1111 → raw 64-bit (signed, two's complement in window width).
  *   values: 0 → repeat; 10 → reuse leading/trailing window;
  *           11 → 5-bit leading, 6-bit sigbits (0 ⇒ 64), sig bits.
  */
object XorChunk {

  /** Decode all samples of one XOR chunk data payload into parallel
    * arrays (timestamps ms, values). */
  def decode(data: Array[Byte]): (Array[Long], Array[Double]) = {
    val num = ((data(0) & 0xff) << 8) | (data(1) & 0xff)
    val ts = new Array[Long](num)
    val vs = new Array[Double](num)
    if (num == 0) return (ts, vs)
    val r = new BitReader(data, 2)

    var t = r.varint()
    var vBits = r.readBits(64)
    ts(0) = t; vs(0) = java.lang.Double.longBitsToDouble(vBits)
    if (num == 1) return (ts, vs)

    var tDelta = r.uvarint()
    t += tDelta
    var leading = 0; var trailing = 0
    def readValue(): Unit = {
      if (r.readBit() == 1) {
        if (r.readBit() == 1) {
          leading = r.readBits(5).toInt
          var sig = r.readBits(6).toInt
          if (sig == 0) sig = 64
          trailing = 64 - leading - sig
        }
        val sig = 64 - leading - trailing
        val bits = r.readBits(sig)
        vBits ^= bits << trailing
      }
    }
    readValue()
    ts(1) = t; vs(1) = java.lang.Double.longBitsToDouble(vBits)

    var i = 2
    while (i < num) {
      // delta-of-delta prefix
      var dod = 0L
      if (r.readBit() == 1) {
        val sz =
          if (r.readBit() == 0) 14
          else if (r.readBit() == 0) 17
          else if (r.readBit() == 0) 20
          else 64
        var bits = r.readBits(sz)
        if (sz != 64 && bits > (1L << (sz - 1))) bits -= (1L << sz)
        dod = bits
      }
      tDelta += dod
      t += tDelta
      readValue()
      ts(i) = t; vs(i) = java.lang.Double.longBitsToDouble(vBits)
      i += 1
    }
    (ts, vs)
  }
}

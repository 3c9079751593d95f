package graft.sources.tsdbblock

/** Little decoding helpers for the Prometheus TSDB on-disk formats
  * (public format docs: prometheus/tsdb/docs/format/{index,chunks}.md;
  * reference consumes these via the prometheus library — SURVEY.md §2.1
  * S1/S2, hello.go:50-74).
  */
object Binary {

  /** Byte-cursor over an array with Go-style varint decoding. */
  final class ByteReader(val buf: Array[Byte], var pos: Int) {
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }

    def be32(): Long = {
      val v = ((buf(pos) & 0xffL) << 24) | ((buf(pos + 1) & 0xffL) << 16) |
        ((buf(pos + 2) & 0xffL) << 8) | (buf(pos + 3) & 0xffL)
      pos += 4; v
    }

    def be64(): Long = { val v = be32() << 32 | be32(); v }

    /** LEB128 unsigned varint (Go binary.Uvarint). */
    def uvarint(): Long = {
      var x = 0L; var shift = 0
      var b = u8()
      while ((b & 0x80) != 0) {
        x |= (b & 0x7fL) << shift; shift += 7; b = u8()
      }
      x | ((b & 0x7fL) << shift)
    }

    /** Zigzag signed varint (Go binary.Varint). */
    def varint(): Long = {
      val u = uvarint()
      (u >>> 1) ^ -(u & 1)
    }

    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n; out
    }

    def skip(n: Int): Unit = pos += n
  }

  /** MSB-first bit reader (Prometheus bstream). */
  final class BitReader(buf: Array[Byte], startByte: Int) {
    private var bytePos = startByte
    private var bitPos = 0 // bits consumed in current byte, 0..7

    def readBit(): Int = {
      val bit = (buf(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      bit
    }

    /** n ≤ 64 bits, MSB first, as unsigned in a Long. */
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** One byte from the bit stream (used by varint-in-bitstream). */
    def readByte(): Int = readBits(8).toInt

    def uvarint(): Long = {
      var x = 0L; var shift = 0
      var b = readByte()
      while ((b & 0x80) != 0) {
        x |= (b & 0x7fL) << shift; shift += 7; b = readByte()
      }
      x | ((b & 0x7fL) << shift)
    }

    def varint(): Long = { val u = uvarint(); (u >>> 1) ^ -(u & 1) }
  }
}

package graft.sources.tsdbblock

import java.nio.file.{Files, Paths}
import Binary.ByteReader

/** Reader for the Prometheus TSDB index file, format version 2
  * (prometheus/tsdb/docs/format/index.md; the reference reaches this
  * through `tsdb.OpenDBReadOnly` — SURVEY.md §2.1 S1, hello.go:50-74).
  *
  * We need exactly what a full-corpus scan needs (the reference's
  * `Select(true, nil, __name__=~".+")`, hello.go:442-447): the symbol
  * table and the series section (label sets + chunk references).
  * Postings/label indices are skipped — scanning all series sequentially
  * is the access path, not point lookups.
  */
object IndexReader {

  final case class ChunkRef(minTime: Long, maxTime: Long, segment: Int, offset: Long)
  /** One series: label set, chunk refs, its index ref (entry offset /
    * 16 — the id tombstones key on), and any deleted intervals attached
    * at planning time from the block's tombstones file. */
  final case class SeriesEntry(labels: Map[String, String], chunks: Seq[ChunkRef],
                               ref: Long = -1L,
                               deleted: Seq[Tombstones.Interval] = Nil)

  private val Magic = 0xbaaad700L

  def read(indexPath: String): Seq[SeriesEntry] = {
    val buf = Files.readAllBytes(Paths.get(indexPath))
    val hdr = new ByteReader(buf, 0)
    require(hdr.be32() == Magic, s"not a TSDB index file: $indexPath")
    val version = hdr.u8()
    require(version == 2, s"unsupported index version $version (need 2)")

    // TOC: last 52 bytes = 6 × uint64 refs + crc32
    // Offsets are uint64 in the format but we parse from a byte[], which
    // java.nio.Files.readAllBytes already caps at Int.MaxValue — so any
    // section offset past 2 GiB must fail LOUDLY, not wrap via .toInt.
    def sectionOffset(v: Long, what: String): Int = {
      require(v >= 0 && v <= buf.length,
        s"index $what offset $v out of range (index files > 2 GiB unsupported)")
      v.toInt
    }
    val toc = new ByteReader(buf, buf.length - 52)
    val symbolsStart = sectionOffset(toc.be64(), "symbols")
    val seriesStart = sectionOffset(toc.be64(), "series")
    val labelIndicesStart = sectionOffset(toc.be64(), "label-indices")

    // ---- symbol table: len(4) #symbols(4) then uvarint-len strings ----
    val sym = new ByteReader(buf, symbolsStart)
    sym.be32() // section length
    val nSyms = sym.be32().toInt
    val symbols = new Array[String](nSyms)
    var i = 0
    while (i < nSyms) {
      val n = sym.uvarint().toInt
      symbols(i) = new String(sym.bytes(n), java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }

    // ---- series section: 16-byte-aligned entries up to labelIndicesStart
    val out = Seq.newBuilder[SeriesEntry]
    // entries are 16-byte aligned from file start (series ref = offset/16);
    // the section may open with zero padding up to the first boundary
    var pos = (seriesStart + 15) & ~15
    val end = labelIndicesStart
    var done = false
    while (!done && pos < end) {
      val r = new ByteReader(buf, pos)
      val len = r.uvarint().toInt
      if (len == 0) done = true // zero padding ⇒ end of entries
      else {
        val entryEnd = r.pos + len
        val nLabels = r.uvarint().toInt
        val labels = (0 until nLabels).map { _ =>
          val k = symbols(r.uvarint().toInt)
          val v = symbols(r.uvarint().toInt)
          k -> v
        }.toMap
        val nChunks = r.uvarint().toInt
        val chunks = Seq.newBuilder[ChunkRef]
        if (nChunks > 0) {
          var mint = r.varint()
          var maxt = r.uvarint() + mint
          var ref = r.uvarint()
          chunks += ChunkRef(mint, maxt, (ref >>> 32).toInt, ref & 0xffffffffL)
          var c = 1
          while (c < nChunks) {
            mint = r.uvarint() + maxt
            maxt = r.uvarint() + mint
            ref += r.varint()
            chunks += ChunkRef(mint, maxt, (ref >>> 32).toInt, ref & 0xffffffffL)
            c += 1
          }
        }
        out += SeriesEntry(labels, chunks.result(), ref = pos.toLong / 16)
        // entry = uvarint len | content | crc32(4); next entry 16-aligned
        pos = entryEnd + 4
        pos = (pos + 15) & ~15
      }
    }
    out.result()
  }
}

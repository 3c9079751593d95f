package graft.sources

import graft.SparkSpec
import graft.sources.tsdbblock.{IndexReader, WalOffset}

/** Corrupt-input behavior: readers must fail loudly or stop cleanly —
  * never mis-parse (the failure mode the advisor flagged for the r1
  * readers; WAL cases live in TsdbWalSpec).
  */
class ReaderRobustnessSpec extends SparkSpec {
  private val index = "/root/reference/01GW1T7K3E9F9R361GDPVH8NZF/index"

  test("a non-index file is rejected by magic check") {
    val dir = tmpDir("idx_bad")
    val p = java.nio.file.Paths.get(s"$dir/index")
    java.nio.file.Files.write(p, Array.fill[Byte](64)(0x42))
    intercept[IllegalArgumentException] { IndexReader.read(p.toString) }
  }

  test("a truncated index fails loudly instead of mis-parsing") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(index))
    val dir = tmpDir("idx_trunc")
    val p = java.nio.file.Paths.get(s"$dir/index")
    // cut mid-series-section: the TOC (last 52 bytes) is gone, so the
    // reader must reject rather than read garbage offsets
    java.nio.file.Files.write(p, bytes.take(bytes.length / 2))
    intercept[Exception] { IndexReader.read(p.toString) }
  }

  test("WalOffset json round-trips") {
    val o = WalOffset(Map("00000000" -> 123L, "00000017" -> 0L))
    assert(WalOffset.parse(o.json()) == o)
    assert(WalOffset.parse(WalOffset(Map.empty).json()) == WalOffset(Map.empty))
  }
}

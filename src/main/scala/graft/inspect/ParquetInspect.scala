package graft.inspect

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** Parquet physical-metadata inspector ≡ the reference's `visualize()`
  * (SURVEY.md §2.1 S7 / §3.3; hello.go:75-119): schema, row counts,
  * per-row-group and per-column-chunk type / value count / encodings /
  * compressed & uncompressed sizes / compression ratio. Footer-only —
  * no data pages are read, no Spark job is launched.
  */
object ParquetInspect {

  final case class ColumnStat(rowGroup: Int, column: String, physicalType: String,
                              numValues: Long, encodings: Seq[String],
                              compressedBytes: Long, uncompressedBytes: Long) {
    def ratioPct: Double =
      if (uncompressedBytes == 0) 0.0 else compressedBytes * 100.0 / uncompressedBytes
  }

  final case class FileStat(path: String, schema: String, numRows: Long,
                            rowGroups: Int, columns: Seq[ColumnStat])

  /** Walk the footer(s) of a parquet file or directory of part-files. */
  def inspect(pathStr: String, conf: Configuration = new Configuration()): Seq[FileStat] = {
    val fs = new Path(pathStr).getFileSystem(conf)
    val files = listParquetFiles(fs, new Path(pathStr))
    files.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        val cols = footer.getBlocks.asScala.toSeq.zipWithIndex.flatMap { case (rg, i) =>
          rg.getColumns.asScala.toSeq.map { c =>
            ColumnStat(i, c.getPath.toDotString, c.getPrimitiveType.getPrimitiveTypeName.toString,
              c.getValueCount, c.getEncodings.asScala.map(_.toString).toSeq.sorted,
              c.getTotalSize, c.getTotalUncompressedSize)
          }
        }
        FileStat(f.toString, schema.toString,
          footer.getBlocks.asScala.map(_.getRowCount).sum,
          footer.getBlocks.size(), cols)
      } finally reader.close()
    }
  }

  private def listParquetFiles(fs: FileSystem, p: Path): Seq[Path] =
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    else Seq(p)

  /** ASCII rendering matching the reference's table dump (hello.go:102-117). */
  def render(stats: Seq[FileStat]): String = {
    val sb = new StringBuilder
    stats.foreach { s =>
      sb.append(s"file: ${s.path}\nrows: ${s.numRows}  row-groups: ${s.rowGroups}\n")
      sb.append(f"${"rg"}%-3s ${"column"}%-28s ${"type"}%-12s ${"values"}%10s ${"comp(B)"}%12s ${"uncomp(B)"}%12s ${"ratio%%"}%8s  encodings\n")
      s.columns.foreach { c =>
        sb.append(f"${c.rowGroup}%-3d ${c.column}%-28s ${c.physicalType}%-12s ${c.numValues}%10d ${c.compressedBytes}%12d ${c.uncompressedBytes}%12d ${c.ratioPct}%8.1f  ${c.encodings.mkString(",")}\n")
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit =
    println(render(inspect(args(0))))
}

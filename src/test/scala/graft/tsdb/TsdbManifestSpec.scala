package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Schema-manifest fast path vs its fallbacks: the invariant is that NO
  * append path — internal or foreign — can make a column silently
  * disappear behind a stale explicit schema. */
class TsdbManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_manifest_").toString

  test("manifested table reads the union of its batch schemas") {
    val path = tmp()
    TsdbIngest.write(Seq((1L, 1.0, "a"))
      .toDF("time", "value", "labels.env"), path)
    TsdbIngest.write(Seq((2L, 2.0, "x"))
      .toDF("time", "value", "labels.job"), path, mode = SaveMode.Append)
    val cols = TsdbIngest.read(spark, path).columns.toSet
    assert(cols === Set("time", "value", "labels.env", "labels.job"))
  }

  test("foreign append (no manifest) with a NEW column is never hidden") {
    val path = tmp()
    TsdbIngest.write(Seq((1L, 1.0, "a"))
      .toDF("time", "value", "labels.env"), path)
    // a foreign writer appends a superset-schema file and records no
    // manifest — the staleness probe must distrust the manifests
    Seq((2L, 2.0, "b", "api")).toDF("time", "value", "labels.env", "labels.job")
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
    val got = TsdbIngest.read(spark, path)
    assert(got.columns.contains("labels.job"),
      s"foreign column hidden by stale manifest: ${got.columns.toSeq}")
    assert(got.where(col("`labels.job`") === "api").count() === 1)
  }

  test("delete on a manifest-less table must not mint a partial manifest") {
    val path = tmp()
    // two foreign files with disjoint label columns, no manifests
    Seq((1L, 1.0, "a")).toDF("time", "value", "labels.env")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    Seq((900L, 2.0, "x")).toDF("time", "value", "labels.job")
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
    // delete touches ONLY the second file's time slice (rewrite path)
    val st = TsdbRetention.delete(spark, path, Nil, 500L, 1000L)
    assert(st.rowsDeleted === 1)
    // the untouched file's column must survive in the read schema:
    // a manifest built from just the rewritten files would hide it
    val cols = TsdbIngest.read(spark, path).columns.toSet
    assert(cols.contains("labels.env"),
      s"untouched file's column lost after delete: $cols")
  }

  test("compactManifests folds appends into one union manifest, schema intact") {
    val path = tmp()
    TsdbIngest.write(Seq((1L, 1.0, "a"))
      .toDF("time", "value", "labels.env"), path)
    TsdbIngest.write(Seq((2L, 2.0, "x"))
      .toDF("time", "value", "labels.job"), path, mode = SaveMode.Append)
    TsdbIngest.write(Seq((3L, 3.0, "y"))
      .toDF("time", "value", "labels.zone"), path, mode = SaveMode.Append)
    val before = TsdbIngest.read(spark, path).schema
    assert(TsdbIngest.compactManifests(spark, path) === 1)
    val sd = new org.apache.hadoop.fs.Path(path, "_schema")
    val fs = sd.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(sd).count(_.getPath.getName.endsWith(".json")) === 1)
    // identical schema (incl. first-seen column order) through one manifest
    assert(TsdbIngest.read(spark, path).schema === before)
    assert(TsdbIngest.read(spark, path).count() === 3)
  }

  test("retention rewrite keeps the fast path on a manifested table") {
    val path = tmp()
    TsdbIngest.write((1L to 100L).map(i => (i * 10L, i.toDouble, s"u$i"))
      .toDF("time", "value", "labels.user"), path, timePartitions = 4)
    TsdbRetention.delete(spark, path, Nil, 0L, 300L)
    assert(TsdbIngest.hasSchemaManifests(spark, path))
    val got = TsdbIngest.read(spark, path)
    assert(got.count() === 70)
    assert(got.columns.toSet === Set("time", "value", "labels.user"))
  }
}

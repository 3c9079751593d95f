package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata, processed batch-wise per
  * partition. The container ships no image/audio codecs, so the decode
  * kernel is a clearly-marked deterministic STUB — everything around it
  * (schema, partition sizing, batch iteration shape, feature schema) is
  * the real 100 TB design:
  *
  *   - payloads NEVER pass through a shuffle: featurize/resize/sample are
  *     map-side `mapPartitions`, so only the (small) derived features
  *     move downstream;
  *   - `spark.sql.files.maxPartitionBytes` governs blob-scan partition
  *     sizing; rows stay within a partition ⇒ one codec init per task,
  *     amortized across the batch (the Scala analogue of a Pandas-UDF
  *     batch over mapInPandas);
  *   - features are fixed-width arrays ⇒ columnar downstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Build a media table from any source DataFrame — here used in tests
    * to wrap `documents.text` bytes as fake payloads (deterministic). */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (pmod(col(idCol), lit(64)) + 16).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col(idCol), lit(30)) + 1).cast("int").as("n_frames"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** ======== STUB decode kernel ========
    * A real deployment plugs a codec (JPEG/PNG/opus/...) here; the rest
    * of the pipeline is codec-agnostic. The stub derives `featureDim`
    * deterministic floats from payload bytes so tests are stable. */
  def stubDecodeFeatures(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, features: Array[Float])

  /** Feature extraction: one batch-iterator pass per partition (codec
    * init once per task), payload dropped on output. */
  def featurize(media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      // per-task codec/context init would go here
      it.map { r: Row =>
        val payload = r.getAs[Array[Byte]]("payload")
        MediaFeatures(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          if (payload == null) 0L else payload.length.toLong,
          stubDecodeFeatures(payload, featureDim))
      }
    }
  }

  /** Frame sampling for video rows: emit every `stride`-th frame index
    * with a byte-slice "frame" (stub slicing; real impl seeks the
    * container). Generator-shaped: rows explode map-side, no shuffle. */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        posexplode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(stride)))
          .as(Seq("sample_idx", "frame_idx")),
        col("payload"))
      .select(col("media_id"), col("frame_idx"),
        // stub "frame": a window into the payload bytes
        expr("substring(payload, frame_idx * 16 + 1, 16)").as("frame_bytes"))

  /** Resize stub: records the target dims, passes payload through —
    * the schema/partitioning contract of a real resize. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"), col("meta.mime").as("mime")))
}

package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata, processed batch-wise per
  * partition.
  *
  * The IMAGE path is a real codec kernel: payloads are genuine PNG
  * bytes, decoded with the JDK's `javax.imageio.ImageIO` (no external
  * dependency) into exact dimensions, per-channel pixel sums and a
  * luminance-ish histogram feature vector; `resize` is decode →
  * exact nearest-neighbor resample → PNG re-encode. AUDIO/VIDEO decode
  * remains a clearly-marked deterministic stub (the container ships no
  * audio/video codecs and the JDK has none); the plumbing around it is
  * identical to the image path.
  *
  * 100 TB design properties (both paths):
  *   - payloads NEVER pass through a shuffle: featurize/resize/sample
  *     are map-side `mapPartitions`, so only the (small) derived
  *     features move downstream;
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

  final case class MediaMeta(width: Option[Int], height: Option[Int],
                             sample_rate: Option[Int], n_frames: Option[Int],
                             mime: Option[String])
  final case class Media(media_id: Long, kind: String,
                         payload: Array[Byte], meta: MediaMeta)

  /** Build a media table from any source DataFrame — used in tests to
    * derive deterministic payloads from `documents`. Image dims are a
    * pure function of the id so an arithmetic oracle can replay the
    * decoded pixels (see `pixelR/G/B`). */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (pmod(col(idCol), lit(13)) + 4).cast("int").as("width"),
        (pmod(col(idCol), lit(11)) + 4).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col(idCol), lit(30)) + 1).cast("int").as("n_frames"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** The deterministic test-image pixel formulas: channel value of
    * pixel (x, y) in image `id`. Chosen so a SQL oracle can replay the
    * decoded values with integer arithmetic. */
  @inline def pixelR(id: Long, x: Int, y: Int): Int = ((id + 7L * x + 13L * y) % 256).toInt
  @inline def pixelG(id: Long, x: Int, y: Int): Int = ((3L * id + 5L * x + 11L * y) % 256).toInt
  @inline def pixelB(id: Long, x: Int, y: Int): Int = ((5L * id + 3L * x + 17L * y) % 256).toInt

  /** Encode the deterministic w×h RGB test image for `id` as real PNG
    * bytes (lossless — decode returns the formula values exactly). */
  def makePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pixelR(id, x, y) << 16) | (pixelG(id, x, y) << 8) | pixelB(id, x, y))
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Replace the payload of `image` rows with real PNG bytes encoding
    * the deterministic test image at the meta dims. Map-side; audio and
    * video rows pass through untouched. */
  def withImagePayloads(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      codecInit()
      it.map { m =>
        if (m.kind == "image")
          m.copy(
            payload = makePng(m.media_id, m.meta.width.getOrElse(16), m.meta.height.getOrElse(16)),
            meta = m.meta.copy(mime = Some("image/png")))
        else m
      }
    }.toDF()
  }

  /** Per-task codec initialization: disable ImageIO's disk cache so
    * decode stays purely in-memory on executors. */
  private def codecInit(): Unit = ImageIO.setUseCache(false)

  /** Exact per-image decode stats: dimensions, channel count, per-channel
    * pixel-value sums, and a `bins`-bin histogram of the red channel. */
  final case class ImageStats(width: Int, height: Int, channels: Int,
                              sumR: Long, sumG: Long, sumB: Long,
                              histR: Array[Long])

  /** REAL image decode via JDK ImageIO (PNG/JPEG/GIF/BMP). Returns None
    * for undecodable payloads. */
  def decodeImage(payload: Array[Byte], bins: Int = 8): Option[ImageStats] = {
    if (payload == null) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](bins)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            sr += r
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            hist(r * bins / 256) += 1L
            x += 1
          }
          y += 1
        }
        Some(ImageStats(w, h, img.getColorModel.getNumColorComponents, sr, sg, sb, hist))
      }
    } catch { case _: java.io.IOException => None }
  }

  // ======== REAL audio decode (javax.sound.sampled — JDK-only) ========

  /** Deterministic test-audio PCM formula: 16-bit sample value at frame
    * `s`, channel `c` of audio `id`. Integer arithmetic so a SQL oracle
    * replays the decoded samples exactly (the audio analogue of
    * pixelR/G/B). */
  @inline def pcmSample(id: Long, c: Int, s: Long): Int =
    (((31L * id + 17L * c + 7L * s) % 65536L) - 32768L).toInt

  /** The deterministic per-id audio parameters (pure id functions, SQL-
    * replayable): 1-2 channels, 256-640 frames, 8/12/16 kHz. */
  @inline def audioChannels(id: Long): Int = (1 + id % 2).toInt
  @inline def audioFrames(id: Long): Long = 256 + (id % 7) * 64
  @inline def audioRate(id: Long): Int = (8000 + (id % 3) * 4000).toInt

  /** Wrap interleaved PCM_SIGNED 16-bit little-endian frames in a REAL
    * WAV (RIFF) container via `javax.sound.sampled.AudioSystem`. */
  private def encodeWav(pcm: Array[Byte], rate: Int, ch: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, pcm.length / (ch * 2))
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Encode the deterministic test signal for `id` as a REAL WAV file
    * (RIFF container, PCM_SIGNED 16-bit little-endian, interleaved) —
    * decode reads it back sample-exactly. */
  def makeWav(id: Long): Array[Byte] = {
    val ch = audioChannels(id)
    val n = audioFrames(id)
    val pcm = new Array[Byte](n.toInt * ch * 2)
    var s = 0L
    var i = 0
    while (s < n) {
      var c = 0
      while (c < ch) {
        val v = pcmSample(id, c, s)
        pcm(i) = (v & 0xff).toByte
        pcm(i + 1) = ((v >> 8) & 0xff).toByte
        c += 1; i += 2
      }
      s += 1
    }
    encodeWav(pcm, audioRate(id), ch)
  }

  /** Downsample audio rows by integer frame DECIMATION (keep every
    * `factor`-th frame, all channels; output rate = rate/factor) — the
    * audio analogue of [[resize]]: real decode → integer-exact resample
    * → WAV re-encode as the new payload. Kept samples are bit-identical
    * to the input's (no filtering/interpolation), so an arithmetic
    * oracle replays the re-encoded stream exactly. Non-audio rows and
    * undecodable payloads pass through untouched. Map-side. */
  def downsampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"decimation factor must be >= 1: $factor")
    import javax.sound.sampled.AudioSystem
    val spark = media.sparkSession
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.map { m =>
        if (m.kind != "audio" || m.payload == null) m
        else try {
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(m.payload))
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16) m
          else {
            val ch = fmt.getChannels
            val frameSize = fmt.getFrameSize
            val bytes = ais.readAllBytes()
            val nFrames = bytes.length / frameSize
            val kept = (nFrames + factor - 1) / factor
            val out = new Array[Byte](kept * frameSize)
            var f = 0; var o = 0
            while (f < nFrames) {
              System.arraycopy(bytes, f * frameSize, out, o * frameSize, frameSize)
              f += factor; o += 1
            }
            val newRate = fmt.getSampleRate.toInt / factor
            m.copy(payload = encodeWav(out, newRate, ch),
              meta = m.meta.copy(sample_rate = Some(newRate),
                mime = Some("audio/wav")))
          }
        } catch { case scala.util.control.NonFatal(_) => m }
      }
    }.toDF()
  }

  /** Replace the payload of `audio` rows with real WAV bytes for the
    * deterministic test signal. Map-side; other kinds pass through. */
  def withAudioPayloads(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      it.map { m =>
        if (m.kind == "audio")
          m.copy(payload = makeWav(m.media_id),
            meta = m.meta.copy(sample_rate = Some(audioRate(m.media_id)),
              mime = Some("audio/wav")))
        else m
      }
    }.toDF()
  }

  /** Exact per-audio decode stats — everything an SQL oracle can replay
    * from the PCM formula: header-derived rate/channels, frame count,
    * integer sample sum / peak, and the RMS derived from the integer
    * sum of squares. */
  final case class AudioStats(media_id: Long, sample_rate: Int, channels: Int,
                              n_samples: Long, duration_ms: Long,
                              pcm_sum: Long, pcm_peak: Long, rms: Double)

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF PCM — the
    * formats the bare JDK ships readers for; lossy codecs would plug in
    * here). Format comes from the CONTAINER header, samples from the
    * stream; returns None for undecodable payloads or non-16-bit PCM. */
  def decodeAudio(payload: Array[Byte]): Option[AudioStats] = {
    import javax.sound.sampled.AudioSystem
    if (payload == null) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16) return None
      val ch = fmt.getChannels
      val rate = fmt.getSampleRate.toInt
      val bytes = ais.readAllBytes()
      val nFrames = bytes.length / fmt.getFrameSize
      var sum = 0L; var sumSq = 0L; var peak = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        // PCM_SIGNED 16-bit little-endian
        val v0 = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
        val v = v0.toShort.toInt
        sum += v
        sumSq += v.toLong * v
        val a = math.abs(v).toLong
        if (a > peak) peak = a
        i += 2
      }
      Some(AudioStats(0L, rate, ch, nFrames,
        nFrames * 1000L / rate, sum, peak,
        math.sqrt(sumSq.toDouble / (nFrames.toLong * ch))))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode every `audio` row's payload per partition (payloads never
    * shuffle; only the fixed-width stats move downstream). Undecodable
    * rows are dropped — the filter-then-decode contract. */
  def audioFeatures(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeAudio(payload).map(_.copy(media_id = id))
        }
      }
  }

  /** ======== STUB decode kernel (video ONLY, since round 10) ========
    * The JDK ships no video codecs; a real deployment plugs h264/vp9/...
    * here. The stub derives `featureDim` deterministic floats from
    * payload bytes so tests are stable. Image rows get the real ImageIO
    * kernel, audio rows the real javax.sound kernel above. */
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

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 width: Option[Int], height: Option[Int],
                                 channels: Option[Int],
                                 px_sum_r: Option[Long], px_sum_g: Option[Long],
                                 px_sum_b: Option[Long],
                                 features: Array[Float])

  /** Feature extraction: one batch-iterator pass per partition (codec
    * init once per task), payload dropped on output. Image rows are
    * REALLY decoded (dims/channels/sums from the PNG bytes, features =
    * normalized red-channel histogram); audio/video rows carry meta
    * dims through and use the stub feature kernel. */
  def featurize(media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"),
        col("meta.width").as("meta_w"), col("meta.height").as("meta_h"))
      .mapPartitions { it =>
        codecInit()
        it.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          val decoded = if (kind == "image") decodeImage(payload, featureDim) else None
          decoded match {
            case Some(st) =>
              val nPx = st.width.toLong * st.height
              val feats = st.histR.map(c => c.toFloat / nPx)
              MediaFeatures(id, kind, nBytes, Some(st.width), Some(st.height),
                Some(st.channels), Some(st.sumR), Some(st.sumG), Some(st.sumB), feats)
            case None =>
              MediaFeatures(id, kind, nBytes,
                Option(r.getAs[java.lang.Integer](3)).map(_.intValue),
                Option(r.getAs[java.lang.Integer](4)).map(_.intValue),
                None, None, None, None, stubDecodeFeatures(payload, featureDim))
          }
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

  /** Resize. Image rows: REAL decode → exact nearest-neighbor resample
    * (src pixel (x·srcW/w, y·srcH/h), floor division — replayable by an
    * arithmetic oracle) → PNG re-encode as the new payload. Audio/video
    * rows: record the target dims in meta and pass the payload through
    * (the schema/partitioning contract of a real codec resize). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[Media].mapPartitions { it =>
      codecInit()
      it.map { m =>
        val newMeta = m.meta.copy(width = Some(w), height = Some(h))
        if (m.kind != "image") m.copy(meta = newMeta)
        else {
          val src = if (m.payload == null) null
                    else ImageIO.read(new ByteArrayInputStream(m.payload))
          if (src == null) m.copy(meta = newMeta)
          else {
            val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val sw = src.getWidth
            val sh = src.getHeight
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                dst.setRGB(x, y, src.getRGB(x * sw / w, y * sh / h) & 0xffffff)
                x += 1
              }
              y += 1
            }
            val baos = new ByteArrayOutputStream()
            ImageIO.write(dst, "png", baos)
            m.copy(payload = baos.toByteArray,
              meta = newMeta.copy(mime = Some("image/png")))
          }
        }
      }
    }.toDF()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` payloads with typed metadata, processed by per-partition
  * decode/feature/sample operators.
  *
  * The Spark-side mechanics here are real and tested — schema, typed
  * Dataset rows, `mapPartitions` batch shape (the Scala equivalent of a
  * Pandas-UDF `mapInPandas` stage: one iterator in, one iterator out, no
  * per-row UDF dispatch), partitioning by media kind. The *codec* step is
  * a clearly marked STUB: this container ships no image/audio libraries,
  * so payloads use a tiny deterministic header format ("GRFT" magic +
  * width/height) and the stub "decode" parses that header and computes
  * byte statistics. Swapping `decodeStub` for a real decoder (JavaCV,
  * TwelveMonkeys, ffmpeg-over-pipe) changes one function, not the
  * pipeline shape.
  *
  * At 100 TB: payloads dominate row size, so operators keep payloads in
  * the partition they arrived in (no shuffle of binary columns anywhere
  * below), project metadata early, and only ever shuffle extracted
  * features. */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  final case class Media(
      media_id: Long, kind: String, payload: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Int, mean_byte: Double, header_ok: Boolean)

  private val Magic = "GRFT".getBytes("US-ASCII")

  /** Deterministic fake payload: "GRFT" + width/height (big-endian int32)
    * + (width*height) pseudo-pixel bytes derived from the id. Stands in
    * for a real encoded image so the pipeline has bytes to move. */
  def fakePayload(id: Long, width: Int, height: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + width * height)
    buf.put(Magic).putInt(width).putInt(height)
    var i = 0
    val n = width * height
    while (i < n) {
      buf.put(((id * 2654435761L + i * 40503L) >>> 16).toByte)
      i += 1
    }
    buf.array()
  }

  /** Build a media table from any table with an id column — the
    * deterministic stand-in for `spark.read.format("binaryFile")` over a
    * real media lake. */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[Media] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .map { id =>
        val w = 8 + (id % 8).toInt
        val h = 8 + (id % 5).toInt
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        Media(id, kind, fakePayload(id, w, h), w, h)
      }
  }

  /** ======== STUB decode ========
    * Parses the fake header + byte stats. A real implementation would
    * decode the codec here (per partition, reusing a decoder instance) —
    * the surrounding iterator shape is exactly what a real decoder
    * needs. */
  def decodeStub(m: Media): MediaFeatures = {
    val ok = m.payload.length >= 12 && m.payload.startsWith(Magic)
    val body = if (ok) m.payload.drop(12) else Array.empty[Byte]
    val mean =
      if (body.isEmpty) 0.0
      else body.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / body.length
    MediaFeatures(m.media_id, m.kind, m.width, m.height, m.payload.length, mean, ok)
  }

  /** Feature extraction as a partition-wise operator: iterator in,
    * iterator out — decoder state (here: none; really: native codec
    * handles) is amortized across the partition, mirroring
    * `mapInPandas` batch semantics. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decodeStub) }
  }

  /** Nearest-neighbor resize — the 1-row-in/1-row-out multimodal
    * transform (payload never leaves its partition; metadata updates with
    * the payload). Same STUB boundary as [[decodeStub]]: the kernel
    * indexes the fake pixel grid; a real implementation swaps in an image
    * library's resampler without touching the pipeline shape. */
  def resize(media: Dataset[Media], newW: Int, newH: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    require(newW > 0 && newH > 0, "resize needs positive target dims")
    media.mapPartitions { it =>
      it.map { m =>
        val body = m.payload.drop(12)
        val out = java.nio.ByteBuffer.allocate(12 + newW * newH)
        out.put(Magic).putInt(newW).putInt(newH)
        var y = 0
        while (y < newH) {
          val sy = y * m.height / newH
          var x = 0
          while (x < newW) {
            val sx = x * m.width / newW
            val idx = sy * m.width + sx
            out.put(if (idx < body.length) body(idx) else 0: Byte)
            x += 1
          }
          y += 1
        }
        Media(m.media_id, m.kind, out.array(), newW, newH)
      }
    }
  }

  /** Frame sampling for "video" payloads: every nth block of the body as
    * one frame row — the explode-shaped operator a real frame sampler
    * has (one input row → k frame rows, payload never shuffled before
    * sampling). */
  def sampleFrames(media: Dataset[Media], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "video")
      .flatMap { m =>
        val body = m.payload.drop(12)
        val frameSize = math.max(m.width, 1)
        val nFrames = body.length / math.max(frameSize, 1)
        (0 until nFrames by everyN).map { f =>
          (m.media_id, f, body.slice(f * frameSize, (f + 1) * frameSize))
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes")
  }
}

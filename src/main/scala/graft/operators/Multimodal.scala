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
    * Parses the fake header + byte stats — kept because the gated
    * `media_*` queries are defined over the GRFT pseudo-format and the
    * oracle replays its byte arithmetic. For REAL codec bytes see
    * [[decodeImages]]: the long-standing "this container ships no image
    * libraries" premise was probed and REFUTED in round 12 —
    * `javax.imageio` ships in the JDK with PNG/JPEG/BMP/GIF/TIFF
    * readers, and a TYPE_BYTE_GRAY PNG round-trips pixel-exactly. */
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

  // ======== REAL decode (javax.imageio) ========

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_luma: Long)

  /** Deterministic pseudo-pixel value for (id, i) — the shared formula
    * between [[fakePayload]]'s body bytes, [[synthesizePng]]'s raster,
    * and the DuckDB oracle's integer replay. */
  @inline private[graft] def pseudoPixel(id: Long, i: Int): Int =
    (((id * 2654435761L + i * 40503L) >>> 16) & 0xFF).toInt

  /** Genuine PNG payloads: the same deterministic pseudo-pixel grid as
    * [[fakePayload]], but encoded through the REAL JDK PNG codec
    * (TYPE_BYTE_GRAY — lossless, so decode recovers every pixel value
    * exactly; probed in this container: 9×8 grayscale round-trips
    * bit-perfectly). Stands in for `spark.read.format("binaryFile")`
    * over a real image lake, with actually-decodable bytes. */
  def synthesizePng(spark: SparkSession, ids: DataFrame,
      idCol: String): Dataset[Media] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        it.map { id =>
          val w = 8 + (id % 8).toInt
          val h = 8 + (id % 5).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var i = 0
          while (i < w * h) {
            raster.setSample(i % w, i / w, 0, pseudoPixel(id, i))
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Media(id, "image", bos.toByteArray, w, h)
        }
      }
  }

  /** REAL codec decode, partition-wise: `javax.imageio.ImageIO.read`
    * over each payload (PNG/JPEG/BMP/GIF/TIFF — whatever the JDK's
    * registered readers handle), emitting decoded dimensions and the
    * exact luma sum of band 0. Same iterator shape as
    * [[extractFeatures]]; an undecodable payload fails LOUDLY with its
    * media_id rather than passing a zeroed row downstream. */
  def decodeImages(media: Dataset[Media]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable media payload: media_id=${m.media_id}")
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        DecodedImage(m.media_id, w, h, w.toLong * h, sum)
      }
    }
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

  /** Uniform brightness shift (all body bytes + delta mod 256, header
    * untouched) — the 1-in/1-out payload transform used to exercise
    * perceptual-hash invariance: dHash compares *adjacent* pixels, so a
    * constant exposure shift preserves almost every bit (only wrap-around
    * cells flip comparisons). Same STUB boundary as [[decodeStub]]. */
  def adjustBrightness(media: Dataset[Media], delta: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val out = m.payload.clone()
        var i = 12
        while (i < out.length) {
          out(i) = (((out(i) & 0xFF) + delta) & 0xFF).toByte
          i += 1
        }
        m.copy(payload = out)
      }
    }
  }

  /** **dHash** (difference hash), the standard perceptual image hash:
    * sample the decoded grid down to 9×8 (nearest neighbor, same kernel
    * as [[resize]]), set bit y·8+x iff px(y,x+1) > px(y,x). Gradient
    * comparisons make it invariant to uniform brightness/contrast shifts
    * — the property that makes it a *near*-dup key where sha256 is an
    * exact-dup key. Emitted as four 16-bit bands (b0..b3 = bits 0‑15 …
    * 48‑63) ready for pigeonhole banding. Runs in the same
    * partition-wise iterator shape as [[extractFeatures]]; payloads never
    * shuffle. */
  def phashBands(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val body = m.payload.drop(12)
        def px(y: Int, x: Int): Int = {
          val idx = (y * m.height / 8) * m.width + (x * m.width / 9)
          if (idx >= 0 && idx < body.length) body(idx) & 0xFF else 0
        }
        var bits = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (px(y, x + 1) > px(y, x)) bits |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (m.media_id, (bits & 0xFFFF).toInt, ((bits >>> 16) & 0xFFFF).toInt,
          ((bits >>> 32) & 0xFFFF).toInt, ((bits >>> 48) & 0xFFFF).toInt)
      }
    }.toDF("media_id", "b0", "b1", "b2", "b3")
  }

  /** Perceptual near-dup pairs at hamming distance ≤ `maxDist` over the
    * 64-bit dHash — the multimodal twin of SimHash text dedup, with the
    * identical pigeonhole banding argument: two hashes within distance
    * d < 4 agree exactly on at least one of the 4 disjoint 16-bit bands,
    * so the band equi-join is a COMPLETE candidate generator for
    * maxDist ≤ 3 (no recall loss, unlike probabilistic LSH). Candidates
    * verify with bit_count(xor) per band — codegen'd integer ops — and
    * only (id, 4×int) rows ever shuffle, never payloads. */
  def phashNearDup(media: Dataset[Media], maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"phashNearDup: 4-band pigeonhole is only complete for maxDist <= 3 (got $maxDist)")
    val ph = phashBands(media)
    val banded = ph.select(col("media_id"),
      col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "bv")))
    val dist =
      bit_count(expr("a.b0 ^ b.b0")) + bit_count(expr("a.b1 ^ b.b1")) +
        bit_count(expr("a.b2 ^ b.b2")) + bit_count(expr("a.b3 ^ b.b3"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        dist.cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
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

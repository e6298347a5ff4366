package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media =
    Multimodal.synthesize(spark, Tables.documents(spark, sf0001), "doc_id")

  test("synthesized media table has the declared schema shape") {
    val df = media.toDF()
    assert(df.columns.toSeq ==
      Seq("media_id", "kind", "payload", "width", "height"))
    assert(media.count() == 500)
    assert(df.select("kind").distinct().count() == 3)
  }

  test("feature extraction decodes headers partition-wise, deterministic") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 500)
    assert(feats.filter(!_.header_ok).isEmpty)
    // deterministic: same id -> same mean on recompute
    val a = feats.filter(_.media_id == 7L).head().mean_byte
    val b = Multimodal.extractFeatures(media).filter(_.media_id == 7L).head().mean_byte
    assert(a == b)
    // payload length = 12-byte header + width*height body
    assert(feats.collect().forall(f => f.n_bytes == 12 + f.width * f.height))
  }

  test("corrupt payload is flagged, not thrown") {
    val bad = Seq(Multimodal.Media(99L, "image", Array[Byte](1, 2, 3), 4, 4)).toDS()
    val f = Multimodal.extractFeatures(bad).head()
    assert(!f.header_ok && f.mean_byte == 0.0)
  }

  test("frame sampling explodes video payloads without shuffling them") {
    val frames = Multimodal.sampleFrames(media, everyN = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    assert(frames.count() > 0)
    // only video rows contribute
    val videoIds = media.filter(_.kind == "video").map(_.media_id).collect().toSet
    assert(frames.select("media_id").as[Long].collect().toSet.subsetOf(videoIds))
    // frame numbers follow the stride
    assert(frames.select("frame_no").as[Int].collect().forall(_ % 2 == 0))
  }
  test("resize: nearest-neighbor stub keeps header shape and id-derived bytes") {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(spark,
      spark.range(1, 20).toDF("id"), "id")
    val resized = Multimodal.resize(media, 4, 4).collect()
    assert(resized.forall(m => m.width == 4 && m.height == 4 && m.payload.length == 28))
    // spot-check one value against the direct formula
    val m7 = resized.find(_.media_id == 7L).get
    val (w, h) = (8 + 7 % 8, 8 + 7 % 5)
    val srcIdx = (1 * h / 4) * w + (2 * w / 4) // pixel (y=1, x=2)
    val expect = ((7L * 2654435761L + srcIdx * 40503L) >>> 16).toByte
    assert(m7.payload(12 + 1 * 4 + 2) == expect)
  }

  test("phashNearDup finds brightness-shifted twins; banding loses no dist<=3 pair") {
    val base = Multimodal.synthesize(spark, spark.range(1, 81).toDF("id"), "id")
    val twins = Multimodal.adjustBrightness(base, 1)
      .map(m => m.copy(media_id = m.media_id + 1000L))
    val all = base.union(twins)
    val got = Multimodal.phashNearDup(all, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force ground truth over the collected band signatures
    val sigs = Multimodal.phashBands(all)
      .as[(Long, Int, Int, Int, Int)].collect()
    def dist(a: (Long, Int, Int, Int, Int), b: (Long, Int, Int, Int, Int)): Int =
      Integer.bitCount(a._2 ^ b._2) + Integer.bitCount(a._3 ^ b._3) +
        Integer.bitCount(a._4 ^ b._4) + Integer.bitCount(a._5 ^ b._5)
    val want = (for {
      a <- sigs; b <- sigs
      if a._1 < b._1 && dist(a, b) <= 3
    } yield (a._1, b._1)).toSet
    assert(got == want)
    // the +1-brightness twin flips a dHash bit only at 255->0 wraps, so
    // most planted pairs sit within distance 3 — and are all found
    val planted = got.count { case (a, b) => b == a + 1000L }
    assert(planted >= 60, s"only $planted of 80 planted twins found")
  }

  test("real PNG round-trip: decodeImages(synthesizePng) recovers the exact pixel grid") {
    val ids = spark.range(0, 40).toDF("id")
    val decoded = Multimodal.decodeImages(
        Multimodal.synthesizePng(spark, ids, "id"))
      .as[(Long, Int, Int, Long, Long)].collect().sortBy(_._1)
    assert(decoded.length == 40)
    decoded.foreach { case (id, w, h, nPix, sum) =>
      assert(w == 8 + (id % 8).toInt && h == 8 + (id % 5).toInt)
      assert(nPix == w.toLong * h)
      val expect = (0 until w * h)
        .map(i => (((id * 2654435761L + i * 40503L) >>> 16) & 0xFF)).sum
      assert(sum == expect, s"id=$id decoded luma $sum != formula $expect")
    }
    // the payloads are GENUINE PNG bytes (magic header), not GRFT fakes
    val payload = Multimodal.synthesizePng(spark, ids, "id").head().payload
    assert(payload.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
  }

  test("decodeImages handles other JDK codecs (BMP) through the same path") {
    import spark.implicits._
    // encode one image as BMP — decodeImages must not care about format
    val img = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 24).foreach(i => img.getRaster.setSample(i % 6, i / 6, 0, i * 10))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val media = Seq(Multimodal.Media(7L, "image", bos.toByteArray, 6, 4)).toDS()
    val out = Multimodal.decodeImages(media)
      .as[(Long, Int, Int, Long, Long)].head()
    assert(out == ((7L, 6, 4, 24L, (0 until 24).map(_ * 10L).sum)))
    // and an undecodable payload fails loudly with its id
    val junk = Seq(Multimodal.Media(9L, "image", Array[Byte](1, 2, 3), 1, 1)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(junk).collect()
    }
    assert(e.getMessage.contains("media_id=9") ||
      Option(e.getCause).exists(_.getMessage.contains("media_id=9")))
  }

  test("dHash is invariant under a wrap-free brightness shift") {
    // payload whose body bytes stay < 255 after +1: hash must be identical
    val m = Multimodal.synthesize(spark, spark.range(3, 4).toDF("id"), "id")
    val shifted = Multimodal.adjustBrightness(m, 1)
    val h1 = Multimodal.phashBands(m).as[(Long, Int, Int, Int, Int)].head()
    val h2 = Multimodal.phashBands(shifted).as[(Long, Int, Int, Int, Int)].head()
    val wraps = m.head().payload.drop(12).count(b => (b & 0xFF) == 255)
    if (wraps == 0) assert(h1 == h2)
    else assert(h1._1 == h2._1) // wrap present: only the id is guaranteed
  }
}

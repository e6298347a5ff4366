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
}

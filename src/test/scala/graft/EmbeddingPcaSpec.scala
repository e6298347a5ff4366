package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingPca

class EmbeddingPcaSpec extends SparkTestBase {
  import spark.implicits._

  test("quantized gram: hand-computed integer entries") {
    // q(0.5)=500000, q(-0.25)=-250000, q(1.0)=1000000, q(0)=0
    val df = Seq(
      (1L, Seq(0.5f, -0.25f)),
      (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = EmbeddingPca.gramQuantized(df, col("vec_id"), col("embedding"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val q11 = 500000L * 500000L + 1000000L * 1000000L
    val q12 = 500000L * -250000L + 1000000L * 0L
    val q22 = 250000L * 250000L
    assert(got == Seq((0L, 0L, 2L, q11), (0L, 1L, 2L, q12),
      (1L, 1L, 2L, q22)), s"got $got")
  }

  test("recovers a planted variance direction, orthonormal, deterministic") {
    val d = 8
    val rng = new scala.util.Random(42)
    val dir = {
      val raw = Array.fill(d)(rng.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n))
    }
    // big variance along dir, small isotropic noise
    val rows = (1L to 300L).map { i =>
      val t = rng.nextGaussian() * 2.0
      (i, (0 until d).map(j =>
        (t * dir(j) + 0.05 * rng.nextGaussian()).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val w = EmbeddingPca.fitProjection(df, col("vec_id"), col("embedding"),
      k = 3)
    // top component aligns with the planted direction
    val cos0 = w.head.zip(dir).map { case (a, b) => a.toDouble * b }.sum
    assert(math.abs(cos0) > 0.99, s"top component off the planted axis: $cos0")
    // rows orthonormal
    for (a <- w.indices; b <- w.indices) {
      val dot = w(a).zip(w(b)).map { case (x, y) => x.toDouble * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-5, s"W[$a]·W[$b] = $dot")
    }
    // sign canonicalization + fixed iteration count => bitwise stable
    val w2 = EmbeddingPca.fitProjection(df, col("vec_id"), col("embedding"),
      k = 3)
    assert(w == w2, "fitProjection is not deterministic")
    // projected variance is non-increasing across components
    val projs = EmbeddingPca.project(df, col("vec_id"), col("embedding"), w)
      .select("p0", "p1", "p2").as[(Double, Double, Double)].collect()
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val vs = Seq(variance(projs.map(_._1).toSeq),
      variance(projs.map(_._2).toSeq), variance(projs.map(_._3).toSeq))
    assert(vs(0) >= vs(1) && vs(1) >= vs(2), s"variance not ordered: $vs")
    assert(vs(0) > 10 * vs(1), s"planted axis should dominate: $vs")
  }

  test("whitening: unit variance per retained component, lambda ordered") {
    val d = 8
    val rng = new scala.util.Random(11)
    // anisotropic: per-dim scales 4, 2, 1, .5, ... halving
    val rows = (1L to 400L).map { i =>
      (i, (0 until d).map(j =>
        (rng.nextGaussian() * 4.0 / (1 << (j min 4))).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (w, lambdas) = EmbeddingPca.fitProjectionWithVariance(
      df, col("vec_id"), col("embedding"), k = 3)
    assert(lambdas == lambdas.sorted.reverse, s"lambda not ordered: $lambdas")
    assert(lambdas.head > 0)
    val projs = EmbeddingPca.projectWhitened(df, col("vec_id"),
        col("embedding"), w, lambdas)
      .select("w0", "w1", "w2").as[(Double, Double, Double)].collect()
    def popVar(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    Seq(projs.map(_._1).toSeq, projs.map(_._2).toSeq, projs.map(_._3).toSeq)
      .zipWithIndex.foreach { case (xs, m) =>
        val v = popVar(xs)
        assert(math.abs(v - 1.0) < 0.05,
          s"whitened component $m variance $v, want ~1") }
  }

  test("pcaRouteTopK: recall floor vs brute force, refine is exact") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf0001)
    val queries = e.filter(col("vec_id") < 15)
    val k = 5
    val truth = Similarity.bruteForceTopK(queries, e, k)
      .select("query_id", "cand_id", "cos")
      .as[(Long, Long, Double)].collect()
    val got = Similarity.pcaRouteTopK(queries, e, k,
        kDims = 8, shortlist = 60)
      .select("query_id", "cand_id", "cos")
      .as[(Long, Long, Double)].collect()
    val truthSet = truth.map(t => (t._1, t._2)).toSet
    val recall = got.count(g => truthSet((g._1, g._2))).toDouble / truth.size
    assert(recall >= 0.5, s"pca-route recall $recall below floor 0.5")
    // wherever route and truth agree on a pair, the refined cosine is
    // the EXACT brute-force value — the refine stage never approximates
    val truthCos = truth.map(t => (t._1, t._2) -> t._3).toMap
    got.filter(g => truthSet((g._1, g._2))).foreach { g =>
      assert(g._3 == truthCos((g._1, g._2)),
        s"refined cos differs from exact for ${(g._1, g._2)}") }
    // per-query row count contract
    assert(got.groupBy(_._1).forall(_._2.size == k))
  }

  test("corpus projection: fit on driver corpus, k <= d enforced") {
    val emb = Tables.embeddings(spark, sf0001)
    val w = EmbeddingPca.fitProjection(emb, col("vec_id"), col("embedding"),
      k = 2)
    assert(w.size == 2 && w.head.size == 64)
    val out = EmbeddingPca.project(emb, col("vec_id"), col("embedding"), w)
    assert(out.count() == emb.count())
    intercept[IllegalArgumentException] {
      EmbeddingPca.fitProjection(emb, col("vec_id"), col("embedding"), k = 65)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("importance scores: hand-computed counts, ranking, top-k") {
    // target = doc 1. Token counts: t -> (c_raw 3, c_tgt 2),
    // r -> (c_raw 3, c_tgt 0)
    val docs = Seq(
      (1L, "t t", true),
      (2L, "t r", false),
      (3L, "r r", false)).toDF("doc_id", "text", "is_t")
    val scored = Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("is_t"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(scored == Seq(
      (1L, 2L, 4L, 6L, 4.0 / 6.0),
      (2L, 2L, 2L, 6L, 2.0 / 6.0),
      (3L, 2L, 0L, 6L, 0.0)), s"got $scored")
    val top = Dsir.selectTopK(
        Dsir.importanceScores(docs, col("doc_id"), col("text"), col("is_t")), 2)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(top == Seq(1L, 2L), s"got $top")
  }

  test("hashed features equal exact features when buckets don't collide") {
    // ~60 distinct tokens into 2^30 buckets: collision probability
    // ~ v^2/2B ≈ 2e-6, and xxhash64 is deterministic — this either
    // always passes or always fails, never flakes
    val docs = (1L to 30L).map(i =>
      (i, s"w${i}a w${i}b common", i % 3 == 0)).toDF("doc_id", "text", "is_t")
    val exact = Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("is_t"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val hashed = Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("is_t"), hashBuckets = Some(1 << 30))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(hashed == exact)
  }

  test("bigram features: hand-computed counts over tokens + bigrams") {
    // target = doc 1. Features with bigrams: doc1 = [a, b, "a b"],
    // doc2 = [a, c, "a c"]. Counts: a -> (2 raw, 1 tgt),
    // b -> (1, 1), "a b" -> (1, 1), c -> (1, 0), "a c" -> (1, 0)
    val docs = Seq(
      (1L, "a b", true),
      (2L, "a c", false)).toDF("doc_id", "text", "is_t")
    val scored = Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("is_t"), bigrams = true)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(scored == Seq(
      (1L, 3L, 3L, 4L, 3.0 / 4.0),
      (2L, 3L, 1L, 4L, 1.0 / 4.0)), s"got $scored")
    // serve split carries the same feature space
    val b = 64
    val (ct, cr) = Dsir.hashedFreq(docs, col("doc_id"), col("text"),
      col("is_t"), b, bigrams = true)
    val served = Dsir.scoreWithFreq(docs, col("doc_id"), col("text"),
        ct, cr, bigrams = true)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val inline = Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("is_t"), hashBuckets = Some(b), bigrams = true)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(served == inline)
  }

  test("collected-frequency serving equals inline hashed scoring") {
    val docs = (1L to 30L).map(i =>
      (i, s"w${i}a w${i}b common", i % 3 == 0)).toDF("doc_id", "text", "is_t")
    val b = 256
    val (ct, cr) = Dsir.hashedFreq(docs, col("doc_id"), col("text"),
      col("is_t"), b)
    assert(ct.size == b && cr.size == b)
    assert(cr.sum == 90L && ct.sum == 30L, // 30 docs x 3 tokens, 10 target
      s"freq mass: tgt ${ct.sum}, raw ${cr.sum}")
    val served = Dsir.scoreWithFreq(docs, col("doc_id"), col("text"), ct, cr)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val inline = Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("is_t"), hashBuckets = Some(b))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(served == inline)
  }

  test("one bucket collapses every document to the corpus-wide ratio") {
    // B = 1: all tokens share a bucket, so every document's score is
    // target_tokens/total_tokens — the graceful-degradation floor of
    // DSIR's hashing (collisions blur scores toward the global ratio,
    // they never error)
    val docs = Seq(
      (1L, "t t", true),
      (2L, "t r", false),
      (3L, "r r r", false)).toDF("doc_id", "text", "is_t")
    val scored = Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("is_t"), hashBuckets = Some(1))
      .select(col("score")).as[Double].collect().toSeq
    assert(scored.size == 3 && scored.forall(_ == 2.0 / 7.0), s"got $scored")
  }

  test("log weights match an independent driver-side fold") {
    // random tiny corpora; expected log w via a straight Scala
    // re-derivation of the add-one-smoothed likelihood ratio
    val rng = new scala.util.Random(7)
    val vocabPool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (1L to 20L).map { i =>
      val n = 1 + rng.nextInt(6)
      (i, Seq.fill(n)(vocabPool(rng.nextInt(vocabPool.size))).mkString(" "),
        rng.nextBoolean())
    }
    val got = Dsir.logWeights(docs.toDF("doc_id", "text", "is_t"),
        col("doc_id"), col("text"), col("is_t"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // reference fold
    val toks = docs.flatMap { case (i, t, y) => t.split(" ").map((i, _, y)) }
    val freq = toks.groupBy(_._2).map { case (w, xs) =>
      w -> (xs.count(_._3).toLong, xs.size.toLong) }
    val v = freq.size.toLong
    val nT = freq.valuesIterator.map(_._1).sum
    val nR = freq.valuesIterator.map(_._2).sum
    val want = docs.map { case (i, t, _) =>
      val ws = t.split(" ").toSeq
      val lw = ws.map { w =>
        val (ct, cr) = freq(w)
        math.log((ct + 1).toDouble / (nT + v).toDouble) -
          math.log((cr + 1).toDouble / (nR + v).toDouble)
      }.sum
      (i, ws.size.toLong, lw)
    }
    assert(got.size == want.size)
    got.zip(want).foreach { case ((gi, gn, gw), (wi, wn, ww)) =>
      assert(gi == wi && gn == wn, s"row mismatch: $gi vs $wi")
      assert(math.abs(gw - ww) <= 1e-9 * math.max(1.0, math.abs(ww)),
        s"doc $gi: log_w $gw vs reference $ww") }
    // target-pure docs must outrank raw-only docs in log-weight order
    val pure = Dsir.logWeights(
        Seq((1L, "t t", true), (2L, "r r", false)).toDF("doc_id", "text", "is_t"),
        col("doc_id"), col("text"), col("is_t"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(pure(0)._3 > pure(1)._3)
  }

  test("selectTopK plans a map-side partial top-k, not a global sort") {
    val docs = Tables.documents(spark, sf0001)
    val plan = Dsir.selectTopK(
        Dsir.importanceScores(docs, col("doc_id"), col("text"),
          col("lang") === "en"), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("Sort ["), s"unexpected global Sort in:\n$plan")
  }
}

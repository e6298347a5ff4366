package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Classifier

/** Batch-perceptron trainer semantics: the engine's integer training
  * procedure must match an independent in-memory implementation epoch
  * for epoch (weights, scores, predictions), converge on linearly
  * separable data, and beat the class prior when distilling the Gopher
  * gate on the real corpus. */
class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference: plain-Scala batch perceptron over the same
    * md5-bucket features. Mirrors the SPEC, not the engine code —
    * Map-based, no Spark. */
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def refFeatures(text: String): Map[Int, Long] = {
    // split(text, " ") in Spark keeps trailing empties (limit -1)
    val fa = text.split(" ", -1).map(t =>
      Integer.parseInt(md5hex(t).take(Classifier.dimHexChars), 16))
    fa.groupBy(identity).map { case (f, a) => f -> a.length.toLong } +
      (Classifier.biasFeature -> 1L)
  }

  private def refTrainScore(docs: Seq[(Long, Long, String)], epochs: Int)
      : Map[Long, (Long, Long, Boolean)] = {
    val b = Classifier.resolution
    val feats = docs.map { case (id, y, t) => (id, y, refFeatures(t)) }
    var w = Map.empty[Int, Long].withDefaultValue(0L)
    var pocket = w
    var pocketOk = -1
    def score(wm: Map[Int, Long], f: Map[Int, Long]): Long =
      f.iterator.map { case (k, c) => wm.getOrElse(k, 0L) * c }.sum
    def checkPocket(): Unit = {
      val ok = feats.count { case (_, y, f) => y * score(w, f) > 0L }
      if (ok > pocketOk) { pocket = w; pocketOk = ok }
    }
    for (k <- 1 to epochs) {
      checkPocket()
      val mis = feats.filter { case (_, y, f) => y * score(w, f) <= 0L }
      val den = math.max(mis.size, 1).toLong * k
      val delta = mis.flatMap { case (_, y, f) =>
        f.iterator.map { case (fk, c) => fk -> y * c } }
        .groupBy(_._1).map { case (fk, kvs) => fk -> (b * kvs.map(_._2).sum) / den }
      w = delta.foldLeft(w) { case (acc, (fk, d)) => acc.updated(fk, acc(fk) + d) }
    }
    checkPocket()
    feats.map { case (id, y, f) =>
      val s = score(pocket, f)
      val p = if (s > 0) 1L else -1L
      // correct = the PREDICTION matches (zero-score docs predict -1 and
      // so count correct when y = -1) — mirrors the engine + SQL oracle
      id -> (s, p, p == y)
    }.toMap
  }

  private def engineTrainScore(docs: Seq[(Long, Long, String)], epochs: Int)
      : Map[Long, (Long, Long, Boolean)] = {
    val df = docs.toDF("doc_id", "y", "text")
    Classifier.trainScore(df, col("doc_id"), col("y"), col("text"), epochs)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map { case (id, _, s, p, c) => id -> (s, p, c) }.toMap
  }

  test("engine matches the independent reference on random corpora") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "x", "yy", "z1", "")
    val doc = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val corpus = for {
      n <- Gen.choose(2, 14)
      texts <- Gen.listOfN(n, doc)
      ys <- Gen.listOfN(n, Gen.oneOf(1L, -1L))
    } yield texts.zip(ys).zipWithIndex.map { case ((t, y), i) =>
      (i.toLong, y, t) }
    val prop = Prop.forAll(corpus, Gen.choose(1, 4)) { (docs, epochs) =>
      engineTrainScore(docs, epochs) == refTrainScore(docs, epochs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("zero-score docs count correct iff the predicted label matches") {
    // round-6 ScalaCheck falsifying case: a doc lands on pocket score 0
    // with y = -1; pred is -1 there, so `correct` must be true on both
    // engines (the y*score>0 spelling wrongly called it a miss)
    val docs = Seq(
      (0L, 1L, "alpha eta z1"),
      (1L, 1L, "z1 beta eps gamma alpha eta gamma alpha beta zeta theta"),
      (2L, -1L, "beta eta z1 eta"), (3L, -1L, "delta z1 eps z1"),
      (4L, -1L, "alpha beta gamma x x beta zeta"), (5L, -1L, "alpha"),
      (6L, -1L, "z1 theta  yy"), (7L, -1L, "beta delta x theta"),
      (8L, 1L, "alpha eta theta eta zeta theta theta eta gamma eps eta alpha"),
      (9L, 1L, "zeta alpha"),
      (10L, -1L, "alpha z1 theta x theta theta eta alpha delta alpha zeta x"),
      (11L, 1L, "x  beta"), (12L, 1L, "eta z1 yy"))
    val eng = engineTrainScore(docs, 3)
    assert(eng == refTrainScore(docs, 3))
    // the case is only a regression guard while it actually exercises a
    // zero score somewhere
    assert(eng.values.exists(_._1 == 0L), s"no zero-score doc: $eng")
  }

  test("null text trains and scores exactly like empty text") {
    // tokenFeatures coalesces NULL -> "" before tokenization; without it
    // a NULL-text doc contributes no feature rows on the engine side but
    // still enrolls in the oracle's training through the bias row
    val withNull = Seq(
      (0L, -1L, null.asInstanceOf[String]),
      (1L, -1L, "alpha beta the a of and"),
      (2L, 1L, "z1 yy x the a"), (3L, 1L, "eta zeta the of"))
    val withEmpty = withNull.map { case (i, y, t) =>
      (i, y, if (t == null) "" else t) }
    val eng = engineTrainScore(withNull, 3)
    assert(eng == engineTrainScore(withEmpty, 3))
    assert(eng == refTrainScore(withEmpty, 3))
  }

  test("converges to a perfect separator on separable data") {
    // label = presence of a marker token; with distinct vocab per class
    // the data is linearly separable, so the perceptron criterion
    // reaches zero within a few batch epochs
    val docs = (0 until 24).map { i =>
      val y = if (i % 2 == 0) 1L else -1L
      val t = if (y > 0) s"good sig$i tail common" else s"bad neg$i tail common"
      (i.toLong, y, t)
    }
    val out = engineTrainScore(docs, epochs = 10)
    assert(out.values.forall(_._3), s"not separated: $out")
  }

  test("distilled gopher classifier beats the class prior on the corpus") {
    val df = SparkEntry.queries("quality_classifier")(spark, sf0001)
    val rows = df.as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val acc = rows.count(_._5).toDouble / rows.size
    val prior = math.max(
      rows.count(_._2 == 1L), rows.count(_._2 == -1L)).toDouble / rows.size
    assert(acc > prior,
      s"agreement $acc not above class prior $prior (n=${rows.size})")
    assert(acc >= 0.70, s"pocket agreement regressed: $acc")
    // predictions are exactly sign(score) with the zero -> -1 convention
    assert(rows.forall { case (_, _, s, p, _) =>
      p == (if (s > 0) 1L else -1L) })
  }

  test("calibration sweep: two-phase prefix sum, no global window over score rows") {
    val cal = SparkEntry.queries("classifier_calibration")(spark, sf0001)
    val rows = cal.as[(Long, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(-_._1).toSeq
    assert(rows.nonEmpty)
    // confusion-count identities at every threshold: tp+fp = kept,
    // tp+fn = pos_total (constant), counts monotone in threshold order
    val posTotal = rows.head._3 + rows.head._5
    assert(rows.forall { case (_, nk, tp, fp, fn, prec, rec) =>
      tp + fp == nk && tp + fn == posTotal &&
        prec == tp.toDouble / nk && rec == tp.toDouble / posTotal })
    assert(rows.sliding(2).forall { case Seq(a, b) =>
      a._2 <= b._2 && a._3 <= b._3; case _ => true })
    // lowest threshold keeps everything: recall 1
    assert(rows.last._7 == 1.0d)
    // plan shape (the corpus_pack rule): every partition-less Window sits
    // above an aggregate — the O(P) partition-totals prefix — never over
    // the per-score row stream
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = cal.queryExecution.optimizedPlan
    plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"single-task window directly over row stream:\n${w.simpleString(5)}")
    }
    assert(plan.collect { case w: LWindow if w.partitionSpec.nonEmpty => w }.nonEmpty)
  }

  test("training is memoized per (corpus, epochs): one epoch-loop per session") {
    import graft.operators.Dedup
    Dedup.releaseCaches()
    val docs = Seq((1L, 1L, "good clean prose"), (2L, -1L, "spam spam spam"),
      (3L, 1L, "more useful text")).toDF("doc_id", "y", "text")
    val g0 = Dedup.gateMeasurements
    val w1 = Classifier.trainPerceptron(docs, col("doc_id"), col("y"), col("text"), 3)
    val w2 = Classifier.trainPerceptron(docs, col("doc_id"), col("y"), col("text"), 3)
    assert(w1 == w2)
    assert(Dedup.gateMeasurements == g0 + 1,
      "second construction must reuse the memoized training run")
    // a different epoch count is a different model — trains again
    Classifier.trainPerceptron(docs, col("doc_id"), col("y"), col("text"), 4)
    assert(Dedup.gateMeasurements == g0 + 2)
    Dedup.releaseCaches()
  }

  test("streaming serving stage scores exactly like the batch projection") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = (0 until 24).map { i =>
      val y = if (i % 2 == 0) 1L else -1L
      (i.toLong, y, if (y > 0) s"good sig$i tail common" else s"bad neg$i tail common")
    }
    val w = Classifier.trainPerceptron(docs.toDF("doc_id", "y", "text"),
      col("doc_id"), col("y"), col("text"), epochs = 10)
    val unlabeled = docs.map { case (id, _, t) => (id, t) }
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDownsample
      .scoreStream(mem.toDF().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("score_out")
      .outputMode("append").start()
    mem.addData(unlabeled.take(12))
    q.processAllAvailable()
    mem.addData(unlabeled.drop(12))
    q.processAllAvailable()
    val streamed = spark.table("score_out")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    val batch = Classifier.scoreDocs(unlabeled.toDF("doc_id", "text"),
      col("doc_id"), col("text"), w)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // trained on separable data: the served predictions are the labels
    assert(batch.forall { case (id, _, p) => p == (if (id % 2 == 0) 1L else -1L) })
  }
}

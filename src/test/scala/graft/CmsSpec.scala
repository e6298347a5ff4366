package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Cms
import graft.queries.DataCleaning
import graft.streaming.StreamingDownsample
import graft.streaming.StreamingDownsample.Event

/** Count-Min sketch laws: the one-sided error contract, the εn bound,
  * the sum-of-sketches rollup, map-side partial folding, and the
  * streaming twin's convergence. The value-level gate is the DuckDB
  * oracle on `cms_estimate`; these pin what the oracle can't see. */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  test("estimates are one-sided (est >= true) for EVERY key, and within the eps*n bound") {
    val ev = Tables.events(spark, sf0001)
    val sk = Cms.sketch(ev, col("user_id"))
    val all = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
    val est = Cms.estimates(sk, all, "user_id")
      .select("user_id", "true_cnt", "est_cnt")
      .as[(Long, Long, Long)].collect()
    val n = ev.count()
    assert(est.nonEmpty)
    assert(est.forall(r => r._3 >= r._2),
      "CMS may only OVERcount — an underestimate is a bug, not noise")
    // e/w ~ 1.06% of n per the theory; deterministic hashes make the
    // observed overcount a fixed number — allow 3x the bound as slack
    val cap = (3.0 * math.E / Cms.W * n).toLong + 1
    val worst = est.map(r => r._3 - r._2).max
    assert(worst <= cap, s"overcount $worst exceeds 3x eps*n = $cap")
  }

  test("collision-free fixture collapses to exact counts") {
    val rows = Seq.tabulate(30)(i => (i.toLong % 3, s"e$i"))
      .toDF("user_id", "x")
    val sk = Cms.sketch(rows, col("user_id"))
    val keys = rows.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
    val est = Cms.estimates(sk, keys, "user_id")
      .select("user_id", "true_cnt", "est_cnt").as[(Long, Long, Long)]
      .collect().toSet
    assert(est == Set((0L, 10L, 10L), (1L, 10L, 10L), (2L, 10L, 10L)),
      s"3 keys in 4x256 cells must sit alone in some row: $est")
  }

  test("rollup law: sketch(A) + sketch(B) == sketch(A union B) elementwise") {
    val ev = Tables.events(spark, sf0001)
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Cms.sketch(df, col("user_id")).as[Seq[Long]].head()
    val sa = arr(a); val sb = arr(b); val sall = arr(ev)
    assert(sa.zip(sb).map { case (x, y) => x + y } == sall,
      "counter merges are elementwise adds — disjoint sketches must sum")
  }

  test("the sketch fold is map-side partial: graft_cms partials precede the exchange") {
    val plan = Cms.sketch(Tables.events(spark, sf0001), col("user_id"))
      .queryExecution.executedPlan.toString
    val firstAgg = plan.lastIndexOf("graft_cms")
    val exchange = plan.lastIndexOf("Exchange")
    assert(firstAgg > exchange && exchange >= 0,
      s"expected a partial graft_cms BELOW the exchange:\n${plan.take(1500)}")
  }

  test("null keys are ignored (match a COUNT over non-null keys)") {
    val rows = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (1L, "c"))
      .toDF("user_id", "x")
    val total = Cms.sketch(rows, col("user_id")).as[Seq[Long]].head().sum
    // one key hit d=4 cells twice; the null row contributes nothing
    assert(total == 2L * Cms.D, s"cell mass $total != 2 rows x d")
  }

  test("cms_estimate: the registered query's overcount column is never negative") {
    val nUsers = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    val out = DataCleaning.cmsEstimate(spark, sf0001)
      .select("overcount").as[Long].collect()
    assert(out.length == math.min(20L, nUsers) && out.forall(_ >= 0L))
  }

  test("windowed CMS stream converges to the identical batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = new scala.util.Random(29).shuffle(
      Tables.events(spark, sf0001)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Event].collect().toSeq)
    val mem = MemoryStream[Event]
    val q = StreamingDownsample.cmsStream(mem.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("append").start()
    mem.addData(corpus); q.processAllAvailable()
    mem.addData(Seq(Event(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "x", 0.0)))
    q.processAllAvailable()
    val got = spark.table("cms_out")
      .filter(col("day") < lit("2030-01-01"))
      .as[(java.sql.Date, Seq[Long])].collect().map(r => r._1 -> r._2).toMap
    q.stop()
    val batch = Tables.events(spark, sf0001)
      .select(col("ts"), Cms.positions(col("user_id")).as("pos"))
      .groupBy(window(col("ts"), "1 day").as("win"))
      .agg(graft.functions.CmsSketchAgg(col("pos"), Cms.D * Cms.W).as("cms"))
      .select(col("win.start").cast("date").as("day"), col("cms"))
      .as[(java.sql.Date, Seq[Long])].collect().map(r => r._1 -> r._2).toMap
    assert(batch.nonEmpty)
    assert(got == batch)
  }

  test("innerProductEstimate: one-sided join-size bound, exact when w resolves all keys") {
    import spark.implicits._
    val a = Seq.tabulate(600)(i => i.toLong % 30).toDF("k")   // f_A(k) = 20
    val b = Seq.tabulate(150)(i => i.toLong % 50).toDF("k")   // f_B(k) = 3
    val trueSize = {
      val fa = (0L until 30L).map(_ -> 20L).toMap
      val fb = (0L until 50L).map(_ -> 3L).toMap
      fa.keys.toSeq.filter(fb.contains).map(k => fa(k) * fb(k)).sum
    }
    val est = Cms.innerProductEstimate(a, col("k"), b, col("k"))
      .as[Long].head()
    assert(est >= trueSize, s"inner product must be one-sided: $est < $trueSize")
    // the w.p.-(1−δ) bound is ε·|A|·|B| = (e/256)·600·150 ≈ 956; the
    // hashes are deterministic so this fixture is ONE draw — pin 3× the
    // bound (measured 2040 here: 2.1×, an ordinary tail draw at d = 4)
    assert(est - trueSize <= 3000, s"overcount ${est - trueSize} beyond 3x the ε bound")
    // a width that gives every key its own cells w.h.p. → exact
    val exact = Cms.innerProductEstimate(a, col("k"), b, col("k"), d = 4, w = 1 << 14)
      .as[Long].head()
    assert(exact == trueSize)
  }
}

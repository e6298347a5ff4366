package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan) vs a
  * driver-side brute-force reference, plus plan-shape and co-partitioning
  * checks. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(
      quotes: Seq[(Long, Long, Long, Double)], // (key, ts, id, px)
      trades: Seq[(Long, Long, Long)])         // (key, ts, id)
      : Set[(Long, Long, Option[Long])] =
    trades.map { case (k, ts, id) =>
      val m = quotes.filter(q => q._1 == k && (q._2 < ts || (q._2 == ts && q._3 <= id)))
        .sortBy(q => (q._2, q._3)).lastOption
      (k, id, m.map(_._3))
    }.toSet

  test("matches brute force on random keyed series, including no-match rows") {
    val rng = new scala.util.Random(3)
    val quotes = Seq.fill(400)(
      (rng.nextInt(8).toLong, rng.nextInt(1000).toLong, rng.nextLong(1L << 40), rng.nextDouble()))
    val trades = Seq.fill(300)(
      (rng.nextInt(10).toLong, rng.nextInt(1000).toLong, rng.nextLong(1L << 40)))

    val qDf = quotes.toDF("key", "ts", "qid", "px").repartition(7)
    val tDf = trades.toDF("key", "ts", "tid").repartition(5)
    val out = AsOfJoin(spark, tDf,
        qDf.select(col("key"), col("ts").as("q_ts"), col("qid"), col("px")),
        on = Seq("key"), leftOrder = Seq("ts", "tid"), rightOrder = Seq("q_ts", "qid"))
      .select(col("key"), col("tid"), col("qid"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == bruteForce(quotes, trades))
    // keys 8,9 exist only on the left: verify genuine null matches survive
    assert(out.exists(_._3.isEmpty))
  }

  test("forward direction matches the first right row at-or-after each left row") {
    val rng = new scala.util.Random(5)
    val quotes = Seq.fill(300)(
      (rng.nextInt(6).toLong, rng.nextInt(500).toLong, rng.nextLong(1L << 40), rng.nextDouble()))
    val trades = Seq.fill(250)(
      (rng.nextInt(8).toLong, rng.nextInt(500).toLong, rng.nextLong(1L << 40)))
    val expected = trades.map { case (k, ts, id) =>
      val m = quotes.filter(q => q._1 == k && (q._2 > ts || (q._2 == ts && q._3 >= id)))
        .sortBy(q => (q._2, q._3)).headOption
      (k, id, m.map(_._3))
    }.toSet
    val out = graft.plans.AsOfJoin(spark,
        trades.toDF("key", "ts", "tid").repartition(5),
        quotes.toDF("key", "q_ts", "qid", "px").repartition(3),
        on = Seq("key"), leftOrder = Seq("ts", "tid"), rightOrder = Seq("q_ts", "qid"),
        direction = graft.plans.AsOfForward)
      .select(col("key"), col("tid"), col("qid"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == expected)
    assert(out.exists(_._3.isEmpty))   // rows past the last quote stay null
    assert(out.exists(_._3.nonEmpty))
  }

  test("tolerance nulls out matches farther than the bound (both directions)") {
    val quotes = Seq((1L, 100L, 10L), (1L, 200L, 20L)).toDF("key", "q_ts", "qid")
    val trades = Seq((1L, 205L, 1L), (1L, 290L, 2L), (1L, 150L, 3L)).toDF("key", "ts", "tid")
    val back = graft.plans.AsOfJoin(spark, trades, quotes,
        on = Seq("key"), leftOrder = Seq("ts", "tid"), rightOrder = Seq("q_ts", "qid"),
        direction = graft.plans.AsOfBackward, tolerance = Some(50L))
      .select("tid", "qid").as[(Long, Option[Long])].collect().toMap
    // trade@205 -> quote@200 (gap 5 ok); trade@290 -> quote@200 gap 90 > 50
    // -> null; trade@150 -> quote@100 gap 50 == bound -> kept
    assert(back == Map(1L -> Some(20L), 2L -> None, 3L -> Some(10L)))
    val fwd = graft.plans.AsOfJoin(spark, trades, quotes,
        on = Seq("key"), leftOrder = Seq("ts", "tid"), rightOrder = Seq("q_ts", "qid"),
        direction = graft.plans.AsOfForward, tolerance = Some(40L))
      .select("tid", "qid").as[(Long, Option[Long])].collect().toMap
    // trade@150 -> quote@200 forward gap 50 > 40 -> null; trade@205/290
    // have no later quote -> null
    assert(fwd == Map(1L -> None, 2L -> None, 3L -> None))
  }

  test("nearest direction matches brute force; ties go backward; tolerance caps both sides") {
    val rng = new scala.util.Random(11)
    val quotes = Seq.fill(300)(
      (rng.nextInt(6).toLong, rng.nextInt(500).toLong, rng.nextLong(1L << 40)))
    val trades = Seq.fill(250)(
      (rng.nextInt(8).toLong, rng.nextInt(500).toLong, rng.nextLong(1L << 40)))
    def nearestBrute(tol: Long): Set[(Long, Long, Option[Long])] =
      trades.map { case (k, ts, id) =>
        val b = quotes.filter(q => q._1 == k && (q._2 < ts || (q._2 == ts && q._3 <= id)))
          .sortBy(q => (q._2, q._3)).lastOption.filter(q => ts - q._2 <= tol)
        val f = quotes.filter(q => q._1 == k && (q._2 > ts || (q._2 == ts && q._3 > id)))
          .sortBy(q => (q._2, q._3)).headOption.filter(q => q._2 - ts <= tol)
        val m = (b, f) match {
          case (Some(bq), Some(fq)) => Some(if (ts - bq._2 <= fq._2 - ts) bq else fq)
          case (x, y) => x.orElse(y)
        }
        (k, id, m.map(_._3))
      }.toSet
    def run(tol: Option[Long]): Set[(Long, Long, Option[Long])] =
      graft.plans.AsOfJoin(spark,
          trades.toDF("key", "ts", "tid").repartition(5),
          quotes.toDF("key", "q_ts", "qid").repartition(3),
          on = Seq("key"), leftOrder = Seq("ts", "tid"), rightOrder = Seq("q_ts", "qid"),
          direction = graft.plans.AsOfNearest, tolerance = tol)
        .select(col("key"), col("tid"), col("qid"))
        .as[(Long, Long, Option[Long])].collect().toSet
    assert(run(None) == nearestBrute(Long.MaxValue))
    assert(run(Some(7L)) == nearestBrute(7L))
    assert(run(Some(7L)).exists(_._3.isEmpty))
  }

  test("plans as AsOfJoinExec with one exchange per side and sorted children") {
    val l = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("ts"))
    val r = spark.range(50).select(col("id").as("k"), (col("id") * 3).as("rts"))
    val df = AsOfJoin(spark, l, r, on = Seq("k"), leftOrder = Seq("ts"),
      rightOrder = Seq("rts"))
    // AdaptiveSparkPlanExec is a leaf node, so string-match the tree it
    // prints instead of collect()ing through it
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin ["), s.take(1500))
    assert(s.contains("Sort "), s.take(1500))
    assert(s.contains("Exchange hashpartitioning(k"), s.take(1500))
    assert(df.count() == 100)
  }

  test("equals the union-window asof_join query on the events corpus") {
    val events = Tables.events(spark, sf0001)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val native = AsOfJoin(spark, purchases, clicks,
        on = Seq("user_id"),
        leftOrder = Seq("ts", "event_id"), rightOrder = Seq("click_ts", "click_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("click_id"), col("click_ts"))
      .as[(Long, Long, Timestamp, Option[Long], Option[Timestamp])]
      .collect().toSet
    val composed = SparkEntry.queries("asof_join")(spark, sf0001)
      .as[(Long, Long, Timestamp, Option[Long], Option[Timestamp])]
      .collect().toSet
    assert(composed.nonEmpty)
    assert(native == composed)
  }

  test("pushdown rule: left/key predicates reach both parquet scans, right predicates stay put") {
    val dir = sf0001
    val ev = Tables.events(spark, dir)
    val l = ev.select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val r = ev.select(col("event_id").as("rid"), col("user_id"), col("ts"),
      col("event_type"), col("props"))
    val j = AsOfJoin(spark, l, r, Seq("user_id"), Seq("ts"), Seq("ts"))
    val f = j.filter(col("user_id") < 5 && col("event_type") === "view")
    val pushed = f.queryExecution.executedPlan.toString.split("\n")
      .filter(_.contains("PushedFilters")).mkString("\n")
    // the KEY predicate prunes BOTH sides (equality transfers it);
    // the right-attribute predicate must NOT move (it would change
    // WHICH right row is the as-of match, not just drop outputs)
    assert("LessThan\\(user_id,5\\)".r.findAllIn(pushed).size == 2,
      s"key predicate should reach both scans:\n$pushed")
    assert(!pushed.contains("event_type,view"),
      s"right-side predicate must stay above the join:\n$pushed")
    val opt = f.queryExecution.optimizedPlan.toString
    assert(opt.indexOf("event_type") < opt.indexOf("AsOfJoinPlan"),
      s"residual right filter must sit ABOVE the node:\n${opt.take(800)}")
    // semantics: rule-pushed == hand-pushed == filter-above on a cold plan
    val handPushed = AsOfJoin(spark, l.filter(col("user_id") < 5), r,
        Seq("user_id"), Seq("ts"), Seq("ts"))
      .filter(col("event_type") === "view")
    assert(f.collect().toSet == handPushed.collect().toSet)
  }

  test("pushdown rule: non-deterministic predicates never move") {
    val ev = Tables.events(spark, sf0001)
    val l = ev.select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.select(col("event_id").as("rid"), col("user_id"), col("ts"))
    val j = AsOfJoin(spark, l, r, Seq("user_id"), Seq("ts"), Seq("ts"))
      .filter(rand(7) >= 0.0)
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.indexOf("rand(") < opt.indexOf("AsOfJoinPlan"),
      s"rand() must stay above the node:\n${opt.take(600)}")
  }

  test("pruning rule: unused payload columns never leave the parquet footer") {
    val ev = Tables.events(spark, sf0001)
    val l = ev.select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val r = ev.select(col("event_id").as("rid"), col("user_id"), col("ts"),
      col("event_type"), col("props"))
    val p = AsOfJoin(spark, l, r, Seq("user_id"), Seq("ts"), Seq("ts"))
      .select(col("event_id"), col("event_type"))
    val schemas = p.queryExecution.executedPlan.toString.split("\n")
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(!schemas.contains("props") && !schemas.contains("value"),
      s"unused payload must be pruned out of ReadSchema:\n$schemas")
    assert(schemas.contains("user_id") && schemas.contains("ts"),
      "keys and order columns must survive pruning")
  }
}

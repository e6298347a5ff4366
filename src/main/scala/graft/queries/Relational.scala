package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Diachronic

/** Relational operator coverage (SURVEY.md §2.7 plan): joins, aggregations,
  * windows, sorts/top-k, set ops — each as a declarative DataFrame query so
  * Catalyst handles pushdown/pruning/join-strategy, with a DuckDB oracle
  * twin.
  *
  * Determinism rules used throughout (SURVEY.md §7 "hard parts"):
  *  - every query ends in an `orderBy` over a total key;
  *  - no raw double SUMs: monetary doubles are cast to exact DECIMAL before
  *    summation (associative ⇒ partition-order-independent), then the final
  *    aggregate is cast back to double so both engines emit identical
  *    float64 values and schemas;
  *  - double columns that merely pass through (no arithmetic) are emitted
  *    as-is — bit-exact by construction;
  *  - window/rank ties broken by a unique key.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Greedy daily downsample (reference A1, /root/reference/main.py:151-161)
    * re-expressed as min-per-(key,day) aggregate — the flagship. */
  def diachronicDaily(spark: SparkSession, dir: String): DataFrame =
    Diachronic
      .firstPerDay(
        Tables.events(spark, dir),
        key = col("user_id"), ts = col("ts"), tieBreak = col("event_id"),
        payload = Seq(
          "event_id" -> col("event_id"),
          "event_type" -> col("event_type"),
          "value" -> col("value")))
      .withColumnRenamed("key", "user_id")
      .orderBy("user_id", "day")

  /** Same semantic via the window formulation — full-row output. */
  def diachronicDailyWindow(spark: SparkSession, dir: String): DataFrame =
    Diachronic
      .firstPerDayWindow(
        Tables.events(spark, dir),
        key = col("user_id"), ts = col("ts"), tieBreak = col("event_id"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("user_id", "ts")

  /** TPC-H-Q1-shaped scan→filter→hash-agg on lineitem. Partial aggregation
    * happens map-side; only |flag×status| = 6 groups shuffle. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val discPrice = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    val charge = discPrice.cast(DecimalType(18, 4)) * (lit(1) + dec2(col("l_tax")))
    li.filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H-Q3-shaped: broadcast the filtered customer dim into orders, then
    * join lineitem; AQE turns the orders side into a broadcast if the
    * filtered result is small. Top-10 by revenue, total tie-break. */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-07-01 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-07-01 00:00:00").cast("timestamp"))
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3JoinSql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H-Q5-shaped 5-way star join: tiny dims (region/nation/supplier)
    * broadcast; the orders↔lineitem fact join is the only shuffle. */
  def q5Join(spark: SparkSession, dir: String): DataFrame = {
    val asia = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, dir)
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
    val sup = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5JoinSql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |            JOIN customer ON c_nationkey = n_nationkey
      |            JOIN orders ON o_custkey = c_custkey
      |            JOIN lineitem ON l_orderkey = o_orderkey
      |            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** The reference's incremental-skip anti-join (S2,
    * /root/reference/main.py:56-71) generalized: work items minus
    * already-done items via `left_anti`. Here: orders with no lineitem. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")

  private val antiJoinSql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** EXISTS as `left_semi`: customers with at least one urgent open order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  private val semiJoinSql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q21's shape — **semi + anti self-joins on the same fact**:
    * suppliers who were the SOLE late shipper on a multi-supplier order
    * ("late" = shipped > 60 days after the order date; this corpus has
    * no commit/receipt dates). Three logical scans of lineitem: the late
    * rows, a semi join proving another supplier exists on the order, an
    * anti join proving no OTHER supplier was late on it. The semi/anti
    * sides project only (orderkey, suppkey) — the two self-join
    * exchanges carry 16-byte rows, never the fact's payload, and all
    * three shuffles share the l_orderkey key so AQE can reuse the
    * exchange. Counts stay int-exact; the supplier attach is a
    * broadcast. */
  def multiExistsJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    val late = li
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOthers = late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    late
      .join(others,
        col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
        "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
        "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  private val multiExistsJoinSql =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |late AS (
      |  SELECT l_orderkey, l_suppkey FROM li
      |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM li l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** TPC-H Q18's shape — a **group-HAVING aggregate driving a semi
    * join**: orders whose total lineitem quantity exceeds 250, with
    * their customer. The HAVING-filtered per-order aggregate (tiny — the
    * heavy-order tail) is the driving side; joining it back to orders IS
    * the semi join with the aggregate riding along as payload, and AQE
    * broadcasts it. Quantity sums in DECIMAL so the HAVING boundary and
    * the emitted sum are exact in both engines. */
  def bigOrdersSemi(spark: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    Tables.orders(spark, dir)
      .join(qty, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  private val bigOrdersSemiSql =
    """SELECT c_name, o_custkey, o_orderkey, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250)
      |  ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q11's shape — a **share-of-grand-total HAVING**: nations
    * holding more than 3% of all supplier account balance. The grand
    * total is a grouping-free aggregate over the (already tiny)
    * per-nation frame — provably one row, broadcast — and the threshold
    * compares by DECIMAL cross-multiplication (`nb·100 > tot·3`), no
    * division, so the boundary is exact in both engines. The
    * scalar_subquery plan shape (1-row broadcast), exempted as such in
    * PlanInvariantsSpec. */
  def nationShare(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("s_acctbal"))).as("nb"))
    val tot = per.agg(sum(col("nb")).as("tot"))
    per.crossJoin(broadcast(tot))
      .filter(col("nb") * 100 > col("tot") * 3)
      .select(col("n_name"), col("nb").cast("double").as("nation_bal"))
      .orderBy("n_name")
  }

  private val nationShareSql =
    """WITH per AS (
      |  SELECT n_name, SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS nb
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name),
      |tot AS (SELECT SUM(nb) AS tot FROM per)
      |SELECT n_name, CAST(nb AS DOUBLE) AS nation_bal
      |FROM per CROSS JOIN tot
      |WHERE nb * 100 > tot * 3
      |ORDER BY n_name""".stripMargin

  /** Equi + range predicate join: lineitems shipped within 30 days of their
    * order's date. The range condition rides on the equi-join (no
    * nested-loop explosion); counts stay int-exact. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    Tables.lineitem(spark, dir)
      .join(ord,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped_30d"),
        min(col("l_shipdate")).as("first_ship"))
      .orderBy("o_orderkey")
  }

  private val rangeJoinSql =
    """SELECT o_orderkey, COUNT(*) AS n_shipped_30d, MIN(l_shipdate) AS first_ship
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** As-of join: each purchase event matched to the same user's most recent
    * preceding (or simultaneous) click. Expressed as a single-pass
    * last-non-null window over the time-sorted union — one shuffle on
    * user_id, no self-join; at 100 TB this beats an O(n²)-per-user
    * inequality join and matches DuckDB's ASOF JOIN semantics. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "click_id", "click_ts")
      .orderBy("user_id", "ts", "event_id")
  }

  private val asofJoinSql =
    """SELECT event_id, user_id, ts, click_id, click_ts FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER w AS click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) OVER w AS click_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** Pure band join (no equi key): pairs of events from DIFFERENT users
    * within one second of each other — the shape a naive formulation
    * turns into an O(n²) cross product. [[graft.operators.Joins.bandJoin]]
    * bins timestamps to ε-width buckets so candidates come from an
    * equi-join on the bin id; only same-bin pairs pay the exact |Δt| ≤ ε
    * check. */
  def bandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val a = ev.select(col("event_id").as("id_a"), col("user_id").as("u_a"), col("ts").as("ts_a"))
    val b = ev.select(col("event_id").as("id_b"), col("user_id").as("u_b"), col("ts").as("ts_b"))
    graft.operators.Joins.bandJoin(a, b, col("ts_a"), col("ts_b"), epsMicros = 1000000L)
      .filter(col("id_a") < col("id_b") && col("u_a") =!= col("u_b"))
      .select(col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")
  }

  private val bandJoinSql =
    """SELECT a.event_id AS id_a, b.event_id AS id_b
      |FROM events a JOIN events b
      |  ON b.ts BETWEEN a.ts - INTERVAL 1 SECOND AND a.ts + INTERVAL 1 SECOND
      |WHERE a.event_id < b.event_id AND a.user_id <> b.user_id
      |ORDER BY id_a, id_b""".stripMargin

  /** **Interval overlap join** ([[graft.operators.Joins.intervalOverlapJoin]]):
    * concurrency analysis over user activity spans. Each (user, day)
    * gets its closed activity interval [first ts, last ts]; the operator
    * then counts, per span, how many OTHER users' spans intersect it —
    * the "who was on at the same time" question, whose naive form is an
    * O(n²) θ-join. The engine side goes through hour-bin replication +
    * equi-join + first-common-bin dedup (no distinct pass, no
    * cartesian); the oracle IS the naive θ-join, so the gate proves the
    * bin decomposition reproduces the exact pair set. Spans come from
    * one events shuffle, memoized across the self-join's two sides. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val spans = graft.operators.Dedup.memoPersist(
      Tables.events(spark, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1")))
    val l = spans.select(col("user_id").as("l_user"), col("day").as("l_day"),
      col("t0").as("l_t0"), col("t1").as("l_t1"))
    val r = spans.select(col("user_id").as("r_user"),
      col("t0").as("r_t0"), col("t1").as("r_t1"))
    graft.operators.Joins.intervalOverlapJoin(l, r,
        col("l_t0"), col("l_t1"), col("r_t0"), col("r_t1"),
        binMicros = 3600L * 1000000L)
      .filter(col("l_user") =!= col("r_user"))
      .groupBy(col("l_user").as("user_id"), col("l_day").as("day"))
      .agg(count(lit(1)).as("n_concurrent"))
      .orderBy("user_id", "day")
  }

  /** **Overlap counts by rank sweep**
    * ([[graft.operators.Temporal.overlapCounts]]): the SAME answer as
    * [[intervalJoin]] — per user-day activity span, how many other
    * users' spans intersect it — WITHOUT enumerating a single pair:
    * two prefix-sum order-statistic sweeps (A = spans starting ≤ my
    * end, B = spans ending < my start; count = A − B − 1) instead of
    * the bin equi-join. Same oracle SQL as `interval_join`, so the
    * driver hash-pins the equivalence. This is the 100 TB form when
    * only counts are needed: pair enumeration pays Θ(matched pairs) —
    * measured 44× wall for 10× data on the densifying weak-scaling
    * axis, because the PAIR MASS is quadratic — while the sweep stays
    * Θ(n log n) (SCALING.md round-11 rows). Per-(user, day) spans are
    * day-disjoint within a user, so all-other-span counts equal the
    * different-user counts the oracle joins on. */
  def intervalCountSweep(spark: SparkSession, dir: String): DataFrame = {
    val spans = graft.operators.Dedup.memoPersist(
      Tables.events(spark, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(unix_micros(min(col("ts"))).as("t0"),
          unix_micros(max(col("ts"))).as("t1")))
    graft.operators.Temporal.overlapCounts(
        spans, Seq("user_id", "day"), "t0", "t1")
      .filter(col("n_overlap") > 0)
      .select(col("user_id"), col("day"),
        col("n_overlap").as("n_concurrent"))
      .orderBy("user_id", "day")
  }

  private val intervalJoinSql =
    """WITH spans AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts) AS t0, MAX(ts) AS t1
      |  FROM events GROUP BY user_id, CAST(ts AS DATE))
      |SELECT l.user_id, l.day, COUNT(*) AS n_concurrent
      |FROM spans l JOIN spans r
      |  ON l.t0 <= r.t1 AND r.t0 <= l.t1 AND l.user_id <> r.user_id
      |GROUP BY l.user_id, l.day
      |ORDER BY l.user_id, l.day""".stripMargin

  /** **Point-in-interval attribution through the native as-of exec**:
    * which session does each purchase belong to? The general form is a
    * range join (`ts BETWEEN session_start AND session_end` — a θ-join
    * Spark plans as BNLJ), but when the intervals PARTITION each key's
    * timeline — sessions do: every event lies in exactly one of its
    * user's sessions — the containing interval is simply the last one
    * STARTING at or before the point, i.e. a backward as-of join on
    * (user_id, session_start): one co-partition + sort + merge walk,
    * no θ-join anywhere. The `ts <= session_end` filter is a belt-and-
    * braces no-op under the partition property; the oracle IS the
    * BETWEEN containment join, so the gate pins as-of ≡ range join on
    * real data. */
  def sessionAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 3600L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin(spark, purchases, sessions,
        on = Seq("user_id"),
        leftOrder = Seq("ts"), rightOrder = Seq("session_start"))
      .filter(col("ts") <= col("session_end"))
      .select(col("event_id"), col("user_id"), col("session_id"),
        col("session_start"))
      .orderBy("event_id")
  }

  private val sessionAttributionSql =
    """WITH sess AS (
      |  SELECT user_id, session_id,
      |    MIN(ts) AS session_start, MAX(ts) AS session_end
      |  FROM (
      |    SELECT user_id, ts,
      |      CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |    FROM (
      |      SELECT user_id, event_id, ts,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |               OR CAST(FLOOR(epoch(ts)) AS BIGINT)
      |                  - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 3600
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
      |  GROUP BY user_id, session_id)
      |SELECT e.event_id, e.user_id, s.session_id, s.session_start
      |FROM events e JOIN sess s
      |  ON s.user_id = e.user_id
      |  AND e.ts BETWEEN s.session_start AND s.session_end
      |WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin

  /** The same as-of semantics through the engine's NATIVE operator
    * ([[graft.plans.AsOfJoin]] — custom LogicalPlan/Strategy/SparkPlan):
    * purchases as-of-joined to the clicks table on user_id with the
    * (ts, event_id) order convention. Same oracle as [[asofJoin]]; unlike
    * the union-window form it takes two independent tables and moves each
    * side exactly once (hash co-partition + in-partition sort + one
    * merge walk). */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    graft.plans.AsOfJoin(spark, purchases, clicks,
        on = Seq("user_id"),
        leftOrder = Seq("ts", "event_id"), rightOrder = Seq("click_ts", "click_id"))
      .select("event_id", "user_id", "ts", "click_id", "click_ts")
      .orderBy("user_id", "ts", "event_id")
  }

  /** The native as-of join reached through its **SQL surface**: the
    * `graft_asof` table-valued function ([[graft.GraftExtensions]]), so a
    * SQL-only user gets the same merge-walk exec. Identical semantics and
    * oracle to [[asofJoinNative]] — the whole query is one SQL string over
    * two temp views. */
  def asofJoinSqlQ(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    val events = Tables.events(spark, dir)
    events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("graft_asof_purchases")
    events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .createOrReplaceTempView("graft_asof_clicks")
    spark.sql(
      """SELECT event_id, user_id, ts, click_id, click_ts
        |FROM graft_asof('graft_asof_purchases', 'graft_asof_clicks',
        |                'user_id', 'ts=click_ts,event_id=click_id')
        |ORDER BY user_id, ts, event_id""".stripMargin)
  }

  /** As-of join, **nearest** direction: each purchase takes whichever
    * click — last preceding or first following in (ts, event_id) order —
    * has the smaller |Δts|, backward winning ties (the remaining member
    * of the pandas `merge_asof` direction family; backward and
    * backward+tolerance are [[asofJoinNative]] / the AsOfJoinSpec).
    * Runs through the native merge-walk exec, which holds ONE candidate
    * per side. The oracle reconstructs both candidates with mirrored
    * IGNORE NULLS windows and arbitrates the same gap comparison. */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    graft.plans.AsOfJoin(spark, purchases, clicks,
        on = Seq("user_id"),
        leftOrder = Seq("ts", "event_id"), rightOrder = Seq("click_ts", "click_id"),
        direction = graft.plans.AsOfNearest)
      .select("event_id", "user_id", "ts", "click_id", "click_ts")
      .orderBy("user_id", "ts", "event_id")
  }

  private val asofJoinNearestSql =
    """SELECT event_id, user_id, ts,
      |  CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR
      |         epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(b_ts AS TIMESTAMP))
      |         <= epoch_us(CAST(f_ts AS TIMESTAMP)) - epoch_us(CAST(ts AS TIMESTAMP)))
      |       THEN b_id ELSE f_id END AS click_id,
      |  CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR
      |         epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(b_ts AS TIMESTAMP))
      |         <= epoch_us(CAST(f_ts AS TIMESTAMP)) - epoch_us(CAST(ts AS TIMESTAMP)))
      |       THEN b_ts ELSE f_ts END AS click_ts
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER wb AS b_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) OVER wb AS b_ts,
      |    first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER wf AS f_id,
      |    first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) OVER wf AS f_ts
      |  FROM events
      |  WINDOW
      |    wb AS (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** rank / dense_rank / row_number with deterministic tie-break. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy("c_nationkey", "rn")
  }

  private val windowRankSql =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  rank()       OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  row_number() OVER w AS rn
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, rn""".stripMargin

  /** Distribution window functions: `ntile` / `percent_rank` /
    * `cume_dist` per nation. The ORDER BY carries a total tie-break
    * (`c_custkey`) so rank-derived values are deterministic, and both
    * doubles are SINGLE divisions of exact small integers —
    * `(rank-1)/(n-1)` and `peers/n` — which IEEE round-to-nearest makes
    * bit-identical across engines (the same discipline as the engine's
    * other oracled ratios; no float SUM order is involved). One shuffle
    * on the partition key; all four functions share the sort. */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_nationkey", "pct_rank", "c_custkey")
  }

  private val windowDistributionSql =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  ntile(4)       OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist()    OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, pct_rank, c_custkey""".stripMargin

  /** Running (prefix) aggregates + lag/lead over an explicit ROWS frame.
    * The running sum is computed over exact decimals so the result is
    * independent of the engine's frame-evaluation strategy (Spark's
    * running accumulation vs DuckDB's segment tree). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        sum(dec6(col("value"))).over(run).cast("double").as("running_value"),
        count(lit(1)).over(run).as("running_n"),
        lag(col("event_type"), 1).over(ord).as("prev_type"),
        lead(col("event_type"), 1).over(ord).as("next_type"))
      .orderBy("user_id", "ts", "event_id")
  }

  private val windowRunningSql =
    """SELECT event_id, user_id, ts, value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value,
      |  COUNT(*) OVER w AS running_n,
      |  lag(event_type, 1)  OVER wo AS prev_type,
      |  lead(event_type, 1) OVER wo AS next_type
      |FROM events
      |WINDOW
      |  w  AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wo AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** Top-k per group via row_number — the scalable per-key top-k. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  private val topkPerGroupSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Global top-k: orderBy+limit — Spark plans TakeOrderedAndProject (per-
    * partition heap + driver merge; no global sort shuffle). */
  def topkGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  private val topkGlobalSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin

  /** UNION / EXCEPT / INTERSECT (all DISTINCT semantics), restricted to the
    * first two days so the result is non-trivially selective: users who
    * clicked or viewed but did not purchase in that window. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-03 00:00:00").cast("timestamp")
    val ev = Tables.events(spark, dir).filter(col("ts") < cutoff)
    def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    users("click").union(users("view")).distinct()
      .except(users("purchase"))
      .orderBy("user_id")
  }

  private val setOpsSql =
    """SELECT user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-03 00:00:00'
      |  UNION
      |  SELECT user_id FROM events WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-03 00:00:00'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03 00:00:00')
      |ORDER BY user_id""".stripMargin

  /** ROLLUP with grouping() marker; NULLS FIRST ordering matches Spark's
    * ascending default. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val rollupAggSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** CUBE over (event_type, day). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .cube(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(dec6(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)

  private val cubeAggSql =
    """SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY CUBE(event_type, CAST(ts AS DATE))
      |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  /** Exact distinct aggregation (expand + two-phase agg in Spark). */
  def countDistinct_(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  private val countDistinctSql =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT o_orderpriority) AS n_prio,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** approx_count_distinct (HLL++) — sketch output is engine-specific, so
    * no oracle (driver rows-only check); the exact twin above is the
    * correctness anchor. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val all: Seq[Q] = Seq(
    Q("diachronic_daily",
      """SELECT user_id, day, first_ts, event_id, event_type, value FROM (
        |  SELECT user_id, CAST(ts AS DATE) AS day, ts AS first_ts, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events WHERE ts >= TIMESTAMP '2001-01-15 00:00:00')
        |WHERE rn = 1
        |ORDER BY user_id, day""".stripMargin)(diachronicDaily),
    Q("diachronic_daily_window",
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                               ORDER BY ts, event_id) AS rn
        |  FROM events WHERE ts >= TIMESTAMP '2001-01-15 00:00:00')
        |WHERE rn = 1
        |ORDER BY user_id, ts""".stripMargin)(diachronicDailyWindow),
    Q("q1_agg", q1AggSql)(q1Agg),
    Q("q3_join", q3JoinSql)(q3Join),
    Q("q5_join", q5JoinSql)(q5Join),
    Q("anti_join", antiJoinSql)(antiJoin),
    Q("semi_join", semiJoinSql)(semiJoin),
    Q("multi_exists_join", multiExistsJoinSql)(multiExistsJoin),
    Q("big_orders_semi", bigOrdersSemiSql)(bigOrdersSemi),
    Q("nation_share", nationShareSql)(nationShare),
    Q("range_join", rangeJoinSql)(rangeJoin),
    Q("band_join", bandJoinSql)(bandJoin),
    Q("interval_join", intervalJoinSql)(intervalJoin),
    // sweep ≡ enumeration: the counting twin answers the same oracle
    Q("interval_count_sweep", intervalJoinSql)(intervalCountSweep),
    Q("asof_join", asofJoinSql)(asofJoin),
    Q("asof_join_native", asofJoinSql)(asofJoinNative),
    Q("session_attribution", sessionAttributionSql)(sessionAttribution),
    Q("asof_join_sql", asofJoinSql)(asofJoinSqlQ),
    Q("asof_join_nearest", asofJoinNearestSql)(asofJoinNearest),
    Q("window_rank", windowRankSql)(windowRank),
    Q("window_distribution", windowDistributionSql)(windowDistribution),
    Q("window_running", windowRunningSql)(windowRunning),
    Q("topk_per_group", topkPerGroupSql)(topkPerGroup),
    Q("topk_global", topkGlobalSql)(topkGlobal),
    Q("set_ops", setOpsSql)(setOps),
    Q("rollup_agg", rollupAggSql)(rollupAgg),
    Q("cube_agg", cubeAggSql)(cubeAgg),
    Q("count_distinct", countDistinctSql)(countDistinct_),
    Q.noOracle("approx_distinct")(approxDistinct))
}

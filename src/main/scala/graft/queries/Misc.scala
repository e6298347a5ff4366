package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Remaining breadth: navigation window functions, bag (ALL) set ops,
  * uncorrelated scalar subquery, null-handling scalars. */
object Misc {

  /** ntile / percent_rank / cume_dist / first / nth / last over a totally
    * ordered window. percent_rank and cume_dist are exact fractions of
    * ints — identical doubles in both engines. */
  def windowNavigation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        first(col("c_custkey")).over(w).as("first_k"),
        nth_value(col("c_custkey"), 2).over(w).as("second_k"),
        last(col("c_custkey")).over(full).as("last_k"))
      .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
  }

  private val windowNavigationSql =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist,
      |  first_value(c_custkey) OVER w AS first_k,
      |  nth_value(c_custkey, 2) OVER w AS second_k,
      |  last_value(c_custkey) OVER (PARTITION BY c_nationkey
      |    ORDER BY c_acctbal DESC, c_custkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin

  /** EXCEPT ALL (bag semantics): click occurrences minus purchase
    * occurrences per user, folded to counts for a compact deterministic
    * result. */
  def bagOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def ids(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    ids("click").exceptAll(ids("purchase"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_surplus"))
      .orderBy("user_id")
  }

  private val bagOpsSql =
    """SELECT user_id, COUNT(*) AS n_surplus FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT ALL
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Uncorrelated scalar subquery ("orders above the global average"),
    * planned as a 1-row broadcast cross join — never a per-row subquery.
    * Decimal-exact average. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val g = ord.agg(
      (sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1))).as("global_avg"))
    ord.crossJoin(broadcast(g))
      .filter(col("o_totalprice") > col("global_avg"))
      .select(col("o_orderkey"), col("o_totalprice"), col("global_avg"))
      .orderBy("o_orderkey")
  }

  private val scalarSubquerySql =
    """SELECT o_orderkey, o_totalprice,
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |   FROM orders) AS global_avg
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                      FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** NULLIF / COALESCE / greatest / least over the orders table. */
  def nullFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("nullif(o_orderstatus, 'O')").as("status_or_null"),
        coalesce(expr("nullif(o_orderstatus, 'O')"), lit("OPEN")).as("status_label"),
        greatest(col("o_totalprice"), lit(1000.0)).as("price_floor"),
        least(col("o_totalprice"), lit(100000.0)).as("price_cap"),
        col("o_totalprice").isNull.as("is_null"))
      .orderBy("o_orderkey")

  private val nullFnsSql =
    """SELECT o_orderkey,
      |  NULLIF(o_orderstatus, 'O') AS status_or_null,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
      |  GREATEST(o_totalprice, 1000.0) AS price_floor,
      |  LEAST(o_totalprice, 100000.0) AS price_cap,
      |  o_totalprice IS NULL AS is_null
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** **2-D skyline** (Pareto front) over orders
    * ([[graft.operators.Skyline.skyline2d]]): the non-dominated
    * (price-bucket, order-month) rows — "no other order was both
    * cheaper-or-equal and earlier-or-equal, strictly better in one".
    * Coarse quantization (price/1000, calendar month) produces plenty of
    * coordinate duplicates, exercising the tie rule (equal points
    * dominate in neither direction, so both surface). Only integer
    * comparisons touch the data after the one floor(), so the result is
    * bitwise engine-independent. The oracle is the O(n²) NOT-EXISTS
    * dominance definition itself, run over DISTINCT points (dominance
    * depends only on coordinates) and joined back to rows — the gate
    * proves the engine's linear prefix-min formulation ≡ the quadratic
    * definition on real data. */
  def skylineQ(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      floor(col("o_totalprice") / 1000).cast("long").as("x"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("y"))
    graft.operators.Skyline.skyline2d(pts, "x", "y")
      .where(col("is_skyline"))
      .select(col("o_orderkey"), col("x"), col("y"))
      .orderBy("o_orderkey")
  }

  private val skylineSql =
    """WITH pts AS (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS x,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS y
      |  FROM orders),
      |d AS (SELECT DISTINCT x, y FROM pts),
      |front AS (
      |  SELECT x, y FROM d a
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM d b
      |    WHERE b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y)))
      |SELECT p.o_orderkey, p.x, p.y
      |FROM pts p JOIN front USING (x, y)
      |ORDER BY p.o_orderkey""".stripMargin

  /** **3-D skyline** ([[graft.operators.Skyline.skylineND]]): the
    * non-dominated (price-bucket, order-month, priority-rank) orders —
    * cheapest AND earliest AND most urgent, no axis sacrificed. The
    * engine runs the local-front-then-merge two-phase (per-partition
    * Pareto fold over distinct coords, bounded driver merge under a loud
    * cap, coordinate semi-join back); the oracle is again the
    * definitional NOT-EXISTS over distinct triples. The priority rank is
    * the leading digit of o_orderpriority — pure string slicing, exact
    * in both engines. */
  def skyline3dQ(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      floor(col("o_totalprice") / 1000).cast("long").as("x"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("y"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("z"))
    graft.operators.Skyline.skylineND(pts, Seq("x", "y", "z"))
      .select(col("o_orderkey"), col("x"), col("y"), col("z"))
      .orderBy("o_orderkey")
  }

  private val skyline3dSql =
    """WITH pts AS (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS x,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS y,
      |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS z
      |  FROM orders),
      |d AS (SELECT DISTINCT x, y, z FROM pts),
      |front AS (
      |  SELECT x, y, z FROM d a
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM d b
      |    WHERE b.x <= a.x AND b.y <= a.y AND b.z <= a.z
      |      AND (b.x < a.x OR b.y < a.y OR b.z < a.z)))
      |SELECT p.o_orderkey, p.x, p.y, p.z
      |FROM pts p JOIN front USING (x, y, z)
      |ORDER BY p.o_orderkey""".stripMargin

  /** **RFM customer segmentation** — the classic marketing-analytics
    * triple: Recency (days since the customer's last order, measured
    * from the corpus-wide latest order date), Frequency (order count),
    * Monetary (lifetime spend). Each metric is ranked into quintiles
    * with `ntile(5)`, 5 = best, and the three scores label a segment.
    * Money is carried as exact CENTS (`round(price·100)` → BIGINT): a
    * double SUM is partition-order-dependent and not reproducible, the
    * integer sum is. Recency anchors on `max(o_orderdate)` via a
    * scalar subquery — Catalyst runs it once and broadcasts the
    * constant into the projection, no join. The ntile ties are broken
    * by custkey so the quintile assignment is a total order, identical
    * in any engine. Scale note: ntile needs a global sort of the
    * customer aggregate — range-partitioned in Spark, |customers|
    * rows, which is the small output relation of the orders
    * aggregation, not the fact table; for truly unbounded key sets,
    * swap ntile for approx-quantile bucket edges. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(cents).as("monetary_cents"))
    val maxDate = Tables.orders(spark, dir)
      .agg(max(to_date(col("o_orderdate"))).as("global_max"))
    val recency = perCust.crossJoin(broadcast(maxDate))
      .withColumn("recency_days",
        datediff(col("global_max"), col("last_order")).cast("long"))
    def score(c: org.apache.spark.sql.Column, asc: Boolean) = {
      val ord = if (asc) Seq(c.asc, col("o_custkey").asc)
                else Seq(c.desc, col("o_custkey").asc)
      ntile(5).over(Window.orderBy(ord: _*)).cast("long")
    }
    recency
      .withColumn("r_score", score(col("recency_days"), asc = true))
      .withColumn("f_score", score(col("frequency"), asc = false))
      .withColumn("m_score", score(col("monetary_cents"), asc = false))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4, "recent")
          .when(col("f_score") >= 4, "loyal_at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
      .select(col("o_custkey").as("custkey"), col("recency_days"),
        col("frequency"), col("monetary_cents"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy("custkey")
  }

  private val rfmSegmentsSql =
    """WITH per_cust AS (
      |  SELECT o_custkey AS custkey,
      |    CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
      |      (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT)
      |      AS recency_days,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM orders GROUP BY o_custkey),
      |scored AS (
      |  SELECT *,
      |    CAST(ntile(5) OVER (ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_score,
      |    CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey ASC) AS BIGINT) AS f_score,
      |    CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, custkey ASC) AS BIGINT) AS m_score
      |  FROM per_cust)
      |SELECT custkey, recency_days, frequency, monetary_cents,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
      |       WHEN r_score >= 4 THEN 'recent'
      |       WHEN f_score >= 4 THEN 'loyal_at_risk'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |       ELSE 'regular' END AS segment
      |FROM scored
      |ORDER BY custkey""".stripMargin

  /** **Column-level lineage report** ([[graft.plans.Lineage]]): the
    * (output column → source table.column) edge set of three
    * representative pipelines — the 6-table TPC-H Q5 join, the
    * gaps-and-islands sessionization, and the flagship diachronic
    * downsample — extracted from the ANALYZED plans by ExprId
    * reachability (never name matching). A driver-side plan walk: zero
    * jobs, zero scans, so the report costs the same against a 100 TB
    * table. The oracle is the hand-audited edge list as literal VALUES
    * — a plan refactor that silently changes provenance breaks the
    * hash, which is the point of a governance pin. */
  def lineageReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.Lineage
    Lineage.report(Relational.q5Join(spark, dir), "q5_join")
      .unionByName(Lineage.report(Behavioral.sessionize(spark, dir), "sessionize"))
      .unionByName(Lineage.report(Relational.diachronicDaily(spark, dir), "diachronic_daily"))
      .orderBy("query", "out_col", "src_table", "src_col")
  }

  // hand-audited: revenue ← extendedprice·(1−discount); the min_by
  // struct in the downsample makes every carried field derive from the
  // full comparator struct; count(1) references nothing (__literal)
  private val lineageReportSql = {
    val rows = Seq(
      ("diachronic_daily", "day", "events", "ts"),
      ("diachronic_daily", "event_id", "events", "event_id"),
      ("diachronic_daily", "event_id", "events", "event_type"),
      ("diachronic_daily", "event_id", "events", "ts"),
      ("diachronic_daily", "event_id", "events", "value"),
      ("diachronic_daily", "event_type", "events", "event_id"),
      ("diachronic_daily", "event_type", "events", "event_type"),
      ("diachronic_daily", "event_type", "events", "ts"),
      ("diachronic_daily", "event_type", "events", "value"),
      ("diachronic_daily", "first_ts", "events", "event_id"),
      ("diachronic_daily", "first_ts", "events", "event_type"),
      ("diachronic_daily", "first_ts", "events", "ts"),
      ("diachronic_daily", "first_ts", "events", "value"),
      ("diachronic_daily", "user_id", "events", "user_id"),
      ("diachronic_daily", "value", "events", "event_id"),
      ("diachronic_daily", "value", "events", "event_type"),
      ("diachronic_daily", "value", "events", "ts"),
      ("diachronic_daily", "value", "events", "value"),
      ("q5_join", "n_name", "nation", "n_name"),
      ("q5_join", "revenue", "lineitem", "l_discount"),
      ("q5_join", "revenue", "lineitem", "l_extendedprice"),
      ("sessionize", "n_events", "__literal", "__none"),
      ("sessionize", "n_types", "events", "event_type"),
      ("sessionize", "session_end", "events", "ts"),
      ("sessionize", "session_id", "events", "event_id"),
      ("sessionize", "session_id", "events", "ts"),
      ("sessionize", "session_id", "events", "user_id"),
      ("sessionize", "session_start", "events", "ts"),
      ("sessionize", "user_id", "events", "user_id"))
    rows.map { case (q, o, t, c) => s"('$q', '$o', '$t', '$c')" }
      .mkString(
        "SELECT * FROM (VALUES\n  ",
        ",\n  ",
        ") AS t(query, out_col, src_table, src_col)\nORDER BY query, out_col, src_table, src_col")
  }

  val all: Seq[Q] = Seq(
    Q("window_navigation", windowNavigationSql)(windowNavigation),
    Q("bag_ops", bagOpsSql)(bagOps),
    Q("scalar_subquery", scalarSubquerySql)(scalarSubquery),
    Q("null_fns", nullFnsSql)(nullFns),
    Q("skyline", skylineSql)(skylineQ),
    Q("skyline_3d", skyline3dSql)(skyline3dQ),
    Q("rfm_segments", rfmSegmentsSql)(rfmSegments),
    Q("lineage_report", lineageReportSql)(lineageReport))
}

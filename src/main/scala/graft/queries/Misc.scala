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

  val all: Seq[Q] = Seq(
    Q("window_navigation", windowNavigationSql)(windowNavigation),
    Q("bag_ops", bagOpsSql)(bagOps),
    Q("scalar_subquery", scalarSubquerySql)(scalarSubquery),
    Q("null_fns", nullFnsSql)(nullFns),
    Q("skyline", skylineSql)(skylineQ),
    Q("skyline_3d", skyline3dSql)(skyline3dQ))
}

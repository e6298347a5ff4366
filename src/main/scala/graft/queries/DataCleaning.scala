package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse data-cleaning wave: entity resolution (fuzzy record
  * matching), SCD2 temporal history, mergeable-sketch rollups, and
  * ANALYZE-style per-column statistics. Same determinism discipline as
  * [[Relational]]. */
object DataCleaning {

  /** **Entity resolution** over the customer dimension: all record pairs
    * whose names are within Levenshtein distance 1 (single typo / digit
    * substitution — the classic dirty-dimension duplicate), found by
    * [[graft.operators.EntityResolution.fuzzyPairs]]'s deletion-variant
    * blocking (linear equi-join, bounded fan-out). The oracle is the
    * BRUTE-FORCE all-pairs O(n²) join — the driver gate therefore proves
    * on the real corpus that the blocking is a complete candidate
    * generator, not just fast. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EntityResolution.fuzzyPairs(
        Tables.customer(spark, dir), col("c_custkey"), col("c_name"))
      .orderBy("id_a", "id_b")

  private val fuzzyMatchSql =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  a.c_name AS name_a, b.c_name AS name_b,
      |  levenshtein(a.c_name, b.c_name) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin

  /** **SCD2 history build** ([[graft.operators.Temporal.scd2]]): each
    * user's event-type stream run-length-encoded into
    * `[valid_from, valid_to)` intervals — one shuffle on the key, rows
    * out = state changes. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.scd2(Tables.events(spark, dir),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumnRenamed("key", "user_id")
      .orderBy("user_id", "valid_from", "state")

  // Identical run construction: break on state change under the same
  // total order, running-sum run ids, fold, close each interval with the
  // next run's start.
  private val scd2IntervalsSql =
    """WITH runs AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), runid AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS rid
      |  FROM runs
      |), agg AS (
      |  SELECT user_id, rid, MIN(event_type) AS state,
      |    MIN(ts) AS valid_from, COUNT(*) AS n_events
      |  FROM runid GROUP BY user_id, rid
      |)
      |SELECT user_id, state, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, rid)
      |    AS valid_to,
      |  n_events
      |FROM agg
      |ORDER BY user_id, valid_from, state""".stripMargin

  /** **Mergeable-sketch rollup**: per-(event_type, month) HLL sketches of
    * the user set, merged across months per type — the incremental-rollup
    * pattern a 100 TB warehouse uses for distinct counts (exact distinct
    * is not mergeable; sketches are, so daily partials fold into any
    * coarser grain without rescanning history). Rows-only by contract
    * (DataSketches HLL has no DuckDB twin); DataCleaningSpec asserts the
    * merged estimate equals the direct whole-corpus sketch exactly
    * (register-max merge is lossless) and is within 5% of the exact
    * count, and the registered `count_distinct` query is the exact
    * oracle-checked twin. */
  def hllRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("month", col("ts")).as("month"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_months"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy("event_type")

  /** **ANALYZE-style column statistics** in ONE scan: count / non-null /
    * exact NDV / min / max for a column set, emitted one row per column.
    * This is the stats-collection pass a cost-based optimizer runs; at
    * warehouse scale the NDV column swaps to the HLL sketch of
    * [[hllRollup]] (mergeable across partitions) — exact here so the
    * DuckDB gate can hash-match it. The multi-distinct aggregate plans as
    * a single Expand over one FileScan (no per-column rescans). */
  def columnStats(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
    val one = Tables.orders(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c).cast("string")).as(s"min_$c"),
        max(col(c).cast("string")).as(s"max_$c"))): _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"nn_$c").as("n_nonnull"),
        col(s"ndv_$c").as("ndv"),
        col(s"min_$c").as("min_s"),
        col(s"max_$c").as("max_s"))): _*)).as("s"))
      .select("s.*")
      .orderBy("col_name")
  }

  private val columnStatsSql = {
    val cols = Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
    cols.map(c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
         |  COUNT(DISTINCT $c) AS ndv, MIN(CAST($c AS VARCHAR)) AS min_s,
         |  MAX(CAST($c AS VARCHAR)) AS max_s FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val all: Seq[Q] = Seq(
    Q("fuzzy_match", fuzzyMatchSql)(fuzzyMatch),
    Q("scd2_intervals", scd2IntervalsSql)(scd2Intervals),
    Q.noOracle("hll_rollup")(hllRollup),
    Q("column_stats", columnStatsSql)(columnStats))
}

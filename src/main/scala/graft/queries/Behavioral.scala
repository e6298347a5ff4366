package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-pipeline operators over the events stream table: sessionization
  * (gaps-and-islands) and n-gram repetition scoring for documents. */
object Behavioral {

  /** Sessionization with a 60-minute inactivity gap, as the classic
    * gaps-and-islands: flag session starts with lag(), number sessions
    * with a running sum, aggregate bounds per session. Two window passes
    * + one aggregate over the same (user_id, ts) shuffle — Spark reuses
    * the partitioning across the chained windows, so it's one exchange.
    * (Spark's `session_window` gives equivalent grouping natively; the
    * explicit form is used so the DuckDB oracle runs the identical
    * logic.) */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 3600L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("user_id", "session_id")
  }

  // CAST(SUM(...) AS BIGINT): DuckDB SUM(int) is HUGEINT; the driver's pandas
  // path turns HUGEINT into float64 ("518.0") and the hash diverges from
  // Spark's long. Applies to every integer SUM in oracle SQL.
  private val sessionizeSql =
    """SELECT user_id, session_id,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS n_types
      |FROM (
      |  SELECT user_id, ts, event_type,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, ts, event_type,
      |      CASE WHEN lag(ts) OVER w IS NULL
      |             OR CAST(FLOOR(epoch(ts)) AS BIGINT)
      |                - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 3600
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Per-document n-gram repetition score: the share of the most frequent
    * trigram in all trigram occurrences (with multiplicity), plus the
    * distinct/total trigram ratio — the standard "repetitive text" signal
    * in corpus quality filtering. Integer counts + same-operand division
    * keep it oracle-exact. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    // trigram hashes WITH multiplicity (unlike the dedup shingle set)
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("transform(split(text, ' '), x -> xxhash64(x))").as("__th"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(__th) >= 3
          |  THEN transform(sequence(0, size(__th) - 3),
          |                 i -> xxhash64(__th[i], __th[i+1], __th[i+2]))
          |  ELSE array() END""".stripMargin)).as("h"))
    grams
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("total_grams"),
        max(col("c")).as("max_gram"),
        count(lit(1)).as("distinct_grams"))
      .select(col("doc_id"), col("total_grams"), col("max_gram"), col("distinct_grams"),
        (col("max_gram").cast("double") / col("total_grams").cast("double"))
          .as("repetition"),
        (col("distinct_grams").cast("double") / col("total_grams").cast("double"))
          .as("diversity"))
      .orderBy("doc_id")
  }

  // DuckDB computes the same trigram identity from word strings — counts
  // are equal because the hash composition is injective w.p. ~1.
  private val textRepetitionSql =
    """SELECT doc_id, total_grams, max_gram, distinct_grams,
      |  CAST(max_gram AS DOUBLE) / CAST(total_grams AS DOUBLE) AS repetition,
      |  CAST(distinct_grams AS DOUBLE) / CAST(total_grams AS DOUBLE) AS diversity
      |FROM (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total_grams, MAX(c) AS max_gram,
      |         COUNT(*) AS distinct_grams
      |  FROM (
      |    SELECT doc_id, s, COUNT(*) AS c FROM (
      |      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |           UNNEST(range(1, len(w) - 1)) AS t(i))
      |    GROUP BY doc_id, s)
      |  GROUP BY doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Strictly-ordered funnel progression per user: the earliest event of
    * each stage that falls AFTER the previous stage's reach time (view →
    * click → purchase). Built as a chain of filter → equi-join on user →
    * min aggregates, so each stage scans only the stage-typed events and
    * joins an ever-shrinking user set — no per-user event-sequence
    * materialization, no window over the full stream. Timestamps pass
    * through untouched (µs), so the oracle matches bit-for-bit. */
  def funnel(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = Tables.events(spark, dir)
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as(s"t_${stages.head}"))
    val completed = stages.zipWithIndex.tail.foldLeft(first) {
      case (prev, (stage, i)) =>
        val prevCol = s"t_${stages(i - 1)}"
        val keepPrev = stages.take(i).map(s => min(col(s"t_$s")).as(s"t_$s"))
        ev.filter(col("event_type") === stage)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevCol))
          .groupBy(col("user_id"))
          .agg(keepPrev.head, (keepPrev.tail :+ min(col("ts")).as(s"t_$stage")): _*)
    }
    completed.orderBy("user_id")
  }

  private val funnelSql =
    """WITH s0 AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |s1 AS (SELECT e.user_id, MIN(s0.t_view) AS t_view, MIN(e.ts) AS t_click
      |       FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t_view
      |       WHERE e.event_type = 'click' GROUP BY e.user_id),
      |s2 AS (SELECT e.user_id, MIN(s1.t_view) AS t_view, MIN(s1.t_click) AS t_click,
      |              MIN(e.ts) AS t_purchase
      |       FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t_click
      |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT user_id, t_view, t_click, t_purchase FROM s2
      |ORDER BY user_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("funnel", funnelSql)(funnel(_, _)),
    Q("sessionize", sessionizeSql)(sessionize),
    Q("text_repetition", textRepetitionSql)(textRepetition))
}

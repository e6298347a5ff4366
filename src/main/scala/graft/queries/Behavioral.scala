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

  /** **Native `session_window` sessionization** — the same islands as
    * [[sessionize]] from Spark's built-in session-window grouping (one
    * hash-agg with merging session state instead of two window passes),
    * checked against the IDENTICAL gaps-and-islands oracle. Boundary
    * semantics, empirically pinned (SessionWindowSemanticsSpec):
    * `session_window` windows MERGE when they touch — an event at
    * exactly `prev + gap` joins the session (merge ⇔ diff ≤ gap), the
    * same convention as the batch rule's `> 3600` break — so the native
    * form feeds second-truncated timestamps with a 3600 s gap: merge ⇔
    * truncDiff ≤ 3600, the batch rule exactly, while min/max aggregate
    * the ORIGINAL timestamps. (A 3601 s gap is WRONG by one: it also
    * merges truncDiff == 3601 — two real sf0.1 session pairs caught it.)
    * session_id = rank of the session's start
    * within its user (sessions are time-disjoint, so this reproduces the
    * running-sum numbering). At scale this is ONE shuffle on user_id and
    * no second pass over events — the session merge happens inside the
    * aggregate — which is why it's the form to prefer when the session
    * bounds, not per-event session tags, are the output. */
  def sessionizeNative(spark: SparkSession, dir: String): DataFrame = {
    val sess = Tables.events(spark, dir)
      .groupBy(col("user_id"),
        session_window(date_trunc("second", col("ts")), "3600 seconds").as("w"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
    sess
      .withColumn("session_id", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_start")))
        .cast("long"))
      .select(col("user_id"), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"), col("n_types"))
      .orderBy("user_id", "session_id")
  }

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

  /** Cohort retention matrix: users are cohorted by their first active
    * day; each (cohort_day, week offset) cell counts the cohort's users
    * still active that week. Three aggregates over the same `user_id`
    * shuffle key (first-day, cohort size, activity) — the per-user cohort
    * frame is tiny relative to the event stream, so its re-join is a
    * shuffle on the already-partitioned key, never a broadcast of events.
    * Week offsets use integral division on datediff — exact in both
    * engines. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    ev.join(cohort, "user_id")
      .withColumn("week_no", expr("datediff(d, cohort_day) div 7").cast("long"))
      .groupBy(col("cohort_day"), col("week_no"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("week_no"), col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort").cast("double"))
          .as("retention"))
      .orderBy("cohort_day", "week_no")
  }

  private val retentionSql =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |c AS (SELECT user_id, MIN(d) AS cohort_day FROM ev GROUP BY user_id),
      |s AS (SELECT cohort_day, COUNT(*) AS n_cohort FROM c GROUP BY cohort_day),
      |a AS (SELECT c.cohort_day,
      |             CAST(date_diff('day', c.cohort_day, ev.d) // 7 AS BIGINT) AS week_no,
      |             COUNT(DISTINCT ev.user_id) AS n_active
      |      FROM ev JOIN c USING (user_id) GROUP BY 1, 2)
      |SELECT cohort_day, week_no, n_active, n_cohort,
      |  CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
      |FROM a JOIN s USING (cohort_day)
      |ORDER BY cohort_day, week_no""".stripMargin

  /** Changelog compaction / latest-state snapshot: treat the event stream
    * as an upsert log and materialize one row per user — the latest event
    * (ties on the µs timestamp broken by event_id) plus lifetime
    * aggregates. One shuffle on `user_id` feeds both the ordered
    * `row_number` and the full-partition count/sum windows; at ingest
    * scale this is the nightly "compact the CDC log into a snapshot
    * table" job. The running sum is decimal-cast so partition order
    * can't perturb the float total.
    *
    * The oracle orders by `CAST(ts AS TIMESTAMP)` — DuckDB reads the
    * parquet nanosecond timestamps at full precision, and ranking on raw
    * ns could pick a different "latest" row than Spark's µs view; the
    * cast applies the identical truncation (see [[graft.Tables.events]]). */
  def latestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val ordered = byUser.orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n_events", count(lit(1)).over(byUser))
      .withColumn("total_value",
        sum(col("value").cast("decimal(18,6)")).over(byUser).cast("double"))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("n_events"), col("total_value"))
      .orderBy("user_id")
  }

  private val latestSnapshotSql =
    """SELECT user_id, last_ts, last_type, last_value, n_events, total_value
      |FROM (
      |  SELECT user_id, ts AS last_ts, event_type AS last_type,
      |    value AS last_value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id)
      |      AS DOUBLE) AS total_value
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** **First-order event-type transition matrix** (Markov edge counts):
    * per user, order events by (ts, event_id) and count each adjacent
    * (prev_type → type) pair globally. The classic clickstream "where
    * do users go next" question; also the input to Markov-chain
    * attribution. One shuffle on user_id for the lag window, then a
    * map-side-combinable count over at most |types|² groups — the
    * second aggregation is effectively free at any scale, and the
    * output is O(|types|²) regardless of corpus size. All-integer
    * output, hash-stable. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("prev_type"), col("next_type"),
        col("n_transitions"), col("n_users"))
      .orderBy("prev_type", "next_type")
  }

  private val eventTransitionsSql =
    """SELECT prev_type, event_type AS next_type,
      |  COUNT(*) AS n_transitions,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      |  FROM events)
      |WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type
      |ORDER BY prev_type, next_type""".stripMargin

  /** **Top entry paths** — the most common first-three-event-type
    * sequences across users (shorter for users with fewer events),
    * ranked by user count. Per user the prefix is assembled from the
    * row_number()-limited head, so the shuffle carries ≤ 3 rows per
    * user no matter how long the history is; the path strings then
    * aggregate into at most |types|³ groups. `sort_array` over
    * (rn, type) structs makes the collect_list order deterministic —
    * collect_list alone is arrival-ordered and NOT reproducible across
    * partitionings. Ties broken by path text; all-integer counts. */
  def pathTopk(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prefixes = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("rn"), col("event_type")))),
          s => s.getField("event_type")),
        ">").as("path"))
    prefixes.groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
      .select(col("path"), col("n_users"))
  }

  private val pathTopkSql =
    """SELECT path, n_users FROM (
      |  SELECT path, COUNT(*) AS n_users FROM (
      |    SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |    FROM (
      |      SELECT user_id, event_type,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |      FROM events)
      |    WHERE rn <= 3
      |    GROUP BY user_id)
      |  GROUP BY path)
      |ORDER BY n_users DESC, path
      |LIMIT 20""".stripMargin

  /** **Integer-exact rolling anomaly flags** over the daily event-count
    * series per type: a day is anomalous when its count deviates from
    * the trailing 7-day window (excluding the current day) by more than
    * 3 sample standard deviations. The 3σ test is evaluated WITHOUT any
    * floating point: with n, s = Σcnt, ss = Σcnt² over the window,
    *   |x − s/n| > 3·σ  ⇔  (n·x − s)²·(n−1) > 9·n·(n·ss − s²),
    * and both sides are computed in DECIMAL(38,0) — exact at any count
    * magnitude (a BIGINT formulation would overflow (n·x−s)² once daily
    * counts pass ~10⁹) — while only BIGINTs and the 0/1 flag are
    * emitted, keeping the hash contract. Needs ≥ 4 prior days to judge.
    * One shuffle on event_type (tiny), window frame ROWS 7 PRECEDING
    * TO 1 PRECEDING; the daily pre-aggregation is map-side combined, so
    * the shuffled relation is |types|×|days| rows, not events. */
  def tsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast(DecimalType(38, 0))
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("is_anomaly",
        when(col("n") >= 4 &&
          pow2(d(col("n")) * d(col("cnt")) - d(col("s"))) * d(col("n") - 1) >
            d(lit(9)) * d(col("n")) *
              (d(col("n")) * d(col("ss")) - pow2(d(col("s")))), 1L)
          .otherwise(0L))
      .select(col("event_type"), col("day"), col("cnt"),
        col("n"), col("s"), col("ss"), col("is_anomaly"))
      .orderBy("event_type", "day")
  }

  private def pow2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c * c

  private val tsAnomalySql =
    """SELECT event_type, day, cnt, n, s, ss,
      |  CASE WHEN n >= 4
      |    AND (CAST(n AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0))
      |         - CAST(s AS DECIMAL(38,0)))
      |        * (CAST(n AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0))
      |           - CAST(s AS DECIMAL(38,0)))
      |        * CAST(n - 1 AS DECIMAL(38,0))
      |      > CAST(9 AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
      |        * (CAST(n AS DECIMAL(38,0)) * CAST(ss AS DECIMAL(38,0))
      |           - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))
      |    THEN 1 ELSE 0 END AS is_anomaly
      |FROM (
      |  SELECT event_type, day, cnt,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
      |    CAST(SUM(cnt) OVER w AS BIGINT) AS s,
      |    CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS ss
      |  FROM (
      |    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |      COUNT(*) AS cnt
      |    FROM events GROUP BY event_type, day)
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |ORDER BY event_type, day""".stripMargin

  /** **Interval union length** (coverage): give every event a 900-second
    * activity window and report, per user, the total seconds covered by
    * the UNION of those overlapping intervals, the number of merged
    * blocks, and the span endpoints. The merge is the gaps-and-islands
    * fold in its general form: a block starts where the interval's
    * start exceeds the running max of previous ends (an interval can be
    * swallowed by an earlier, longer one — plain lag(end) would split
    * such blocks; the PREFIX MAX is what makes the fold correct). All
    * arithmetic is epoch-second integers. Same one-shuffle shape as
    * `sessionize`: the two chained windows and the aggregates reuse a
    * single user_id exchange. */
  def intervalUnion(spark: SparkSession, dir: String,
      windowSeconds: Long = 900L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    val prior = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("s"))
      .withColumn("e", col("s") + windowSeconds)
      .withColumn("prev_max_e", max(col("e")).over(prior))
      .withColumn("is_new",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("block", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("block"))
      .agg(min(col("s")).as("bs"), max(col("e")).as("be"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("be") - col("bs")).as("covered_seconds"),
        min(col("bs")).as("first_start"), max(col("be")).as("last_end"))
      .orderBy("user_id")
  }

  private val intervalUnionSql =
    """SELECT user_id, COUNT(*) AS n_blocks,
      |  CAST(SUM(be - bs) AS BIGINT) AS covered_seconds,
      |  MIN(bs) AS first_start, MAX(be) AS last_end
      |FROM (
      |  SELECT user_id, block, MIN(s) AS bs, MAX(e) AS be
      |  FROM (
      |    SELECT user_id, s, e,
      |      CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS block
      |    FROM (
      |      SELECT user_id, event_id, s, e,
      |        CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |             OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM (
      |        SELECT user_id, event_id,
      |          CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
      |          CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 900 AS e
      |        FROM events)))
      |  GROUP BY user_id, block)
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** **Session co-occurrence pairs** (market-basket lite): which event
    * types appear together in the same session, counted over sessions —
    * the UNORDERED complement of [[eventTransitions]]' ordered
    * adjacency. Sessions come from the same gaps-and-islands fold as
    * [[sessionize]]; each session reduces to its distinct type set
    * before the pair expansion, so the self-join input is ≤
    * sessions×|types| rows and the pair space ≤ |types|² groups —
    * at 100 TB the expansion is bounded by the tiny type vocabulary,
    * never by event volume. Pairs are canonically ordered (a < b). */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessTypes = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 3600L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .select(col("user_id"), col("session_id"), col("event_type"))
      .distinct()
    val memo = graft.operators.Dedup.memoPersist(sessTypes)
    val a = memo.as("a")
    val b = memo.as("b")
    a.join(b,
        col("a.user_id") === col("b.user_id") &&
          col("a.session_id") === col("b.session_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("a.user_id")).as("n_users"))
      .orderBy("type_a", "type_b")
  }

  private val basketPairsSql =
    """WITH sess AS (
      |  SELECT DISTINCT user_id, session_id, event_type FROM (
      |    SELECT user_id, event_type,
      |      CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |        AS session_id
      |    FROM (
      |      SELECT user_id, event_id, ts, event_type,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |               OR CAST(FLOOR(epoch(ts)) AS BIGINT)
      |                  - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 3600
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))))
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  COUNT(*) AS n_sessions,
      |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM sess a JOIN sess b
      |  ON a.user_id = b.user_id AND a.session_id = b.session_id
      |  AND a.event_type < b.event_type
      |GROUP BY type_a, type_b
      |ORDER BY type_a, type_b""".stripMargin

  /** **Item-item collaborative-filtering recommendations** (the
    * market-basket step BEYOND [[basketPairs]]' co-occurrence counts):
    * for each part, the top-5 most-similar parts by cosine over
    * order-baskets — cos(a,b) = cooc/√(n_a·n_b), ranked through the
    * EXACT integer key floor(cooc²·10⁶/(n_a·n_b)) so no square root or
    * float division ever runs (cosine is monotone in its square, and
    * integral floor-division is deterministic in both engines); ties
    * break (cooc DESC, rec id). Pair generation is a self-equi-join on
    * l_orderkey — co-partitioned, pairs bounded by Σ basket_size² with
    * TPC-H's ≤7-line baskets, never |parts|² — and the part-frequency
    * attach broadcasts (dimension-sized). Top-5 is a per-item rank
    * window; at web scale swap in the map-side `BoundedTopK` aggregate
    * (the `fuzzy_match_k2_topk` move). */
  /** The shared scored-pair pipeline behind [[recommendTopk]] and
    * [[recommendTopkBounded]]: symmetric co-occurrence pairs with the
    * exact integer square-of-cosine key. Single source of truth for the
    * decimal-exactness contract — the two queries differ ONLY in how
    * they select top-5 (rank window vs BoundedTopK heap), which is the
    * point of registering both. */
  private def recommendScoredPairs(spark: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast(DecimalType(38, 0))
    val li = graft.operators.Dedup.memoPersist(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct())
    val freq = li.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("cooc"))
    // both orientations from ONE aggregate pass: the union-of-two-
    // selects form re-planned the whole pair join + groupBy under each
    // Union branch (r14 plan audit: two HashAggregate(Exchange) subtrees
    // over the same join), doubling the query's most expensive stage.
    // explode(array(fwd, rev)) emits the identical row set from a
    // single pass.
    val sym = pairs
      .select(explode(array(
        struct(col("pa"), col("pb"), col("cooc")),
        struct(col("pb").as("pa"), col("pa").as("pb"), col("cooc")))).as("s"))
      .select(col("s.pa").as("pa"), col("s.pb").as("pb"), col("s.cooc").as("cooc"))
    sym
      .join(broadcast(freq.select(col("p").as("pa"), col("n").as("n_item"))), "pa")
      .join(broadcast(freq.select(col("p").as("pb"), col("n").as("n_rec"))), "pb")
      .withColumn("__num", d(col("cooc")) * d(col("cooc")) * lit(1000000))
      .withColumn("__den", d(col("n_item")) * d(col("n_rec")))
      // `div` = integral division (exact on DECIMAL operands) — the
      // only arithmetic both engines floor identically; mirrors
      // DuckDB's `//` on HUGEINT
      .withColumn("score_scaled", expr("CAST(__num div __den AS BIGINT)"))
      .drop("__num", "__den")
  }

  def recommendTopk(spark: SparkSession, dir: String): DataFrame = {
    recommendScoredPairs(spark, dir)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("pa"))
          .orderBy(col("score_scaled").desc, col("cooc").desc, col("pb"))))
      .filter(col("rk") <= 5)
      .select(col("pa").as("item"), col("pb").as("rec"), col("cooc"),
        col("n_item"), col("n_rec"), col("score_scaled"), col("rk"))
      .orderBy("item", "rk")
  }

  /** **Bounded-aggregate recommender top-k** — [[recommendTopk]]'s
    * web-scale form (the `fuzzy_match_k2_topk` move SCALING.md names as
    * the swap-in once pair mass grows): the same exact integer scoring,
    * but per-item top-5 selected by the map-side [[graft.functions
    * .BoundedTopK]] heap aggregate instead of a rank window — each map
    * task reduces to ≤5 candidates per item BEFORE the shuffle, so the
    * exchange moves ≤ 5·partitions rows per item while the window form
    * moves the whole scored pair mass. Emits the exact per-item
    * `n_candidates` alongside (the aggregate is one pass, so the count
    * is free), and the oracle is the quadratic ROW_NUMBER formulation —
    * the gate proves heap-selection ≡ full-sort selection. */
  def recommendTopkBounded(spark: SparkSession, dir: String): DataFrame = {
    val scored = recommendScoredPairs(spark, dir)
    // (score desc, cooc desc, rec asc) ≡ ascending (−score, −cooc, rec);
    // fields after the total key are payload and never affect the heap
    val sortStruct = struct(
      (-col("score_scaled")).as("ns"), (-col("cooc")).as("nc"),
      col("pb").as("rec"), col("cooc").as("cooc"),
      col("n_rec").as("n_rec"), col("score_scaled").as("score_scaled"))
    scored.groupBy(col("pa"))
      .agg(graft.functions.BoundedTopK(sortStruct, 5).as("top"),
        count(lit(1)).as("n_candidates"),
        max(col("n_item")).as("n_item"))
      .select(col("pa").as("item"), col("n_item"), col("n_candidates"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("item"), (col("pos") + 1).cast("int").as("rk"),
        col("t.rec").as("rec"), col("t.cooc").as("cooc"),
        col("t.n_rec").as("n_rec"), col("t.score_scaled").as("score_scaled"),
        col("n_item"), col("n_candidates"))
      .orderBy("item", "rk")
  }

  private val recommendTopkBoundedSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |freq AS (SELECT p, COUNT(*) AS n FROM li GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cooc
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2),
      |sym AS (SELECT pa, pb, cooc FROM pairs
      |        UNION ALL SELECT pb, pa, cooc FROM pairs),
      |scored AS (
      |  SELECT sym.pa AS item, sym.pb AS rec, cooc,
      |    u1.n AS n_item, u2.n AS n_rec,
      |    CAST((CAST(cooc AS HUGEINT) * cooc * 1000000)
      |         // (CAST(u1.n AS HUGEINT) * u2.n) AS BIGINT) AS score_scaled
      |  FROM sym JOIN freq u1 ON u1.p = sym.pa JOIN freq u2 ON u2.p = sym.pb),
      |counted AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_candidates
      |            FROM scored GROUP BY item)
      |SELECT s.item, CAST(rk AS INT) AS rk, rec,
      |  CAST(cooc AS BIGINT) AS cooc, CAST(n_rec AS BIGINT) AS n_rec,
      |  score_scaled, CAST(n_item AS BIGINT) AS n_item, c.n_candidates
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
      |        ORDER BY score_scaled DESC, cooc DESC, rec) AS rk
      |      FROM scored) s
      |JOIN counted c USING (item)
      |WHERE rk <= 5
      |ORDER BY s.item, rk""".stripMargin

  private val recommendTopkSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |freq AS (SELECT p, COUNT(*) AS n FROM li GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cooc
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2),
      |sym AS (SELECT pa, pb, cooc FROM pairs
      |        UNION ALL SELECT pb, pa, cooc FROM pairs),
      |scored AS (
      |  SELECT sym.pa AS item, sym.pb AS rec, cooc,
      |    u1.n AS n_item, u2.n AS n_rec,
      |    CAST((CAST(cooc AS HUGEINT) * cooc * 1000000)
      |         // (CAST(u1.n AS HUGEINT) * u2.n) AS BIGINT) AS score_scaled
      |  FROM sym JOIN freq u1 ON u1.p = sym.pa JOIN freq u2 ON u2.p = sym.pb)
      |SELECT item, rec, CAST(cooc AS BIGINT) AS cooc,
      |  CAST(n_item AS BIGINT) AS n_item, CAST(n_rec AS BIGINT) AS n_rec,
      |  score_scaled, rk
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
      |        ORDER BY score_scaled DESC, cooc DESC, rec) AS rk
      |      FROM scored)
      |WHERE rk <= 5
      |ORDER BY item, rk""".stripMargin

  /** **Seasonal decomposition, STL-lite and integer-exact**: the
    * classic trend / weekday-seasonal / remainder split of the global
    * daily event-count series, every component a scaled integer —
    * trend = centered 7-day moving sum ×10⁶ div 7 (emitted only where
    * the window is FULL, the standard convention), detrended =
    * x·10⁶ − trend, seasonal = the day-of-week mean of detrended
    * (sum div count, integral), remainder = detrended − seasonal. No
    * float division anywhere, so every component hash-pins. Shapes:
    * one map-side daily aggregate (window input = |days| rows), one
    * ordered window, one 7-group weekday aggregate broadcast back. */
  def tsDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.operators.Dedup.memoPersist(
      Tables.events(spark, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt")))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("sum7", sum(col("cnt")).over(w))
      .filter(col("n7") === 7)
      .withColumn("trend_scaled", expr("CAST((sum7 * 1000000) div 7 AS BIGINT)"))
      .withColumn("detrended", col("cnt") * lit(1000000L) - col("trend_scaled"))
      // Spark dayofweek is Sunday=1..Saturday=7 (NOT isodow); the
      // oracle's DuckDB dayofweek is Sunday=0..6 and compensates with
      // +1 — any "fix" toward real ISO numbering on either side shifts
      // every seasonal group by a day and breaks the hash
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val seasonal = trended.groupBy(col("dow"))
      .agg(sum(col("detrended")).as("sd"), count(lit(1)).as("nd"))
      .withColumn("seasonal", expr("CAST(sd div nd AS BIGINT)"))
      .select(col("dow"), col("seasonal"))
    trended.join(broadcast(seasonal), "dow")
      .select(col("day"), col("cnt"), col("trend_scaled"),
        col("seasonal").as("seasonal_scaled"),
        (col("detrended") - col("seasonal")).as("remainder_scaled"))
      .orderBy("day")
  }

  private val tsDecomposeSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1),
      |trended AS (
      |  SELECT day, cnt,
      |    CAST((sum7 * 1000000) // 7 AS BIGINT) AS trend_scaled,
      |    cnt * 1000000 - CAST((sum7 * 1000000) // 7 AS BIGINT) AS detrended,
      |    dayofweek(day) + 1 AS dow
      |  FROM (
      |    SELECT day, cnt,
      |      COUNT(*) OVER w AS n7, SUM(cnt) OVER w AS sum7
      |    FROM daily
      |    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
      |  WHERE n7 = 7),
      |seasonal AS (
      |  SELECT dow, CAST(SUM(detrended) // COUNT(*) AS BIGINT) AS seasonal
      |  FROM trended GROUP BY dow)
      |SELECT day, CAST(cnt AS BIGINT) AS cnt, trend_scaled,
      |  seasonal AS seasonal_scaled,
      |  CAST(detrended - seasonal AS BIGINT) AS remainder_scaled
      |FROM trended JOIN seasonal USING (dow)
      |ORDER BY day""".stripMargin

  /** **Survival-curve sufficient statistics** (Kaplan–Meier, exact):
    * time-to-reorder analysis over customer order gaps. Each
    * consecutive-order pair contributes an EVENT observation (gap in
    * days); each customer's last order contributes a CENSORED
    * observation (gap to the corpus horizon — still alive at that
    * duration). Per observed duration t the curve needs d_t (events at
    * exactly t) and n_t (observations still at risk: duration ≥ t) —
    * both exact integers here; S(t) = Π(1 − d/n) is the consumer's
    * one float fold (the stats_moments sufficient-statistics
    * discipline). n_t is a suffix sum over the duration histogram —
    * a window over |distinct durations| rows, never observations;
    * gaps come from one lag window on the customer shuffle. */
  def survivalCurve(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
    val byCust = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
    val horizon = ord.agg(max(col("d")).as("h"))
    val obs = ord
      .withColumn("next_d", lead(col("d"), 1).over(byCust))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("next_d").isNotNull, datediff(col("next_d"), col("d")))
          .otherwise(datediff(col("h"), col("d"))).cast("long").as("t"),
        col("next_d").isNotNull.as("event"))
    val hist = obs.groupBy(col("t"))
      .agg(count(when(col("event"), 1)).as("d_t"),
        count(lit(1)).as("all_t"))
    hist
      .withColumn("n_t", sum(col("all_t")).over(
        Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("d_t") > 0)
      .select(col("t"), col("d_t"), col("n_t"))
      .orderBy("t")
  }

  private val survivalCurveSql =
    """WITH ord AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
      |h AS (SELECT MAX(d) AS h FROM ord),
      |obs AS (
      |  SELECT
      |    CASE WHEN next_d IS NOT NULL THEN datediff('day', d, next_d)
      |         ELSE datediff('day', d, h.h) END AS t,
      |    next_d IS NOT NULL AS event
      |  FROM (SELECT o_custkey, d,
      |          lead(d) OVER (PARTITION BY o_custkey ORDER BY d) AS next_d
      |        FROM ord) CROSS JOIN h),
      |hist AS (
      |  SELECT t, CAST(COUNT(*) FILTER (event) AS BIGINT) AS d_t,
      |    COUNT(*) AS all_t
      |  FROM obs GROUP BY t)
      |SELECT t, d_t,
      |  CAST(SUM(all_t) OVER (ORDER BY t DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_t
      |FROM hist
      |QUALIFY d_t > 0
      |ORDER BY t""".stripMargin

  /** **Association rules** (Apriori level 2, exact): directed rules
    * a→b over order baskets with the three classic measures — support
    * (co-basket count), confidence = supp/n_a, lift = supp·N/(n_a·n_b)
    * — the latter two as EXACT scaled integers (floor(x·10⁶), integral
    * division both engines share), so the ranking never touches float.
    * Same co-partitioned pair machinery as [[recommendTopk]] (mass ∝
    * Σ basket², never |parts|²); the basket-count scalar N broadcasts;
    * top-200 by (lift desc, rule) is a TakeOrdered. Rules read both
    * directions (confidence is asymmetric; lift is shared). */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast(DecimalType(38, 0))
    val li = graft.operators.Dedup.memoPersist(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct())
    val freq = li.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val nBaskets = li.select(col("o")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 3)
    val sym = pairs.select(col("pa"), col("pb"), col("supp"))
      .unionByName(pairs.select(col("pb").as("pa"), col("pa").as("pb"), col("supp")))
    sym
      .join(broadcast(freq.select(col("p").as("pa"), col("n").as("n_a"))), "pa")
      .join(broadcast(freq.select(col("p").as("pb"), col("n").as("n_b"))), "pb")
      .crossJoin(broadcast(nBaskets))
      .withColumn("__cn", d(col("supp")) * lit(1000000))
      .withColumn("conf_scaled", expr("CAST(__cn div n_a AS BIGINT)"))
      .withColumn("__ln", d(col("supp")) * d(col("n_baskets")) * lit(1000000))
      .withColumn("__ld", d(col("n_a")) * d(col("n_b")))
      .withColumn("lift_scaled", expr("CAST(__ln div __ld AS BIGINT)"))
      .select(col("pa").as("antecedent"), col("pb").as("consequent"),
        col("supp"), col("n_a"), col("n_b"), col("conf_scaled"),
        col("lift_scaled"))
      .orderBy(col("lift_scaled").desc, col("antecedent"), col("consequent"))
      .limit(200)
  }

  private val assocRulesSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |freq AS (SELECT p, COUNT(*) AS n FROM li GROUP BY p),
      |nb AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM li),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS supp
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |sym AS (SELECT pa, pb, supp FROM pairs
      |        UNION ALL SELECT pb, pa, supp FROM pairs)
      |SELECT sym.pa AS antecedent, sym.pb AS consequent,
      |  CAST(supp AS BIGINT) AS supp,
      |  CAST(u1.n AS BIGINT) AS n_a, CAST(u2.n AS BIGINT) AS n_b,
      |  CAST((CAST(supp AS HUGEINT) * 1000000) // u1.n AS BIGINT) AS conf_scaled,
      |  CAST((CAST(supp AS HUGEINT) * nb.n_baskets * 1000000)
      |       // (CAST(u1.n AS HUGEINT) * u2.n) AS BIGINT) AS lift_scaled
      |FROM sym JOIN freq u1 ON u1.p = sym.pa
      |         JOIN freq u2 ON u2.p = sym.pb
      |         CROSS JOIN nb
      |ORDER BY lift_scaled DESC, antecedent, consequent
      |LIMIT 200""".stripMargin

  /** **Strict-sequence pattern match** (CEP-lite): occurrences of the
    * event pattern view → click → purchase as three STRICTLY CONSECUTIVE
    * events in a user's event-time order, with the whole run inside a
    * 24-hour window — MATCH_RECOGNIZE's `PATTERN (A B C)` on the
    * all-rows stream, expressed as two lag() taps over one user_id
    * shuffle (contiguity is what separates this from [[funnel]], which
    * allows gaps). Every detection carries the full triple's
    * timestamps; all comparisons are integer epoch seconds. At scale
    * this is the one-pass shape: no self-joins, no per-user
    * sequence materialization, window state = 2 rows. */
  def patternMatch(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("t1", lag(col("ts"), 2).over(byUser))
      .withColumn("t2", lag(col("ts"), 1).over(byUser))
      .withColumn("e1", lag(col("event_type"), 2).over(byUser))
      .withColumn("e2", lag(col("event_type"), 1).over(byUser))
      .filter(col("e1") === "view" && col("e2") === "click" &&
        col("event_type") === "purchase" &&
        col("ts").cast("long") - col("t1").cast("long") <= 86400L)
      .select(col("user_id"), col("event_id").as("end_event_id"),
        col("t1"), col("t2"), col("ts").as("t3"),
        (col("ts").cast("long") - col("t1").cast("long")).as("span_seconds"))
      .orderBy("user_id", "end_event_id")
  }

  private val patternMatchSql =
    """SELECT user_id, event_id AS end_event_id, t1, t2, ts AS t3,
      |  CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |    - CAST(FLOOR(epoch(CAST(t1 AS TIMESTAMP))) AS BIGINT) AS span_seconds
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    lag(ts, 2) OVER w AS t1, lag(ts, 1) OVER w AS t2,
      |    lag(event_type, 2) OVER w AS e1, lag(event_type, 1) OVER w AS e2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
      |WHERE e1 = 'view' AND e2 = 'click' AND event_type = 'purchase'
      |  AND CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |      - CAST(FLOOR(epoch(CAST(t1 AS TIMESTAMP))) AS BIGINT) <= 86400
      |ORDER BY user_id, end_event_id""".stripMargin

  /** **CUSUM changepoint detection, integer-exact** (the `ts_anomaly`
    * discipline applied to level shifts): per event type, the day
    * maximizing |n·S_i − i·T| — the classic CUSUM statistic
    * Σ_{j≤i}(x_j − x̄) scaled by n so the mean never divides and every
    * step stays in DECIMAL(38,0); the argmax day is where the series'
    * level most plausibly shifted. One (type, day) aggregate, then two
    * window passes over the SAME event_type partitioning (prefix sums +
    * whole-partition totals + argmax rank — one exchange); emitted
    * finals are BIGINT (the stats_moments portability rule). Ties break
    * to the earliest day. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast(DecimalType(38, 0))
    val byTypeDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val run = byTypeDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("event_type"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("i", row_number().over(byTypeDay))
      .withColumn("s", sum(col("cnt")).over(run))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("t", sum(col("cnt")).over(whole))
      .withColumn("c", d(col("n")) * d(col("s")) - d(col("i")) * d(col("t")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(abs(col("c")).desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        // overflow-guarded narrowing (the innerProductEstimate rule): a
        // beyond-Long CUSUM statistic must fail loudly, not cast to NULL
        // silently while the oracle's BIGINT arithmetic errors
        when(abs(col("c")) > d(lit(Long.MaxValue)),
          raise_error(lit("cusumChangepoint exceeds BIGINT — widen the output type"))
            .cast("long"))
          .otherwise(col("c").cast("long")).as("cusum_scaled"),
        col("n").cast("long").as("n_days"))
      .orderBy("event_type")
  }

  private val cusumChangepointSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, day,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS t
      |  FROM daily)
      |SELECT event_type, day AS change_day,
      |  CAST(n * s - i * t AS BIGINT) AS cusum_scaled,
      |  CAST(n AS BIGINT) AS n_days
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |        ORDER BY ABS(n * s - i * t) DESC, day) AS rk
      |      FROM scored)
      |WHERE rk = 1
      |ORDER BY event_type""".stripMargin

  /** **Autocorrelation sufficient statistics** at lags 1..7 over the
    * per-type daily count series — the diagnostics behind an ACF plot
    * / seasonality test, emitted as EXACT integers (n_pairs, Σx, Σy,
    * Σx·y per lag; the consumer derives r_k in whatever float it
    * likes — the stats_moments structural lesson). One lag-explode +
    * one equi-join on (type, day-index), instead of 7 window passes:
    * the lagged pairing is a join on a derived key, so it shuffles the
    * DAILY aggregate (≤ types × days rows), never events. */
  def acfStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byTypeDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val idx = graft.operators.Dedup.memoPersist(
      Tables.events(spark, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("i", row_number().over(byTypeDay)))
    val l = idx.select(col("event_type"), col("i"), col("cnt").as("x"))
    val r = idx.select(col("event_type"), col("i").as("j"), col("cnt").as("y"))
    l.withColumn("k", explode(sequence(lit(1L), lit(7L))))
      .withColumn("j", col("i") + col("k"))
      .join(r, Seq("event_type", "j"))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y").cast(DecimalType(38, 0)))
          .cast("long").as("sxy"))
      .orderBy("event_type", "k")
  }

  private val acfStatsSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i, cnt
      |  FROM daily),
      |ks AS (SELECT range AS k FROM range(1, 8))
      |SELECT l.event_type, ks.k,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(l.cnt) AS BIGINT) AS sx,
      |  CAST(SUM(r.cnt) AS BIGINT) AS sy,
      |  CAST(SUM(l.cnt * r.cnt) AS BIGINT) AS sxy
      |FROM idx l CROSS JOIN ks
      |JOIN idx r ON r.event_type = l.event_type AND r.i = l.i + ks.k
      |GROUP BY l.event_type, ks.k
      |ORDER BY l.event_type, ks.k""".stripMargin

  val all: Seq[Q] = Seq(
    Q("funnel", funnelSql)(funnel(_, _)),
    Q("sessionize", sessionizeSql)(sessionize),
    Q("sessionize_native", sessionizeSql)(sessionizeNative),
    Q("retention", retentionSql)(retention),
    Q("latest_snapshot", latestSnapshotSql)(latestSnapshot),
    Q("text_repetition", textRepetitionSql)(textRepetition),
    Q("event_transitions", eventTransitionsSql)(eventTransitions),
    Q("path_topk", pathTopkSql)(pathTopk(_, _)),
    Q("ts_anomaly", tsAnomalySql)(tsAnomaly),
    Q("interval_union", intervalUnionSql)(intervalUnion(_, _)),
    Q("basket_pairs", basketPairsSql)(basketPairs),
    Q("pattern_match", patternMatchSql)(patternMatch),
    Q("cusum_changepoint", cusumChangepointSql)(cusumChangepoint),
    Q("acf_stats", acfStatsSql)(acfStats),
    Q("recommend_topk", recommendTopkSql)(recommendTopk),
    Q("recommend_topk_bounded", recommendTopkBoundedSql)(recommendTopkBounded),
    Q("assoc_rules", assocRulesSql)(assocRules),
    Q("ts_decompose", tsDecomposeSql)(tsDecompose),
    Q("survival_curve", survivalCurveSql)(survivalCurve))
}

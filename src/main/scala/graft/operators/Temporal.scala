package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal history modeling: compress an event stream into
  * slowly-changing-dimension type-2 history — per key, the run-length
  * encoding of a changing attribute as `[valid_from, valid_to)` intervals.
  * The warehouse-side complement of [[Diachronic]]'s downsample: where the
  * reference keeps one snapshot per day (main.py:127-150's greedy state
  * machine), SCD2 keeps one row per *state change*, which is what a
  * dimension table join (`asof_join` / `latest_snapshot`) consumes.
  *
  * Scale shape: every step — change detection (`lag`), run numbering
  * (running `sum`), interval close (`lead`) — is a window over the SAME
  * `partitionBy(key)` partitioning, and the run fold is a `groupBy` on a
  * superset of that key, so the whole operator costs ONE shuffle on the
  * key; with hundreds of millions of keys the per-key state never
  * materializes anywhere (no driver collection, no per-key loop — compare
  * the reference's in-memory per-page dict). Rows out = number of state
  * changes, the asymptotic floor for any history encoding.
  */
object Temporal {

  /** Fold `df`'s per-event attribute into SCD2 intervals.
    *
    * Output: (key, state, valid_from, valid_to, n_events) where
    * `valid_to` is the next interval's start (NULL for the current/open
    * interval) and `n_events` counts the run's source events.
    *
    * `(order, tieBreak)` must totally order events within a key —
    * without a total order, run boundaries are nondeterministic under
    * shuffle. `valid_from` is the run's `order` value (its minimum, since
    * the run is an `order`-contiguous slice). */
  def scd2(df: DataFrame, key: Column, state: Column,
      order: Column, tieBreak: Column): DataFrame =
    foldRuns(df.select(key.as("key"), state.as("s"),
      order.as("o"), tieBreak.as("tb"), lit(1L).as("wt")))

  /** The gaps-and-islands fold over pre-normalized rows
    * (key, s, o, tb, wt): runs break on state change under the (o, tb)
    * total order; `n_events` sums `wt` so a whole prior run can ride in
    * as ONE weighted seed row ([[scd2Merge]]). */
  private def foldRuns(base: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("o"), col("tb"))
    base
      // a run breaks where the state differs from the previous event's
      // (null-safe: the first event of a key always starts a run)
      .withColumn("brk",
        when(not(lag(col("s"), 1).over(w) <=> col("s")), 1L).otherwise(0L))
      .withColumn("rid", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("rid"))
      .agg(min(col("s")).as("state"), // constant within a run
        min(col("o")).as("valid_from"),
        sum(col("wt")).as("n_events"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1)
          .over(Window.partitionBy(col("key")).orderBy(col("valid_from"), col("rid"))))
      .select(col("key"), col("state"), col("valid_from"), col("valid_to"),
        col("n_events"))
  }

  /** **Daily resample with forward fill** — sparse observations onto a
    * dense per-key daily grid, gaps carrying the last observed value
    * (the sensor/price/metric gap-fill every time-series warehouse
    * runs). Shape: the day's closing observation is a (key, day) window
    * rank; the grid is a per-row `sequence(min_day, max_day)` explode
    * (pure arithmetic, no generator join); the fill is
    * `last(_, ignoreNulls)` over the SAME `partitionBy(key)` the join
    * already shuffled on — so the whole operator costs the (key, day)
    * aggregation shuffle plus one key shuffle. Grid size is bounded by
    * span/day, not event count — the dense frame can EXCEED the input
    * for long-lived keys; that expansion is the operator's point.
    *
    * Output: (key, day, value_filled, n_obs, is_gap); leading days
    * before a key's first observation cannot occur (grid starts at its
    * first observed day), so `value_filled` is never NULL. */
  def resampleFfillDaily(df: DataFrame, key: Column, ts: Column,
      value: Column, tie: Column): DataFrame = {
    val base = df.select(key.as("key"), to_date(ts).as("day"),
      value.as("v"), ts.as("t"), tie.as("tb"))
    val wDay = Window.partitionBy(col("key"), col("day"))
    val daily = base
      .withColumn("rn", row_number().over(
        wDay.orderBy(col("t").desc, col("tb").desc)))
      .withColumn("n_obs", count(lit(1)).over(wDay))
      .filter(col("rn") === 1)
      // __observed is a constant-true marker: after the left join below
      // its NULL-ness is a JOIN MISS, which is what is_gap means. Keying
      // the gap off day_last's own NULL-ness would misclassify a day
      // whose closing observation legitimately carries a NULL value —
      // the SQL twin (d.day IS NULL) and the engine would then diverge
      .select(col("key"), col("day"), col("v").as("day_last"), col("n_obs"),
        lit(true).as("__observed"))
    val spine = daily.groupBy(col("key"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("key"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wFill = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        last(col("day_last"), ignoreNulls = true).over(wFill)
          .as("value_filled"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("__observed").isNull.as("is_gap"))
  }

  /** [[resampleFfillDaily]]'s LINEAR sibling: gap days interpolate
    * between the surrounding observed days' closing values instead of
    * carrying the last one forward — sensor/metric gap filling where a
    * step function would bias downstream aggregates. Every gap day has
    * both neighbors by construction (the spine spans [first, last]
    * observed day, and both endpoints are observed).
    *
    * Exact-oracle discipline for a float formula: the interpolation is
    * spelled as the SAME three correctly-rounded IEEE ops in both
    * engines — `v0 + (v1 − v0) · (Δprev / Δspan)` with the day deltas
    * exact int64s and the division the only rounding point — so the
    * result hash-matches bitwise (the `avg` rule of SURVEY §7 rule 3,
    * one notch wider). A NULL closing value on a neighbor propagates
    * NULL through the arithmetic identically in both engines.
    *
    * Scale shape: identical to [[resampleFfillDaily]] — one (key, day)
    * shuffle for the closing observation, one key shuffle shared by the
    * join and both fill windows (prev via unbounded-preceding `last`,
    * next via unbounded-following `first`, same partitioning); grid
    * size bounded by span, not event count. */
  def resampleInterpDaily(df: DataFrame, key: Column, ts: Column,
      value: Column, tie: Column): DataFrame = {
    val base = df.select(key.as("key"), to_date(ts).as("day"),
      value.as("v"), ts.as("t"), tie.as("tb"))
    val wDay = Window.partitionBy(col("key"), col("day"))
    val daily = base
      .withColumn("rn", row_number().over(
        wDay.orderBy(col("t").desc, col("tb").desc)))
      .withColumn("n_obs", count(lit(1)).over(wDay))
      .filter(col("rn") === 1)
      .select(col("key"), col("day"), col("v").as("day_last"), col("n_obs"),
        lit(true).as("__observed"))
    val spine = daily.groupBy(col("key"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("key"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wPrev = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsStruct = when(col("__observed").isNotNull,
      struct(col("day").as("d"), col("day_last").as("v")))
    spine.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"), col("day_last"), col("n_obs"),
        col("__observed"),
        last(obsStruct, ignoreNulls = true).over(wPrev).as("p"),
        first(obsStruct, ignoreNulls = true).over(wNext).as("n"))
      .select(col("key"), col("day"),
        when(col("__observed").isNotNull, col("day_last"))
          .otherwise(col("p.v") + (col("n.v") - col("p.v")) *
            (datediff(col("day"), col("p.d")) /
              datediff(col("n.d"), col("p.d"))))
          .as("value_interp"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("__observed").isNull.as("is_gap"))
  }

  /** **Incremental SCD2 maintenance** — the MERGE INTO pattern: fold a
    * delta batch of events into an existing [[scd2]] history WITHOUT
    * recomputing untouched keys. Exactness contract (spec + oracle):
    * {{{ scd2Merge(scd2(events ≤ T), events > T) ≡ scd2(all events) }}}
    * requires every delta event to sort strictly after the cutoff (no
    * late data — the same frontier assumption as a streaming watermark).
    *
    * Work is delta-shaped, not history-shaped:
    *  - the distinct delta key set broadcasts; untouched keys pass
    *    through via a broadcast ANTI join (no shuffle of the history),
    *    touched keys' CLOSED intervals pass through via the broadcast
    *    SEMI join — closed history can never change under append-only
    *    deltas;
    *  - only each touched key's OPEN interval re-enters the fold, as a
    *    single weighted seed row (state, valid_from, n_events) ahead of
    *    that key's delta events — so the window fold runs over
    *    |delta| + |touched keys| rows. If the seed's state matches the
    *    first delta event, the run extends (weights sum); otherwise the
    *    seed run closes at the new run's start. */
  def scd2Merge(history: DataFrame, delta: DataFrame, key: Column,
      state: Column, order: Column, tieBreak: Column): DataFrame = {
    val d = delta.select(key.as("key"), state.as("s"), order.as("o"),
      tieBreak.as("tb"), lit(1L).as("wt"))
    val deltaKeys = d.select("key").distinct()
    val untouched = history.join(broadcast(deltaKeys), Seq("key"), "left_anti")
    val touched = history.join(broadcast(deltaKeys), Seq("key"), "left_semi")
    val closed = touched.filter(col("valid_to").isNotNull)
    // the open interval re-enters the fold as one weighted row; the
    // Long.MinValue tie-break pins it ahead of any delta event at the
    // same instant (cannot occur under the frontier contract — belt and
    // braces for degenerate order columns)
    val seeds = touched.filter(col("valid_to").isNull)
      .select(col("key"), col("state").as("s"), col("valid_from").as("o"),
        lit(Long.MinValue).as("tb"), col("n_events").as("wt"))
    val recomputed = foldRuns(seeds.unionByName(d.withColumn("tb",
      col("tb").cast("long"))))
    untouched.unionByName(closed).unionByName(recomputed)
  }

  /** **Interval overlap COUNTS by rank sweep — no pair enumeration.**
    * For each closed interval `[start, end]`, the number of OTHER
    * intervals in the same frame that intersect it:
    * `count = A − B − 1`, where A = #{r : r.start ≤ s.end} and
    * B = #{r : r.end < s.start} (every interval is left-disjoint,
    * overlapping, or right-disjoint; the −1 removes s itself). A and B
    * are order statistics, so the whole computation is two
    * [[PrefixSum.runningSums]] sweeps over (marker ∪ probe) point
    * lists — range-partitioned, parallel, O(n log n) — plus one
    * interval-keyed join. Tie discipline: A's markers sort BEFORE
    * probes at equal value (≤ is inclusive), B's AFTER (< is strict).
    *
    * This is the scale twin of [[Joins.intervalOverlapJoin]]: when the
    * question is "how many overlap", enumeration pays Θ(matched pairs)
    * — quadratic on a densifying time axis — while the sweep pays
    * Θ(n log n) regardless of how dense the overlaps get. Use the join
    * when the pairs themselves are the output; use this when a count
    * per interval is.
    *
    * `idCols` must uniquely identify intervals. The count includes
    * overlapping intervals sharing id prefixes (no per-key exclusion);
    * when same-key intervals cannot overlap by construction — e.g.
    * per-(user, day) spans, which day boundaries keep disjoint — the
    * result equals the different-key overlap count exactly. */
  def overlapCounts(spans: DataFrame, idCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    require(idCols.nonEmpty, "overlapCounts needs id columns")
    val ids = idCols.map(col)
    // malformed intervals (end < start) would silently shift BOTH order
    // statistics — fail loudly instead, the intervalOverlapJoin contract
    val guarded = spans.withColumn(startCol,
      when(col(endCol) >= col(startCol), col(startCol))
        .otherwise(raise_error(
          lit("overlapCounts: interval has end < start")).cast("long")))
    def sweep(markerCol: String, probeCol: String,
        markersFirstAtTies: Boolean, outName: String): DataFrame = {
      val (mKind, pKind) = if (markersFirstAtTies) (0, 1) else (1, 0)
      val mk = guarded.select((col(markerCol).as("val") +: lit(mKind).as("kind")
        +: ids) ++ Seq(lit(1L).as("m"), lit(false).as("probe")): _*)
      val pr = guarded.select((col(probeCol).as("val") +: lit(pKind).as("kind")
        +: ids) ++ Seq(lit(0L).as("m"), lit(true).as("probe")): _*)
      PrefixSum.runningSums(mk.unionByName(pr),
          col("val") +: col("kind") +: ids, Seq("m"))
        .filter(col("probe"))
        .select(ids :+ col("m_cum").as(outName): _*)
    }
    val a = sweep(startCol, endCol, markersFirstAtTies = true, "__a")
    val b = sweep(endCol, startCol, markersFirstAtTies = false, "__b")
    a.join(b, idCols)
      .select(ids :+ (col("__a") - col("__b") - 1L).as("n_overlap"): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core semantic: greedy per-key daily downsample.
  *
  * The reference (/root/reference/main.py:151-161) walks each page's
  * revisions in chronological order keeping a threshold `cur_date`
  * (initialised to the epoch, /root/reference/diachronic/conf.py:14) and
  * emits a revision iff `ts >= cur_date`, then advances the threshold to
  * the midnight after the emitted revision. SURVEY.md §2.4 proves this is
  * exactly "the minimum-timestamp row per (key, calendar day), restricted
  * to ts >= epoch" — an order-independent relational query. That proof is
  * what lets us express it as a shuffle-friendly aggregate rather than a
  * stateful scan.
  *
  * Two formulations are provided:
  *
  *  - [[firstPerDay]]: `groupBy(key, day).agg(min(struct(ts, tieBreak,
  *    payload...)))`. A struct `min` compares fields lexicographically, so
  *    (ts, tieBreak) gives a total, deterministic order even with duplicate
  *    timestamps (the reference keeps the first in document order; we keep
  *    the lowest tie-break key). Hash aggregation with map-side partial
  *    combine: each of the N input partitions reduces to at most
  *    |keys×days| rows before the shuffle — at 100 TB this moves only the
  *    per-(key,day) winners, not the raw rows.
  *
  *  - [[firstPerDayWindow]]: `row_number` over a (key, day) window. Same
  *    result; requires a full shuffle+sort of every input row, so it is
  *    the formulation you choose only when you also need the losing rows
  *    (e.g. ranked audits). Kept for parity and as a cross-check.
  */
object Diachronic {

  /** The reference epoch: `datetime_init` 2001-01-15
    * (/root/reference/diachronic/conf.yml:7). Inclusive (`>=`,
    * /root/reference/main.py:154). */
  val DefaultEpoch = "2001-01-15 00:00:00"

  /** Aggregate formulation — preferred at scale (map-side combine). Output
    * columns: key, day, then `ts` and payload columns flattened from the
    * winning struct. */
  def firstPerDay(
      df: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      payload: Seq[(String, Column)],
      epoch: String = DefaultEpoch): DataFrame = {
    val winner = struct(
      (ts.as("ts") +: tieBreak.as("__tie") +: payload.map { case (n, c) => c.as(n) }): _*)
    df.filter(ts >= lit(epoch).cast("timestamp"))
      .groupBy(key.as("key"), to_date(ts).as("day"))
      .agg(min(winner).as("w"))
      .select(
        (col("key") +: col("day") +: col("w.ts").as("first_ts") +:
          payload.map { case (n, _) => col(s"w.$n").as(n) }): _*)
  }

  /** Window formulation — full shuffle+sort; kept as a semantic cross-check
    * and for callers that need non-winning rows too. */
  def firstPerDayWindow(
      df: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      epoch: String = DefaultEpoch): DataFrame = {
    val w = Window.partitionBy(key, to_date(ts)).orderBy(ts, tieBreak)
    df.filter(ts >= lit(epoch).cast("timestamp"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

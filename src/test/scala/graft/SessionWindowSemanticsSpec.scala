package graft

import org.apache.spark.sql.functions._

/** Pins Spark's `session_window` BOUNDARY semantics, which
  * `sessionize_native` ([[graft.queries.Behavioral.sessionizeNative]])
  * and the streaming `sessions` twin bank on: windows MERGE when they
  * touch — an event at exactly `prev + gap` joins the session (merge ⇔
  * diff ≤ gap). A Spark upgrade that flipped the boundary to exclusive
  * would silently split exact-gap ties and hash-diverge from the batch
  * gaps-and-islands oracle (two real sf0.1 session pairs sit at
  * truncDiff == 3601, which is how the off-by-one was caught); this
  * spec makes that flip loud. */
class SessionWindowSemanticsSpec extends SparkTestBase {

  import spark.implicits._

  private def sessionsOf(gap: String, diffsSec: Seq[Long]): Long = {
    val df = diffsSec.zipWithIndex.flatMap { case (d, u) =>
      Seq((u.toLong, 0L), (u.toLong, d))
    }.toDF("u", "sec")
      .select(col("u"), timestamp_seconds(lit(978307200L) + col("sec")).as("ts"))
    df.groupBy(col("u"), session_window(col("ts"), gap))
      .agg(count(lit(1))).count()
  }

  test("session_window merges touching windows: diff == gap stays in-session") {
    // per user: two events diff seconds apart; gap 3600 s
    // diff 3600 == gap -> MERGE (1 session); 3601 > gap -> split (2)
    assert(sessionsOf("3600 seconds", Seq(3600L)) == 1L,
      "exact-gap tie must merge (inclusive boundary)")
    assert(sessionsOf("3600 seconds", Seq(3601L)) == 2L,
      "one past the gap must split")
    // the off-by-one sessionize_native shipped with first: gap 3601
    // also merges diff 3601 — pinned so the fix's reasoning stays true
    assert(sessionsOf("3601 seconds", Seq(3601L)) == 1L)
    assert(sessionsOf("3601 seconds", Seq(3602L)) == 2L)
  }

  test("chained exact-gap ties merge transitively into one session") {
    val df = Seq.tabulate(5)(i => (1L, i * 3600L)).toDF("u", "sec")
      .select(col("u"), timestamp_seconds(lit(978307200L) + col("sec")).as("ts"))
    val n = df.groupBy(col("u"), session_window(col("ts"), "3600 seconds"))
      .agg(count(lit(1))).count()
    assert(n == 1L, "a chain of exact-gap events is one session")
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Diachronic

/** A1 downsample semantics — the edge cases pinned from the reference
  * (FIXTURES.md §B table; /root/reference/main.py:151-164) plus the
  * SURVEY.md §2.4 equivalence proof as an executable property. */
class DiachronicSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** (key, ts, id) rows through the aggregate formulation. */
  private def run(rows: Seq[(String, Timestamp, Long)], epoch: String = Diachronic.DefaultEpoch) =
    Diachronic.firstPerDay(
      rows.toDF("k", "ts", "id"),
      key = col("k"), ts = col("ts"), tieBreak = col("id"),
      payload = Seq("id" -> col("id")), epoch = epoch)
      .select("key", "day", "first_ts", "id")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getTimestamp(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("revision exactly at epoch is emitted (inclusive >=)") {
    val out = run(Seq(("p", ts("2001-01-15 00:00:00"), 1L)))
    assert(out.length == 1 && out.head._4 == 1L)
  }

  test("all revisions before epoch -> zero rows") {
    assert(run(Seq(("p", ts("2000-12-31 23:59:59"), 1L),
      ("p", ts("2001-01-14 23:59:59"), 2L))).isEmpty)
  }

  test("multiple same-day revisions keep the earliest") {
    val out = run(Seq(
      ("p", ts("2020-05-01 08:00:00"), 1L),
      ("p", ts("2020-05-01 07:00:00"), 2L),
      ("p", ts("2020-05-01 23:59:59"), 3L)))
    assert(out.length == 1 && out.head._4 == 2L)
  }

  test("identical timestamps tie-break deterministically by tieBreak column") {
    val t = ts("2020-05-01 07:00:00")
    val out = run(Seq(("p", t, 9L), ("p", t, 3L), ("p", t, 5L)))
    assert(out.length == 1 && out.head._4 == 3L)
  }

  test("per-key independence (state resets per page, main.py:163-164)") {
    val out = run(Seq(
      ("a", ts("2020-05-01 10:00:00"), 1L),
      ("b", ts("2020-05-01 11:00:00"), 2L),
      ("a", ts("2020-05-01 12:00:00"), 3L)))
    assert(out.map(_._4).toSeq == Seq(1L, 2L))
  }

  test("window formulation agrees with aggregate formulation on sf0.001 events") {
    val agg = queries.Relational.diachronicDaily(spark, sf0001)
      .select("user_id", "day", "event_id").collect().map(_.toSeq).toSet
    val win = queries.Relational.diachronicDailyWindow(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_id"))
      .collect().map(_.toSeq).toSet
    assert(agg == win)
  }

  /** The §2.4 proof as a property: the reference's greedy threshold scan
    * over time-sorted revisions ≡ min-per-(key, day). */
  test("greedy scan equivalence property") {
    val epochMs = ts("2001-01-15 00:00:00").getTime
    val dayMs = 24L * 3600 * 1000
    val genRows: Gen[List[(String, Long, Long)]] = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        // timestamps straddling the epoch, multiple per day
        t <- Gen.choose(epochMs - 3 * dayMs, epochMs + 10 * dayMs)
        id <- Gen.choose(0L, 1000L)
      } yield (k, t, id))
    } yield rows

    val prop = Prop.forAll(genRows) { rows =>
      // reference semantics: greedy scan per key over (ts, id)-sorted rows
      val greedy = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        var threshold = epochMs
        rs.sortBy(r => (r._2, r._3)).flatMap { case (_, t, id) =>
          if (t >= threshold) {
            threshold = t - Math.floorMod(t, dayMs) + dayMs
            Some((k, t, id))
          } else None
        }
      }.toSet

      // engine semantics via the Spark operator
      val df = rows.map { case (k, t, id) => (k, new Timestamp(t), id) }
        .toDF("k", "ts", "id")
      val engine = Diachronic.firstPerDay(df,
          key = col("k"), ts = col("ts"), tieBreak = col("id"),
          payload = Seq("id" -> col("id")))
        .select("key", "first_ts", "id")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSet

      greedy == engine
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }
}

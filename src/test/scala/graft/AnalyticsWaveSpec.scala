package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.queries.{Behavioral, DataCleaning, LlmOps, Misc}

/** Round-11 analytics wave: transition matrix, entry paths, integer-exact
  * rolling anomaly flags, RFM segmentation, FD discovery, BM25 search.
  * Each test pins semantics on a hand-computable fixture or a structural
  * invariant on the sf0.001 corpus (the value-level gate is the DuckDB
  * oracle; these pin the LAWS the oracle can't see). */
class AnalyticsWaveSpec extends SparkTestBase {

  test("event_transitions: edges conserve counts (n-1 per multi-event user)") {
    val events = Tables.events(spark, sf0001)
    val perUser = events.groupBy("user_id").count()
      .agg(sum(when(col("count") > 1, col("count") - 1)).cast("long"))
      .head.getLong(0)
    val total = Behavioral.eventTransitions(spark, sf0001)
      .agg(sum("n_transitions").cast("long")).head.getLong(0)
    assert(total == perUser,
      s"transition edges $total != sum of (events-1) per user $perUser")
  }

  test("path_topk: user counts conserve and paths cap at 3 hops") {
    val rows = Behavioral.pathTopk(spark, sf0001, k = 1000).collect()
    val nUsers = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers,
      "every user contributes exactly one entry path")
    assert(rows.forall(_.getString(0).split(">").length <= 3))
  }

  test("ts_anomaly flags exactly the hand-computed spike") {
    import spark.implicits._
    // 8 flat days (cnt=10) then a spike: window n=7, s=70, ss=700,
    // variance 0 -> any deviation > 0 flags. Day 9 cnt=11 must flag;
    // a second flat series must not.
    val tmp = java.nio.file.Files.createTempDirectory("tsa").toString
    val rows = (1 to 8).map(d => ("spike", d, 10)) ++ Seq(("spike", 9, 11)) ++
      (1 to 9).map(d => ("flat", d, 10))
    rows.flatMap { case (t, d, c) => (1 to c).map { i =>
        (d.toLong * 100000 + i, // event_id
          java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:01"),
          i.toLong, t, 0.0, "{}")
      }}
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Behavioral.tsAnomaly(spark, tmp)
      .filter(col("is_anomaly") === 1).collect()
    assert(out.length == 1 && out(0).getString(0) == "spike" &&
      out(0).getAs[java.sql.Date]("day").toString == "2024-01-09",
      s"expected exactly the day-9 spike, got ${out.toSeq}")
  }

  test("rfm_segments: quintiles are balanced and champions dominate") {
    val out = Misc.rfmSegments(spark, sf0001).cache()
    val n = out.count()
    // ntile(5) group sizes differ by at most one
    val sizes = out.groupBy("r_score").count().collect().map(_.getLong(1))
    assert(sizes.length == 5 && sizes.max - sizes.min <= 1)
    // champions are recent AND frequent by construction
    val bad = out.filter(col("segment") === "champion" &&
      (col("r_score") < 4 || col("f_score") < 4)).count()
    assert(bad == 0 && n > 0)
    out.unpersist()
  }

  test("fd_discover: a key FD holds, an injected violation is counted") {
    import spark.implicits._
    val df = Seq((1, "a", "x"), (2, "a", "x"), (3, "b", "y"),
      (4, "b", "z")).toDF("id", "k", "v")
    val rep = DataQuality.fdDiscover(df,
        Seq(Seq("id") -> "v", Seq("k") -> "v"))
      .collect().map(r => (r.getString(0), r)).toMap
    assert(rep(Seq("id").mkString("+")).getBoolean(5), "id -> v must hold")
    val kv = rep("k")
    assert(!kv.getBoolean(5) && kv.getLong(4) == 1,
      s"k -> v must fail with exactly one violating lhs ('b'), got $kv")
    assert(kv.getLong(2) == 2 && kv.getLong(3) == 3)
  }

  test("bm25_search: ranking rewards the rare term and respects length norm") {
    val out = LlmOps.bm25Search(spark, sf0001, k = 500).cache()
    val top = out.filter(col("rank") <= 25)
    // 'dup' is ~15x rarer than the other query terms in the corpus, so
    // its idf dominates: the head of the ranking must be dup-carriers.
    assert(top.filter(col("tf_dup") > 0).count() >= 20,
      "top-25 should be dominated by documents containing the rare term")
    val worstDupRank = out.filter(col("tf_dup") > 0)
      .agg(max("rank")).head.getLong(0)
    val bestNonDup = out.filter(col("tf_dup") === 0)
      .agg(min("rank")).head.getLong(0)
    assert(worstDupRank < bestNonDup || top.count() < 25,
      "no tf-only pile-up should outrank an idf-dominant match")
    out.unpersist()
  }
}

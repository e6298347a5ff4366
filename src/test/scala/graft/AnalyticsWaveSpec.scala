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

  test("indDiscover: containment verdicts, NULL FKs unconstrained") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("fk")
    val parentFull = Seq(1L, 2L, 3L, 9L).toDF("pk")
    val parentGap = Seq(1L, 2L).toDF("pk")
    val rep = DataQuality.indDiscover(Seq(
        DataQuality.IndCandidate("c.fk", child, "fk", "pFull.pk", parentFull, "pk"),
        DataQuality.IndCandidate("c.fk", child, "fk", "pGap.pk", parentGap, "pk")))
      .collect().map(r => r.getString(1) -> r).toMap
    val full = rep("pFull.pk")
    // the NULL child value is ignored: 3 distinct non-NULL values, all contained
    assert(full.getLong(2) == 3 && full.getLong(3) == 0 && full.getBoolean(4))
    val gap = rep("pGap.pk")
    assert(gap.getLong(2) == 3 && gap.getLong(3) == 1 && !gap.getBoolean(4))
  }

  test("keyDiscover: uniqueness verdicts; struct distinct groups NULLs equal") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, None))
      .toDF("id", "v")
    val rep = DataQuality.keyDiscover("t", df, Seq(Seq("id"), Seq("v")))
      .collect().map(r => r.getString(1) -> r).toMap
    assert(rep("id").getBoolean(4), "id is a key")
    val v = rep("v")
    // NULLs group equal inside the struct: distinct {a, NULL} = 2, so a
    // NULL-skipping countDistinct (which would report 1 of 4) can't
    // inflate nor a NULL-distinct convention deflate the verdict
    assert(v.getLong(3) == 2 && !v.getBoolean(4), s"v distinct must be 2, got $v")
  }

  test("cusum_changepoint: argmax |n*S_i - i*T| recomputed exactly per type") {
    val out = Behavioral.cusumChangepoint(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDate(1).toString, r.getLong(2))).toMap
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val series = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val n = series.length.toLong
      val total = series.map(_._2).sum
      var s = 0L
      val cs = series.zipWithIndex.map { case ((day, cnt), i0) =>
        s += cnt; (day, n * s - (i0 + 1) * total)
      }
      val best = cs.minBy { case (day, c) => (-math.abs(c), day) }
      assert(out(tpe) == best, s"$tpe: got ${out(tpe)}, want $best")
    }
  }

  test("acf_stats: pair counts and sums match the shifted-series recompute") {
    val out = Behavioral.acfStats(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val xs = rows.map(t => (t._2, t._3)).sortBy(_._1).map(_._2)
      (1 to 7).foreach { k =>
        if (xs.length > k) {
          val pairs = xs.dropRight(k).zip(xs.drop(k))
          val want = (pairs.length.toLong, pairs.map(_._1).sum,
            pairs.map(_._2).sum, pairs.map(p => p._1 * p._2).sum)
          assert(out((tpe, k.toLong)) == want, s"$tpe lag $k")
        } else assert(!out.contains((tpe, k.toLong)), s"$tpe lag $k should be absent")
      }
    }
  }

  test("recommend_topk equals the brute-force cosine ranking at sf0.001") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val cooc = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sym = cooc.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val want = sym.groupBy(_._1).flatMap { case (item, recs) =>
      recs.map { case (_, rec, c) =>
        val score = (BigInt(c) * c * 1000000 / (BigInt(n(item)) * n(rec))).toLong
        (item, rec, c, score)
      }.sortBy { case (_, rec, c, score) => (-score, -c, rec) }
        .take(5).zipWithIndex
        .map { case ((i, r, c, s), rk) => (i, r, c, s, rk + 1L) }
    }.toSet
    val got = Behavioral.recommendTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5),
        r.getInt(6).toLong)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("collocations_pmi: emitted scores are self-consistent and support-pruned") {
    val rows = LlmOps.collocationsPmi(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // total bigram positions from the corpus (the N in the PMI)
    val nb = Tables.documents(spark, sf0001)
      .select(size(split(col("text"), " ")).as("l"))
      .agg(sum(when(col("l") >= 2, col("l") - 1)).cast("long")).head.getLong(0)
    rows.foreach { r =>
      val (n12, n1, n2, score) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n12 >= 5, "support floor")
      assert(n12 <= n1 && n12 <= n2, "bigram count bounded by unigram counts")
      val want = (BigInt(n12) * nb * 1000000 / (BigInt(n1) * n2)).toLong
      assert(score == want, s"score mismatch for ${r.getString(0)} ${r.getString(1)}")
    }
    // descending by (score, w1, w2): the emitted order is the total order
    val keys = rows.map(r => (-r.getLong(5), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted), "output must be sorted by the rank key")
  }

  test("holt_forecast: packed fold ≡ the Holt recurrence recomputed in Scala") {
    val got = DataCleaning.holtForecast(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    def truncDiv(a: Long, b: Long): Long = a / b // JVM / truncates toward zero
    daily.foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3 * 1000L)
      var l = xs.head; var b = 0L
      xs.tail.foreach { x =>
        val nl = truncDiv(l + b + x, 2)
        b = truncDiv(b + (nl - l), 2)
        l = nl
      }
      assert(got(tpe) == (l, b), s"$tpe: got ${got(tpe)}, want ($l, $b)")
    }
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

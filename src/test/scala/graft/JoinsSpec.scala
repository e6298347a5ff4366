package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals plain join (inner + left) under skew") {
    // pathological skew: 90% of big-side rows share one key
    val big = spark.range(0, 20000).toDF("id")
      .withColumn("k", when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100))
      .withColumn("v", col("id") * 2)
    val small = spark.range(0, 100).toDF("k")
      .withColumn("w", col("k") * 10)

    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "v", "w").collect().map(_.toSeq).toSet
      val salted = Joins.saltedJoin(big, small, big("k"), small("k"), salt = 8, jt)
        .select(big("k"), col("v"), col("w")).collect().map(_.toSeq).toSet
      assert(salted == plain, s"join type $jt")
    }

    // semi/anti are big-side-driven too: multiset equality, not just set
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = big.join(small, big("k") === small("k"), jt)
        .select("id", "v").collect().map(_.toSeq).sortBy(_.toString)
      val salted = Joins.saltedJoin(big, small, big("k"), small("k"), salt = 8, jt)
        .select("id", "v").collect().map(_.toSeq).sortBy(_.toString)
      assert(salted.sameElements(plain), s"join type $jt")
    }
  }

  test("saltedJoinAuto measures skew: salts the hot key, skips uniform keys") {
    // same pathological shape: key 7 holds 90% of the big side
    val big = spark.range(0, 20000).toDF("id")
      .withColumn("k", when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100))
      .withColumn("v", col("id") * 2)
    val small = spark.range(0, 100).toDF("k").withColumn("w", col("k") * 10)
    graft.operators.Dedup.releaseCaches()
    val auto = Joins.saltedJoinAuto(big, small, big("k"), small("k"))
    // the measured plan must actually salt (the probe saw key 7)
    assert(auto.queryExecution.analyzed.toString.contains("__salt"),
      "expected a salted plan for the 90%-hot key")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
      .collect().map(_.toSeq).toSet
    assert(auto.select(big("k"), col("v"), col("w"))
      .collect().map(_.toSeq).toSet == plain)
    // uniform keys: salt must come out 1 and the plain join be returned
    val uni = spark.range(0, 20000).toDF("id")
      .withColumn("k", col("id") % 100).withColumn("v", col("id"))
    graft.operators.Dedup.releaseCaches()
    val auto1 = Joins.saltedJoinAuto(uni, small, uni("k"), small("k"))
    assert(!auto1.queryExecution.analyzed.toString.contains("__salt"),
      "uniform keys must not pay the salting machinery")
    graft.operators.Dedup.releaseCaches()
  }

  test("AQE skew join splits the hot partition natively (the salting alternative)") {
    // the engine's OTHER answer to the skew saltedJoin solves by hand:
    // with AQE skew-join enabled and thresholds sized to the fixture,
    // the runtime re-plan splits the oversized partition — assert the
    // finalized plan marks the sort-merge join as skew-handled and the
    // results are identical to the plain join
    import spark.implicits._
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key carrying ~95% of the rows, padded to make its
      // partition dwarf the threshold
      val pad = "x" * 64
      val big = ((0L until 40000L).map(i => (7L, i, pad)) ++
        (0L until 2000L).map(i => (i % 50 + 100L, i, pad)))
        .toDF("k", "seq", "pad")
      val dim = (0L until 200L).map(i => (i, s"d$i")).toDF("k", "name")
      val joined = big.join(dim, "k")
      // collect() (not count()) so THIS DataFrame's adaptive plan is the
      // one that executes and finalizes — count() builds a separate
      // query execution and the original would print isFinalPlan=false
      val n = joined.collect().length
      assert(n == 40000 + 2000, s"join row count $n")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n${finalPlan.take(2000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("saltedJoin rejects small-side-driven join types") {
    val big = spark.range(0, 10).toDF("k")
    val small = spark.range(0, 10).toDF("k2")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Joins.saltedJoin(big, small, big("k"), small("k2"), salt = 4, jt)
      }
      assert(e.getMessage.contains("saltedJoin"), s"join type $jt: ${e.getMessage}")
    }
  }

  test("bucketed join plans without a shuffle exchange") {
    // warehouse dir is a temp dir set at session build (static conf)
    Joins.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 4)
    Joins.writeBucketed(
      Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)

    // sf0.001 tables are broadcast-sized, which bypasses bucketing; force
    // the sort-merge path the layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Joins.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan.take(800))
      // and it's still correct
      val expect = Tables.orders(spark, sf0001)
        .join(Tables.lineitem(spark, sf0001),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
  test("bandJoin equals the brute-force cross product on epsilon windows") {
    import java.sql.Timestamp
    val rng = new scala.util.Random(13)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (1 to 400).map(i =>
      (i.toLong, new Timestamp(base + rng.nextInt(600) * 1000L + rng.nextInt(1000))))
    val df = rows.toDF("id", "ts")
    val a = df.select(col("id").as("id_a"), col("ts").as("ts_a")).repartition(5)
    val b = df.select(col("id").as("id_b"), col("ts").as("ts_b")).repartition(3)
    val got = graft.operators.Joins.bandJoin(a, b, col("ts_a"), col("ts_b"), 1000000L)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expect = (for {
      (i, ti) <- rows; (j, tj) <- rows
      if i < j && math.abs(ti.getTime - tj.getTime) <= 1000
    } yield (i, j)).toSet
    assert(expect.nonEmpty)
    assert(got == expect)
  }
  test("bandJoin bins exactly at day-scale epsilon and pre-1970 timestamps") {
    import java.sql.Timestamp
    val dayUs = 86400L * 1000000L
    // points straddling a day boundary plus pre-epoch negatives
    val ts = Seq(-3L * 86400000L - 1L, -1000L, 0L, 86399999L, 86400000L,
      86400001L, 200L * 86400000L).zipWithIndex
      .map { case (ms, i) => (i.toLong, new Timestamp(ms)) }
    val df = ts.toDF("id", "ts")
    val a = df.select(col("id").as("id_a"), col("ts").as("ts_a"))
    val b = df.select(col("id").as("id_b"), col("ts").as("ts_b"))
    val got = graft.operators.Joins.bandJoin(a, b, col("ts_a"), col("ts_b"), dayUs)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expect = (for {
      (i, ti) <- ts; (j, tj) <- ts
      if i < j && math.abs(ti.getTime - tj.getTime) * 1000L <= dayUs
    } yield (i, j)).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("intervalOverlapJoin equals the brute-force theta join, exactly once per pair") {
    import java.sql.Timestamp
    val rng = new scala.util.Random(29)
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // random closed intervals: lengths from zero-width points to spans
    // covering many hour bins, so multi-bin pairs exercise the
    // first-common-bin dedup
    val rows = (1 to 300).map { i =>
      val s = base + rng.nextInt(48 * 3600) * 1000L
      val len = rng.nextInt(4 * 3600) * 1000L
      (i.toLong, new Timestamp(s), new Timestamp(s + len))
    }
    val df = rows.toDF("id", "t0", "t1")
    val a = df.select(col("id").as("id_a"), col("t0").as("a0"), col("t1").as("a1"))
      .repartition(5)
    val b = df.select(col("id").as("id_b"), col("t0").as("b0"), col("t1").as("b1"))
      .repartition(3)
    val expect = (for {
      (i, s1, e1) <- rows; (j, s2, e2) <- rows
      if i < j && s1.getTime <= e2.getTime && s2.getTime <= e1.getTime
    } yield (i, j)).toSet
    for (binSec <- Seq(600L, 3600L, 86400L)) {
      // collect as a LIST: a duplicate pair (double emission at two
      // shared bins) must fail the exactly-once contract, not vanish
      // into a set
      val got = graft.operators.Joins.intervalOverlapJoin(a, b,
          col("a0"), col("a1"), col("b0"), col("b1"), binSec * 1000000L)
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"duplicate pairs at bin=$binSec s")
      assert(got.toSet == expect, s"pair set diverges at bin=$binSec s")
    }
    assert(expect.nonEmpty)
  }

  test("Temporal.overlapCounts (rank sweep) equals brute-force overlap counting") {
    val rng = new scala.util.Random(31)
    val base = 1700000000000000L // µs
    val rows = (1 to 500).map { i =>
      val s = base + rng.nextInt(48 * 3600).toLong * 1000000L
      (i.toLong, s, s + rng.nextInt(4 * 3600).toLong * 1000000L)
    }
    val df = rows.toDF("id", "t0", "t1").repartition(7)
    val got = graft.operators.Temporal.overlapCounts(df, Seq("id"), "t0", "t1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, s1, e1) =>
      val want = rows.count { case (j, s2, e2) =>
        j != i && s1 <= e2 && s2 <= e1
      }.toLong
      assert(got(i) == want, s"interval $i")
    }
    // ties at exact endpoint equality: touching counts (closed intervals)
    val touch = Seq((1L, 0L, 100L), (2L, 100L, 200L), (3L, 201L, 300L))
      .toDF("id", "t0", "t1")
    val tg = graft.operators.Temporal.overlapCounts(touch, Seq("id"), "t0", "t1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tg == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("intervalOverlapJoin: touching endpoints join; disjoint same-bin pairs don't; end<start fails loudly") {
    import java.sql.Timestamp
    def t(ms: Long) = new Timestamp(ms)
    val h = 3600000L
    val a = Seq((1L, t(0L), t(h))).toDF("id_a", "a0", "a1")
    // touching at exactly a1 == b0 (closed intervals) + a same-bin
    // disjoint interval that a bin-only join would falsely match
    val b = Seq((10L, t(h), t(2 * h)), (11L, t(h + 60000L), t(h + 120000L)))
      .toDF("id_b", "b0", "b1")
    val got = graft.operators.Joins.intervalOverlapJoin(a, b,
        col("a0"), col("a1"), col("b0"), col("b1"), h * 1000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))

    val bad = Seq((2L, t(h), t(0L))).toDF("id_a", "a0", "a1")
    val err = intercept[Exception] {
      graft.operators.Joins.intervalOverlapJoin(bad, b,
          col("a0"), col("a1"), col("b0"), col("b1"), h * 1000L)
        .collect()
    }
    assert(err.getMessage.contains("end < start"), err.getMessage)

    // reversed interval WITHIN one bin: equal bin ids would slip a
    // bin-level guard and emit a bogus pair — the value-level guard
    // must still raise
    val badSameBin = Seq((3L, t(30 * 60000L), t(5 * 60000L)))
      .toDF("id_a", "a0", "a1")
    val err2 = intercept[Exception] {
      graft.operators.Joins.intervalOverlapJoin(badSameBin, b,
          col("a0"), col("a1"), col("b0"), col("b1"), h * 1000L)
        .collect()
    }
    assert(err2.getMessage.contains("end < start"), err2.getMessage)
  }
}

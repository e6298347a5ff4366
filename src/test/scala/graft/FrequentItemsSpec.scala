package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.FrequentItems
import graft.operators.Frequent

/** Misra–Gries summary + the heavy-hitters two-phase operator.
  * The load-bearing property is COMPLETENESS: any item with true count
  * > n/(k+1) must survive every partition split and merge order. */
class FrequentItemsSpec extends SparkTestBase {

  private def agg(k: Int) = FrequentItems(BoundReference(0, LongType, nullable = true), k)

  /** Drive the aggregate driver-side: split `xs` into `cuts` chunks,
    * update each into its own buffer, merge left-to-right, eval. */
  private def summarize(xs: Seq[Long], k: Int, cuts: Seq[Int]): Seq[Long] = {
    val a = agg(k)
    val chunks = if (cuts.isEmpty) Seq(xs) else {
      val bounds = (0 +: cuts.sorted.map(c => math.min(math.max(c, 0), xs.size))) :+ xs.size
      bounds.sliding(2).map { case Seq(lo, hi) => xs.slice(lo, math.max(lo, hi)) }.toSeq
    }
    val merged = chunks.map { chunk =>
      val buf = a.createAggregationBuffer()
      chunk.foreach(x => a.update(buf, InternalRow(x)))
      buf
    }.reduceLeft(a.merge)
    a.eval(merged).asInstanceOf[GenericArrayData].array.toSeq.map(_.asInstanceOf[Long])
  }

  test("property: every item above n/(k+1) survives random splits and merge orders") {
    val gen = for {
      k <- Gen.choose(2, 12)
      // a few hot items + a uniform tail, shuffled
      hot <- Gen.listOfN(3, Gen.choose(0L, 5L))
      hotReps <- Gen.choose(20, 60)
      tail <- Gen.listOfN(80, Gen.choose(100L, 200L))
      seed <- Gen.choose(0L, Long.MaxValue)
      nCuts <- Gen.choose(0, 6)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, 300))
    } yield {
      val xs = new scala.util.Random(seed).shuffle(
        hot.flatMap(h => Seq.fill(hotReps)(h)) ++ tail)
      (xs, k, cuts)
    }
    val prop = Prop.forAll(gen) { case (xs, k, cuts) =>
      val cands = summarize(xs, k, cuts).toSet
      val counts = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val n = xs.size.toLong
      val mustHave = counts.filter { case (_, c) => c * (k + 1) > n }.keySet
      cands.size <= k && mustHave.subsetOf(cands)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("summary is the exact count map while distinct keys fit in k") {
    val xs = Seq(1L, 2L, 1L, 3L, 1L, 2L)
    // k = 3 holds all three keys: no decrement ever fires, so the
    // candidate set is exactly the key set regardless of splits
    (0 to 3).foreach { c =>
      assert(summarize(xs, k = 3, cuts = Seq(c, c + 2)).sorted == Seq(1L, 2L, 3L))
    }
  }

  test("serialization round-trips string keys and counts") {
    val a = FrequentItems(BoundReference(0, StringType, nullable = true), 8)
    val buf = a.createAggregationBuffer()
    Seq("alpha", "beta", "alpha", "gamma", "beta", "alpha").foreach { s =>
      a.update(buf, InternalRow(UTF8String.fromString(s)))
    }
    val back = a.deserialize(a.serialize(buf))
    assert(back == buf)
    assert(back(UTF8String.fromString("alpha")) == 3L)
    val out = a.eval(back).asInstanceOf[GenericArrayData]
      .array.toSeq.map(_.toString)
    assert(out == Seq("alpha", "beta", "gamma")) // sorted ascending
  }

  test("heavyKeys equals the exact groupBy-having answer on sf0.001 orders") {
    val orders = Tables.orders(spark, sf0001).select(col("o_custkey"))
    val got = Frequent.heavyKeys(orders, col("o_custkey"), k = 2048).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perKey = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = perKey.map(_._2).sum
    val nk = perKey.length.toLong
    val want = perKey.filter { case (_, c) => c * nk * 2 >= n * 3 }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("heavyKeys is invariant to the input partitioning") {
    val orders = Tables.orders(spark, sf0001).select(col("o_custkey"))
    graft.operators.Dedup.releaseCaches() // separate memo entries per layout
    val a = Frequent.heavyKeys(orders.repartition(1), col("o_custkey"), k = 2048)
      .collect().toSeq
    graft.operators.Dedup.releaseCaches()
    val b = Frequent.heavyKeys(orders.repartition(13), col("o_custkey"), k = 2048)
      .collect().toSeq
    assert(a == b)
    graft.operators.Dedup.releaseCaches()
  }

  test("string keys end-to-end: frequent tokens match the exact counts") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
    val got = Frequent.heavyKeys(toks, col("tok"), k = 256, numer = 1, denom = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val perKey = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = perKey.map(_._2).sum
    val nk = perKey.length.toLong
    val want = perKey.filter { case (_, c) => c * nk >= n }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    graft.operators.Dedup.releaseCaches()
  }

  test("auto-sized forms equal the fixed-k answers; the cap refuses loudly") {
    val orders = Tables.orders(spark, sf0001).select(col("o_custkey"))
    graft.operators.Dedup.releaseCaches()
    val fixed = Frequent.heavyKeys(orders, col("o_custkey"), k = 2048)
      .collect().toSeq
    graft.operators.Dedup.releaseCaches()
    val auto = Frequent.heavyKeysAuto(orders, col("o_custkey")).collect().toSeq
    assert(auto == fixed)
    intercept[IllegalArgumentException] {
      Frequent.heavyKeysAuto(orders, col("o_custkey"), kCap = 64)
    }
    // boilerplate: kFloor=64 would fail as a FIXED size (the sf0.001
    // corpus needs ~4.7k entries at the 2-doc threshold); auto raises to
    // the deterministic bound and must reproduce the exact scrub
    val docs = Tables.documents(spark, sf0001)
    graft.operators.Dedup.releaseCaches()
    val exact = graft.operators.Boilerplate.scrubFrequent(docs,
      col("doc_id"), col("text"), k = 3, minDocs = 2)
      .orderBy("doc_id").collect().toSeq
    val autoScrub = graft.operators.Boilerplate.scrubFrequentFractionAuto(docs,
      col("doc_id"), col("text"), k = 3, numer = 1, denom = 2000, kFloor = 64)
      .orderBy("doc_id").collect().toSeq
    assert(autoScrub == exact)
    intercept[IllegalArgumentException] {
      graft.operators.Boilerplate.scrubFrequentFractionAuto(docs,
        col("doc_id"), col("text"), kCap = 128)
    }
    // grouped auto: equals the fixed-k grouped form
    val ev = Tables.events(spark, sf0001).select(col("event_type"), col("user_id"))
    graft.operators.Dedup.releaseCaches()
    val gFixed = Frequent.heavyKeysPerGroup(ev, col("event_type"),
      col("user_id"), k = 2048).collect().toSeq
    graft.operators.Dedup.releaseCaches()
    val gAuto = Frequent.heavyKeysPerGroupAuto(ev, col("event_type"),
      col("user_id")).collect().toSeq
    assert(gAuto == gFixed)
    graft.operators.Dedup.releaseCaches()
  }

  test("per-group form equals the exact grouped HAVING on sf0.001 events") {
    val ev = Tables.events(spark, sf0001).select(col("event_type"), col("user_id"))
    graft.operators.Dedup.releaseCaches()
    val got = Frequent.heavyKeysPerGroup(ev, col("event_type"), col("user_id"),
        k = 2048).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perKey = ev.groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = perKey.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val n = rows.map(_._3).sum
      val nk = rows.length.toLong
      rows.filter { case (_, _, c) => c * nk * 2 >= n * 3 }
    }.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.toSeq == want)
    graft.operators.Dedup.releaseCaches()
  }

  test("per-group fraction form equals the exact grouped HAVING; static guard") {
    val ev = Tables.events(spark, sf0001).select(col("event_type"), col("user_id"))
    graft.operators.Dedup.releaseCaches()
    // 2% of each type's events: some users qualify, most don't
    val got = Frequent.heavyKeysPerGroupFraction(ev, col("event_type"),
        col("user_id"), k = 64, numer = 2, denom = 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perKey = ev.groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = perKey.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val n = rows.map(_._3).sum
      rows.filter { case (_, _, c) => c * 100 >= n * 2 }
    }.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.toSeq == want)
    intercept[IllegalArgumentException] {
      Frequent.heavyKeysPerGroupFraction(ev, col("event_type"),
        col("user_id"), k = 16, numer = 2, denom = 100)
    }
    graft.operators.Dedup.releaseCaches()
  }

  test("fraction form matches the exact answer and rejects a statically undersized k") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
    graft.operators.Dedup.releaseCaches()
    val got = Frequent.heavyKeysFraction(toks, col("tok"), k = 48, numer = 32, denom = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val perKey = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = perKey.map(_._2).sum
    val want = perKey.filter { case (_, c) => c * 1000 >= n * 32 }.sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // numer*(k+1) must exceed denom: 32*(k+1) > 1000 needs k >= 31
    intercept[IllegalArgumentException] {
      Frequent.heavyKeysFraction(toks, col("tok"), k = 16, numer = 32, denom = 1000)
    }
    graft.operators.Dedup.releaseCaches()
  }

  test("undersized k fails loud instead of returning a silently incomplete answer") {
    val orders = Tables.orders(spark, sf0001).select(col("o_custkey"))
    graft.operators.Dedup.releaseCaches()
    val ex = intercept[Exception] {
      // ~150 distinct custkeys: k=4 cannot guarantee 1.5x-mean completeness
      Frequent.heavyKeys(orders, col("o_custkey"), k = 4).collect()
    }
    assert(ex.getMessage != null)
    graft.operators.Dedup.releaseCaches()
  }
}

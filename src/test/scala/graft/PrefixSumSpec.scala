package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, PrefixSum}

/** Direct spec for the shared two-phase prefix sum ([[PrefixSum]]) —
  * the scale-safe running-sum kernel behind `corpus_pack`'s token
  * offsets and `classifier_calibration`'s cumulative confusion counts.
  * The consumers' own specs assert plan shape end-to-end; this one
  * pins the kernel's CONTRACT: inclusive cumulative sums under the
  * requested total order, for any column set, any order direction, any
  * partition count — equal to a driver-side scanLeft. */
class PrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  test("running sums equal a driver-side scan under ascending key order") {
    val df = (1L to 1000L).map(k => (k, k % 7, k % 3)).toDF("k", "a", "b")
      .repartition(13) // scatter the input; runningSums must re-range
    val got = PrefixSum.runningSums(df, order = Seq(col("k")),
        values = Seq("a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    var (ca, cb) = (0L, 0L)
    val want = (1L to 1000L).map { k =>
      ca += k % 7; cb += k % 3; (k, k % 7, k % 3, ca, cb)
    }
    assert(got == want)
    Dedup.releaseCaches()
  }

  test("descending order and random values match scanLeft; property over seeds") {
    val gen = for {
      n <- Gen.choose(1, 400)
      vs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield vs
    val prop = Prop.forAll(gen) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = PrefixSum.runningSums(rows.toDF("k", "v"),
          order = Seq(col("k").desc), values = Seq("v"))
        .as[(Long, Long, Long)].collect().sortBy(-_._1).toSeq
      val want = rows.sortBy(-_._1)
        .scanLeft((0L, 0L, 0L)) { case ((_, _, c), (k, v)) => (k, v, c + v) }
        .tail
      Dedup.releaseCaches()
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("empty input and single row are well-defined") {
    val empty = PrefixSum.runningSums(
      Seq.empty[(Long, Long)].toDF("k", "v"),
      order = Seq(col("k")), values = Seq("v"))
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq == Seq("k", "v", "v_cum"))
    val one = PrefixSum.runningSums(Seq((7L, 42L)).toDF("k", "v"),
        order = Seq(col("k")), values = Seq("v"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(one == Seq((7L, 42L, 42L)))
    Dedup.releaseCaches()
  }
}

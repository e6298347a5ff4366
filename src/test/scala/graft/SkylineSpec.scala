package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Skyline

/** [[graft.operators.Skyline.skyline2d]] against the O(n²) dominance
  * definition: a row is on the front iff NO other row is ≤ in both
  * coordinates and < in at least one. Points are drawn from a small grid
  * so coordinate duplicates (ties on x, on y, and on BOTH) occur
  * constantly — the tie rule (equal points dominate in neither
  * direction, both surface) is the part a naive strict-< formulation
  * gets wrong. The registered `skyline` query adds the DuckDB
  * NOT-EXISTS gate on real data; this spec covers the adversarial
  * corners randomized data finds. */
class SkylineSpec extends SparkTestBase {

  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)]): Seq[Boolean] =
    pts.map { case (x, y) =>
      !pts.exists { case (bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }

  private def check(pts: Seq[(Long, Long)]): Unit = {
    val df = pts.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "x", "y")
      .select(col("id"), col("is_skyline"))
      .as[(Long, Boolean)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == brute(pts),
      s"skyline2d disagrees with brute force on ${pts.take(50)}")
  }

  test("skyline2d ≡ brute-force dominance on a dense tie-heavy grid") {
    // every point of a 6×6 grid twice: maximal coordinate duplication —
    // only (0,0) is on the front, and BOTH copies of it must be flagged
    val grid = for (x <- 0L to 5L; y <- 0L to 5L; _ <- 1 to 2) yield (x, y)
    check(grid)
    val flags = brute(grid)
    assert(flags.count(identity) == 2, "both copies of the minimum surface")
  }

  test("skyline2d ≡ brute-force on an anti-chain (everything on the front)") {
    // strictly decreasing y over increasing x: nothing dominates anything
    check((0L to 20L).map(i => (i, 20L - i)))
  }

  test("skyline2d ≡ brute-force on a chain (only the minimum survives)") {
    check((0L to 20L).map(i => (i, i)))
  }

  test("skyline2d ≡ brute-force dominance on random tie-heavy points") {
    val gen = for {
      n <- Gen.choose(1, 120)
      pts <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    } yield pts
    val prop = Prop.forAll(gen) { pts => check(pts); true }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("skylineND ≡ brute-force dominance in 3-D, duplicates restored, cap is loud") {
    val rng = new scala.util.Random(11)
    // tie-heavy 3-D points with deliberate full-coordinate duplicates
    val pts = Seq.fill(300)((rng.nextInt(5).toLong, rng.nextInt(5).toLong,
      rng.nextInt(5).toLong)) ++ Seq((0L, 4L, 2L), (0L, 4L, 2L))
    val df = pts.zipWithIndex.map { case ((x, y, z), i) => (i.toLong, x, y, z) }
      .toDF("id", "x", "y", "z")
    val got = Skyline.skylineND(df, Seq("x", "y", "z"))
      .select("id").as[Long].collect().toSet
    val want = pts.zipWithIndex.collect {
      case (p, i) if !pts.exists(q =>
        q._1 <= p._1 && q._2 <= p._2 && q._3 <= p._3 && q != p &&
          !(q._1 == p._1 && q._2 == p._2 && q._3 == p._3)) => i.toLong
    }.toSet
    assert(got == want && got.nonEmpty)
    // every coordinate-duplicate of a front point surfaces
    val frontCoords = pts.zipWithIndex.filter(p => want(p._2.toLong)).map(_._1).toSet
    val dupIds = pts.zipWithIndex.filter(p => frontCoords(p._1)).map(_._2.toLong).toSet
    assert(dupIds == got)
    // 2-D agreement with the prefix-min operator on the same points
    val nd2 = Skyline.skylineND(df, Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    val flag2 = Skyline.skyline2d(df, "x", "y")
      .filter(col("is_skyline")).select("id").as[Long].collect().toSet
    assert(nd2 == flag2)
    // the cap refuses loudly instead of truncating — on an anti-chain
    // (x+y+z constant: nothing dominates anything, the front is ALL
    // points; the random-grid df above almost surely contains (0,0,0)
    // and folds to a single-coordinate front that no cap can bind)
    val anti = (for (i <- 0L to 9L; j <- 0L to 9L - i)
      yield (i, j, 9L - i - j)).toDF("x", "y", "z")
    val err = intercept[IllegalArgumentException] {
      Skyline.skylineND(anti, Seq("x", "y", "z"), maxFrontRows = 10)
    }
    assert(err.getMessage.contains("front rows exceed"))
  }

  test("skylineND rejects non-integral dims and null dim values loudly") {
    // doubles would be silently truncated to long — the operator refuses
    // and tells the caller to quantize explicitly
    val dbl = Seq((1.5, 2L), (0.5, 3L)).toDF("x", "y")
    val terr = intercept[IllegalArgumentException] {
      Skyline.skylineND(dbl, Seq("x", "y"))
    }
    assert(terr.getMessage.contains("must be integral"))
    // a null dim value fails the job with the contract message, never an
    // executor NPE or a silently-dropped row
    val withNull = Seq((Some(1L), 2L), (None, 3L))
      .toDF("x", "y")
    val nerr = intercept[org.apache.spark.SparkException] {
      Skyline.skylineND(withNull, Seq("x", "y")).collect()
    }
    assert(nerr.getMessage.contains("undefined on null") ||
      Option(nerr.getCause).exists(_.getMessage.contains("undefined on null")))
  }

  test("skylineND front-of-fronts: driver collect is bounded by the true front") {
    // many partitions of a chain (only the global minimum survives): the
    // coalesced second fold must hand the driver exactly ONE row even
    // though every partition contributes a local front
    val chain = (0L until 2000L).map(i => (i, i, i)).toDF("x", "y", "z")
      .repartition(16)
    val got = Skyline.skylineND(chain, Seq("x", "y", "z"), maxFrontRows = 1)
    // cap=1 passes ⇔ the collect saw the merged front, not the union of
    // 16 local fronts (which would be ≥ 16 rows and trip the loud cap)
    assert(got.select("x").as[Long].collect().toSeq == Seq(0L))
  }

  test("skyline plans no single-task global window over row-scaled data") {
    // the only empty-partitionSpec Window allowed is the O(P)
    // partition-bases prefix-min — its input must be the __pid-grouped
    // aggregate (one row per partition), never the row-scaled frame
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def globalWindows(p: SparkPlan): Seq[WindowExec] = p.collect {
      case a: AdaptiveSparkPlanExec => globalWindows(a.inputPlan)
      case c: InMemoryTableScanExec => globalWindows(c.relation.cachedPlan)
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
    }.flatten
    def pidBounded(p: SparkPlan): Boolean =
      p.collectFirst {
        case a: BaseAggregateExec
            if a.groupingExpressions.exists(_.toString.contains("__pid")) => a
        case c: InMemoryTableScanExec if pidBounded(c.relation.cachedPlan) => c
        case a: AdaptiveSparkPlanExec if pidBounded(a.inputPlan) => a
      }.nonEmpty
    val df = SparkEntry.queries("skyline")(spark, sf0001)
    val globals = globalWindows(df.queryExecution.executedPlan)
    assert(globals.nonEmpty, "expected the bounded partition-bases window")
    globals.foreach { w =>
      assert(pidBounded(w.child),
        s"global window over a frame not bounded by the __pid aggregate:\n" +
          w.child.toString.take(1200))
    }
  }
}

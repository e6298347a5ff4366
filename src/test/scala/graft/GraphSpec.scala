package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Graph}

/** Weighted PageRank: agreement with an independent driver-side
  * reference, mass conservation, dangling-node handling. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent in-memory reference — same dangling redistribution. */
  private def refPageRank(edges: Seq[(Long, Long, Double)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      edges.foreach { case (s, t, w) =>
        contrib(t) += r(s) * (w / outW(s))
      }
      // same dangling formulation as the engine: Σ rank over
      // out-edge-less nodes (not 1 − flowed — float-identical only up
      // to rounding, and the spec tolerance should not absorb that)
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (contrib(v) + dangling / n))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Double)], iters: Int)
      : Map[Long, Double] = {
    val df = edges.toDF("src", "dst", "w")
    val out = Graph.pageRank(df, col("src"), col("dst"), col("w"), iters)
      .as[(Long, Double)].collect().toMap
    Dedup.releaseCaches()
    out
  }

  test("matches the reference on a hand graph with a dangling node") {
    // 1 -> 2 -> 3, 3 dangling; 1 also -> 3 with half the weight
    val edges = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    val got = run(edges, iters = 10)
    val want = refPageRank(edges, iters = 10)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"$k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
    // the sink accumulates the most mass
    assert(got.maxBy(_._2)._1 == 3L)
  }

  test("property: agrees with the reference on random weighted graphs") {
    val gen = for {
      n <- Gen.choose(2, 8)
      m <- Gen.choose(1, 20)
      es <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n.toLong - 1)
        t <- Gen.choose(0L, n.toLong - 1)
        w <- Gen.choose(1, 9)
      } yield (s, t, w.toDouble))
    } yield es.distinct
    val prop = Prop.forAll(gen) { es =>
      es.isEmpty || {
        val got = run(es, iters = 5)
        val want = refPageRank(es, iters = 5)
        got.keySet == want.keySet &&
          got.forall { case (k, v) => math.abs(v - want(k)) < 1e-9 }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("zero-out-weight sources route through dangling; mass stays conserved") {
    // node 1's weights cancel to 0: normalizing would make p NULL and
    // silently drop its rank mass — the operator must treat it as
    // dangling instead (ADVICE r6)
    val edges = Seq((1L, 2L, 1.0), (1L, 3L, -1.0), (2L, 3L, 1.0))
    val got = run(edges, iters = 10)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(v => !v.isNaN && v > 0))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // structure: 3 is the sink fed by 2; 1 contributes only dangling mass
    assert(got(3L) > got(2L))
  }

  test("fixed-point pageRank: early stop is bitwise-equal to fixed iterations") {
    // a regular graph: uniform ranks are the exact integer fixed point
    // after round 1, so earlyStop cuts 49 of 50 rounds — and must still
    // equal the full run bit for bit
    val ring = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 0L, 1L))
    def runFp(early: Boolean, iters: Int): Map[Long, Long] = {
      val out = Graph.pageRankFixedPoint(ring.toDF("src", "dst", "w"),
          col("src"), col("dst"), col("w"), iters = iters, earlyStop = early)
        .as[(Long, Long)].collect().toMap
      Dedup.releaseCaches()
      out
    }
    val fast = runFp(early = true, iters = 50)
    val full = runFp(early = false, iters = 50)
    assert(fast == full)
    assert(fast.values.toSet.size == 1) // uniform on the regular ring
    // an irregular graph (no early fixed point within 6 rounds): the
    // probe must not perturb the trajectory either
    val irr = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L))
    def runIrr(early: Boolean): Map[Long, Long] = {
      val out = Graph.pageRankFixedPoint(irr.toDF("src", "dst", "w"),
          col("src"), col("dst"), col("w"), iters = 6, earlyStop = early)
        .as[(Long, Long)].collect().toMap
      Dedup.releaseCaches()
      out
    }
    assert(runIrr(true) == runIrr(false))
  }

  test("fixed-point pageRank matches the float reference to truncation precision") {
    val edges = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L))
    val got = Graph.pageRankFixedPoint(edges.toDF("src", "dst", "w"),
        col("src"), col("dst"), col("w"), iters = 10)
      .as[(Long, Long)].collect().toMap
    Dedup.releaseCaches()
    val want = refPageRank(edges.map(e => (e._1, e._2, e._3.toDouble)), iters = 10)
    got.foreach { case (k, v) =>
      assert(math.abs(v / 1e12 - want(k)) < 1e-9, s"node $k")
    }
  }

  test("fixed-point pageRank rejects nonpositive weights loudly") {
    val bad = Seq((1L, 2L, 0L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      Graph.pageRankFixedPoint(bad, col("src"), col("dst"), col("w"))
    }
    Dedup.releaseCaches()
  }

  test("graph_pagerank emits a total rank order over every trading nation") {
    val out = SparkEntry.queries("graph_pagerank")(spark, sf0001)
      .as[(Int, Int)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_._2).sorted == (1 to out.length))
    assert(out.map(_._1).distinct.length == out.length)
    // deterministic across constructions
    val again = SparkEntry.queries("graph_pagerank")(spark, sf0001)
      .as[(Int, Int)].collect().toSeq
    assert(out == again)
    Dedup.releaseCaches()
  }

  // --- triangle census / BFS ------------------------------------------

  private def refTriangles(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    // (n_edges, n_wedges, n_triangles) by brute force over the distinct
    // undirected edge set, wedges under the engine's (deg, id) orientation
    val e = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct
    val eset = e.toSet
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    def ord(n: Long) = (deg(n), n)
    val out = e.map { case (u, v) =>
      if (Ordering[(Long, Long)].lt(ord(u), ord(v))) (u, v) else (v, u)
    }
    val wedges = out.groupBy(_._1).values
      .map { es => val c = es.size.toLong; c * (c - 1) / 2 }.sum
    val nodes = deg.keys.toSeq.sorted
    val tris = (for {
      i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
      u = nodes(i); v = nodes(j); w = nodes(k)
      if eset((u, v)) && eset((u, w)) && eset((v, w))
    } yield 1).size.toLong
    (e.size.toLong, wedges, tris)
  }

  test("triangleStats ≡ brute force on hand graphs (star has zero triangles)") {
    // star: the hot-vertex case the degree orientation exists for
    val star = (2L to 12L).map(i => (1L, i))
    val sdf = star.toDF("a", "b")
    val s = Graph.triangleStats(sdf, col("a"), col("b"))
      .as[(Long, Long, Long, Long)].head()
    assert(s == ((12L, 11L, 0L, 0L)), s"star stats $s")
    // K4: every triple closes
    val k4 = for (i <- 1L to 4L; j <- i + 1 to 4L) yield (i, j)
    val k = Graph.triangleStats(k4.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Long)].head()
    assert(k == ((4L, 6L, 4L, 4L)), s"K4 stats $k")
    Dedup.releaseCaches()
  }

  test("property: triangleStats ≡ brute force on random multigraph input") {
    val gen = for {
      n <- Gen.choose(3, 24)
      m <- Gen.choose(1, 80)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(1L, n.toLong), Gen.choose(1L, n.toLong)))
    } yield es.filter(p => p._1 != p._2)
    val prop = Prop.forAll(gen) { es =>
      es.isEmpty || {
        val got = Graph.triangleStats(es.toDF("a", "b"), col("a"), col("b"))
          .as[(Long, Long, Long, Long)].head()
        Dedup.releaseCaches()
        val (ne, nw, nt) = refTriangles(es)
        (got._2, got._3, got._4) == ((ne, nw, nt))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
    Dedup.releaseCaches()
  }

  private def refBfs(edges: Seq[(Long, Long)], seeds: Seq[Long]): Map[Long, Int] = {
    val adj = (edges ++ edges.map(_.swap)).filter(p => p._1 != p._2)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    var dist = seeds.distinct.map(_ -> 0).toMap
    var frontier = seeds.distinct
    var h = 0
    while (frontier.nonEmpty) {
      h += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      next.foreach(n => dist += n -> h)
      frontier = next
    }
    dist
  }

  test("bfsHops: exact min hops on a path graph, unreachable nodes absent") {
    // path 1-2-3-4-5 plus isolated edge 10-11; seed 1
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val seeds = Seq(1L).toDF("s")
    val got = Graph.bfsHops(es.toDF("a", "b"), col("a"), col("b"),
        seeds, col("s"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    Dedup.releaseCaches()
  }

  private def refSssp(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      cap: Long): Map[Long, Long] = {
    // driver Dijkstra over the min-weight-canonicalized undirected graph
    val adj = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((x, y), es) => (x, y, es.map(_._3).min) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(e => (e._2, e._3)).toSeq }
    val dist = scala.collection.mutable.Map[Long, Long](seeds.distinct.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue[(Long, Long)](
      seeds.distinct.map(s => (0L, s)): _*)(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, n) = pq.dequeue()
      if (dist(n) == d) adj.getOrElse(n, Nil).foreach { case (m, w) =>
        val nd = d + w
        if (nd <= cap && nd < dist.getOrElse(m, Long.MaxValue)) {
          dist(m) = nd; pq.enqueue((nd, m))
        }
      }
    }
    dist.toMap
  }

  test("ssspFixed: exact weighted distances on a hand graph, cap honored") {
    // 1 -2- 2 -2- 3 and a direct heavy edge 1-3 (weight 5): path wins
    val es = Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 5L), (4L, 5L, 9L))
    val got = Graph.ssspFixed(es.toDF("a", "b", "w"), col("a"), col("b"),
        col("w"), Seq(1L).toDF("s"), col("s"), maxDist = 6L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 4L)) // 4-5 unreachable, 9 > cap anyway
    Dedup.releaseCaches()
  }

  test("property: ssspFixed ≡ driver Dijkstra on random weighted multigraphs") {
    val gen = for {
      n <- Gen.choose(3, 25)
      m <- Gen.choose(1, 60)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(1L, n.toLong),
        Gen.choose(1L, n.toLong), Gen.choose(1L, 4L)))
      nSeeds <- Gen.choose(1, 3)
      seeds <- Gen.listOfN(nSeeds, Gen.choose(1L, n.toLong))
    } yield (es.filter(e => e._1 != e._2), seeds)
    val prop = Prop.forAll(gen) { case (es, seeds) =>
      es.isEmpty || {
        val got = Graph.ssspFixed(es.toDF("a", "b", "w"), col("a"),
            col("b"), col("w"), seeds.toDF("s"), col("s"), maxDist = 10L)
          .as[(Long, Long)].collect().toMap
        Dedup.releaseCaches()
        got == refSssp(es, seeds, cap = 10L)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
    Dedup.releaseCaches()
  }

  test("property: bfsHops ≡ driver BFS on random graphs with multi-source seeds") {
    val gen = for {
      n <- Gen.choose(3, 30)
      m <- Gen.choose(1, 70)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(1L, n.toLong), Gen.choose(1L, n.toLong)))
      nSeeds <- Gen.choose(1, 3)
      seeds <- Gen.listOfN(nSeeds, Gen.choose(1L, n.toLong))
    } yield (es.filter(p => p._1 != p._2), seeds)
    val prop = Prop.forAll(gen) { case (es, seeds) =>
      es.isEmpty || {
        val got = Graph.bfsHops(es.toDF("a", "b"), col("a"), col("b"),
            seeds.toDF("s"), col("s"))
          .as[(Long, Int)].collect().toMap
        Dedup.releaseCaches()
        got == refBfs(es, seeds)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
    Dedup.releaseCaches()
  }

  /** Reference peel: repeatedly delete nodes with degree < k. */
  private def refKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = edges.flatMap { case (x, y) => Seq((x, y), (y, x)) }
      .filter(p => p._1 != p._2).distinct
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(p => keep(p._1) && keep(p._2))
      changed = next.size != es.size
      es = next
    }
    es.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("kCore: hand graph (clique survives, tail peels in a cascade) + loud non-convergence") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus a path 4-5-6: the 3-core is exactly the K4;
    // node 5 only falls below degree 3 AFTER 6 is deleted — the cascade
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = graft.operators.Graph.kCore(
        edges.toDF("a", "b"), col("a"), col("b"), k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max core: empty, converged, no crash
    assert(graft.operators.Graph.kCore(
      edges.toDF("a", "b"), col("a"), col("b"), k = 4).isEmpty)
    // maxIter too small for the cascade raises, never truncates silently
    val err = intercept[IllegalStateException] {
      graft.operators.Graph.kCore(
        edges.toDF("a", "b"), col("a"), col("b"), k = 3, maxIter = 1)
    }
    assert(err.getMessage.contains("converge"))
  }

  test("kCore ≡ the reference peel on the sf0.001 co-purchase graph") {
    val li = Tables.lineitem(spark, sf0001)
      .filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_partkey")
    val a = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val edges = a.join(b, "l_orderkey")
      .filter(col("pa") < col("pb")).select("pa", "pb").distinct()
    val es = edges.as[(Long, Long)].collect().toSeq
    for (k <- Seq(2, 4, 6)) {
      val got = graft.operators.Graph.kCore(edges, col("pa"), col("pb"), k)
        .as[(Long, Long)].collect().toMap
      assert(got == refKcore(es, k), s"k=$k")
    }
  }
}

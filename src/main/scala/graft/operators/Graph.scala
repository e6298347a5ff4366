package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms beyond the connected-components family
  * ([[Dedup.connectedComponentsAuto]]): weighted PageRank, the standard
  * authority weighting for web-domain quality scoring in crawl-corpus
  * curation (rank domains by the link graph, downweight low-authority
  * sources).
  *
  * Each iteration is ONE shuffle: `ranks ⋈ edges` on the source key
  * (broadcast when ranks fit, hash otherwise) followed by a `groupBy`
  * on the destination — map-side partial sums, nothing quadratic. The
  * edge table is normalized (per-source out-weight sums) once and
  * persisted; ranks stay `(node, rank)`-shaped so N iterations cost N
  * equi-join+agg rounds over a frame the size of the node set, the
  * textbook Pregel-on-DataFrames shape. Dangling mass (nodes with no
  * out-edges) is redistributed uniformly each round, keeping Σrank = 1
  * exactly up to float rounding — GraphSpec asserts conservation and
  * agreement with an independent driver-side reference. */
object Graph {

  /** Weighted PageRank over `edges` (src, dst, weight), `iters` rounds
    * at damping `d`. Returns (node, rank); nodes = every src or dst.
    * Float determinism: per-run deterministic plans, but rank VALUES are
    * float sums over shuffled partitions — registered queries emit
    * ranks' ORDER, not the doubles (SURVEY §7 rule 5), or go rows-only. */
  def pageRank(edges: DataFrame, src: Column, dst: Column, weight: Column,
      iters: Int = 10, d: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val spark = edges.sparkSession
    val e0 = edges.select(src.as("src"), dst.as("dst"),
      weight.cast("double").as("w"))
    // normalize out-weights once; persisted — every iteration re-reads
    // it. Sources whose weights sum to <= 0 (or to NULL via NULL
    // weights) are excluded from normalization — w/wout would be NULL
    // or nonsense and their mass would silently vanish from Σrank — and
    // instead fall through to the dangling term below (srcs is computed
    // from NORM, not e0, so a zero-out-weight node is "dangling" by
    // construction and its mass is redistributed, conserving Σrank = 1).
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      .filter(col("wout") > 0)
    val norm = Dedup.memoPersist(
      e0.join(outW, "src")
        .select(col("src"), col("dst"), (col("w") / col("wout")).as("p")))
    val nodes = Dedup.memoPersist(
      e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct())
    val srcs = Dedup.memoPersist(norm.select(col("src").as("node")).distinct())
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(norm, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("p")).as("in_mass"))
      // dangling mass = Σ rank over out-edge-less nodes, folded in as a
      // 1-row broadcast — NO driver action inside the loop (an earlier
      // `first()`-per-round form cost a full job round-trip each
      // iteration)
      val dang = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      // localCheckpoint (eager) truncates the logical plan each round —
      // without it every round re-analyzes the whole nested lineage and
      // planning cost is O(iters²) (measured 1.5 s/round of pure
      // planning on a 25-node graph); it also materializes ranks once
      // though the next round consumes it twice (contrib + dangling).
      // Non-reliable storage is the right trade for an iterative
      // refinement: executor loss costs a re-run, not correctness.
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit((1 - d) / n) + lit(d) *
            (coalesce(col("in_mass"), lit(0.0)) + col("dmass") / n))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** **Fixed-point PageRank**: the same per-round shape as [[pageRank]]
    * — ranks ⋈ edges on the source key, groupBy destination, dangling
    * mass as a 1-row broadcast — but every quantity is an INTEGER
    * multiple of 1/`scale`, and every division is integer division. That
    * buys two things float ranks cannot have:
    *
    *  - a full DuckDB hash oracle: integer `+`/`*`/`div` are exact and
    *    associative, so shuffle order cannot perturb a single bit and
    *    the registered query hash-matches an unrolled-CTE SQL replay —
    *    the engine's own no-float-sums discipline, applied to the one
    *    operator that was rows-only;
    *  - a self-limiting iteration: the integer map reaches an EXACT
    *    fixed point (delta == 0), after which every further round is the
    *    identity — so stopping early is bitwise-equal to running all
    *    `iters` rounds (GraphSpec asserts it), and the oracle just runs
    *    the full unroll.
    *
    * Per round, node i receives Σ_in (rank_src · w) div wout — each
    * edge's term truncated independently, so the sum is order-free —
    * then rank' = (1000−dNum)·scale div (1000·n) + dNum·(in + dang div n)
    * div 1000. Truncation loses ≤ 1/scale per edge per round: at
    * scale = 10¹² the registered 25-node ranks are exact to ~10⁻¹⁰,
    * while rank·w stays < 2⁶³ for edge weights up to ~9·10⁶ (require'd).
    * Weights must be positive integers (counts, cents — quantize
    * upstream); the early-stop probe is one bounded `limit(1)` job per
    * round over the node-sized frame. */
  def pageRankFixedPoint(edges: DataFrame, src: Column, dst: Column,
      weight: Column, iters: Int = 20, dNum: Int = 850,
      scale: Long = 1000000000000L, earlyStop: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    require(dNum > 0 && dNum < 1000, s"dNum must be in (0, 1000) (got $dNum)")
    val e0 = Dedup.memoPersist(
      edges.select(src.as("src"), dst.as("dst"), weight.cast("long").as("w")))
    // positive-weight guard (the float operator routes wout<=0 through
    // dangling; here a nonpositive or null weight means the caller
    // skipped quantization — fail loudly): one bounded 1-row probe.
    // rank can reach ~scale (all mass on one node), so rank*w must stay
    // under Long.MaxValue — the admissible weight ceiling is
    // Long.MaxValue/scale (~9.2e6 at the default scale), tracked from
    // the scale parameter rather than hard-coded.
    val wMax = Long.MaxValue / scale
    val bad = e0.filter(col("w").isNull || col("w") <= 0 ||
      col("w") > wMax).limit(1).collect()
    require(bad.isEmpty,
      s"pageRankFixedPoint needs integer weights in (0, $wMax] " +
        s"(Long.MaxValue/scale keeps rank*w exact); got ${bad.mkString}")
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val eN = Dedup.memoPersist(e0.join(outW, "src")
      .select(col("src"), col("dst"), col("w"), col("wout")))
    val nodes = Dedup.memoPersist(
      e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct())
    val srcs = Dedup.memoPersist(eN.select(col("src").as("node")).distinct())
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(scale / n))
    var round = 0
    var converged = false
    while (round < iters && !converged) {
      val contrib = ranks.join(eN, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("(rank * w) div wout")).as("in_mass"))
      val dang = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
      val next = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit((1000L - dNum) * scale / (1000L * n)) +
            expr(s"$dNum * (coalesce(in_mass, 0L) + dmass div $n) div 1000"))
            .as("rank"))
        .localCheckpoint()
      if (earlyStop)
        converged = next.join(ranks.withColumnRenamed("rank", "__prev"), "node")
          .filter(col("rank") =!= col("__prev")).limit(1).collect().isEmpty
      ranks = next
      round += 1
    }
    ranks
  }
}

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
    // normalize out-weights once; persisted — every iteration re-reads it
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("wout"))
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
}

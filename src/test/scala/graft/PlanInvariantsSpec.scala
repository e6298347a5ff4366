package graft

/** Plan-shape regression guard over EVERY registered query: no broadcast
  * nested loop or cartesian product may appear except where the all-pairs
  * scan IS the documented operator. A new query (or a refactor of an old
  * one) that silently plans a cross product fails here, not in a 100 TB
  * run. */
class PlanInvariantsSpec extends SparkTestBase {

  /** Queries whose plan is intentionally all-pairs:
    *  - scalar_subquery: 1-row broadcast cross join (the scalar value);
    *  - sparse_cosine: same shape — the corpus size enters the stop-gram
    *    cutoff as a grouping-free aggregate, provably 1 row, broadcast;
    *  - vector_topk: the exact brute-force baseline — tiny query side
    *    broadcast against the candidate scan, with annTopK/ivfTopK as the
    *    documented scale paths;
    *  - semantic_dedup: the cell-assignment argmax joins each corpus row
    *    against the BROADCAST nCells-row seeds frame (bounded side ships,
    *    corpus never moves; partial-agg argmax collapses the expansion
    *    map-side) — the scalar_subquery shape with nCells rows. */
  private val intendedAllPairs =
    Set("scalar_subquery", "sparse_cosine", "vector_topk", "semantic_dedup")

  private val forbidden = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without nested-loop/cartesian joins") {
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      val hits = forbidden.filter(plan.contains)
      if (intendedAllPairs(name)) {
        // documented exception — but it must stay a BROADCAST nested loop
        // (small side shipped), never a full cartesian shuffle
        assert(!plan.contains("CartesianProduct"), plan.take(1200))
      } else {
        assert(hits.isEmpty,
          s"$name plan contains ${hits.mkString(", ")}\n${plan.take(1200)}")
      }
    }
  }
}

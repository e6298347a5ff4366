package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}

/** Scan-parallelism repair for CPU-dense operators (r14 optimization
  * round; guide §2.5 "input skew: one huge unsplittable file …
  * repartition immediately after the read").
  *
  * The failure mode: a corpus that arrives as few (or single-row-group)
  * files plans as a handful of scan partitions, and every per-row-heavy
  * projection BEFORE the first exchange — md5-per-token featureization,
  * segment hashing, per-pair dot products, conditional-aggregate scans —
  * runs on that handful of tasks while the rest of the cluster idles
  * (the r14 baseline's par≈1.5 cluster: quality_classifier,
  * exact_pct_search, boilerplate_frequent, column_stats …).
  *
  * [[cpuHeavy]] round-robins such a frame up to the session's shuffle
  * parallelism — but ONLY when the planned scan is narrower than that,
  * so at real scale (thousands of input splits) it is a no-op and the
  * plan keeps its shuffle-free shape. The exchange it inserts moves the
  * raw rows once; every call site below pays it only because the stage
  * it feeds is measured ≫ the exchange (the [[graft.operators
  * .EntityResolution]] precedent, where the same trade measured
  * 4.5 s → 1.3 s).
  *
  * Scan-rooted frames only — and since r15 that precondition is
  * ENFORCED, not just documented (r14 advice): the partition-count
  * probe (`.rdd`) plans but never runs a job on a scan/Project/Filter
  * chain, while on a post-shuffle frame it would materialize AQE query
  * stages eagerly (running jobs at construction that the later
  * execution does not reuse). [[cpuHeavy]] now inspects the analyzed
  * plan and passes anything that is not a Project/Filter/alias chain
  * over a leaf through untouched — the safe default for the public
  * operators that accept arbitrary frames (Boilerplate.scrubFrequent*,
  * Sampling.quantilesBySearch): a frame with an upstream exchange
  * already has that shuffle's parallelism. Streaming frames pass
  * through untouched: their parallelism is the source's.
  * Round-robin repartition is deterministic under retries (Spark sorts
  * before round-robin, SPARK-23207) and every caller's arithmetic is
  * partition-order-free (integer/decimal sums, exact counts, per-row
  * projections), so oracle hashes are unchanged — asserted per caller by
  * the driver gate. */
object Spread {

  def cpuHeavy(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    if (!scanRooted(df.queryExecution.analyzed)) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** True iff the analyzed plan is a Project/Filter/alias chain over a
    * single leaf — the shapes whose `.rdd` probe is plan-only. Anything
    * else (joins, aggregates, repartitions, unions) either already owns
    * an exchange's parallelism or would pay eager AQE stage
    * materialization for the probe. */
  private def scanRooted(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case Project(_, child) => scanRooted(child)
    case Filter(_, child) => scanRooted(child)
    case SubqueryAlias(_, child) => scanRooted(child)
    case _ => false
  }
}

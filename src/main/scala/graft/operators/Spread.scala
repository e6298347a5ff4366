package graft.operators

import org.apache.spark.sql.DataFrame

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
  * Call on scan-rooted frames only (a scan/projection has no exchanges,
  * so probing its partition count plans but never runs a job — probing
  * a post-shuffle frame under AQE would materialize stages). Streaming
  * frames pass through untouched: their parallelism is the source's.
  * Round-robin repartition is deterministic under retries (Spark sorts
  * before round-robin, SPARK-23207) and every caller's arithmetic is
  * partition-order-free (integer/decimal sums, exact counts, per-row
  * projections), so oracle hashes are unchanged — asserted per caller by
  * the driver gate. */
object Spread {

  def cpuHeavy(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }
}

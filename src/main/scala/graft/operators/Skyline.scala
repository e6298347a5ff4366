package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-front (skyline) computation — the "not dominated by any other
  * row" filter (minimize all dimensions; a row dominates another when it
  * is ≤ in every dimension and < in at least one). The reference has no
  * such operator; a data-curation pipeline uses it to pick
  * non-dominated configurations (cost vs quality trade-off rows).
  *
  * The naive formulation is the O(n²) NOT-EXISTS self-join — that is
  * exactly what the DuckDB oracle runs, so the driver gate proves this
  * linear formulation equivalent on real data. The engine's 2-D shape:
  *
  *   1. fold to one row per distinct x: `gmin(x) = min(y)` — a map-side
  *      partial aggregate, the only full-data shuffle;
  *   2. prefix-min over x-order in the two-phase [[PrefixSum]] pattern
  *      (range partition → in-partition running min → O(P) partition
  *      bases broadcast) — never a single-task global window;
  *   3. join the per-x `pm` (min y at price ≤ x) and `m1` (min y at
  *      price < x) back and flag each row:
  *      `skyline ⇔ y == pm(x) ∧ (m1(x) is null ∨ m1(x) > y)`
  *      (`y == pm` rules out a dominator with equal x and smaller y;
  *      `m1 > y` rules out one with strictly smaller x and y ≤ ours —
  *      ties on BOTH coordinates dominate in neither direction, so
  *      coordinate-duplicates can both be on the front, matching the
  *      strict-in-one SQL definition).
  *
  * Only comparisons touch the doubles (min/least/lag) — no float
  * arithmetic, so results are bitwise engine-independent. Higher
  * dimensions fall out by grid-partitioning on d−2 coordinates and
  * running this per cell; the registered query stays 2-D where the
  * window identity is exact. */
object Skyline {

  /** Flags every row of `df` with `is_skyline` for the 2-D minimization
    * skyline over (`x`, `y`). `x` and `y` must be column NAMES in df. */
  def skyline2d(df: DataFrame, x: String, y: String): DataFrame = {
    val g = df.groupBy(col(x)).agg(min(col(y)).as("__gmin"))
    // two-phase prefix min over distinct x (PrefixSum.runningSums shape;
    // memoPersist pins partition ids between the bases job and the row job)
    val meta = Dedup.memoPersist(
      g.repartitionByRange(col(x)).withColumn("__pid", spark_partition_id()))
    val within = Window.partitionBy(col("__pid")).orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, 0)
    val basew = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = meta.groupBy(col("__pid")).agg(min(col("__gmin")).as("__t"))
      .select(col("__pid"), min(col("__t")).over(basew).as("__b"))
    val flagged = meta.join(broadcast(bases), Seq("__pid"))
      .withColumn("__pml", min(col("__gmin")).over(within))
      .withColumn("__lagpml",
        lag(col("__pml"), 1).over(
          Window.partitionBy(col("__pid")).orderBy(col(x))))
      // least() skips nulls: pm = min(earlier partitions, this partition
      // so far); m1 = the same one distinct-x earlier (null at the front)
      .select(col(x),
        least(col("__b"), col("__pml")).as("__pm"),
        least(col("__b"), col("__lagpml")).as("__m1"))
    df.join(flagged, Seq(x))
      .withColumn("is_skyline",
        col(y) === col("__pm") && (col("__m1").isNull || col("__m1") > col(y)))
      .drop("__pm", "__m1")
  }
}

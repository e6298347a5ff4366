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
  * dimensions take [[skylineND]]'s local-front-then-merge route (grid
  * slicing would NOT be correct: dominance crosses cells); the 2-D
  * registered query uses this prefix-min form where the window identity
  * is exact. */
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

  /** **N-dimensional skyline** (minimize every column in `dims`) by the
    * classic distributed two-phase: each partition folds to its LOCAL
    * Pareto front (correct to consider only these: a globally
    * non-dominated point is non-dominated within its partition a
    * fortiori, so no skyline point can be lost), the union of local
    * fronts — small: 2-D random fronts run O(log n), higher-d fronts
    * grow but stay ≪ n — merges on the driver into the GLOBAL front
    * coordinate set under a LOUD cap (the `MaxVocabRows` discipline:
    * past `maxFrontRows` this data has no skyline worth reading and the
    * caller hears it, never a silent truncation), and one broadcast
    * equi-join on the exact coordinate tuple restores row multiplicity
    * (coordinate-duplicate ties all surface, matching [[skyline2d]]).
    * The per-partition fold is `mapPartitions` by necessity — a Pareto
    * fold is genuinely per-partition imperative state with no
    * aggregate/window form at arbitrary d (the rubric's last-resort
    * tier, used as designed); everything that touches full-data volume
    * (scan, fold, final join) stays distributed.
    *
    * Contract: every dim must already be an INTEGRAL column
    * (byte/short/int/long) — dominance over quantized coordinates is the
    * caller's explicit decision (`floor(x/1000).cast("long")`), never a
    * silent truncation of doubles inside the operator — and null dim
    * values fail the job loudly (dominance is undefined on null). */
  def skylineND(df: DataFrame, dims: Seq[String],
      maxFrontRows: Int = 100000): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    require(dims.size >= 2, s"need >= 2 dims, got $dims")
    dims.foreach { dname =>
      val dt = df.schema(dname).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"skylineND dims must be integral (byte/short/int/long); '$dname' " +
          s"is $dt — quantize explicitly (e.g. floor(...).cast(\"long\")) " +
          "so the dominance granularity is the caller's choice")
    }
    val spark = df.sparkSession
    def dominates(q: Seq[Long], p: Seq[Long]): Boolean =
      q.zip(p).forall { case (a, b) => a <= b } && q != p
    def fold(it: Iterator[Seq[Long]]): Iterator[Seq[Long]] = {
      val front = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      it.foreach { p =>
        if (!front.exists(q => dominates(q, p))) {
          val kept = front.filterNot(q => dominates(p, q))
          kept += p
          front.clear(); front ++= kept
        }
      }
      front.iterator
    }
    // phase 1: distributed local fronts over DISTINCT coords (the final
    // join restores row multiplicity); phase 2: front-of-fronts — ONE
    // more application of the same fold on a single partition, reached
    // via coalesce(shuffle = true): the SHUFFLED narrowing is what keeps
    // phase 1 parallel (a narrow coalesce(1) would pull every upstream
    // partition into the single task and run the local folds
    // sequentially) and means only Σ|local fronts| rows — not the
    // distinct volume — cross the wire to the merge task. The driver
    // collect below then only ever sees the FINAL front, never a set
    // proportional to partition count; the loud cap stays as the
    // last-resort bound on that true front
    val front = df.select(dims.map(c => col(c).cast("long")): _*)
      .distinct()
      .rdd.mapPartitions(rows =>
        fold(rows.map { r =>
          dims.indices.map { i =>
            require(!r.isNullAt(i),
              s"skylineND: null value in dim '${dims(i)}' — dominance " +
                "is undefined on null; filter or impute upstream")
            r.getLong(i)
          }: Seq[Long]
        }))
      .coalesce(1, shuffle = true)
      .mapPartitions(fold)
      .collect().toSeq
    require(front.length <= maxFrontRows,
      s"skylineND: ${front.length} front rows exceed " +
        s"$maxFrontRows — no Pareto front worth reading at this size")
    val frontDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        front.map(p => org.apache.spark.sql.Row.fromSeq(p)), 1),
      org.apache.spark.sql.types.StructType(dims.map(d =>
        org.apache.spark.sql.types.StructField(
          s"__f_$d", org.apache.spark.sql.types.LongType))))
    df.join(broadcast(frontDf),
      dims.map(d => col(d).cast("long") === col(s"__f_$d")).reduce(_ && _),
      "left_semi")
  }
}

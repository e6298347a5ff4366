package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/dbt-test shape): a check
  * suite compiles into the fewest jobs that can answer it, instead of
  * one scan per assertion.
  *
  *  - Row-level checks ([[NotNull]], [[Range]], [[Predicate]]) against
  *    one table fold into ONE conditional aggregate —
  *    `count(when(violated))` columns side by side in a single pass, so
  *    a 50-rule suite over a 100 TB fact table still costs one scan;
  *  - [[Unique]] is a key-grouped count (map-side partial; only keys
  *    with duplicates survive the post-aggregate filter);
  *  - [[ForeignKey]] is a LEFT ANTI join against the parent's key
  *    projection (broadcast when the parent is dimension-sized — the
  *    same shape as the reference's incremental skip, SURVEY §2.1-S2).
  *
  * Every check emits (check, n_checked, n_violations, pass) — an audit
  * row, not an exception: pipelines gate on the report (`pass = false →
  * quarantine the batch`), which keeps the audit idempotent and
  * mergeable across partitions/batches. */
object DataQuality {

  /** One declarative expectation over a table. */
  sealed trait Check { def name: String }
  /** `column` must never be NULL. */
  final case class NotNull(name: String, column: String) extends Check
  /** `column` must lie in [lo, hi] (NULLs are [[NotNull]]'s business). */
  final case class Range(name: String, column: String, lo: Double, hi: Double)
      extends Check
  /** Arbitrary row predicate that must hold (NULL counts as violation). */
  final case class Predicate(name: String, holds: Column) extends Check
  /** `columns` must be unique across the table; violations = surplus
    * rows beyond the first per duplicated key. */
  final case class Unique(name: String, columns: Seq[String]) extends Check
  /** Every non-NULL `column` value must exist in `parent.parentColumn`;
    * violations = orphan child rows. */
  final case class ForeignKey(name: String, column: String,
      parent: DataFrame, parentColumn: String) extends Check

  /** Run the suite against `df`; one report row per check, ordered by
    * check name (names must be unique — the report is keyed on them). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val rowLevel = checks.collect {
      case NotNull(n, c) => n -> col(c).isNull
      case Range(n, c, lo, hi) =>
        n -> (col(c).isNotNull && !col(c).between(lo, hi))
      case Predicate(n, holds) => n -> !coalesce(holds, lit(false))
    }
    val rowReport: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else {
        // single pass: total + one violation counter per check
        val one = df.agg(count(lit(1)).as("n_checked"),
          rowLevel.map { case (n, bad) =>
            count(when(bad, 1)).as(s"viol_$n")
          }: _*)
        Some(one.select(explode(array(rowLevel.map { case (n, _) =>
          struct(lit(n).as("check"), col("n_checked"),
            col(s"viol_$n").as("n_violations"))
        }: _*)).as("s")).select("s.*"))
      }
    val others: Seq[DataFrame] = checks.collect {
      case Unique(n, cols) =>
        df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_checked"),
            coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"))
          .select(lit(n).as("check"), col("n_checked"), col("n_violations"))
      case ForeignKey(n, c, parent, pc) =>
        // one child scan: LEFT join against the parent's distinct key
        // projection (broadcast — it's a dimension), then count total
        // and unmatched in the same aggregate
        df.select(col(c)).filter(col(c).isNotNull)
          .join(broadcast(parent.select(col(pc).as(c)).distinct()
            .withColumn("__parent_hit", lit(1))), Seq(c), "left")
          .agg(count(lit(1)).as("n_checked"),
            count(when(col("__parent_hit").isNull, 1)).as("n_violations"))
          .select(lit(n).as("check"), col("n_checked"), col("n_violations"))
    }
    val names = checks.map(_.name)
    require(names.distinct == names, s"duplicate check names in $names")
    (rowReport.toSeq ++ others).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check")
  }

  /** **Functional-dependency discovery** over a candidate list: the
    * dependency lhs → rhs holds iff every distinct lhs tuple maps to
    * exactly one rhs value, i.e. `count_distinct(lhs) ==
    * count_distinct(lhs, rhs)`. Reports both counts plus the number of
    * VIOLATING lhs groups (distinct lhs with ≥ 2 rhs values) — the
    * repair-effort measure profilers like Metanome emit. Each candidate
    * is its own column-pruned aggregate job (a parquet scan reads only
    * lhs ∪ rhs), unioned into one tiny report; for a small candidate
    * set this beats a single multi-countDistinct aggregate, whose
    * Expand would replicate every row once per distinct-set. The
    * group-level pass aggregates `(lhs, rhs)` distinct pairs, then
    * counts rhs-multiplicity per lhs map-side — two shuffles over data
    * whose size is bounded by the distinct-pair count, not the table.
    * Scale path: swap the exact pair distinct for HLL sketches per lhs
    * when distinct pairs rival the fact-table size. */
  def fdDiscover(df: DataFrame,
      candidates: Seq[(Seq[String], String)]): DataFrame = {
    val reports = candidates.map { case (lhs, rhs) =>
      val pairs = df.select((lhs :+ rhs).map(col): _*).distinct()
      pairs.groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("n_rhs"))
        .agg(count(lit(1)).as("n_lhs_distinct"),
          coalesce(sum(col("n_rhs")), lit(0L)).as("n_pair_distinct"),
          count(when(col("n_rhs") > 1, 1)).as("n_violating_lhs"))
        .select(lit(lhs.mkString("+")).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs_distinct"), col("n_pair_distinct"),
          col("n_violating_lhs"),
          (col("n_violating_lhs") === 0L).as("holds"))
    }
    reports.reduce(_ unionByName _).orderBy("lhs", "rhs")
  }

  /** One inclusion-dependency candidate: does every non-NULL value of
    * `childCol` in `child` appear in `parentCol` of `parent`? The
    * foreign-key-discovery primitive (Metanome/Binder's unary IND).
    * Labels name the endpoints in the report. */
  final case class IndCandidate(childLabel: String, child: DataFrame,
      childCol: String, parentLabel: String, parent: DataFrame,
      parentCol: String)

  /** **Inclusion-dependency (foreign-key) discovery** — the
    * cross-table companion of [[fdDiscover]] (which profiles WITHIN a
    * table): per candidate, the count of distinct non-NULL child values
    * and how many are missing from the parent's distinct values; the
    * IND holds iff none is missing. NULLs are ignored on both sides
    * (SQL FK semantics: a NULL FK is unconstrained).
    *
    * Work per candidate is two column-pruned DISTINCT projections —
    * shuffle ∝ distinct values, never rows; the parquet scan reads one
    * column per table — and one left join of the distinct sets, on
    * which AQE broadcasts the (usually dimension-sized) parent side.
    * Scale path when a child's distinct set rivals the fact table: a
    * Bloom filter of the parent key set (the `decontaminate_bloom`
    * machinery) turns the join into a map-side membership probe with a
    * bounded false-containment rate. Values compare as BIGINT —
    * candidates are integer key columns by construction. */
  def indDiscover(candidates: Seq[IndCandidate]): DataFrame = {
    val reports = candidates.map { c =>
      // a non-integral candidate column would CAST to NULL, empty the
      // distinct set, and report a vacuous `holds = true` — reject at
      // construction instead
      for ((df, colName, side) <- Seq((c.child, c.childCol, "child"),
          (c.parent, c.parentCol, "parent"))) {
        import org.apache.spark.sql.types._
        df.schema(colName).dataType match {
          case LongType | IntegerType | ShortType | ByteType => ()
          case t => throw new IllegalArgumentException(
            s"indDiscover: $side column $colName must be integral, got $t")
        }
      }
      val childD = c.child
        .select(col(c.childCol).cast("long").as("v"))
        .filter(col("v").isNotNull).distinct()
      val parentD = c.parent
        .select(col(c.parentCol).cast("long").as("v"))
        .filter(col("v").isNotNull).distinct()
        .withColumn("__hit", lit(1))
      childD.join(parentD, Seq("v"), "left")
        .agg(count(lit(1)).as("n_child_distinct"),
          count(when(col("__hit").isNull, 1)).as("n_missing"))
        .select(
          lit(c.childLabel).as("child"), lit(c.parentLabel).as("parent"),
          col("n_child_distinct"), col("n_missing"),
          // an empty / all-NULL child column satisfies the IND only
          // vacuously — a completely unpopulated FK must not read as a
          // confirmed dependency, so the verdict is NULL, not true
          when(col("n_child_distinct") === 0L, lit(null).cast("boolean"))
            .otherwise(col("n_missing") === 0L).as("holds"))
    }
    reports.reduce(_ unionByName _).orderBy("child", "parent")
  }

  /** **k-anonymity / l-diversity audit** (Sweeney 2002; Machanavajjhala
    * et al. 2007): group the table by its quasi-identifier columns and
    * report, per equivalence class, the class size (re-identification
    * risk when < k) and the number of distinct sensitive values
    * (attribute-disclosure risk when < l — a class can be large yet
    * reveal everyone's value if it is constant). One aggregate over the
    * QI projection — column-pruned, map-side-combined; the release
    * decision (suppress / generalize the risky classes) stays with the
    * caller, which is what keeps the audit idempotent. The privacy
    * sibling of the governance pair `pii_scrub` (content) and
    * `Lineage` (provenance). */
  def kAnonymity(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Int, l: Int): DataFrame = {
    require(qi.nonEmpty && k >= 1 && l >= 1, "kAnonymity needs QI cols, k>=1, l>=1")
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("l_distinct"))
      .select(qi.map(col) ++ Seq(col("n"), col("l_distinct"),
        (col("n") < k.toLong).as("k_risky"),
        (col("l_distinct") < l.toLong).as("l_risky")): _*)
  }

  /** **k-anonymity repair to the hierarchy fixpoint** — the iterated
    * generalization loop [[kAnonymity]] deliberately leaves to the
    * caller, closed: every row starts at the MOST SPECIFIC level of the
    * QI hierarchy; any class below k re-generalizes its rows one level
    * up and is re-audited there, until the class meets k or the
    * hierarchy tops out. The top level keeps its honest residual — a
    * class that is STILL risky after full generalization is re-flagged
    * (`k_risky`), never hidden. Returns the final audit with
    * `qi_level` = the hierarchy level each class settled at.
    *
    * Shapes: the loop is driver-side over the FIXED hierarchy depth
    * (never data-dependent); each level runs one class-sized aggregate
    * over the shrinking frontier, broadcast back onto frontier rows —
    * the row table itself never shuffles for a repair decision. */
  def kAnonymityRepairFull(df: DataFrame, levels: Seq[Column],
      otherQi: Seq[String], sensitive: String, k: Int, l: Int): DataFrame = {
    require(levels.nonEmpty && k >= 1 && l >= 1,
      "kAnonymityRepairFull needs a hierarchy, k>=1, l>=1")
    val grpNames = "__qi" +: otherQi
    val grp: Seq[Column] = grpNames.map(col)
    var settled: Option[DataFrame] = None
    var frontier = df
      .withColumn("__qi", levels.head.cast("string"))
      .withColumn("qi_level", lit(0))
    for (i <- levels.indices) {
      // null-safe (<=>) class matching: a NULL QI value (NULL segment,
      // or a level expression that nulls out) is a real equivalence
      // class — a plain equi-join would drop those rows from BOTH the
      // settled set and the next frontier, hiding exactly the
      // population a privacy audit must flag
      val counts = frontier.groupBy(grp: _*).agg(count(lit(1)).as("__n"))
        .select(grpNames.map(c => col(c).as(s"__c_$c")) :+ col("__n"): _*)
      val cond = grpNames
        .map(c => frontier(c) <=> counts(s"__c_$c")).reduce(_ && _)
      val marked = frontier.join(broadcast(counts), cond)
        .drop(grpNames.map(c => s"__c_$c"): _*)
      val isTop = i == levels.length - 1
      val ok = if (isTop) marked else marked.filter(col("__n") >= k.toLong)
      settled = Some(settled.fold(ok.drop("__n"))(_ unionByName ok.drop("__n")))
      if (!isTop) {
        frontier = marked.filter(col("__n") < k.toLong).drop("__n")
          .withColumn("__qi", levels(i + 1).cast("string"))
          .withColumn("qi_level", lit(i + 1))
      }
    }
    settled.get.groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("l_distinct"),
        max(col("qi_level")).as("qi_level"))
      .select((col("__qi").as("qi") +: otherQi.map(col)) ++ Seq(
        col("qi_level"), col("n"), col("l_distinct"),
        (col("n") < k.toLong).as("k_risky"),
        (col("l_distinct") < l.toLong).as("l_risky")): _*)
  }

  /** **Candidate-key (uniqueness) discovery**: for each column set,
    * does it identify rows uniquely? Reports row count, distinct count
    * of the column-set struct, and `is_key`. The struct comparison
    * groups NULLs as equal (both engines' DISTINCT-row convention), so
    * a nullable non-key column can't masquerade as a key through
    * NULL-skipping `countDistinct` semantics. Each candidate is a
    * column-pruned distinct aggregate — one shuffle over the candidate
    * columns only; the approximate path at 100 TB is HLL
    * (`approx_count_distinct`) with an exact confirm pass on survivors. */
  def keyDiscover(table: String, df: DataFrame,
      candidates: Seq[Seq[String]]): DataFrame = {
    val reports = candidates.map { cols =>
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(struct(cols.map(col): _*)).as("n_distinct"))
        .select(lit(table).as("tbl"), lit(cols.mkString("+")).as("cols"),
          col("n_rows"), col("n_distinct"),
          (col("n_rows") === col("n_distinct")).as("is_key"))
    }
    reports.reduce(_ unionByName _)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Second-wave relational coverage: pivot, full-outer join, correlated
  * subquery (decorrelated to a window), GROUPING SETS, regex string
  * functions, and positional array explode. Same determinism discipline
  * as [[Relational]]. */
object Extras {

  /** Skew-safe **salted join**, registered end-to-end: events (big side)
    * joined to its own per-user aggregate (small side) through
    * [[graft.operators.Joins.saltedJoin]] — the construction for a single
    * hot key melting one task, which AQE cannot fix (it splits oversized
    * partitions; all rows of one key hash to one partition by
    * definition). Output is identical to the plain join, so the oracle
    * IS the plain join — the driver gate proves the salting is
    * semantics-preserving on the real corpus. */
  def saltedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val userAgg = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_user_events"))
      .withColumnRenamed("user_id", "u2")
    graft.operators.Joins.saltedJoin(
        ev.select(col("event_id"), col("user_id")), userAgg,
        col("user_id"), col("u2"), salt = 8)
      .select(col("event_id"), col("user_id"), col("n_user_events"))
      .orderBy("event_id")
  }

  private val saltedJoinSql =
    """SELECT event_id, user_id, n_user_events
      |FROM events
      |JOIN (SELECT user_id AS u2, COUNT(*) AS n_user_events
      |      FROM events GROUP BY user_id) ON user_id = u2
      |ORDER BY event_id""".stripMargin

  /** **Auto-salted join** ([[graft.operators.Joins.saltedJoinAuto]]):
    * the salt width MEASURED by a Misra–Gries probe instead of guessed.
    * The big side collapses 90% of users to a single "guest" key (the
    * classic real-world hot key: anonymous traffic, NULL surrogate) —
    * the probe finds it, the exact candidate recount sizes the salt,
    * and the salted plan runs; the oracle is the PLAIN join, so the
    * gate proves the measured salting is semantics-preserving on the
    * real corpus. The same `FrequentItems` summary that answers
    * `heavy_hitters` here powers physical-join planning. */
  def saltedJoinAutoQ(spark: SparkSession, dir: String): DataFrame = {
    val gkey = when(col("user_id") % 10 < 9, lit(0L)).otherwise(col("user_id"))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), gkey.as("gkey"))
    val dim = ev.groupBy(col("gkey")).agg(count(lit(1)).as("n_key_events"))
      .withColumnRenamed("gkey", "g2")
    graft.operators.Joins.saltedJoinAuto(
        ev, dim, col("gkey"), col("g2"))
      .groupBy(col("gkey"))
      .agg(count(lit(1)).as("n_rows"), max(col("n_key_events")).as("n_key_events"))
      .orderBy("gkey")
  }

  private val saltedJoinAutoSql =
    """WITH ev AS (SELECT event_id,
      |              CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS gkey
      |            FROM events),
      |dim AS (SELECT gkey AS g2, COUNT(*) AS n_key_events FROM ev GROUP BY 1)
      |SELECT gkey, COUNT(*) AS n_rows, MAX(n_key_events) AS n_key_events
      |FROM ev JOIN dim ON gkey = g2
      |GROUP BY gkey
      |ORDER BY gkey""".stripMargin

  /** **Bucketed co-located join**: both sides written as bucketed+sorted
    * tables on the join key at construction (the layout investment a
    * fact table joined repeatedly on one key pays once), then joined
    * shuffle-free — JoinsSpec asserts zero Exchange in that plan; this
    * registered form proves the layout round-trip preserves the rows
    * against the plain-join oracle. */
  def bucketedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    graft.operators.Joins.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "graft_bkt_lineitem", "l_orderkey", 8)
    graft.operators.Joins.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_bkt_orders", "l_orderkey", 8)
    graft.operators.Joins
      .bucketedJoin(spark, "graft_bkt_lineitem", "graft_bkt_orders", "l_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  private val bucketedJoinSql =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Pivot (cross-tab): events per user by type. Spark's `pivot` yields
    * NULL for empty cells; coalesce to 0 to match the oracle's
    * COUNT(*) FILTER semantics. Pivot values are enumerated explicitly —
    * at scale that skips the extra distinct-values job entirely. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }

  private val pivotAggSql =
    """SELECT user_id,
      |  COUNT(*) FILTER (event_type = 'click') AS click,
      |  COUNT(*) FILTER (event_type = 'error') AS error,
      |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (event_type = 'view') AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Full-outer join of two aggregated sides with genuine one-sided
    * rows (thresholds chosen so some nations appear on only one side). */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9800)
      .groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_rich_cust"))
    val s = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 8000)
      .groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_rich_supp"))
    c.join(s, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        col("n_rich_cust"), col("n_rich_supp"))
      .orderBy("nationkey")
  }

  private val fullOuterJoinSql =
    """SELECT COALESCE(nk_c, nk_s) AS nationkey, n_rich_cust, n_rich_supp
      |FROM (SELECT c_nationkey nk_c, COUNT(*) n_rich_cust FROM customer
      |      WHERE c_acctbal > 9800 GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey nk_s, COUNT(*) n_rich_supp FROM supplier
      |      WHERE s_acctbal > 8000 GROUP BY s_nationkey) s
      |  ON nk_c = nk_s
      |ORDER BY nationkey""".stripMargin

  /** Correlated-subquery pattern ("orders above their customer's average
    * order value"), decorrelated into a window — one shuffle on the
    * correlation key instead of a per-row subquery. The average is
    * computed as exact-decimal sum cast to double over an integer count,
    * so both engines compare against the identical float64. */
  def corrSubquery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("cust_avg",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
      .orderBy("o_orderkey")
  }

  private val corrSubquerySql =
    """SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |      / COUNT(*) OVER w AS cust_avg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey))
      |WHERE o_totalprice > cust_avg
      |ORDER BY o_orderkey""".stripMargin

  /** GROUPING SETS beyond rollup/cube: an explicit non-hierarchical set
    * list, via SQL (the Dataset API has no grouping-sets builder). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  private val groupingSetsSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Regex + positional string functions over documents. */
  def regexFns(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("lang"), "[aeiou]", "_").as("lang_masked"),
        instr(col("text"), "data").as("data_pos"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        reverse(col("lang")).as("lang_rev"))
      .orderBy("doc_id")

  private val regexFnsSql =
    """SELECT doc_id,
      |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
      |  regexp_replace(lang, '[aeiou]', '_', 'g') AS lang_masked,
      |  strpos(text, 'data') AS data_pos,
      |  lpad(lang, 5, '_') AS lang_pad,
      |  reverse(lang) AS lang_rev
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** posexplode over the embedding arrays + per-position aggregation.
    * min/max of floats pass through without arithmetic — bit-exact. */
  def explodeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("min_x"), max(col("x")).as("max_x"))
      .orderBy("pos")

  // DuckDB 1.0 has no WITH ORDINALITY; a lateral range join gives the
  // position instead.
  private val explodeAggSql =
    """SELECT pos, COUNT(*) AS n,
      |  MIN(embedding[pos + 1]) AS min_x, MAX(embedding[pos + 1]) AS max_x
      |FROM embeddings, UNNEST(range(0, len(embedding))) AS t(pos)
      |GROUP BY pos
      |ORDER BY pos""".stripMargin

  /** Top-k per group via the custom [[graft.functions.BoundedTopK]]
    * aggregate: map-side partial top-k (≤k rows per partition per group
    * cross the shuffle) instead of the window formulation's full
    * shuffle+sort. Same result as `topk_per_group` — same oracle. */
  def topkPerGroupAgg(spark: SparkSession, dir: String): DataFrame = {
    val sortStruct = struct(
      (-col("o_totalprice")).as("neg_price"), // descending price
      col("o_orderkey").as("ok"),             // ascending tie-break
      col("o_totalprice").as("price"))        // payload (never compared)
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(graft.functions.BoundedTopK(sortStruct, 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_custkey"),
        col("t.ok").as("o_orderkey"),
        col("t.price").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  private val topkPerGroupAggSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Unpivot (melt): wide per-part numeric columns → long (attr, value)
    * rows. */
  def unpivotMelt(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("size"), col("retailprice")), "attr", "val")
      .orderBy("p_partkey", "attr")

  private val unpivotMeltSql =
    """SELECT p_partkey, attr, val FROM (
      |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part)
      |ORDER BY p_partkey, attr""".stripMargin

  /** Sorted collect aggregation: deterministic output from an unordered
    * aggregate (sort_array makes the set order total). Serialized to one
    * string column — array-typed outputs break the driver's pandas
    * row-sort, and string joining is exact in both engines. */
  def collectAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  private val collectAggSql =
    """SELECT user_id,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("unpivot_melt", unpivotMeltSql)(unpivotMelt),
    Q("collect_agg", collectAggSql)(collectAgg),
    Q("topk_per_group_agg", topkPerGroupAggSql)(topkPerGroupAgg),
    Q("pivot_agg", pivotAggSql)(pivotAgg),
    Q("full_outer_join", fullOuterJoinSql)(fullOuterJoin),
    Q("corr_subquery", corrSubquerySql)(corrSubquery),
    Q("grouping_sets", groupingSetsSql)(groupingSets),
    Q("regex_fns", regexFnsSql)(regexFns),
    Q("explode_agg", explodeAggSql)(explodeAgg),
    Q("salted_join", saltedJoinSql)(saltedJoinQ),
    Q("salted_join_auto", saltedJoinAutoSql)(saltedJoinAutoQ),
    Q("bucketed_join", bucketedJoinSql)(bucketedJoinQ),
    Q("zorder_layout", zorderLayoutSql)(zorderLayout),
    Q("hilbert_layout", hilbertLayoutSql)(hilbertLayout))

  /** **Z-order layout key** over events ([[graft.operators.Zorder]]):
    * the (user_id, day) Morton interleave a writer would
    * `repartitionByRange(z).sortWithinPartitions(z)` by so min/max
    * pruning serves BOTH a user predicate and a time predicate from the
    * same layout. Pure bit arithmetic — the oracle runs the identical
    * generated expression; ZorderSpec proves the pruning advantage
    * block-by-block. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("day"))
      .withColumn("z",
        graft.operators.Zorder.interleave(col("user_id"), col("day"), 16))
      .orderBy("z", "event_id")

  // lazy: referenced by the registry val above its own initializer
  private lazy val zorderLayoutSql = {
    val z = graft.operators.Zorder.interleaveSql("user_id", "day", 16)
    s"""SELECT event_id, user_id, day, $z AS z
       |FROM (SELECT event_id, user_id,
       |        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
       |          AS BIGINT) AS day
       |      FROM events)
       |ORDER BY z, event_id""".stripMargin
  }

  /** [[zorderLayout]]'s Hilbert twin ([[graft.operators.Hilbert]]):
    * the same (user, day) layout keyed by the Hilbert index — strictly
    * better locality (unit-step curve, no quadrant jumps; HilbertSpec
    * quantifies the block-touch win over the Morton key on the same box
    * workload). Same hash-check discipline: Spark's runtime fold and
    * DuckDB's recursive-CTE loop run the identical integer iteration. */
  def hilbertLayout(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("day"))
      .withColumn("h",
        graft.operators.Hilbert.index(col("user_id"), col("day"), 16))
      .orderBy("h", "event_id")

  private lazy val hilbertLayoutSql = {
    val base =
      """SELECT event_id, user_id, day,
        |       user_id & 65535 AS x, day & 65535 AS y
        |FROM (SELECT event_id, user_id,
        |        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS BIGINT) AS day
        |      FROM events)""".stripMargin
    graft.operators.Hilbert.indexSqlCte(
      base, Seq("event_id", "user_id", "day"), 16) +
      "\nORDER BY h, event_id"
  }
}

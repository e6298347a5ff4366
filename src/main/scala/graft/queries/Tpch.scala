package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Warehouse relational breadth: with [[Relational]] (Q1/Q3/Q5 +
  * Q21/Q18/Q11 as `multi_exists_join`/`big_orders_semi`/`nation_share`),
  * this file completes ALL 22 classic TPC-H query SHAPES —
  * Q2/4/6/7/8/9/10/12/13/14/15/16/17/19/20/22 here. Adapted to the
  * driver corpus (FIXTURES.md — no `partsupp` table, so Q2/Q9-shaped
  * queries substitute lineitem price / part retail-price for supply
  * cost, and Q4/Q16/Q20 swap corpus-absent columns for same-shaped
  * predicates; semantics of the *composition* — the part a query engine
  * must plan well — are preserved).
  *
  * Exactness protocol (the repo rule): every float aggregate is an exact
  * DECIMAL(18,2) sum cast to DOUBLE at the boundary; every threshold
  * against an average is cross-multiplied into exact-decimal form
  * (`qty · cnt · 5 < sum` instead of `qty < 0.2 · sum/cnt`); ratios are
  * ONE IEEE division of two exactly-equal doubles in both engines.
  *
  * Scale notes (100 TB reading): every query here filters its dimension
  * tables FIRST and broadcasts them into the fact scan, so the big
  * lineitem/orders shuffles carry only surviving rows; the only
  * fact-sized shuffles are the final keyed aggregations and (for Q17/Q2
  * shapes) one per-partkey statistics pass — both map-side-combined
  * hash aggregates. */
object Tpch {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  private val revenue: Column =
    dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))

  // ---------------------------------------------------------------- Q7

  /** TPC-H Q7 shape — "volume shipping" between two trading nations:
    * revenue by (supplier nation, customer nation, ship year) for the
    * two directed pairs of a fixed nation pair, over a two-year window.
    *
    * Plan: both nation-filtered dimensions (suppliers of the pair's
    * nations; customers of the pair's nations) broadcast into the fact
    * scans, so lineitem and orders are each reduced to ~2/25 of their
    * rows BEFORE the one fact-to-fact equi-join on orderkey. The
    * direction predicate (A→B or B→A) evaluates post-join on two
    * broadcast-joined name columns. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .filter(col("n_name").isin("NATION_12", "NATION_3"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nations.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nations.select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("nk2"))
      .select(col("c_custkey"), col("cust_nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        revenue.as("volume"), year(col("l_shipdate")).cast("int").as("l_year"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_3") ||
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_12"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("volume")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val volumeShippingSql =
    """SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      |  FROM lineitem, orders, customer, supplier, nation n1, nation n2
      |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND l_suppkey = s_suppkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_3')
      |      OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_12'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- Q8

  /** TPC-H Q8 shape — "market share": of all PROMO-part revenue sold to
    * ASIA customers per order year, the fraction supplied by NATION_12.
    * The share is `CAST(num AS DOUBLE) / CAST(den AS DOUBLE)` — both
    * operands exact decimals, so the single IEEE division is identical
    * in both engines.
    *
    * Plan: part (type filter), supplier+nation, customer+nation+region
    * are all broadcast; the two fact-sized operations are
    * lineitem⋈orders on orderkey and the final per-year hash agg. The
    * numerator rides as a conditional aggregate — no second pass. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val asiaCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), revenue.as("volume"))
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_12", col("volume"))
          .otherwise(dec2(lit(0)))).cast("double").as("nation_volume"),
        sum(col("volume")).cast("double").as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy("o_year")
  }

  private val marketShareSql =
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
      |  CAST(SUM(volume) AS DOUBLE) AS total_volume,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
      |    AND p_type = 'PROMO')
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- Q9

  /** TPC-H Q9 shape — "product profit" by (supplier nation, order year)
    * for parts whose name contains a substring. The corpus has no
    * partsupp, so unit cost substitutes the part's retail price
    * (`p_retailprice · l_quantity`) — the composition (5-way join, CASE
    * arithmetic, two-key agg) is what's exercised. Both products are
    * cast to DECIMAL(18,4) before the subtraction so both engines
    * subtract identical exact operands. */
  def profitByNation(spark: SparkSession, dir: String): DataFrame = {
    val widgetParts = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), dec2(col("p_retailprice")).as("rp"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("nation"))
    val amount = dec4(revenue) - dec4(col("rp") * dec2(col("l_quantity")))
    Tables.lineitem(spark, dir)
      .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("int").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val profitByNationSql =
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
      |      - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |    AND p_name LIKE '%widget%')
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------- Q13

  /** TPC-H Q13 shape — customer order-count distribution: a LEFT OUTER
    * join (customers with zero qualifying orders must appear with
    * c_count = 0) under a join-side filter, then a second aggregation
    * over the first's result. Exercises outer-join-with-condition
    * planning plus agg-of-agg.
    *
    * Plan: orders filtered before the join; at 100 TB both sides
    * shuffle on custkey once (customer is the smaller side and would
    * broadcast at dimension scale; the shape stays correct either
    * way); the second agg's input is one row per customer. */
  def custdist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val custdistSql =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- Q17

  /** TPC-H Q17 shape — small-quantity-order revenue: lineitems of one
    * brand's parts whose quantity is below 20% of that part's average
    * quantity, total extended price scaled by 1/7. The correlated
    * average is decorrelated into one per-part aggregate and the
    * threshold is cross-multiplied (`5·qty·cnt < sum`) so the
    * comparison is exact-decimal in both engines; the final ÷7 is one
    * IEEE division of an exact double.
    *
    * Plan: brand parts broadcast-semi-reduce lineitem first (~1/25 of
    * rows); the per-part (count, sum) aggregate runs on the reduced
    * fact and joins back broadcast. No fact-sized shuffle survives at
    * dimension-scale part counts. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#16").select(col("p_partkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), dec2(col("l_quantity")).as("qty"),
        dec2(col("l_extendedprice")).as("ep"))
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
    val stats = li.groupBy(col("l_partkey").as("sk"))
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("sum_qty"))
    li.join(broadcast(stats), col("l_partkey") === col("sk"))
      .filter(col("qty") * lit(5) * col("cnt") < col("sum_qty"))
      .agg((sum(col("ep")).cast("double") / lit(7.0)).as("avg_yearly"))
  }

  private val smallQtyRevenueSql =
    """SELECT CAST(SUM(ep) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM (
      |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS ep
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  JOIN (
      |    SELECT l_partkey AS sk, COUNT(*) AS cnt,
      |      SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      |    FROM lineitem JOIN part ON p_partkey = l_partkey
      |    WHERE p_brand = 'Brand#16'
      |    GROUP BY l_partkey) ON l_partkey = sk
      |  WHERE p_brand = 'Brand#16'
      |    AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty)""".stripMargin

  // --------------------------------------------------------------- Q19

  /** TPC-H Q19 shape — disjunctive multi-attribute predicate: revenue
    * from lineitem⋈part rows satisfying any of three (brand, size
    * range, quantity range) conjunctions. Exercises OR-of-ANDs
    * pushdown: the part-side conjuncts (`p_brand`/`p_size`) filter the
    * broadcast dimension, the lineitem-side conjuncts (`l_quantity`)
    * evaluate in the scan, and only the residual OR crosses the join. */
  def disjunctivePred(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter((col("p_brand") === "Brand#13" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(5, 20)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(10, 30)))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"), revenue.as("volume"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter((col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(5, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(col("volume")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val disjunctivePredSql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --------------------------------------------------------------- Q22

  /** TPC-H Q22 shape — "global sales opportunity": customers from a
    * nation set with above-average positive balance and no RECENT
    * orders (the corpus' order density gives every customer *some*
    * order, so the anti-join condition is "none since 2001-01-01" —
    * same composition, non-degenerate result). The scalar average is a
    * 1-row broadcast and the comparison is cross-multiplied
    * (`bal · cnt > sum`) so it is exact-decimal; the no-recent-orders
    * condition is a left-anti join against the date-filtered orders
    * fact.
    *
    * Plan: the anti join is the only fact-sized operation; at scale it
    * shuffles orders' filtered custkey projection once (or broadcasts
    * the filtered customer side — either is sound; Spark picks by
    * size). */
  def globalCustomers(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq(1, 3, 5, 8, 10, 12, 15, 18, 21, 24)
    val cust = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(nations: _*))
    val avgStats = broadcast(cust.filter(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("cnt_pos"), sum(dec2(col("c_acctbal"))).as("sum_pos")))
    cust.crossJoin(avgStats)
      .filter(dec2(col("c_acctbal")) * col("cnt_pos") > col("sum_pos"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  private val globalCustomersSql =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_nationkey IN (1, 3, 5, 8, 10, 12, 15, 18, 21, 24)
      |  AND CAST(c_acctbal AS DECIMAL(18,2)) *
      |      (SELECT COUNT(*) FROM customer
      |       WHERE c_nationkey IN (1, 3, 5, 8, 10, 12, 15, 18, 21, 24) AND c_acctbal > 0)
      |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
      |       WHERE c_nationkey IN (1, 3, 5, 8, 10, 12, 15, 18, 21, 24) AND c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- Q2

  /** TPC-H Q2 shape — correlated MIN across a join: for each part of a
    * fixed size, the supplier rows achieving that part's minimum
    * extended price (the corpus' stand-in for min supply cost), with
    * supplier nation attached. Ties keep every achieving supplier
    * (DISTINCT on the output key set), exactly like Q2's multi-supplier
    * minima.
    *
    * Plan: the correlated subquery decorrelates into a per-partkey MIN
    * window over the size-filtered fact slice — one shuffle on partkey,
    * no join back (window reuses the partitioning). Supplier and nation
    * attach as broadcasts. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val sizeParts = Tables.part(spark, dir)
      .filter(col("p_size") === 10).select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), dec2(col("l_extendedprice")).as("ep"))
      .join(broadcast(sizeParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn("min_ep", min(col("ep")).over(w))
      .filter(col("ep") === col("min_ep"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
        col("ep").cast("double").as("min_price"))
      .distinct()
      .orderBy("p_partkey", "s_name")
  }

  private val minCostSupplierSql =
    """SELECT DISTINCT l_partkey AS p_partkey, s_name, n_name,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS min_price
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE p_size = 10
      |  AND CAST(l_extendedprice AS DECIMAL(18,2)) =
      |    (SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
      |     FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |ORDER BY p_partkey, s_name""".stripMargin

  // --------------------------------------------------------------- Q12

  /** TPC-H Q12 shape — shipping-priority breakdown: one fact-to-fact
    * join (lineitem⋈orders on orderkey) then a CASE-conditional
    * aggregate splitting line counts by order priority class per
    * lineitem category (`l_returnflag` stands in for the corpus-absent
    * `l_shipmode`; the composition — conditional SUM over a join, the
    * "pivot a flag out of the joined dimension" pattern — is identical).
    * Counts are exact longs: nothing float anywhere.
    *
    * Plan: lineitem is date-filtered in the scan and projected to two
    * columns; orders projects to (orderkey, priority). At 100 TB both
    * sides shuffle on orderkey once (no broadcastable side — this is
    * THE canonical co-partitioned fact join, and bucketing both tables
    * on orderkey would eliminate even that shuffle); the conditional
    * agg is map-side partial. */
  def shipPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
    li.join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  private val shipPrioritySql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '2002-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- Q15

  /** TPC-H Q15 shape — "top revenue supplier": a revenue VIEW (per-
    * supplier exact-decimal revenue over a 3-month window) joined
    * against its own scalar MAX — the aggregated-view + scalar-subquery
    * composition. The max comparison is DECIMAL = DECIMAL (exact), ties
    * all surface (Q15's documented multi-winner semantics); the DOUBLE
    * cast happens only at the output boundary.
    *
    * Plan: the view is one map-side-combined hash agg over the filtered
    * fact; its scalar max is a 1-row broadcast cross join (the
    * `scalar_subquery` discipline), and the supplier name attaches as a
    * broadcast. The view never materializes twice: memoPersist pins it
    * across the two reads. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = graft.operators.Dedup.memoPersist(
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("2001-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue).as("total_rev")))
    val mx = broadcast(rev.agg(max(col("total_rev")).as("max_rev")))
    rev.crossJoin(mx)
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val topSupplierSql =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '2001-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q16

  /** TPC-H Q16 shape — supplier counts by part attribute: how many
    * DISTINCT suppliers offer parts of each (brand, type, size) combo,
    * for parts NOT of an excluded brand/type and of a size in a fixed
    * set, excluding suppliers on a complaint list via NOT IN. The
    * part-supplier relation is the distinct (l_partkey, l_suppkey)
    * projection of lineitem (the corpus has no partsupp); the complaint
    * list is the negative-balance suppliers (no s_comment column) —
    * both substitutions preserve the composition: NOT IN + DISTINCT
    * projection + count(distinct) grouped by dimension attributes.
    *
    * NOT IN discipline: the subquery key (s_suppkey) is non-nullable
    * here, so left-anti ≡ NOT IN; with a nullable subquery column NOT
    * IN's three-valued semantics (one NULL empties the result) must be
    * guarded explicitly — the oracle keeps a literal NOT IN so the
    * driver gate would catch any divergence.
    *
    * Plan: the distinct pair projection is the only fact-sized shuffle
    * (on the pair key); parts filter-then-broadcast, the complaint list
    * is a broadcast anti join, and count(distinct) is Spark's two-phase
    * expand — all map-side-combinable. */
  def partsuppCount(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaints = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val partsuppCountSql =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --------------------------------------------------------------- Q20

  /** TPC-H Q20 shape — nested correlated-threshold semi join: suppliers
    * of one nation who, for some name-matched part, shipped MORE than
    * half that part's total shipped quantity in a year (the corpus-free
    * stand-in for `ps_availqty > 0.5·sum(l_quantity)`: the inner
    * correlated aggregate compares a per-(supplier, part) measure
    * against a per-part aggregate threshold, then the surviving pairs
    * semi-reduce the supplier dimension — two nesting levels, exactly
    * Q20's). The threshold is cross-multiplied (`2·pair_qty >
    * part_qty`) so the comparison is exact-decimal in both engines.
    *
    * Plan: the name-filtered part set broadcast-semi-reduces lineitem
    * FIRST; one hash agg per (part, supp) then a per-part agg over its
    * result (strictly smaller input); the comparison joins the pair agg
    * to the broadcast per-part totals; the final semi against supplier
    * is a broadcast. Only the first pair agg touches fact-scale rows. */
  def dominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val namedParts = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget")).select(col("p_partkey"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01 00:00:00").cast("timestamp"))
      .join(broadcast(namedParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"), dec2(col("l_quantity")).as("qty"))
    val pairQty = graft.operators.Dedup.memoPersist(
      li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("pair_qty")))
    val partQty = pairQty.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("pair_qty")).as("part_qty"))
    val dominant = pairQty
      .join(broadcast(partQty), col("l_partkey") === col("pk"))
      .filter(col("pair_qty") * lit(2) > col("part_qty"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .filter(col("s_nationkey") < 13)
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  private val dominantSuppliersSql =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_nationkey < 13
      |  AND s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM (SELECT l_partkey, l_suppkey,
      |            SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pair_qty
      |          FROM lineitem
      |          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      |            AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      |            AND l_shipdate < TIMESTAMP '2002-01-01 00:00:00'
      |          GROUP BY l_partkey, l_suppkey) pair
      |    WHERE pair_qty * 2 > (
      |      SELECT SUM(pq2.pair_qty)
      |      FROM (SELECT l_partkey, l_suppkey,
      |              SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pair_qty
      |            FROM lineitem
      |            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      |              AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      |              AND l_shipdate < TIMESTAMP '2002-01-01 00:00:00'
      |            GROUP BY l_partkey, l_suppkey) pq2
      |      WHERE pq2.l_partkey = pair.l_partkey))
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- Q4

  /** TPC-H Q4 shape — order-priority checking: orders of one quarter
    * having at least one "problem" lineitem (EXISTS semi —
    * `l_returnflag = 'R'` stands in for the corpus-absent
    * commitdate<receiptdate lateness predicate), counted per priority.
    * The semi join is the whole point: each order counts ONCE however
    * many problem lines it has.
    *
    * Plan: both facts filter in their scans first; the semi join
    * shuffles only (orderkey) projections and stops probing an order at
    * its first match (LeftSemi). The count is a 5-group map-side agg. */
  def priorityCount(spark: SparkSession, dir: String): DataFrame = {
    val problem = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2001-04-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("2001-07-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .join(problem, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val priorityCountSql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2001-04-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '2001-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- Q6

  /** TPC-H Q6 shape — forecast revenue change: a pure scan-filter-agg
    * over lineitem (year of shipdate, discount band, quantity cap) with
    * `sum(extendedprice · discount)` in exact decimal. The simplest
    * TPC-H query and the purest pushdown test: every predicate must
    * reach the parquet scan (timestamp range + two numeric ranges), the
    * projection must prune to three columns, and the whole thing is one
    * map-side-combined 1-row aggregate — zero joins, zero wide shuffle.
    * Discounts are exact hundredths in the corpus, so the
    * DECIMAL(18,2)·DECIMAL(18,2) product is exact in both engines. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  private val forecastRevenueSql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '2002-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |  AND l_quantity < 24""".stripMargin

  // --------------------------------------------------------------- Q10

  /** TPC-H Q10 shape — returned-item reporting: the top 20 customers by
    * revenue lost to returns in a quarter, with nation attached — the
    * canonical "sort a fact-sized aggregate, keep k" composition.
    *
    * Plan: returns-filtered lineitem joins date-filtered orders on
    * orderkey (the one fact-to-fact shuffle), the per-customer agg is
    * map-side-combined, and the global top-20 plans as
    * TakeOrderedAndProject — a bounded per-partition heap + driver
    * merge of 20-row partials, NEVER a global sort. Customer and nation
    * attach as broadcasts AFTER the agg (20 rows), not before —
    * dimension columns ride the smallest possible frame. */
  def returnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2001-04-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("2001-07-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenue.as("volume"))
    val perCust = returned
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("volume")).as("rev"))
      .orderBy(col("rev").desc, col("o_custkey"))
      .limit(20)
    perCust
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("rev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
  }

  private val returnedCustomersSql =
    """SELECT c_custkey, c_name, n_name, CAST(rev AS DOUBLE) AS revenue
      |FROM (
      |  SELECT o_custkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '2001-04-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '2001-07-01 00:00:00'
      |  GROUP BY o_custkey
      |  ORDER BY rev DESC, o_custkey
      |  LIMIT 20)
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY revenue DESC, c_custkey""".stripMargin

  // --------------------------------------------------------------- Q14

  /** TPC-H Q14 shape — promotion effect: the percentage of one month's
    * lineitem revenue that came from PROMO-type parts — a conditional
    * aggregate ratio across a dimension join. Numerator and denominator
    * ride ONE aggregate (no second pass); both are exact decimals, and
    * the percentage is a single IEEE `100·num/den` on exactly-equal
    * operands in both engines.
    *
    * Plan: the date filter reaches the lineitem scan; part broadcasts
    * (only partkey + the type flag); one map-side-combined 1-row agg. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-09-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2001-10-01 00:00:00").cast("timestamp"))
      .select(col("l_partkey"), revenue.as("volume"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("volume"))
          .otherwise(dec2(lit(0)))).as("promo"),
        sum(col("volume")).as("total"))
      .select(
        (lit(100.0) * col("promo").cast("double") / col("total").cast("double"))
          .as("promo_revenue_pct"),
        col("promo").cast("double").as("promo_revenue"),
        col("total").cast("double").as("total_revenue"))

  private val promoRevenueSql =
    """SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_revenue_pct,
      |  CAST(promo AS DOUBLE) AS promo_revenue,
      |  CAST(total AS DOUBLE) AS total_revenue
      |FROM (
      |  SELECT
      |    SUM(CASE WHEN p_type = 'PROMO'
      |          THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |          ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '2001-09-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '2001-10-01 00:00:00')""".stripMargin

  // ------------------------------------------------------------ registry

  val all: Seq[Q] = Seq(
    Q("volume_shipping", volumeShippingSql)(volumeShipping),
    Q("market_share", marketShareSql)(marketShare),
    Q("profit_by_nation", profitByNationSql)(profitByNation),
    Q("custdist", custdistSql)(custdist),
    Q("small_qty_revenue", smallQtyRevenueSql)(smallQtyRevenue),
    Q("disjunctive_pred", disjunctivePredSql)(disjunctivePred),
    Q("global_customers", globalCustomersSql)(globalCustomers),
    Q("min_cost_supplier", minCostSupplierSql)(minCostSupplier),
    Q("ship_priority", shipPrioritySql)(shipPriority),
    Q("top_supplier", topSupplierSql)(topSupplier),
    Q("partsupp_count", partsuppCountSql)(partsuppCount),
    Q("dominant_suppliers", dominantSuppliersSql)(dominantSuppliers),
    Q("priority_count", priorityCountSql)(priorityCount),
    Q("forecast_revenue", forecastRevenueSql)(forecastRevenue),
    Q("returned_customers", returnedCustomersSql)(returnedCustomers),
    Q("promo_revenue", promoRevenueSql)(promoRevenue))
}

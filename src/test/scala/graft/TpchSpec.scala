package graft

import org.apache.spark.sql.functions._

import graft.queries.Tpch

/** Structural invariants for the TPC-H-shaped relational wave (value-level
  * correctness is the DuckDB-oracle gate — these pin the cross-query /
  * cross-formulation facts an oracle can't see) and the weighted-sample
  * distribution property its scaladoc promises. */
class TpchSpec extends SparkTestBase {

  test("custdist counts partition the customer table exactly") {
    val dist = Tpch.custdist(spark, sf0001).collect()
    val nCust = Tables.customer(spark, sf0001).count()
    assert(dist.map(_.getLong(1)).sum == nCust,
      "every customer appears in exactly one order-count bucket")
    // zero-orders bucket exists iff some customer has only 5-LOW orders
    // or none; the partition property above is the load-bearing check
    assert(dist.map(_.getLong(0)).distinct.length == dist.length)
  }

  test("volume_shipping covers only the two directed nation pairs") {
    val rows = Tpch.volumeShipping(spark, sf0001).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_12", "NATION_3"), ("NATION_3", "NATION_12"))))
    assert(rows.map(_.getInt(2)).forall(y => y == 1996 || y == 1997))
  }

  test("market_share numerator is bounded by the denominator, share consistent") {
    Tpch.marketShare(spark, sf0001).collect().foreach { r =>
      val (num, den, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(num >= 0 && num <= den)
      assert(share == num / den)
    }
  }

  test("min_cost_supplier rows all carry their part's true minimum price") {
    val out = Tpch.minCostSupplier(spark, sf0001)
      .select("p_partkey", "min_price").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001).filter(col("p_size") === 10),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == want)
  }

  test("small_qty_revenue equals the brute-force per-part recompute") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001).filter(col("p_brand") === "Brand#16"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .as[(Long, Double, Double)].collect()
    val byPart = li.groupBy(_._1)
    val expect = byPart.values.flatMap { rows =>
      val sumQ = rows.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      val cnt = rows.length
      rows.filter(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 5 * cnt < sumQ)
        .map(r => BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }.sum
    val got = Tpch.smallQtyRevenue(spark, sf0001).collect().head.getDouble(0)
    assert(got == expect.toDouble / 7.0)
  }

  test("global_customers members have no 2001 orders and above-average balance") {
    val members = Tpch.globalCustomers(spark, sf0001).collect()
    assert(members.nonEmpty)
    val total = members.map(_.getLong(1)).sum
    // recompute the member set brute-force on the driver
    val nations = Set(1, 3, 5, 8, 10, 12, 15, 18, 21, 24)
    val cust = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .filter(r => nations(r.getInt(1)))
    val pos = cust.filter(_.getDouble(2) > 0)
    val sumPos = pos.map(r => BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    val recent = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expect = cust.filter(r =>
      BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * pos.length > sumPos &&
        !recent(r.getLong(0)))
    assert(total == expect.length)
  }

  test("ship_priority: high+low partitions the joined window line count") {
    val rows = Tpch.shipPriority(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val want = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01 00:00:00").cast("timestamp"))
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(total == want, "every window line lands in exactly one class")
  }

  test("top_supplier returns exactly the max-revenue supplier(s) of the view") {
    import spark.implicits._
    val out = Tpch.topSupplier(spark, sf0001)
      .select("s_suppkey", "total_revenue").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    // brute-force the revenue view and its max
    val view = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2001-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).cast("double").as("r"))
      .as[(Long, Double)].collect()
    val mx = view.map(_._2).max
    assert(out.map(_._2).forall(_ == mx))
    assert(out.map(_._1).toSet == view.filter(_._2 == mx).map(_._1).toSet)
  }

  test("partsupp_count excludes complaint suppliers and bounds by the pair relation") {
    val excluded = Tables.supplier(spark, sf0001)
      .filter(col("s_acctbal") < 0).count()
    val nSupp = Tables.supplier(spark, sf0001).count()
    val rows = Tpch.partsuppCount(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // no group can count more suppliers than exist minus the excluded
    assert(rows.map(_.getLong(3)).forall(c => c >= 1 && c <= nSupp - excluded))
  }

  test("dominant_suppliers members each dominate some widget part's yearly volume") {
    import spark.implicits._
    val got = Tpch.dominantSuppliers(spark, sf0001)
      .select("s_suppkey").as[Long].collect().toSet
    // brute force: (part, supp) quantities over the window
    val li = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01 00:00:00").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .as[(Long, Long, Double)].collect()
    def q2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val pairQty = li.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> rs.map(r => q2(r._3)).sum }
    val partQty = li.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(r => q2(r._3)).sum }
    val nat = Tables.supplier(spark, sf0001)
      .filter(col("s_nationkey") < 13).select("s_suppkey")
      .as[Long].collect().toSet
    val want = pairQty.collect {
      case ((pk, sk), q) if q * 2 > partQty(pk) && nat(sk) => sk
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("priority_count totals the problem orders of the quarter once each") {
    val rows = Tpch.priorityCount(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val want = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit("2001-04-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("2001-07-01 00:00:00").cast("timestamp"))
      .join(Tables.lineitem(spark, sf0001).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .count()
    assert(rows.map(_.getLong(1)).sum == want,
      "each problem order counts once regardless of its problem-line count")
  }

  test("forecast_revenue equals the driver-side exact-decimal recompute") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .select("l_extendedprice", "l_discount").as[(Double, Double)].collect()
    def q2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val want = li.map { case (ep, d) => q2(ep) * q2(d) }.sum
    val row = Tpch.forecastRevenue(spark, sf0001).collect().head
    assert(row.getDouble(0) == want.toDouble && row.getLong(1) == li.length)
  }

  test("returned_customers is the true top-20 and plans a bounded top-k") {
    val df = Tpch.returnedCustomers(spark, sf0001)
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(3))
    assert(revs.sameElements(revs.sortBy(-(_: Double))), "sorted by revenue desc")
    // the per-customer agg's top-k must plan as TakeOrderedAndProject,
    // never a global sort of the aggregate
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      df.queryExecution.executedPlan.toString.take(2000))
  }

  test("promo_revenue: share consistent, promo bounded by total") {
    val r = Tpch.promoRevenue(spark, sf0001).collect().head
    val (pct, promo, total) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0 && promo <= total)
    assert(pct == 100.0 * promo / total)
  }

  test("weighted_sample: priority is hash/weight and inclusion is weight-monotone") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val out = graft.operators.Sampling
      .weightedPriorityTopK(docs, col("doc_id"), col("n_chars"), k = 64)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 64)
    // recompute priorities on the driver with the same md5 path
    def prio(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graftws$id".getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / w.toDouble
    }
    out.foreach { case (id, w, p) => assert(p == prio(id, w), s"doc $id") }
    // the sample IS the global bottom-64 by (priority, id)
    val all = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
      .filter(_._2 > 0).map { case (id, w) => (prio(id, w), id, w) }.sorted.take(64)
    assert(out.map(_._1).toSet == all.map(_._2).toSet)
    // monotone inclusion: doubling every weight halves every priority —
    // the sample under scaled weights is the SAME set (scale-invariance),
    // and raising one excluded doc's weight enough pulls it in
    val inSet = out.map(_._1).toSet
    val outDoc = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
      .filter(r => r._2 > 0 && !inSet(r._1)).head
    val boosted = docs.withColumn("n_chars",
      when(col("doc_id") === outDoc._1, lit(Long.MaxValue / 4)).otherwise(col("n_chars")))
    val boostedSample = graft.operators.Sampling
      .weightedPriorityTopK(boosted, col("doc_id"), col("n_chars"), k = 64)
      .as[(Long, Long, Double)].collect().map(_._1).toSet
    assert(boostedSample(outDoc._1), "a large-enough weight always enters the sample")
  }

  test("weighted_sample plans as a bounded top-k (TakeOrdered), not a global sort") {
    val plan = graft.operators.Sampling
      .weightedPriorityTopK(Tables.documents(spark, sf0001),
        col("doc_id"), col("n_chars"), k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.plans.Lineage
import graft.plans.Lineage.Src

/** Pins the ExprId-reachability walk on the plan shapes that break
  * name-based lineage tools: alias chains, self-joins on renamed
  * columns, positional union merge, generators, grouping-set Expand,
  * and cache boundaries. The registered `lineage_report` query pins
  * three real pipelines against a VALUES oracle; these pin the LAWS. */
class LineageSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(df: org.apache.spark.sql.DataFrame): Map[String, Set[Src]] =
    Lineage.columns(df).toMap

  test("alias chains resolve to base columns; literals have no sources") {
    val docs = Tables.documents(spark, sf0001)
    val df = docs.select(col("doc_id").as("a"), col("n_chars").as("b"))
      .select((col("a") + col("b")).as("c"), lit(1).as("k"))
    val e = edges(df)
    assert(e("c") == Set(Src("documents", "doc_id"), Src("documents", "n_chars")))
    assert(e("k") == Set.empty)
  }

  test("self-join with renames keeps the two sides' provenance separate") {
    val ord = Tables.orders(spark, sf0001)
    val l = ord.select(col("o_orderkey").as("k"), col("o_totalprice").as("lp"))
    val r = ord.select(col("o_orderkey").as("k"), col("o_orderpriority").as("rp"))
    val e = edges(l.join(r, "k").select(col("lp").as("x"), col("rp").as("y")))
    assert(e("x") == Set(Src("orders", "o_totalprice")))
    assert(e("y") == Set(Src("orders", "o_orderpriority")))
  }

  test("union merges positionally across differently-named branches") {
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val u = ev.select(col("event_id").as("id"))
      .union(docs.select(col("doc_id").as("whatever")))
    val e = edges(u)
    assert(e("id") == Set(Src("events", "event_id"), Src("documents", "doc_id")))
  }

  test("generators (explode) attribute output to the generator's references") {
    val docs = Tables.documents(spark, sf0001)
    val df = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val e = edges(df)
    assert(e("tok") == Set(Src("documents", "text")))
    assert(e("n") == Set.empty) // count(1): control lineage is out of scope
  }

  test("grouping sets (Expand) union provenance across projections") {
    val ev = Tables.events(spark, sf0001)
    val df = ev.cube(col("event_type"), col("user_id"))
      .agg(sum(col("value")).as("s"))
    val e = edges(df)
    assert(e("s") == Set(Src("events", "value")))
    assert(e("event_type") == Set(Src("events", "event_type")))
  }

  test("lineage walks through a persisted (InMemoryRelation) stage") {
    val ev = Tables.events(spark, sf0001)
    val cached = ev.select(col("user_id"), col("value")).persist()
    try {
      cached.count() // materialize so the analyzed plan uses the cache
      val e = edges(cached.groupBy(col("user_id"))
        .agg(sum(col("value")).as("total")))
      assert(e("total") == Set(Src("events", "value")))
      assert(e("user_id") == Set(Src("events", "user_id")))
    } finally cached.unpersist()
  }

  test("lineage resolves through the custom as-of join node (re-aliased right side)") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val e = edges(graft.plans.AsOfJoin(spark, p, c,
      Seq("user_id"), Seq("ts", "event_id"), Seq("click_ts", "click_id")))
    // the right side's defensive re-alias (fresh exprIds) must not
    // erase provenance: click_* still traces to the events columns
    assert(e("click_id") == Set(Src("events", "event_id")))
    assert(e("click_ts") == Set(Src("events", "ts")))
    assert(e("user_id") == Set(Src("events", "user_id")))
  }

  test("subquery-derived columns carry the subquery plan's provenance") {
    Tables.orders(spark, sf0001).createOrReplaceTempView("lin_ord")
    Tables.customer(spark, sf0001).createOrReplaceTempView("lin_cust")
    val scalar = spark.sql(
      """SELECT o_orderkey,
        |  (SELECT MAX(c_acctbal) FROM lin_cust) AS max_bal
        |FROM lin_ord""".stripMargin)
    val e = edges(scalar)
    // pre-fix this reported __literal (empty set): references excludes
    // the subquery plan, silently dropping real provenance
    assert(e("max_bal") == Set(Src("customer", "c_acctbal")))

    // correlated scalar subquery: both the outer probe column and the
    // subquery's aggregated column are sources
    val correlated = spark.sql(
      """SELECT o_orderkey,
        |  (SELECT MAX(c_acctbal) FROM lin_cust
        |   WHERE c_custkey = o_custkey) AS cust_bal
        |FROM lin_ord""".stripMargin)
    val ec = edges(correlated)
    assert(ec("cust_bal").contains(Src("customer", "c_acctbal")))
  }

  test("report emits deterministic OpenLineage-style edges") {
    val ev = Tables.events(spark, sf0001)
    val rep = Lineage.report(
        ev.select(col("user_id"), lit(0L).as("zero")), "probe")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rep.toSet == Set(
      ("probe", "user_id", "events", "user_id"),
      ("probe", "zero", "__literal", "__none")))
  }
}

package graft

/** Smoke: every registered query runs and returns rows on sf0.001, and
  * every oracle key refers to a registered query. Value-level correctness
  * is the DuckDB-oracle gate (graft.Verify + driver compare). */
class QueriesSpec extends SparkTestBase {

  test("oracle keys are a subset of query names, with matching names") {
    val qn = SparkEntry.queries.keySet
    val on = SparkEntry.oracleSql.keySet
    assert(on.subsetOf(qn), s"orphan oracles: ${on.diff(qn)}")
  }

  test("entry returns rows (driver t1 gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001 and returns rows") {
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}

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

  test("corpus_stats slices are consistent with the whole-corpus facts") {
    import org.apache.spark.sql.functions._
    val stats = SparkEntry.queries("corpus_stats")(spark, sf0001)
      .agg(sum("n_docs"), sum("n_tokens"), sum("n_exact_dup"), sum("n_keep"))
      .head()
    val docs = Tables.documents(spark, sf0001)
    assert(stats.getLong(0) == docs.count())
    val tok = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    assert(stats.getLong(1) == tok)
    // docs living in a sha256 group of size > 1, counted independently
    val dup = docs.groupBy(sha2(col("text"), 256)).count()
      .filter(col("count") > 1).select(sum("count")).head()
    val nDup = if (dup.isNullAt(0)) 0L else dup.getLong(0)
    assert(stats.getLong(2) == nDup)
    val keep = SparkEntry.queries("quality_gopher")(spark, sf0001)
      .filter(col("keep")).count()
    assert(stats.getLong(3) == keep)
  }
}

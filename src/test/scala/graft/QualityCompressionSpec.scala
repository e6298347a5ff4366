package graft

import org.apache.spark.sql.functions._

import graft.functions.DeflateLength

/** Laws of the deflate-length quality signal (the oracle can't see
  * zlib bytes, so the contract is pinned here, not by hash). */
class QualityCompressionSpec extends SparkTestBase {
  import spark.implicits._

  private def len(s: String): Long =
    Seq(s).toDF("t").select(DeflateLength(col("t"))).as[Long].head()

  test("repetitive text compresses far below unique-token text of equal size") {
    val rep = "spam ham " * 500
    val rng = new scala.util.Random(7)
    val uniq = Seq.fill(500)(rng.alphanumeric.take(8).mkString).mkString(" ")
    val (lr, lu) = (len(rep), len(uniq.take(rep.length)))
    assert(lr * 5 < lu, s"repetitive $lr should be ≪ unique $lu")
    // ratio sanity: prose-ish unique text still compresses a little
    assert(lu < rep.length)
  }

  test("deterministic across partitionings and re-evaluation; empty is a tiny constant") {
    val docs = Tables.documents(spark, sf0001)
    val a = docs.repartition(13)
      .select(col("doc_id"), DeflateLength(col("text")).as("l"))
      .as[(Long, Long)].collect().toSet
    val b = docs.coalesce(1)
      .select(col("doc_id"), DeflateLength(col("text")).as("l"))
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
    val e = len("")
    assert(e >= 0L && e <= 8L, s"empty deflate should be a header-sized constant, got $e")
  }

  test("SQL surface + query shape: per-row only, null-safe, exact scaled ratio") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_deflate_len('aaaaaaaaaa') AS l")
      .as[Long].head()
    assert(viaSql == len("aaaaaaaaaa"))
    assert(spark.sql("SELECT graft_deflate_len(CAST(NULL AS STRING)) AS l")
      .collect().head.isNullAt(0))

    // plan check on the PRE-execution plan: after a collect, AQE's
    // toString prints final + initial sections and double-counts
    val exchanges = "Exchange".r.findAllIn(
      graft.queries.LlmOps.qualityCompression(spark, sf0001)
        .queryExecution.executedPlan.toString).size
    assert(exchanges <= 1, "per-row operator grew a shuffle")

    val out = graft.queries.LlmOps.qualityCompression(spark, sf0001)
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val (nb, dl, rs) = (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))
      if (nb > 0) assert(rs == dl * 1000000L / nb, s"doc ${r.getLong(0)}")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries.DataCleaning

/** Statistical laws behind the hash-checked queries: the Poisson
  * bootstrap's weights and interval actually behave like a bootstrap,
  * and the Benford audit's shares are a distribution. */
class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  test("the 95% percentile interval over replicate means covers the corpus mean") {
    val reps = DataCleaning.bootstrapCi(spark, sf0001)
      .select("mean_cents").as[Double].collect().sorted
    assert(reps.length == 100)
    val lo = reps(2); val hi = reps(97)
    val truth = Tables.orders(spark, sf0001)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .agg(sum("c").cast("double") / count(lit(1)).cast("double"))
      .as[Double].head()
    assert(lo < truth && truth < hi,
      s"95% interval [$lo, $hi] must cover the corpus mean $truth")
    assert(hi - lo < truth, "interval sanity: narrower than the mean itself")
  }

  test("weights are Poisson(1) in aggregate: mean ~ 1, P(0) ~ 1/e, counts conserve") {
    val n = Tables.orders(spark, sf0001).count()
    val reps = DataCleaning.bootstrapCi(spark, sf0001)
      .select("resample_n").as[Long].collect()
    val meanW = reps.map(_.toDouble / n).sum / reps.length
    assert(math.abs(meanW - 1.0) < 0.02,
      s"mean weight $meanW should be ~1 (Poisson(1))")
    // each replicate's total stays within ~4 sigma of n (sd = sqrt(n))
    val sd = math.sqrt(n.toDouble)
    assert(reps.forall(r => math.abs(r - n) < 5 * sd),
      s"replicate sizes should concentrate around n=$n: ${reps.min}..${reps.max}")
  }

  test("benford shares and expectations each form a distribution") {
    val rows = DataCleaning.benfordAudit(spark, sf0001)
      .select("digit", "share", "benford").as[(Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1L to 9L))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9, "shares sum to 1")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9, "Benford masses sum to 1")
  }
}

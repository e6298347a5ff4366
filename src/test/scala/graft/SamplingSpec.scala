package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("hash sample is deterministic and close to the nominal fraction") {
    val a = Sampling.hashSample(ids, col("id"), 0.2).as[Long].collect().toSet
    val b = Sampling.hashSample(ids, col("id"), 0.2).as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size / 20000.0 - 0.2) < 0.02, s"got ${a.size}")
  }

  test("larger fraction is a strict superset; different salt decorrelates") {
    val small = Sampling.hashSample(ids, col("id"), 0.1).as[Long].collect().toSet
    val big = Sampling.hashSample(ids, col("id"), 0.5).as[Long].collect().toSet
    assert(small.subsetOf(big))
    val other = Sampling.hashSample(ids, col("id"), 0.1, salt = "other").as[Long].collect().toSet
    // overlap of two independent 10% samples ≈ 1% of the corpus
    val overlap = (small intersect other).size / 20000.0
    assert(overlap < 0.03, s"salted samples correlated: $overlap")
  }

  test("stratified sample applies per-stratum fractions with a default of drop") {
    val df = ids.withColumn("grp", (col("id") % 3).cast("string"))
    val out = Sampling.stratifiedSample(df, col("id"), col("grp"),
        fractions = Map("0" -> 1.0, "1" -> 0.25))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(out("0") > 6600)                 // every id ≡ 0 (mod 3) kept
    assert(math.abs(out("1") - 6667 * 0.25) < 300)
    assert(!out.contains("2"))              // default fraction 0 drops
  }

  test("thresholdHex edges") {
    assert(Sampling.thresholdHex(0.0) == "0" * 32)
    assert(Sampling.thresholdHex(1.0) == "f" * 32)
    assert(Sampling.thresholdHex(0.5).startsWith("8"))
    assert(Sampling.thresholdHex(0.5).length == 32)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries.DataCleaning

/** Pins the stats_moments split (round-10 restructure): the
  * oracle-gated query carries ONLY exact integer/decimal sufficient
  * statistics (hash-stable under any engine version), and the derived
  * cov/corr doubles live in the rows-only twin whose values THIS spec
  * adjudicates — against a hand-computed fixture and against Spark's
  * own `covar_samp`/`corr` on the real corpus. */
class StatsMomentsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val fixtureDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-moments").toString
    // en: x = n_chars = (3, 5, 10), y = tokens = (2, 3, 7); fr: one row.
    Seq(
      (1L, "a b", "en", "s", 3L),
      (2L, "a b c", "en", "s", 5L),
      (3L, "a b c d e f g", "en", "s", 10L),
      (4L, "a", "fr", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("sufficient statistics are the exact hand-computed integers") {
    val rows = DataCleaning.statsMoments(spark, fixtureDir).collect()
    assert(rows.length == 2)
    val en = rows(0)
    assert(en.getString(0) == "en")
    // n=3, sx=18, sy=12, sxy=3*2+5*3+10*7=91, sxx=9+25+100=134,
    // syy=4+9+49=62 — accumulated exactly in DECIMAL(38,0), emitted as
    // BIGINT (the representation-portable type; see statsMoments doc).
    assert(en.getLong(1) == 3L)
    assert(Seq(2, 3, 4, 5, 6).map(en.getLong) ==
      Seq(18L, 12L, 91L, 134L, 62L))
    val fr = rows(1)
    assert(fr.getString(0) == "fr" && fr.getLong(1) == 1L)
  }

  test("oracle-gated schema carries no doubles (the hash-stability contract)") {
    val schema = DataCleaning.statsMoments(spark, fixtureDir).schema
    assert(!schema.exists(f =>
      f.dataType == org.apache.spark.sql.types.DoubleType ||
      f.dataType == org.apache.spark.sql.types.FloatType),
      s"stats_moments must stay double-free; got $schema")
  }

  test("derived twin matches the hand computation exactly") {
    val en = DataCleaning.statsMomentsDerived(spark, fixtureDir)
      .filter(col("lang") === "en").collect().head
    // cov = (3*91 - 18*12) / (3*2) = 57/6 = 9.5
    assert(en.getDouble(2) == 9.5d)
    // corr = 57 / (sqrt(3*134-18^2) * sqrt(3*62-12^2)) = 57/(sqrt78*sqrt42)
    val want = 57.0d / (math.sqrt(78.0) * math.sqrt(42.0))
    assert(math.abs(en.getDouble(3) - want) <= 1e-15)
  }

  test("derived twin matches Spark's covar_samp/corr on the real corpus") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), col("n_chars").cast("double").as("x"),
        size(split(col("text"), " ")).cast("double").as("y"))
    val builtin = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), covar_samp(col("x"), col("y")).as("cov_b"),
        corr(col("x"), col("y")).as("corr_b"))
    val derived = DataCleaning.statsMomentsDerived(spark, sf0001)
    val joined = derived.join(builtin.drop("n"), Seq("lang")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (cov, corrV) = (r.getDouble(2), r.getDouble(3))
      val (covB, corrB) = (r.getDouble(4), r.getDouble(5))
      // Built-in partials merge doubles in partition order; the exact-sum
      // derivation is the reference. 1e-9 relative separates real bugs
      // from that merge noise.
      assert(math.abs(cov - covB) <= 1e-9 * math.max(1.0, math.abs(covB)),
        s"cov mismatch for ${r.getString(0)}: $cov vs $covB")
      assert(math.abs(corrV - corrB) <= 1e-9 * math.max(1.0, math.abs(corrB)),
        s"corr mismatch for ${r.getString(0)}: $corrV vs $corrB")
    }
  }
}

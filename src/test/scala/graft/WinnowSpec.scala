package graft

import org.apache.spark.sql.functions._

import graft.functions.WinnowFingerprint
import graft.queries.LlmOps

/** The codegen'd winnow kernel vs the built-in-HOF reference formulation:
  * identical output on the driver corpus, random strings (unicode, short,
  * empty), and across (k, w) choices. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  /** The round-2 registered formulation, kept as the executable spec of
    * the semantics: xxhash64 over substr k-grams, array_min over slices,
    * array_distinct (first-occurrence order). */
  private def hofFingerprint(k: Int, w: Int) = {
    val grams =
      s"transform(sequence(1, greatest(length(txt) - ${k - 1}, 1)), i -> xxhash64(substr(txt, i, $k)))"
    expr(
      s"array_distinct(transform(sequence(1, greatest(size($grams) - ${w - 1}, 1)), j -> array_min(slice($grams, j, $w))))")
  }

  private def bothForms(texts: Seq[String], k: Int, w: Int): Seq[(Seq[Long], Seq[Long])] =
    texts.toDF("txt")
      .select(WinnowFingerprint(col("txt"), k, w).as("fast"), hofFingerprint(k, w).as("ref"))
      .as[(Seq[Long], Seq[Long])]
      .collect()
      .toSeq

  test("matches the HOF reference on the sf0.001 documents corpus (k=8, w=16)") {
    val texts = Tables.documents(spark, sf0001)
      .select("text").as[String].collect().toSeq
    bothForms(texts, 8, 16).zipWithIndex.foreach { case ((fast, ref), i) =>
      assert(fast == ref, s"doc $i")
    }
  }

  test("matches the HOF reference on adversarial edges") {
    val texts = Seq(
      "", "a", "short", "exactly8", "exactly8chars_16",
      "naïve — üñíçødé ∑ text 🙂 with multibyte chars",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // all-equal grams: min ties
      " spaced   out\ttabs\nnewlines ",
      "x" * 15, "y" * 16, "z" * 17)
    for (k <- Seq(1, 2, 8); w <- Seq(1, 4, 16)) {
      bothForms(texts, k, w).zipWithIndex.foreach { case ((fast, ref), i) =>
        assert(fast == ref, s"text ${texts(i).take(20)} k=$k w=$w")
      }
    }
  }

  test("matches the HOF reference on random strings (property)") {
    val rng = new scala.util.Random(42)
    val alnum = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ ' '
    val wide = Seq("a", "b", " ", "é", "語", "🙂")
    val texts = Seq.fill(200) {
      if (rng.nextInt(10) < 8)
        Seq.fill(rng.nextInt(200))(alnum(rng.nextInt(alnum.length))).mkString
      else
        Seq.fill(rng.nextInt(80))(wide(rng.nextInt(wide.length))).mkString
    }
    bothForms(texts, 8, 16).zipWithIndex.foreach { case ((fast, ref), i) =>
      assert(fast == ref, s"random text $i")
    }
  }

  test("registered winnow_fingerprint query keeps its round-2 shape") {
    val out = LlmOps.winnowFingerprint(spark, sf0001)
    assert(out.columns.toSeq == Seq("doc_id", "n_fingerprints", "min_fp"))
    assert(out.count() == 500)
  }
}

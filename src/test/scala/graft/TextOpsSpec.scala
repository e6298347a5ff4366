package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bpeishTokens extraction form equals the boundary-split formulation") {
    // the original lookaround-split definition, kept as the executable
    // reference (lookarounds are Java-regex-only, which is why the
    // implementation moved to the RE2-compatible extraction form)
    def splitForm(text: org.apache.spark.sql.Column) =
      filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
        t => t =!= "" && t =!= " ")

    val rng = new scala.util.Random(11)
    val chars = "abcXYZ019 .,;:!?()-_'\"/\t"
    val texts = Seq("", " ", "   ", "plain words here", "a1b2c3",
      "punct.,;end", "tabs\there", "-lead and trail-") ++
      Seq.fill(300)(Seq.fill(rng.nextInt(60))(chars(rng.nextInt(chars.length))).mkString)
    val rows = texts.toDF("txt")
      .select(TextOps.bpeishTokens(col("txt")).as("ex"), splitForm(col("txt")).as("sp"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zipWithIndex.foreach { case ((ex, sp), i) =>
      assert(ex == sp, s"text ${texts(i).take(30)}")
    }
  }

  test("token_bpe query: counts line up on a known document") {
    val out = Seq((1L, "Hello, world! x2"))
      .toDF("doc_id", "text").createOrReplaceTempView("ignore_me")
    val toks = Seq("Hello", ",", "world", "!", "x2")
    val got = Seq("Hello, world! x2").toDF("text")
      .select(TextOps.bpeishTokens(col("text"))).as[Seq[String]].head()
    assert(got == toks)
  }

  test("scrubPii redacts emails, phones and IPs; counts match occurrences") {
    val raw = "mail a.b+c@ex-ample.org then 555-0199 twice 555-0200 " +
      "from 192.168.0.1 but not 555-12345 nor ver 1.2.3"
    val (scrubbed, ne, np, ni) = Seq(raw).toDF("t")
      .select(TextOps.scrubPii(col("t")),
        TextOps.matchCount(col("t"), TextOps.emailRe),
        TextOps.matchCount(col("t"), TextOps.phoneRe),
        TextOps.matchCount(col("t"), TextOps.ipRe))
      .as[(String, Int, Int, Int)].head()
    assert(scrubbed == "mail <EMAIL> then <PHONE> twice <PHONE> " +
      "from <IP> but not 555-12345 nor ver 1.2.3")
    assert((ne, np, ni) == (1, 2, 1))
  }
}

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

  test("quality_gopher: each rule fires on its designed violation") {
    // corpus docs run 10-99 tokens: the >=50 count rule genuinely splits
    // the corpus, and keep is exactly the conjunction of the rule columns
    val corpus = graft.queries.LlmOps.qualityGopher(spark, sf0001)
    val kept = corpus.filter(col("keep")).count()
    assert(kept > 0 && kept < corpus.count())
    assert(corpus.filter(col("keep") =!= (col("r_count") && col("r_word_len") &&
      col("r_alpha") && col("r_stop") && col("r_ttr"))).count() == 0)
    // crafted violations, one per rule (metrics recomputed on a local df)
    val short = "the a of and to"                                // < 50 tokens
    val longWords = ("the a " + Seq.fill(60)("extraordinarily").mkString(" "))  // mean len > 10
    val symbols = "the a " + Seq.fill(60)("### !!! $$$ %%%").mkString(" ") // alpha < 0.8
    val noStop = Seq.fill(60)("alpha beta gamma delta").mkString(" ")      // 0 stopwords
    val repeat = "the a " + Seq.fill(100)("spam").mkString(" ")            // ttr < 0.2
    val df = Seq((1L, short), (2L, longWords), (3L, symbols), (4L, noStop),
      (5L, repeat)).toDF("doc_id", "text")
    val w = TextOps.tokens(col("text"))
    val out = df.select(col("doc_id"),
        size(w).between(50, 100000).as("r_count"),
        (((length(col("text")) - size(w) + 1).cast("double") / size(w)) >= 3.0 &&
          ((length(col("text")) - size(w) + 1).cast("double") / size(w)) <= 10.0).as("r_word_len"),
        ((size(filter(w, t => t.rlike("[A-Za-z]"))).cast("double") / size(w)) >= 0.8).as("r_alpha"),
        (TextOps.hitCount(w, TextOps.enStopwords) >= 2).as("r_stop"),
        ((size(array_distinct(w)).cast("double") / size(w)) >= 0.2).as("r_ttr"))
      .orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(out(0)._2 == false)  // short: count rule fails
    assert(out(1)._3 == false)  // longWords: word-length rule fails
    assert(out(2)._4 == false)  // symbols: alpha rule fails
    assert(out(3)._5 == false)  // noStop: stopword rule fails
    assert(out(4)._6 == false)  // repeat: ttr rule fails
  }

  test("lm_unigram: frequencies and per-doc sums on a known corpus") {
    // corpus: 'x' appears 3 times total, 'y' 2, 'z' 1
    val docs = Seq((1L, "x x y"), (2L, "x y z")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val out = toks.join(vocab, "tok").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("tf")).as("s"), min(col("tf")).as("m"))
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    // doc 1: tf(x)+tf(x)+tf(y) = 3+3+2 = 8, min 2
    assert(out(0) == ((1L, 3L, 8L, 2L)))
    // doc 2: 3+2+1 = 6, min 1
    assert(out(1) == ((2L, 3L, 6L, 1L)))
  }

  test("lm_bigram equals an independent Scala bigram count on sf0.001") {
    import graft.queries.LlmOps
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .as[(Long, String)].collect()
    // split(" ", -1) keeps empty tokens exactly like Spark's split regex
    val perDoc = docs.map { case (id, t) =>
      val w = t.split(" ", -1).toSeq
      id -> (if (w.size < 2) Seq.empty[String]
             else w.sliding(2).map(p => p(0) + " " + p(1)).toSeq)
    }
    val bf = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = perDoc.filter(_._2.nonEmpty).map { case (id, bgs) =>
      val fs = bgs.map(bf)
      (id, bgs.size.toLong, fs.sum, fs.min, fs.count(_ == 1L).toLong,
        fs.sum.toDouble / bgs.size.toDouble)
    }.sortBy(_._1).toSeq
    val out = LlmOps.lmBigram(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == want)
  }

  test("WordShingles byte-range kernel equals the HOF shingle formulation") {
    val rng = new scala.util.Random(17)
    val chars = "abXY01 éß世 .,!"  // multi-byte UTF-8 + punctuation + spaces
    val texts = Seq("", " ", "  ", "a", "a b", "a b c", "a  b c", " a b c ",
      "é 世 ß x", "one two three four five") ++
      Seq.fill(300)(Seq.fill(rng.nextInt(40))(chars(rng.nextInt(chars.length))).mkString)
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = texts.toDF("txt")
        .select(TextOps.shingles(col("txt"), n).as("k"),
          TextOps.shinglesHof(col("txt"), n).as("h"))
        .as[(Seq[String], Seq[String])].collect()
      rows.zipWithIndex.foreach { case ((k, h), i) =>
        assert(k == h, s"n=$n text='${texts(i)}'")
      }
    }
  }

  test("normalize: NFC + strip + collapse, and it rescues combining-char near-dups") {
    import graft.operators.{Dedup, TextOps}
    // precomposed \u00e9 vs e + COMBINING ACUTE (U+0301): byte-distinct,
    // canonically equal -- raw exact dedup hashes them apart
    val docs = Seq(
      (1L, "caf\u00e9 latte"),
      (2L, "cafe\u0301   latte\u200B \t ")).toDF("doc_id", "text")
    val raw = Dedup.exact(docs, col("doc_id"), col("text"))
    assert(raw.count() == 2, "raw exact dedup wrongly unified NFC variants")
    val normed = Dedup.exact(docs, col("doc_id"), TextOps.normalize(col("text")))
      .as[(String, Long, Long)].collect()
    assert(normed.length == 1 && normed.head._2 == 1L && normed.head._3 == 2L,
      s"normalized dedup should unify the pair, got ${normed.toSeq}")
    // each normalization step individually
    val steps = Seq(
      "a\u0301" -> "\u00e1",            // NFC composes
      "a\u0001b\u200Bc" -> "abc",       // control + zero-width stripped
      "a \t\r\n b" -> "a b",           // whitespace run collapses
      " x " -> "x",                       // trim
      "" -> "")
      .toDF("in", "want")
    val got = steps.select(TextOps.normalize(col("in")), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w, s"'$g' != '$w'") }
  }

  test("boilerplate scrub: frequency criterion, reassembly order, round-trip") {
    import graft.operators.Boilerplate
    // segment size 2, minDocs 2: "c1 c2" opens three docs (boilerplate);
    // "u1 u2" appears twice but only in doc 1 (distinct-doc count 1 ->
    // kept); every other segment is unique
    val docs = Seq(
      (1L, "c1 c2 u1 u2 u1 u2"),
      (2L, "a1 a2 c1 c2 b1"),
      (3L, "c1 c2 d1 d2"),
      (4L, "e1 e2 e3 e4 e5")).toDF("doc_id", "text")
    val got = Boilerplate.scrubFrequent(docs, col("doc_id"), col("text"),
        k = 2, minDocs = 2)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      // doc 1: block 0 scrubbed, blocks (u1 u2)(u1 u2) kept — distinct
      // DOC count gates, not occurrence count
      (1L, 3L, 1L, 2L, "u1 u2 u1 u2"),
      // doc 2: odd length — "c1 c2" straddles a block boundary here
      // ((a1 a2)(c1 c2)(b1)), so the middle block is scrubbed and the
      // short tail survives
      (2L, 3L, 1L, 2L, "a1 a2 b1"),
      (3L, 2L, 1L, 2L, "d1 d2"),
      // doc 4: nothing frequent — exact round-trip
      (4L, 3L, 0L, 0L, "e1 e2 e3 e4 e5")))
    // a doc that is ALL boilerplate scrubs to the empty string
    val all = Boilerplate.scrubFrequent(
        Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 2, minDocs = 2)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(all.forall(r => r._5 == "" && r._4 == 2L))
    graft.operators.Dedup.releaseCaches()
  }

  test("boilerplate scrub on the corpus: token conservation, no scrubbed segment survives") {
    import graft.operators.Boilerplate
    val docs = Tables.documents(spark, sf0001)
    val out = Boilerplate.scrubFrequent(docs, col("doc_id"), col("text"),
      k = 3, minDocs = 3)
    val joined = out.join(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_orig")), "doc_id")
      .select(col("n_blocks"), col("n_scrubbed_blocks"),
        col("n_scrubbed_tokens"),
        size(split(col("text_clean"), " ")).cast("long").as("n_clean"),
        when(col("text_clean") === "", 0L)
          .otherwise(size(split(col("text_clean"), " ")).cast("long")).as("n_kept"),
        col("n_orig"))
      .collect()
    assert(joined.nonEmpty)
    // kept + scrubbed tokens == original tokens, and something scrubbed
    joined.foreach { r =>
      assert(r.getLong(4) + r.getLong(2) == r.getLong(5),
        s"token conservation violated: $r") }
    assert(joined.map(_.getLong(2)).sum > 0, "expected a binding scrub at sf0.001")
    graft.operators.Dedup.releaseCaches()
  }

  test("fraction scrub equals the exact minDocs scrub where the thresholds coincide") {
    import graft.operators.Boilerplate
    val docs = Tables.documents(spark, sf0001)
    // D=500 docs: max(2, ceil(500/2000)) = 2, so the fraction form must
    // reproduce scrubFrequent(minDocs = 2) bitwise — the MG candidate
    // stage may differ per run, the exact recount must not
    graft.operators.Dedup.releaseCaches()
    val exact = Boilerplate.scrubFrequent(docs, col("doc_id"), col("text"),
      k = 3, minDocs = 2).orderBy("doc_id").collect().toSeq
    val viaMg = Boilerplate.scrubFrequentFraction(docs, col("doc_id"),
      col("text"), k = 3, numer = 1, denom = 2000, kSummary = 32768)
      .orderBy("doc_id").collect().toSeq
    assert(viaMg == exact)
    assert(exact.map(_.getLong(2)).sum > 0, "expected a binding scrub")
    graft.operators.Dedup.releaseCaches()
  }

  test("fraction scrub fails loud when the summary is too small for the guarantee") {
    import graft.operators.Boilerplate
    val docs = Tables.documents(spark, sf0001)
    graft.operators.Dedup.releaseCaches()
    val ex = intercept[Exception] {
      Boilerplate.scrubFrequentFraction(docs, col("doc_id"), col("text"),
        k = 3, numer = 1, denom = 2000, kSummary = 16).collect()
    }
    assert(ex.getMessage != null)
    graft.operators.Dedup.releaseCaches()
  }

  test("ccnet buckets: per-source tertiles on the corpus, balanced and ordered") {
    val out = graft.queries.LlmOps.qualityCcnetBuckets(spark, sf0001)
      .as[(Long, String, Long, Double, Long)].collect()
    assert(out.nonEmpty && out.forall(r => r._5 >= 1 && r._5 <= 3))
    out.groupBy(_._2).foreach { case (src, rows) =>
      // ntile balance: bucket sizes differ by at most one
      val sizes = rows.groupBy(_._5).view.mapValues(_.size).toMap
      assert(sizes.values.max - sizes.values.min <= 1,
        s"unbalanced tertiles for $src: $sizes")
      // ordering: every head doc's (avg_tf, -doc_id) sort key is >= every
      // tail doc's — heads are the most target-frequent (lowest-ppl proxy)
      val byBucket = rows.groupBy(_._5).view
        .mapValues(_.map(r => (r._4, -r._1)).toSeq).toMap
      for (hi <- 1L to 2L; lo <- (hi + 1) to 3L
           if byBucket.contains(hi) && byBucket.contains(lo)) {
        assert(Ordering[(Double, Long)].gteq(byBucket(hi).min,
          byBucket(lo).max),
          s"bucket $hi not uniformly above bucket $lo in $src")
      }
    }
  }

  test("llm_prepare_corpus composition: every stage binds on crafted docs") {
    // mirror the registered query's exact composition (cleanStream ->
    // sha-keyed exact dedup -> budgetSelect) on documents crafted so
    // each stage decides something the natural corpus doesn't force:
    // 51 distinct gate-passing tokens (the count rule needs >= 50)
    val base = (Seq("the", "and") ++ (3 to 51).map(i => f"tok$i%02d"))
    val doc4 = (base ++ Seq("mail", "x@y.org")).mkString(" ")
    val docs = Seq(
      (1L, base.mkString(" ")),                          // survives as-is
      (2L, (base ++ base.take(3)).mkString(" ")),        // scrub -> dup of 1
      (3L, "too short to keep"),                         // gate drops
      (4L, doc4)                                         // PII scrubbed
    ).toDF("doc_id", "text")
    val cleaned = graft.streaming.StreamingDownsample.cleanStream(docs)
    val keepers = cleaned
      .groupBy(sha2(col("clean_text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val kept = cleaned.join(keepers, Seq("doc_id"), "semi")
    // gate dropped 3; scrub made 2 an exact dup of 1; dedup kept {1, 4}
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    val scrubbed4 = kept.filter(col("doc_id") === 4L)
      .select("clean_text").as[String].head()
    assert(scrubbed4.endsWith("mail <EMAIL>"), s"got: $scrubbed4")
    // budget 53: doc 4 (score 53) fills it exactly; doc 1 (51) is cut
    val out = graft.operators.Sampling.budgetSelect(kept, col("doc_id"),
        score = size(array_distinct(split(col("clean_text"), " "))),
        nTokens = size(split(col("clean_text"), " ")),
        budgetTokens = 53)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((4L, 53L, 53L, 53L)), s"got $out")
  }

  test("writePreparedCorpus: the artifact equals the checked selection") {
    import graft.queries.LlmOps
    val out = java.nio.file.Files
      .createTempDirectory("graft-prep").toString + "/corpus"
    LlmOps.writePreparedCorpus(spark, sf0001, out)
    val artifact = spark.read.parquet(out)
      .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    val checked = LlmOps.llmPrepareCorpus(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(artifact.map(r => (r._1, r._2, r._3, r._4)) == checked,
      "artifact rows diverge from the oracle-checked selection")
    assert(artifact.nonEmpty)
    // the written text is the CLEANED text, not the raw corpus
    val cleanMap = graft.streaming.StreamingDownsample.cleanStream(
        Tables.documents(spark, sf0001).select(col("doc_id"), col("text")))
      .as[(Long, String)].collect().toMap
    artifact.foreach { r =>
      assert(cleanMap(r._1) == r._5, s"doc ${r._1} text not the clean form") }
    graft.operators.Dedup.releaseCaches()
  }

  test("intradoc scrub: keep-first semantics, tail blocks, round-trip") {
    import graft.operators.Boilerplate
    val docs = Seq(
      // k=2 blocks: (a b)(a b)(c d)(a b) — repeats of block 0 dropped
      (1L, "a b a b c d a b"),
      // odd tail: (x y)(x y)(x) — the short tail "x" is NOT the block
      // "x y", so it survives
      (2L, "x y x y x"),
      // no within-doc repeats — exact round-trip (cross-doc repetition
      // of "a b" with doc 1 must NOT scrub anything here)
      (3L, "a b c d e")).toDF("doc_id", "text")
    val got = Boilerplate.scrubRepeatedBlocks(docs, col("doc_id"),
        col("text"), k = 2)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 4L, "a b c d"),
      (2L, 3L, 1L, 2L, "x y x"),
      (3L, 3L, 0L, 0L, "a b c d e")), s"got $got")
  }

  test("intradoc scrub on the corpus: token conservation, clean text is repeat-free") {
    import graft.operators.Boilerplate
    val docs = Tables.documents(spark, sf0001)
    val out = Boilerplate.scrubRepeatedBlocks(docs, col("doc_id"),
      col("text"), k = 3)
    val joined = out.join(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_orig")), "doc_id")
      .select(col("doc_id"), col("n_dup_tokens"),
        size(split(col("text_clean"), " ")).cast("long").as("n_kept"),
        col("n_orig"), col("text_clean"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(2) + r.getLong(1) == r.getLong(3),
        s"token conservation violated for doc ${r.getLong(0)}") }
    // idempotence: scrubbing the cleaned text changes nothing
    val again = Boilerplate.scrubRepeatedBlocks(
        out.select(col("doc_id"), col("text_clean")),
        col("doc_id"), col("text_clean"), k = 3)
      .agg(sum(col("n_dup_blocks"))).as[Long].head()
    assert(again == 0L, s"second scrub still found $again duplicate blocks")
  }
}

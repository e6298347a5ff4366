package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Bpe

/** BPE merge-loop trainer semantics pinned on corpora small enough to
  * merge by hand: pair counting weighted by word frequency, the
  * (count desc, pair asc) tie-break, greedy left-to-right overlap
  * handling, early stop, and encode replaying training exactly. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("merges, tie-breaks, and early stop match the hand computation") {
    // words: the×2, them×1. Round 1 pairs: (t,h)=3, (h,e)=3, (e,m)=1 —
    // tie at 3 broken by pair asc: (h,e) < (t,h). Round 2: (t,he)=3,
    // (he,m)=1. Round 3: (the,m)=1. Then no adjacent pairs remain.
    val docs = Seq("the the them").toDF("text")
    val out = Bpe.train(docs, col("text"), nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1, "h", "e", 3L),
      (2, "t", "he", 3L),
      (3, "the", "m", 1L)))
  }

  test("greedy left-to-right merge on overlapping runs") {
    // "aaa"×2: round 1 counts BOTH adjacent (a,a) positions per word
    // (4 total), and the rewrite merges left-to-right -> [aa, a], never
    // [a, aa]; round 2 merges (aa, a) -> [aaa]
    val docs = Seq("aaa aaa").toDF("text")
    val out = Bpe.train(docs, col("text"), nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1, "a", "a", 4L),
      (2, "aa", "a", 2L)))
  }

  test("encode replays the learned merges over unseen text") {
    val docs = Seq("the the them").toDF("text")
    val merges = Bpe.train(docs, col("text"), nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map(m => (m._2, m._3))
    val enc = Seq("the them there")
      .toDF("text")
      .select(Bpe.encode(col("text"), merges).as("syms"))
      .as[Seq[String]].head()
    // "there": t,h,e,r,e -> (h,e) -> t,he,r,e -> (t,he) -> the,r,e
    // (the final e has no h left to pair with)
    assert(enc == Seq("the", "them", "the", "r", "e"))
  }

  test("encodeDocs (vocab-join) equals the per-row encode on the sf0.001 corpus") {
    val docs = Tables.documents(spark, sf0001)
    val merges = Bpe.train(docs, col("text"), nMerges = 8)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
      .map(m => (m._2, m._3))
    val perRow = docs
      .select(col("doc_id"), Bpe.encode(col("text"), merges).as("syms"))
      .as[(Long, Seq[String])].collect().toMap
    val viaVocab = Bpe.encodeDocs(docs, col("doc_id"), col("text"), merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(viaVocab == perRow)
    assert(perRow.values.exists(_.nonEmpty))
  }

  test("BpeEncodeWord kernel equals the HOF merge-fold on random words") {
    val rng = new scala.util.Random(23)
    val chars = "abAB0é世!"  // incl. multi-byte code points
    // non-empty only: bpeishTokens can't produce empty pre-tokens, and
    // the two formulations are specified only on that domain (the HOF's
    // sequence(1, 0) on "" degenerates to a descending range)
    val words = Seq("a", "ab", "aaaa", "é世é", "a!b") ++
      Seq.fill(200)(Seq.fill(1 + rng.nextInt(10))(chars(rng.nextInt(chars.length))).mkString)
    val merges = Seq("a" -> "b", "ab" -> "a", "é" -> "世", "a" -> "a")
    val rows = words.toDF("w")
      .select(graft.functions.BpeEncodeWord(col("w"), merges).as("k"),
        Bpe.mergeWordHof(col("w"), merges).as("h"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zipWithIndex.foreach { case ((k, h), i) =>
      assert(k == h, s"word='${words(i)}'")
    }
  }

  test("train + encode equal an independent reference BPE on random corpora") {
    // plain-Scala reference implementation, written independently of the
    // Spark formulation (lists + sliding windows, no string-fold trick)
    def pretok(t: String): List[String] =
      "[A-Za-z0-9]+|[^A-Za-z0-9 ]".r.findAllIn(t).toList
    def refApply(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    def refTrain(docs: List[String], nMerges: Int): List[(String, String, Long)] = {
      var words: Map[List[String], Long] = docs.flatMap(pretok)
        .groupBy(identity).map { case (w, o) => w.toList.map(_.toString) -> o.size.toLong }
      var merges = List.empty[(String, String, Long)]
      var done = false
      while (merges.size < nMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (syms, cnt) =>
          syms.sliding(2).foreach {
            case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
            case _ =>
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          merges :+= ((l, r, c))
          words = words.toSeq.map { case (s, cnt) => (refApply(s, l, r), cnt) }
            .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        }
      }
      merges
    }
    val genDoc: Gen[String] = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', '!'))
      } yield cs.mkString)
    } yield ws.mkString(" ")
    val genCorpus: Gen[List[String]] =
      Gen.choose(1, 6).flatMap(Gen.listOfN(_, genDoc))
    val prop = Prop.forAll(genCorpus) { docs =>
      val df = docs.toDF("text")
      val got = Bpe.train(df, col("text"), nMerges = 4)
        .as[(Int, String, String, Long)].collect().toList.sortBy(_._1)
        .map(m => (m._2, m._3, m._4))
      val want = refTrain(docs, 4)
      val merges = want.map(m => (m._1, m._2))
      val gotEnc = df.select(Bpe.encode(col("text"), merges))
        .as[Seq[String]].collect().toList
      val wantEnc = docs.map(d =>
        pretok(d).flatMap(w =>
          merges.foldLeft(w.toList.map(_.toString))(
            (s, m) => refApply(s, m._1, m._2))))
      got == want && gotEnc.map(_.toList) == wantEnc
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("long merge runs stay consistent with short runs") {
    graft.operators.Dedup.releaseCaches()
    val docs = Tables.documents(spark, sf0001)
    val m20 = Bpe.train(docs, col("text"), nMerges = 20)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val m8 = Bpe.train(docs, col("text"), nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    // a longer run extends a shorter one
    assert(m20.size == 20)
    assert(m20.take(8) == m8)
    assert(m20.map(_._4).sliding(2).forall { case Seq(a, b) => b <= a })
    graft.operators.Dedup.releaseCaches()
  }

  test("merge-table save/load round-trips the model and its encodings") {
    graft.operators.Dedup.releaseCaches()
    val docs = Tables.documents(spark, sf0001)
    val merges = Bpe.train(docs, col("text"), nMerges = 12)
    val path = java.nio.file.Files.createTempDirectory("graftbpe").toString + "/model"
    Bpe.saveMerges(merges, path)
    val loaded = Bpe.loadMerges(spark, path)
    val direct = merges.orderBy("step")
      .as[(Int, String, String, Long)].collect().toSeq.map(m => (m._2, m._3))
    assert(loaded == direct && loaded.size == 12)
    // encodings under the loaded model are the encodings under the
    // trained one — the artifact IS the tokenizer
    val a = Bpe.encodeDocs(docs, col("doc_id"), col("text"), direct)
      .as[(Long, Seq[String])].collect().toMap
    val b = Bpe.encodeDocs(docs, col("doc_id"), col("text"), loaded)
      .as[(Long, Seq[String])].collect().toMap
    assert(a == b && a.values.exists(_.nonEmpty))
    graft.operators.Dedup.releaseCaches()
  }

  test("driver-side merge loop equals the distributed reference loop") {
    // the production in-memory loop (incremental pair stats) against the
    // superseded per-merge distributed formulation, merge for merge, on
    // the real sf0.001 corpus — at nMerges=20 the distributed loop also
    // crosses its persist stride (16), covering the checkpoint path
    graft.operators.Dedup.releaseCaches()
    val docs = Tables.documents(spark, sf0001)
    val words = docs
      .select(explode(graft.operators.TextOps.bpeishTokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .persist()
    val vocab = words.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
    for (n <- Seq(8, 20)) {
      val local = Bpe.runMergeLoopLocal(vocab, n)
      val dist = Bpe.runMergeLoopDistributed(words, n)
      assert(local == dist, s"nMerges=$n")
    }
    words.unpersist()
    graft.operators.Dedup.releaseCaches()
  }

  test("driver loop trains 1024 merges over a 30k-word vocabulary in-memory") {
    // the registered corpora exhaust adjacent pairs at ~89 merges, so
    // real-vocab capability is demonstrated on a synthetic Zipf word
    // table: 30k distinct words, lengths 4-12 over 26 letters. The whole
    // loop is driver-side — no Spark jobs — and must stay well-founded
    // (every merged symbol built from chars or earlier merges) at depth
    val rng = new scala.util.Random(11)
    val vocab = Array.tabulate(30000) { i =>
      val len = 4 + rng.nextInt(9)
      val w = Array.fill(len)(('a' + rng.nextInt(26)).toChar).mkString
      // Zipf-ish counts so argmax ties are rare but present
      (1L + 1000000L / (i + 1), w.map(_.toString).toArray)
    }
    val t0 = System.nanoTime()
    val merges = Bpe.runMergeLoopLocal(vocab, 1024)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 1024, s"exhausted at ${merges.size}")
    info(f"1024 merges over 30k words in $secs%.2f s driver-side")
    val known = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (_, l, r, c) =>
      assert(c >= 1)
      assert(l.length == 1 || known.contains(l), s"unbuildable lhs $l")
      assert(r.length == 1 || known.contains(r), s"unbuildable rhs $r")
      known += (l + r)
    }
  }

  test("trainer is stable on the sf0.001 corpus and merges nest correctly") {
    val docs = Tables.documents(spark, sf0001)
    val out = Bpe.train(docs, col("text"), nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out.size == 8)
    assert(out.map(_._1) == (1 to 8))
    // counts never increase as merges consume pair mass
    // (not strictly true of BPE in general for unrelated pairs, but each
    // step's winner is the global max, so the winning counts are
    // non-increasing)
    assert(out.map(_._4).sliding(2).forall { case Seq(a, b) => b <= a })
    // every later lhs/rhs symbol is either a single char or a previously
    // merged symbol — merges form a well-founded build order
    val known = scala.collection.mutable.Set.empty[String]
    out.foreach { case (_, l, r, _) =>
      assert(l.length == 1 || known.contains(l), s"unbuildable lhs $l")
      assert(r.length == 1 || known.contains(r), s"unbuildable rhs $r")
      known += (l + r)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

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

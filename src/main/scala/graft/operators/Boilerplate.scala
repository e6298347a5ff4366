package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the C4/CCNet cleaning rule
  * ("drop any line that occurs more than a handful of times across the
  * corpus") re-expressed for a line-less token stream: a document's
  * tokens partition into consecutive non-overlapping k-token segments,
  * and a segment is boilerplate iff it occurs in at least `minDocs`
  * DISTINCT documents. Unlike [[Dedup.substringDedup]] (pairwise
  * aligned spans between two specific documents), this is a corpus-wide
  * frequency criterion — navigation chrome, license headers, cookie
  * banners repeated across thousands of pages.
  *
  * Scale shape: one explode to segment rows, one groupBy(segment hash)
  * with a partial-agg distinct-doc count (the frequent set is bounded by
  * corpusDocs / minDocs — heavy hitters are few by definition, so AQE
  * broadcasts the build side of the membership join), and one
  * groupBy(doc_id) to reassemble — three shuffles, all equi-keyed,
  * nothing quadratic. Segments join on their xxhash64, never the string
  * (the [[Dedup]] currency: 8-byte shuffle keys; at 2⁶⁴ a collision —
  * which could scrub a non-boilerplate segment — has probability
  * ≈ nSegs²/2⁶⁵, negligible at any realistic corpus size, so the DuckDB
  * oracle's string-keyed twin hash-matches w.p. ~1). */
object Boilerplate {

  /** **Intra-document** repetition scrub — [[scrubFrequent]]'s
    * within-one-page sibling: a document's tokens partition into the same
    * consecutive k-token segments, and every REPEAT of a segment already
    * seen earlier in the SAME document is dropped (first occurrence kept).
    * This is the other half of the C4 cleaning recipe: corpus-frequency
    * scrubbing kills cross-page chrome, while this kills within-page
    * stutter — scraper loops, repeated nav blocks, copy-pasted paragraphs
    * — which near-dup detectors never see (a self-repetitive document is
    * not a duplicate of anything else).
    *
    * Scale shape: ZERO shuffles — segmentation, keep-first detection,
    * and reassembly are all per-row higher-order functions, so the
    * operator runs map-side inside whatever stage consumes it, and the
    * per-row cost is O(B log B) in the per-document block count B (see
    * the implementation comment) — bounded by document size, not corpus
    * size, so it holds at any corpus scale. Emits (doc_id, n_blocks,
    * n_dup_blocks, n_dup_tokens, text_clean). */
  def scrubRepeatedBlocks(df: DataFrame, id: Column, text: Column,
      k: Int = 3): DataFrame = {
    require(k > 0, s"segment size must be positive (got $k)")
    // NO Spread here (r14): this operator is map-only by contract
    // (PlanInvariantsSpec pins ≤ 1 Exchange) and runs inside whatever
    // stage consumes it — parallelism is the caller's concern, and an
    // injected shuffle would be pure cost at scale.
    // First-occurrence detection is sort-based, O(B log B) per document,
    // NOT a per-block scan over the preceding prefix — that form is
    // O(B²) and a single 1 MB page (~60k blocks at k=3) would spend ~10⁹
    // string compares inside one row evaluation. Sorting (xxhash64(seg),
    // position) pairs orders every run of equal-hash blocks by position,
    // so each run's head is the keep-first survivor and the rest are the
    // repeats — the [[Classifier.tokenFeatures]] run-length lesson.
    // Blocks compare by 8-byte hash, never by string (the [[Dedup]]
    // currency; a within-document collision, p ≈ B²/2⁶⁵, could scrub one
    // distinct block — negligible, and the string-keyed oracle would
    // catch a corpus where it ever fired). Each intermediate binds as an
    // attribute in its own select so no stage re-computes its input.
    df.select(id.as("doc_id"), TextOps.tokens(text).as("w"))
      .select(col("doc_id"),
        transform(
          expr(s"sequence(0, greatest(size(w) - 1, 0), $k)"),
          st => array_join(slice(col("w"), st + 1, lit(k)), " ")).as("segs"))
      .select(col("doc_id"), col("segs"),
        array_sort(transform(sequence(lit(1), size(col("segs"))),
          i => struct(xxhash64(element_at(col("segs"), i)).as("h"),
            i.as("i")))).as("sp"))
      .select(col("doc_id"), col("segs"),
        transform(
          filter(sequence(lit(1), size(col("sp"))), j =>
            j === 1 || element_at(col("sp"), j).getField("h") =!=
              element_at(col("sp"), j - 1).getField("h")),
          j => element_at(col("sp"), j).getField("i")).as("keep_i"),
        transform(
          filter(sequence(lit(1), size(col("sp"))), j =>
            j > 1 && element_at(col("sp"), j).getField("h") ===
              element_at(col("sp"), j - 1).getField("h")),
          j => element_at(col("sp"), j).getField("i")).as("dup_i"))
      .select(
        col("doc_id"),
        size(col("segs")).cast("long").as("n_blocks"),
        size(col("dup_i")).cast("long").as("n_dup_blocks"),
        aggregate(col("dup_i"), lit(0L),
          (acc, i) =>
            acc + size(split(element_at(col("segs"), i), " ")).cast("long"))
          .as("n_dup_tokens"),
        // keep_i is in (hash, position) order; re-sorting restores
        // document order for reassembly
        array_join(
          transform(array_sort(col("keep_i")),
            i => element_at(col("segs"), i)),
          " ").as("text_clean"))
  }

  /** Per-document scrub report: (doc_id, n_blocks, n_scrubbed_blocks,
    * n_scrubbed_tokens, text_clean) where text_clean is the surviving
    * segments rejoined in document order. */
  def scrubFrequent(df0: DataFrame, id: Column, text: Column,
      k: Int = 3, minDocs: Int = 3): DataFrame = {
    require(k > 0, s"segment size must be positive (got $k)")
    // spread the corpus once: segmentation + per-segment hashing run
    // before any exchange and otherwise inherit a single-row-group
    // scan's one task (r14; counts and per-doc reassembly are
    // partition-order-free)
    val df = Spread.cpuHeavy(df0)
    require(minDocs >= 2, s"minDocs below 2 would scrub every segment (got $minDocs)")
    // (doc_id, blk_no, seg): the Generate sits between the split
    // projection and the slice projection, so the tokenization runs once
    // per document, not once per segment (the Chunking.chunks shape)
    val segs = Dedup.memoPersist(
      df.select(id.as("doc_id"), TextOps.tokens(text).as("w"))
        .select(col("doc_id"), col("w"),
          posexplode(expr(s"sequence(0, greatest(size(w) - 1, 0), $k)"))
            .as(Seq("blk_no", "st")))
        .select(col("doc_id"), col("blk_no").cast("long").as("blk_no"),
          array_join(slice(col("w"), col("st") + 1, lit(k)), " ").as("seg"))
        .withColumn("bh", xxhash64(col("seg"))))
    val frequent = segs.groupBy(col("bh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("bh"), lit(true).as("is_bp"))
    scrubTail(segs, frequent)
  }

  /** Shared scrub reassembly: left-join the boilerplate flag back onto
    * the segment stream and fold each document once. */
  private def scrubTail(segs: DataFrame, frequent: DataFrame): DataFrame =
    segs.join(frequent, Seq("bh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        count(when(col("is_bp"), 1)).as("n_scrubbed_blocks"),
        coalesce(sum(when(col("is_bp"), size(split(col("seg"), " ")).cast("long"))),
          lit(0L)).as("n_scrubbed_tokens"),
        // collect_list skips the when-null boilerplate rows; blk_no (the
        // struct's first field) makes the sort a document-order total
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_bp").isNull, struct(col("blk_no"), col("seg"))))),
            x => x.getField("seg")),
          " ").as("text_clean"))

  /** [[scrubFrequent]] with a FRACTION-of-docs criterion answered
    * through the [[graft.functions.FrequentItems]] Misra–Gries summary —
    * the web-scale form. [[scrubFrequent]]'s exact doc-frequency
    * aggregate shuffles one row per distinct segment per task; at 100 TB
    * the distinct-segment universe is billions of keys and that shuffle
    * dominates. Here the criterion is "segment appears in ≥
    * max(2, ⌈numer·D/denom⌉) of the D documents" (CCNet's page-fraction
    * rule, floored at 2 so tiny corpora don't scrub everything), and the
    * doc-frequency stage becomes the two-phase heavy-hitter shape:
    *
    *   1. per-document DISTINCT segment hashes are built doc-locally
    *      (`array_distinct` before the explode — no shuffle), then one
    *      summary scan folds each task to ≤ kSummary candidates;
    *   2. only candidates are recounted exactly (broadcast pre-filter),
    *      and the threshold test runs on exact counts.
    *
    * Completeness is guarded at runtime: `assert_true` fires unless
    * t·(kSummary+1) > n (n = per-doc-distinct segment rows), so an
    * undersized summary fails loud rather than under-scrubbing. D is the
    * row count of `df` (one row per document by the corpus contract).
    * Output is bitwise [[scrubFrequent]]'s shape, so the full scrub gets
    * an exact DuckDB oracle despite the approximate candidate stage —
    * the approximate-generate / exact-verify discipline again. */
  /** [[scrubFrequentFraction]] with the summary SIZED FROM THE DATA: a
    * one-row pre-pass (memoized via [[Dedup.memoGate]]) computes the doc
    * count D and a DETERMINISTIC upper bound on the distinct (doc,
    * segment) rows — the total segment count Σ(⌊(|w|−1)/k⌋+1), no
    * distinct needed — and sizes the summary to ⌊nUpper/t⌋+1 where t is
    * the fraction threshold. Unlike [[graft.operators.Frequent
    * .heavyKeysAuto]]'s HLL estimate this bound cannot under-shoot, but
    * the exact in-plan guard still stands. Past `kCap` the raise is
    * refused loudly (summary entries cost ~50 B; the default cap is
    * ~50 MB — far above any fraction worth scrubbing at). Raises above
    * `kFloor` are logged. */
  def scrubFrequentFractionAuto(df: DataFrame, id: Column, text: Column,
      k: Int = 3, numer: Int = 1, denom: Int = 2000,
      kFloor: Int = 32768, kCap: Int = 1 << 20): DataFrame = {
    val pre = Spread.cpuHeavy(df).select(TextOps.tokens(text).as("w"))
      .agg(count(lit(1)).as("d"),
        sum(expr(s"CAST(greatest(size(w) - 1, 0) div $k AS LONG) + 1")).as("n_upper"))
    val (d, nUpper) = Dedup.memoGate(pre) {
      val r = pre.head(); (r.getLong(0), r.getLong(1))
    }
    val t = math.max(2L, (d * numer + denom - 1) / denom)
    val need = nUpper / t + 1
    require(need <= kCap,
      s"scrubFrequentFractionAuto: $nUpper segment rows at threshold $t need a " +
        s"$need-entry summary, over the $kCap cap — widen the fraction or raise kCap")
    val kSummary = math.max(need, kFloor.toLong).toInt
    if (kSummary > kFloor) {
      System.err.println(
        s"[graft] scrubFrequentFractionAuto: sized summary to $kSummary entries " +
          s"($nUpper segment rows, threshold $t docs)")
    }
    scrubFrequentFraction(df, id, text, k, numer, denom, kSummary)
  }

  def scrubFrequentFraction(df0: DataFrame, id: Column, text: Column,
      k: Int = 3, numer: Int = 1, denom: Int = 2000,
      kSummary: Int = 32768): DataFrame = {
    require(k > 0, s"segment size must be positive (got $k)")
    require(numer > 0 && denom > 0, s"fraction must be positive: $numer/$denom")
    // same spread as [[scrubFrequent]]: this operator makes THREE
    // tokenize-and-hash passes over the corpus (segs, docSegs, the
    // summary) — all pre-exchange. A wider Misra–Gries summary merge
    // only grows the candidate SUPERSET; the exact recount below keeps
    // the emitted frequent set (and the oracle hash) identical.
    val df = Spread.cpuHeavy(df0)
    val segs = Dedup.memoPersist(
      df.select(id.as("doc_id"), TextOps.tokens(text).as("w"))
        .select(col("doc_id"), col("w"),
          posexplode(expr(s"sequence(0, greatest(size(w) - 1, 0), $k)"))
            .as(Seq("blk_no", "st")))
        .select(col("doc_id"), col("blk_no").cast("long").as("blk_no"),
          array_join(slice(col("w"), col("st") + 1, lit(k)), " ").as("seg"))
        .withColumn("bh", xxhash64(col("seg"))))
    // doc-locally distinct segment hashes: zero shuffle before the summary
    val docSegs = df.select(id.as("doc_id"), TextOps.tokens(text).as("w"))
      .select(col("doc_id"),
        array_distinct(transform(
          expr(s"sequence(0, greatest(size(w) - 1, 0), $k)"),
          st => xxhash64(array_join(slice(col("w"), st + 1, lit(k)), " "))))
          .as("hs"))
      .select(col("doc_id"), explode(col("hs")).as("bh"))
    val aggRow = Dedup.memoPersist(docSegs.agg(
      graft.functions.FrequentItems(col("bh"), kSummary).as("cands"),
      count(lit(1)).as("n")))
    val nDocs = Dedup.memoPersist(df.agg(count(lit(1)).as("nd_docs")))
    val cands = aggRow.select(explode(col("cands")).as("bh"))
    val thr = nDocs.crossJoin(aggRow.select(col("n")))
      .select(
        greatest(lit(2L),
          expr(s"(nd_docs * $numer + ${denom - 1}) div $denom")).as("thr"),
        col("n"))
      .select(col("thr"),
        assert_true(col("thr") * (kSummary + 1) > col("n"),
          concat(lit(s"FrequentItems kSummary=$kSummary cannot guarantee doc-fraction $numer/$denom at n = "),
            col("n"), lit(" distinct (doc, segment) rows — raise kSummary")))
          .as("guard"))
    val frequent = docSegs.join(broadcast(cands), "bh")
      .groupBy(col("bh"))
      .agg(count(lit(1)).as("nd")) // docSegs is per-doc distinct: count = doc count
      .crossJoin(broadcast(thr))
      .where(col("nd") >= col("thr") && col("guard").isNull)
      .select(col("bh"), lit(true).as("is_bp"))
    scrubTail(segs, frequent)
  }
}

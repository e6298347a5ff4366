package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence preparation: split documents into overlapping token
  * chunks, and pack the corpus into fixed-length training sequences —
  * the last mile between a cleaned corpus and a dataloader.
  *
  * Both operators are deterministic integer arithmetic over token
  * positions, so they carry full DuckDB hash oracles like the rest of
  * the pipeline. */
object Chunking {

  /** Sliding-window chunking: one row per (doc, chunk), where chunk `i`
    * covers tokens [i·stride, i·stride + size) — `size − stride` tokens
    * of overlap between consecutive chunks, the standard long-document
    * treatment for fixed-context training. Chunk starts are every
    * stride-multiple below the doc's token count; trailing chunks clamp
    * to the document end.
    *
    * Shape: pure per-row explode (no shuffle at all until a consumer
    * aggregates) — chunking a 100 TB corpus is embarrassingly parallel. */
  def chunks(df: DataFrame, id: Column, text: Column,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"chunking needs 0 < stride <= size (got size=$size, stride=$stride)")
    df.select(id.as("doc_id"), split(text, " ").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(expr(s"sequence(0, greatest(size(w) - 1, 0), $stride)"))
          .as(Seq("chunk_no", "start_tok")))
      .select(col("doc_id"),
        col("chunk_no").cast("long").as("chunk_no"),
        col("start_tok").cast("long").as("start_tok"),
        org.apache.spark.sql.functions.size(
          slice(col("w"), col("start_tok") + 1, lit(size)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("w"), col("start_tok") + 1, lit(size)), " ")
          .as("text_chunk"))
  }

  /** Fixed-length **sequence packing** manifest: concatenate every
    * document's tokens in doc-id order and cut the stream every
    * `seqLen` tokens; report, per training sequence, its token count
    * (= seqLen except the tail), how many documents contribute, and the
    * first/last contributing doc — the metadata a dataloader needs to
    * assemble packed batches without padding waste.
    *
    * Shape: one global running-sum window over ONE ROW PER DOCUMENT
    * (not per token) assigns each doc its token offset; docs explode to
    * the sequences they straddle (≤ n_tokens/seqLen + 1 rows each) and
    * one groupBy(seq) aggregates. The ordered window serializes through
    * a single task, but over doc-count-sized metadata — ~10⁸ skinny rows
    * for a 100 TB corpus; if even that binds, the standard fix is a
    * two-phase prefix sum (per-partition totals broadcast as offsets)
    * with identical output. */
  def pack(df: DataFrame, id: Column, text: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"pack needs seqLen > 0 (got $seqLen)")
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    df.select(id.as("doc_id"), size(split(text, " ")).cast("long").as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("seq_id",
        explode(expr(s"sequence(off div $seqLen, (off + n - 1) div $seqLen)")))
      .select(col("doc_id"), col("seq_id"),
        (least((col("seq_id") + 1) * seqLen, col("off") + col("n")) -
          greatest(col("seq_id") * seqLen, col("off"))).as("contrib"))
      .groupBy(col("seq_id"))
      .agg(sum(col("contrib")).as("n_tokens"),
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }
}

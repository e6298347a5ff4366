package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-pipeline operators: whitespace
  * tokenization, word n-gram shingling, and stopword scoring. All built-in
  * `functions._` compositions (codegen'd, oracle-friendly) — no UDFs. */
object TextOps {

  /** Whitespace tokenization. The corpus (`documents.text`) is single-space
    * separated; a BPE-ish fallback for arbitrary text is
    * [[bpeishTokens]]. */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokenizer for arbitrary text: alphanumeric runs, or single
    * non-space symbols — a deterministic stand-in for BPE pre-tokenization
    * (contiguous letter/digit runs kept whole, punctuation split apart).
    * Extraction form (`regexp_extract_all`), not boundary-split with
    * lookarounds: identical output (TextOpsSpec property-tests the
    * equivalence), and the pattern stays inside what RE2 supports, so the
    * DuckDB oracle can run the very same regex. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0))

  /** Word n-gram shingles (space-joined), empty array for texts shorter
    * than n tokens. Shingling is the standard unit for near-dup detection
    * (MinHash/Jaccard). */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Count of tokens (with multiplicity) that appear in `set`. */
  def hitCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(set)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "est", "dans", "pour"))

  /** English stopwords used for quality scoring. */
  val enStopwords: Seq[String] = stopwords("en")
}

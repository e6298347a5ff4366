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
    * (MinHash/Jaccard). One codegen'd pass over the UTF-8 buffer
    * ([[graft.functions.WordShingles]] — shingle strings are byte ranges
    * of the original text, never assembled); the higher-order-function
    * formulation it replaced lives on as [[shinglesHof]], the executable
    * reference TextOpsSpec property-tests against. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.WordShingles(text, n)

  /** The pure-built-in shingle formulation (interpreted `transform` +
    * `concat_ws`) — kept as the reference implementation for the
    * equivalence property test, and as the form an engine without custom
    * expressions would run. */
  def shinglesHof(text: Column, n: Int = 3): Column = {
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

  // ------------------------------------------------------- Gopher quality

  /** Gopher quality metrics (Rae et al. 2021 §A1.1) for a text column,
    * as named columns — the ONE definition both the batch
    * `quality_gopher` query and the streaming cleaning stage compute
    * (a drifted copy would silently diverge batch and stream). */
  def gopherMetrics(text: Column): Seq[(String, Column)] = {
    val w = tokens(text)
    val nTok = size(w)
    Seq(
      "n_tokens" -> nTok,
      "mean_token_len" ->
        ((length(text) - nTok + 1).cast("double") / nTok.cast("double")),
      "alpha_frac" ->
        (size(filter(w, t => t.rlike("[A-Za-z]"))).cast("double") /
          nTok.cast("double")),
      "n_stop" -> hitCount(w, enStopwords),
      "ttr" -> (size(array_distinct(w)).cast("double") / nTok.cast("double")))
  }

  /** Gopher rule thresholds — named once, interpolated into BOTH the
    * Column rules below and the generated DuckDB oracle fragments
    * ([[GopherSql]]), so a tuned threshold cannot update one engine and
    * silently drift the other. */
  val gopherMinTokens = 50
  val gopherMaxTokens = 100000
  val gopherMinMeanLen = 3.0
  val gopherMaxMeanLen = 10.0
  val gopherMinAlphaFrac = 0.8
  val gopherMinStop = 2
  val gopherMinTtr = 0.2

  /** The per-rule booleans over [[gopherMetrics]]' column NAMES —
    * evaluate after projecting the metrics. */
  def gopherRules: Seq[(String, Column)] = Seq(
    "r_count" -> col("n_tokens").between(gopherMinTokens, gopherMaxTokens),
    "r_word_len" ->
      (col("mean_token_len") >= gopherMinMeanLen &&
        col("mean_token_len") <= gopherMaxMeanLen),
    "r_alpha" -> (col("alpha_frac") >= gopherMinAlphaFrac),
    "r_stop" -> (col("n_stop") >= gopherMinStop),
    "r_ttr" -> (col("ttr") >= gopherMinTtr))

  /** DuckDB spellings of [[gopherMetrics]] / [[gopherRules]], generated
    * from the SAME threshold constants and stopword list as the Column
    * forms. Three oracle queries embed the Gopher gate
    * (`quality_gopher`, `quality_classifier`'s label CTE,
    * `corpus_stats`); hand-copied SQL in each was the exact
    * silent-drift hazard the shared Column definitions exist to
    * prevent, so the SQL comes from one generator too. Fragments are
    * scoped to a relation exposing `text` and
    * `w = string_split(text, ' ')`. */
  object GopherSql {
    val stopList: String =
      enStopwords.map(s => s"'$s'").mkString("(", ",", ")")
    /** Metric name → DuckDB expression, mirroring [[gopherMetrics]]. */
    val metricExprs: Seq[(String, String)] = Seq(
      "n_tokens" -> "len(w)",
      "mean_token_len" ->
        "CAST(length(text) - len(w) + 1 AS DOUBLE) / CAST(len(w) AS DOUBLE)",
      "alpha_frac" ->
        ("CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)" +
          " / CAST(len(w) AS DOUBLE)"),
      "n_stop" -> s"len(list_filter(w, x -> x IN $stopList))",
      "ttr" ->
        "CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)")
    /** Rule name → predicate, over whatever spelling of the metrics
      * `metric` supplies (column names for the projected form, inline
      * parenthesized expressions for the single-predicate form). */
    def rules(metric: String => String): Seq[(String, String)] = Seq(
      "r_count" ->
        s"${metric("n_tokens")} BETWEEN $gopherMinTokens AND $gopherMaxTokens",
      "r_word_len" ->
        (s"${metric("mean_token_len")} >= $gopherMinMeanLen AND " +
          s"${metric("mean_token_len")} <= $gopherMaxMeanLen"),
      "r_alpha" -> s"${metric("alpha_frac")} >= $gopherMinAlphaFrac",
      "r_stop" -> s"${metric("n_stop")} >= $gopherMinStop",
      "r_ttr" -> s"${metric("ttr")} >= $gopherMinTtr")
    /** The whole gate as ONE predicate over (text, w). */
    val keepPredicate: String = {
      val m = metricExprs.toMap
      rules(n => s"(${m(n)})").map { case (_, r) => s"($r)" }
        .mkString("\n      AND ")
    }
  }

  // --------------------------------------------------------- normalization

  /** Zero-width and non-whitespace control characters (NUL..BS, VT, FF,
    * SO..US, DEL, ZWSP, ZWNJ, ZWJ, BOM) — stripped outright. Tab/LF/CR
    * are deliberately NOT here: they are whitespace and fold into the
    * collapse step instead. `\x{hhhh}` escapes are valid in both Java
    * regex and RE2, so the oracle runs the IDENTICAL pattern string. */
  val ctlZeroWidthRe =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"

  /** Whitespace runs (space, tab, LF, CR) — collapsed to one space.
    * Spelled as an explicit class, not `\s`: Java and RE2 disagree on
    * `\s`'s exact membership (vertical tab), and VT is already handled
    * by [[ctlZeroWidthRe]]. */
  val wsRunRe = "[ \\t\\n\\r]+"

  /** Canonical text normalization, to run UPSTREAM of every hash-based
    * dedup operator: NFC composition (é ≡ e+COMBINING ACUTE — raw
    * `dedup_exact` treats those as distinct documents), then control/
    * zero-width strip, then whitespace collapse + trim. Order matters
    * and is part of the contract (the oracle applies the same chain):
    * NFC first so stripping never splits a combining sequence the
    * composition would have used. NFC itself is the codegen'd
    * [[graft.functions.NfcNormalize]]; the rest is builtin
    * `regexp_replace`/`trim`. */
  def normalize(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(graft.functions.NfcNormalize(text), ctlZeroWidthRe, ""),
        wsRunRe, " "))

  // ------------------------------------------------------------- PII scrub

  /** PII patterns, deliberately inside the RE2 subset (no lookarounds, no
    * backreferences) so the DuckDB oracle runs the IDENTICAL pattern
    * strings — the same discipline as [[bpeishTokens]]. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b555-[0-9]{4}\\b"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails, then phone numbers, then IPv4 addresses with typed
    * placeholder tokens. Replacement order is part of the contract
    * (applied identically by the oracle): emails go first so their
    * user/host substrings can never half-match the later patterns. All
    * three are codegen'd `regexp_replace` — no UDF in the hot path. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")

  /** Count of matches of `pattern` in `text` (on the original text —
    * redaction counts are computed before scrubbing). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}

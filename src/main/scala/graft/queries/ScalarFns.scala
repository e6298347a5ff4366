package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function coverage (SURVEY.md §2.7: string/date/json/array rows).
  * All built-in `functions._` — codegen'd, no UDFs. Each query touches only
  * the columns it needs so Parquet scans stay pruned. */
object ScalarFns {

  /** String functions over documents: length/substring/case/concat/split.
    * (The reference's own string surface is tiny — trailing-Z strip and
    * filename splits, /root/reference/main.py:35-36,153 — generalized
    * here.) */
  def stringFns(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_char"),
        size(split(col("text"), " ")).as("n_tokens"),
        upper(col("lang")).as("lang_uc"),
        substring(col("text"), 1, 20).as("prefix"),
        concat_ws("-", col("source"), col("lang")).as("src_lang"),
        col("text").contains("spark").as("has_spark"))
      .orderBy("doc_id")

  private val stringFnsSql =
    """SELECT doc_id,
      |  length(text) AS n_char,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  upper(lang) AS lang_uc,
      |  substr(text, 1, 20) AS prefix,
      |  source || '-' || lang AS src_lang,
      |  contains(text, 'spark') AS has_spark
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Date/time functions over events: truncation, field extraction,
    * interval arithmetic. Mirrors the reference's midnight-after-day
    * arithmetic (/root/reference/main.py:155). */
  def dateFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        to_date(col("ts")).as("day"),
        date_trunc("hour", col("ts")).as("hour_ts"),
        year(col("ts")).cast("int").as("y"),
        month(col("ts")).cast("int").as("m"),
        dayofmonth(col("ts")).cast("int").as("d"),
        hour(col("ts")).cast("int").as("h"),
        (col("ts") + expr("INTERVAL 7 DAYS")).as("ts_plus_7d"),
        // the reference's downsample threshold: midnight after ts's day
        (to_date(col("ts")).cast("timestamp") + expr("INTERVAL 1 DAY")).as("next_midnight"))
      .orderBy("event_id")

  private val dateFnsSql =
    """SELECT event_id,
      |  CAST(ts AS DATE) AS day,
      |  date_trunc('hour', ts) AS hour_ts,
      |  CAST(year(ts) AS INT) AS y,
      |  CAST(month(ts) AS INT) AS m,
      |  CAST(day(ts) AS INT) AS d,
      |  CAST(hour(ts) AS INT) AS h,
      |  ts + INTERVAL 7 DAY AS ts_plus_7d,
      |  CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY AS next_midnight
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** JSON extraction from the events.props string column — via
    * `json_tuple`, a Generator that parses each props value ONCE and
    * emits both paths, where the `get_json_object`-per-path spelling
    * re-parses the document per extraction (3 Jackson parses/row here;
    * measured 1.6× at sf0.1). Same NULL-for-missing-key semantics for
    * top-level keys, verified value-identical to the per-path form. */
  def jsonFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        json_tuple(col("props"), "k", "missing").as(Seq("k_str", "k_missing")))
      .select(
        col("event_id"),
        col("k_str"),
        col("k_str").cast("int").as("k"),
        col("k_missing"))
      .orderBy("event_id")

  private val jsonFnsSql =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  json_extract_string(props, '$.missing') AS k_missing
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Array functions over embeddings: size, element access, slice. The
    * elements pass through without arithmetic, so float32 values stay
    * bit-exact across engines. The slice is flattened to scalar columns
    * (array-typed outputs break the driver's pandas row-sort). */
  def arrayFns(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_elem"),
        element_at(col("embedding"), -1).as("last_elem"),
        // try_element_at: under ANSI mode a plain element_at throws when a
        // vector has fewer than 4 elements, where DuckDB's [1:4][k] yields
        // NULL — NULL-on-short matches the oracle for variable-dim input
        try_element_at(slice(col("embedding"), 1, 4), lit(2)).as("head4_2"),
        try_element_at(slice(col("embedding"), 1, 4), lit(4)).as("head4_4"))
      .orderBy("vec_id")

  private val arrayFnsSql =
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  embedding[1] AS first_elem,
      |  embedding[-1] AS last_elem,
      |  embedding[1:4][2] AS head4_2,
      |  embedding[1:4][4] AS head4_4
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("string_fns", stringFnsSql)(stringFns),
    Q("date_fns", dateFnsSql)(dateFns),
    Q("json_fns", jsonFnsSql)(jsonFns),
    Q("array_fns", arrayFnsSql)(arrayFns))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Line-delimited text ingestion (JSONL) with an EXPLICIT schema and an
  * explicit corrupt-record policy — the generic little sibling of the
  * wiki dump scan ([[WikiXmlSource]]), carrying the same two scale
  * rules:
  *
  *  - schemas are supplied, never inferred ([[graft.Tables]] scaladoc:
  *    at 100 TB, footer/line sampling is a planning-time cost and one
  *    degenerate file poisons the inferred schema);
  *  - malformed input is a POLICY, not a crash: `PERMISSIVE` lands bad
  *    lines in a quarantine column (`_corrupt_record`) so the load can
  *    gate on a [[graft.operators.DataQuality]] audit of it,
  *    `DROPMALFORMED` sheds them, `FAILFAST` aborts the job — choose
  *    per pipeline stage (bronze layers quarantine; gold layers fail
  *    fast). JSONL splits by line, so a 100 TB drop parallelizes by
  *    byte range with no index pass. */
object TextSources {

  val corruptCol = "_corrupt_record"

  /** Read JSONL at `path` with `schema`; `mode` ∈ PERMISSIVE |
    * DROPMALFORMED | FAILFAST. Under PERMISSIVE the result carries
    * `_corrupt_record` (NULL for clean rows, the raw line otherwise). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    val withQuarantine =
      if (mode == "PERMISSIVE" && !schema.fieldNames.contains(corruptCol))
        schema.add(StructField(corruptCol, StringType))
      else schema
    spark.read
      .schema(withQuarantine)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Write `df` as JSONL (one object per line, gzip — Spark's text
    * codec list has no zstd, unlike parquet) — the export half of the
    * round trip. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** Read CSV at `path` with an EXPLICIT schema (no inference — the
    * [[graft.Tables]] discipline: schema inference is a full extra pass
    * at 100 TB and silently widens types) and the same corrupt-record
    * policy surface as [[readJsonl]]. Quoting must match [[writeCsv]]:
    * `escape`-doubled quotes, no multiLine (embedded newlines would cost
    * splittability; the writer strips the one column that could carry
    * them is NOT done — callers whose text can hold newlines should use
    * JSONL, which is why `documents` round-trips are exercised on BOTH
    * ingestion paths). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    val withQuarantine =
      if (mode == "PERMISSIVE" && !schema.fieldNames.contains(corruptCol))
        schema.add(StructField(corruptCol, StringType))
      else schema
    spark.read
      .schema(withQuarantine)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
  }

  /** CSV export half: header + RFC-4180 quote-doubling, gzip (same
    * text-codec constraint as JSONL). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("compression", "gzip")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
}

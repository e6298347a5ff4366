package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver corpus (`TESTDATA.md`, schemas in `FIXTURES.md`).
  *
  * Explicit static schemas, deliberately unlike the reference's
  * infer-then-freeze approach (/root/reference/main.py:178-182, SURVEY.md
  * §1.3): at 100 TB a dataset has many thousands of files and letting Spark
  * sample footers for schema inference is a planning-time cost and a
  * correctness hazard (a single degenerate empty file would poison an
  * inferred schema). Supplying the schema also lets the vectorized Parquet
  * reader skip per-file merge checks.
  *
  * `events.ts` has shipped in two physical encodings across driver corpus
  * generations: INT64 TIMESTAMP(NANOS) — which Spark 4 cannot read as a
  * timestamp at all ([PARQUET_TYPE_ILLEGAL]) — and plain TIMESTAMP(MICROS).
  * [[events]] probes the file footer once (a single driver-side metadata
  * read, not corpus-wide inference) and dispatches: the nanos form is read
  * as raw longs via `spark.sql.legacy.parquet.nanosAsLong` and truncated to
  * microsecond `TimestampType` (`ts div 1000`) — the same truncation DuckDB
  * applies when casting its ns read to TIMESTAMP — while the micros form is
  * read natively. Either way both engines see identical µs instants, so
  * oracle SQL compares equal.
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** On-disk schema: `ts` is INT64 TIMESTAMP(NANOS), surfaced as raw nanos
    * (LongType) under the nanosAsLong legacy conf; [[events]] converts. */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema, "nation" -> nationSchema,
    "customer" -> customerSchema, "supplier" -> supplierSchema,
    "part" -> partSchema, "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema,
    "documents" -> documentsSchema, "embeddings" -> embeddingsSchema)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `ts` stored as INT64 TIMESTAMP(MICROS) — reads as TimestampType
    * directly. */
  val eventsMicrosSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    // One-footer probe (under nanosAsLong a NANOS column infers LongType,
    // a MICROS column TimestampType) — O(1) metadata read per query
    // construction, not data-path schema inference.
    val storedNanos =
      spark.read.parquet(path).schema("ts").dataType == LongType
    if (!storedNanos)
      spark.read.schema(eventsMicrosSchema).parquet(path)
    else
      spark.read.schema(eventsRawSchema).parquet(path)
        .select(
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)").as("ts"),
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("value"),
          org.apache.spark.sql.functions.col("props"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

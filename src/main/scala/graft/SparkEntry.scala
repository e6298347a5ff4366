package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Behavioral, DataCleaning, Extras, LlmOps, Misc, Q, Relational, ScalarFns, Tpch, Typed}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a named
  * query over the driver corpus plus (when ANSI-SQL-expressible) a DuckDB
  * oracle twin with identical column names and ordering. */
object SparkEntry {

  private def registry: Seq[Q] =
    Relational.all ++ ScalarFns.all ++ LlmOps.all ++ Extras.all ++
      Behavioral.all ++ Typed.all ++ Misc.all ++ DataCleaning.all ++ Tpch.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature semantic: greedy daily downsample
    * (SURVEY.md §2.4) over the events table. */
  def entry(spark: SparkSession): DataFrame =
    Relational.diachronicDaily(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

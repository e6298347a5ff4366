package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark formulation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle. Queries
  * without an oracle get the driver's weaker rows-only check — reserved for
  * ops whose results depend on engine-specific hashing (MinHash/SimHash) or
  * approximate sketches (HLL). */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

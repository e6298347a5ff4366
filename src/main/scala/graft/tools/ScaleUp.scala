package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weak-scaling input generator: builds an sf(k×0.1) dataset as `k`
  * disjoint re-keyed copies of `/root/testdata/sf0.1` (the largest
  * driver-generated scale). Copy `c` offsets every entity key by
  * c·10⁹ and suffixes every document token with `_c`, so copies share
  * NO keys, tokens, shingles or users — per-copy structure (dup
  * clusters, session shapes, value distributions) is exactly sf0.1's,
  * repeated k times. That is the textbook weak-scaling protocol: data
  * grows k×, per-shard statistics constant, so a linear-shuffle plan
  * should grow ≤ k× in wall-clock on fixed resources. (Vocabulary
  * also grows k× — real corpora grow it slower, per Heaps' law, so
  * vocab-bounded stages measure CONSERVATIVELY here.) Nation keys are
  * deliberately NOT offset: the PageRank graph keeps its 25 nodes and
  * scales edge mass, matching how that operator meets more data.
  *
  * Usage: ScaleUp <srcSfDir> <outDir> <k>   (writes outDir/<t>.parquet)
  */
object ScaleUp {
  private val KEY_STRIDE = 1000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args.take(3)
    val k = kStr.toInt
    require(k >= 1, "k must be >= 1")
    // optional 4th arg: comma-separated table subset, for topping up an
    // existing scale dir with tables added to the protocol later
    val only = args.lift(3).map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(t: String)(rekey: (DataFrame, Int) => DataFrame): Unit = {
      if (!only.forall(_.contains(t))) return
      val base = spark.read.parquet(s"$src/$t.parquet")
      // unionByName: copy 0 is the raw parquet frame while copies c>0
      // are hand-ordered selects — positional union would silently
      // misalign same-typed columns if the source column order drifts
      val union = (0 until k).map(c => rekey(base, c)).reduce(_ unionByName _)
      union.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"$t: ${k}x written")
    }
    def off(c: Int) = lit(c.toLong * KEY_STRIDE)

    copies("documents") { (df, c) =>
      if (c == 0) df
      else df.select(
        (col("doc_id") + off(c)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit(s"_$c"))), " ").as("text"),
        col("lang"), col("source"),
        length(array_join(transform(split(col("text"), " "),
          x => concat(x, lit(s"_$c"))), " ")).cast("long").as("n_chars"))
    }
    copies("events") { (df, c) =>
      if (c == 0) df
      else df.select((col("event_id") + off(c)).as("event_id"), col("ts"),
        (col("user_id") + off(c)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    copies("lineitem") { (df, c) =>
      if (c == 0) df
      else df.select((col("l_orderkey") + off(c)).as("l_orderkey"),
        (col("l_partkey") + off(c)).as("l_partkey"),
        (col("l_suppkey") + off(c)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }
    copies("orders") { (df, c) =>
      if (c == 0) df
      else df.select((col("o_orderkey") + off(c)).as("o_orderkey"),
        (col("o_custkey") + off(c)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }
    // names get a 3-char per-copy suffix: cross-copy name pairs land at
    // Levenshtein distance >= 3, so the entity-resolution operators see
    // k disjoint shards (per the protocol) instead of every name
    // duplicated k times — which would grow the TRUE dist<=2 pair count
    // ~k² and measure output shape, not plan scaling
    def suffixed(name: Column, c: Int): Column =
      if (c == 0) name else concat(name, lit(s"_$c$c$c"))
    copies("customer") { (df, c) =>
      if (c == 0) df
      else df.select((col("c_custkey") + off(c)).as("c_custkey"),
        suffixed(col("c_name"), c).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }
    copies("supplier") { (df, c) =>
      if (c == 0) df
      else df.select((col("s_suppkey") + off(c)).as("s_suppkey"),
        suffixed(col("s_name"), c).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }
    copies("part") { (df, c) =>
      if (c == 0) df
      else df.select((col("p_partkey") + off(c)).as("p_partkey"),
        suffixed(col("p_name"), c).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    }
    // embeddings re-key ids only — the float vectors repeat per copy
    // (there is no principled way to "suffix" geometry). Index/serving
    // ops (IVF build, delta append, routed scans) measure correctly:
    // their cost is corpus mass and bucket layout. Pairwise similarity
    // dedup would see k-1 exact cross-copy twins per vector and is NOT
    // part of the embeddings decade protocol.
    copies("embeddings") { (df, c) =>
      if (c == 0) df
      else df.select((col("vec_id") + off(c)).as("vec_id"),
        col("embedding"), col("label"))
    }
    // the 25-row nation and 5-row region dims are fixed by protocol
    // (see scaladoc): one copy each
    for (dim <- Seq("nation", "region") if only.forall(_.contains(dim))) {
      spark.read.parquet(s"$src/$dim.parquet")
        .write.mode("overwrite").parquet(s"$out/$dim.parquet")
      println(s"$dim: 1x written (fixed dim)")
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot maintenance — the MERGE INTO / Delta-Lake upsert
  * shape: fold a delta batch into a keyed base table, delta wins per
  * key, tombstone rows delete. The plain-table sibling of
  * [[Temporal.scd2Merge]] (which maintains history; this maintains the
  * current snapshot) and of the reference's incremental skip
  * (main.py:66-68 decides *file* presence; this reconciles *row*
  * versions).
  *
  * Work is delta-shaped: the distinct delta key set broadcasts, the base
  * passes through a broadcast LEFT ANTI join (surviving base rows never
  * reshuffle), and the delta contributes its non-tombstone rows
  * directly. Columns must match; the tombstone marker is any predicate
  * over the delta row. */
object Upsert {

  /** `base` ∖ delta-keys ∪ delta-upserts. A delta row with
    * `isTombstone` true removes the key; otherwise it replaces it.
    * Delta must hold one row per key (enforce upstream with
    * `latest_snapshot`-style dedup when folding an event stream). */
  def upsert(base: DataFrame, delta: DataFrame, key: Column,
      isTombstone: Column): DataFrame = {
    val deltaKeys = delta.select(key.as("__k")).distinct()
    val kept = base.join(broadcast(deltaKeys),
      key === col("__k"), "left_anti")
    kept.unionByName(delta.filter(!isTombstone))
  }

  /** The **streaming half**: a `foreachBatch` body maintaining a
    * VERSIONED parquet snapshot under `path/v=<n>` — each micro-batch
    * reads the latest version, folds the batch through [[upsert]]
    * (after within-batch latest-wins dedup on `(order, tie)`), and
    * writes the next version. Append-only versioning sidesteps the
    * read-while-overwrite hazard (the Delta-log idea without the log);
    * compaction of old versions is [[graft.sources.Sink.compact]]'s
    * kind of job. Batch ids are NOT used as versions: a replayed batch
    * (at-least-once delivery) re-applies idempotently because upsert of
    * the same delta twice is a no-op on the same base version only —
    * so the sink reads the version WRITTEN BY the last *distinct*
    * batch id, recorded in the version directory name
    * (`v=<n>_b=<batchId>`): a replay of batch b overwrites its own
    * version instead of stacking a new one. */
  def versionedSink(path: String, key: String, order: String, tie: String,
      isTombstone: Column): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val dir = new java.io.File(path)
      val versions = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
        .map { f =>
          val Array(v, b) = f.getName.stripPrefix("v=").split("_b=")
          (v.toLong, b.toLong, f)
        }.sortBy(_._1)
      // replay of the SAME batch id rewrites its own version; its base
      // is everything strictly before it
      val (myVersion, baseVersions) = versions.find(_._2 == batchId) match {
        case Some((v, _, _)) => (v, versions.filter(_._1 < v))
        case None => (versions.map(_._1).maxOption.getOrElse(0L) + 1, versions)
      }
      val base = baseVersions.lastOption match {
        case Some((_, _, f)) => spark.read.parquet(f.getAbsolutePath)
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
      }
      // within-batch latest-wins: keep the (order, tie)-max row per key
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(key)).orderBy(col(order).desc, col(tie).desc)
      val latest = batch
        .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      upsert(base, latest, col(key), isTombstone)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/v=${myVersion}_b=$batchId")
    }
  }

  /** Latest materialized state of a [[versionedSink]] directory. */
  def readLatest(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val vs = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .sortBy(_.getName.stripPrefix("v=").split("_b=")(0).toLong)
    require(vs.nonEmpty, s"no versions under $path")
    spark.read.parquet(vs.last.getAbsolutePath)
  }
}

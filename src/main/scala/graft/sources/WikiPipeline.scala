package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's whole job (/root/reference/main.py `main()`), as one
  * library call: manifest scan [S1] → incremental skip [S2] → streaming
  * decompress + XML event scan [S4/S5, DataSource V2] → ns filter [F1] +
  * epoch filter [F2] + greedy daily downsample [A1] → wiki/month-
  * partitioned zstd Parquet [S6/S7]. A user of the reference switches by
  * pointing this at the same manifest, dump directory, and output tree.
  *
  * Differences from the reference, by design: the downsample is the
  * shuffle aggregate (order-independent, SURVEY §2.4 proof), doneness is
  * an explicit `done` table (the reference keys on bucket listings —
  * callers on object storage pass the listing as that table), and
  * download orchestration is out of scope (zero-egress build; the dump
  * dir stands in for the fetched files). */
object WikiPipeline {

  /** Process a concrete file list end to end. Returns the number of input
    * files processed (0 = nothing to do, nothing written). */
  def run(spark: SparkSession, inputs: Seq[String], outPath: String,
      wiki: String,
      epoch: String = graft.operators.Diachronic.DefaultEpoch): Int = {
    if (inputs.nonEmpty) {
      val snaps = WikiXml.dailySnapshots(WikiXml.read(spark, inputs), epoch)
      Sink.writeSnapshots(snaps, outPath, wiki)
    }
    inputs.length
  }

  /** Manifest-driven variant: extract the job's file list, drop the ones
    * whose outputs `done` already records (the reference's S2 anti-join,
    * keyed `<file>.parquet` like its bucket listing), resolve the rest
    * against `dumpDir`, and run. `done` = a 1-column DataFrame of
    * already-produced output names; `overwrite` bypasses the skip. */
  def runFromManifest(spark: SparkSession, manifestPath: String,
      dumpDir: String, outPath: String, wiki: String,
      done: Option[DataFrame] = None, overwrite: Boolean = false,
      epoch: String = graft.operators.Diachronic.DefaultEpoch): Int = {
    val items = Manifest.fileList(spark, manifestPath)
    val todo = done match {
      case Some(d) => Sink.incrementalSkip(items, "file", d, d.columns.head,
        outputSuffix = "parquet", overwrite = overwrite)
      case None => items
    }
    val files = todo.orderBy("file").collect()
      .map(r => s"${dumpDir.stripSuffix("/")}/${r.getString(0)}").toSeq
    run(spark, files, outPath, wiki, epoch)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output-side operators: the reference's Parquet sink + object-store
  * upload (S6/S7, /root/reference/main.py:177-191) and incremental-skip
  * anti-join (S2, main.py:56-71), Spark-native.
  *
  * S6+S7 collapse into a single `.write` against the destination URI
  * (local path here; `gs://`/`s3a://` via the corresponding Hadoop
  * connector on a real cluster — SURVEY.md §2.1). Compression is zstd:
  * the reference's brotli codec has no JVM implementation on the
  * classpath (main.py:182; BASELINE.md), zstd is the dense-codec
  * equivalent. Row-group sizing / memory-bounded flush (the reference's
  * M1, main.py:166-169) is Spark's ParquetOutputWriter's job — nothing
  * custom. */
object Sink {

  /** Partitioned Parquet write. `partitionBy` plays the reference's
    * `wiki/month/` output layout (conf.py:27-28): at 100 TB, partition
    * columns are what lets downstream readers prune input by
    * wiki/month without listing everything. */
  def writeParquet(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).option("compression", "zstd")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Wiki snapshots partitioned like the reference's output tree:
    * wiki (constant column added by the caller) / month of the snapshot
    * timestamp. */
  def writeSnapshots(snapshots: DataFrame, path: String, wiki: String): Unit =
    writeParquet(
      snapshots
        .withColumn("wiki", lit(wiki))
        .withColumn("month", date_format(col("timestamp"), "yyyy-MM")),
      path,
      partitionCols = Seq("wiki", "month"))

  /** **Small-file compaction** — the table-maintenance job every
    * partitioned 100 TB dataset needs: streaming/batch appends leave
    * partitions fragmented into many undersized files (one per task per
    * micro-batch), and scan cost becomes file-open-bound instead of
    * byte-bound. Rewrite each partition into `ceil(rows/targetRows)`
    * files: ONE read of the fragmented layout, a repartition keyed on
    * (partition, file-slot) so output files land near `targetRows` rows
    * each, one write. Returns the per-partition (files_before,
    * files_after, rows) report — the audit row a maintenance scheduler
    * gates on, same report-first discipline as
    * [[graft.operators.DataQuality]]. Content is preserved exactly
    * (spec: row-set equality before/after). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      partitionCol: String, targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive (got $targetRows)")
    def fileStats(p: String, filesCol: String, rowsCol: String): DataFrame =
      spark.read.parquet(p)
        .select(col(partitionCol), input_file_name().as("f"))
        .groupBy(col(partitionCol))
        .agg(countDistinct(col("f")).as(filesCol), count(lit(1)).as(rowsCol))
    val before = fileStats(path, "files_before", "rows")
    // one shuffle keyed on the partition column co-locates each
    // partition's rows in one task; maxRecordsPerFile then splits any
    // oversized partition into ceil(rows/targetRows) files — the
    // deterministic file count the report carries
    spark.read.parquet(path)
      .repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("maxRecordsPerFile", targetRows)
      .partitionBy(partitionCol)
      .parquet(path + "__compacted")
    before
      .join(fileStats(path + "__compacted", "files_after", "rows_after"),
        partitionCol)
      .select(col(partitionCol).cast("string").as(partitionCol),
        col("files_before"), col("files_after"), col("rows"),
        col("rows_after"))
      .orderBy(partitionCol)
  }

  /** The reference's incremental skip (S2): drop work items whose derived
    * output key already exists. A genuine left-anti join over the key
    * transform `item + "." + suffix` (main.py:66-68); `overwrite=true`
    * bypasses, exactly like the reference's flag. */
  def incrementalSkip(workItems: DataFrame, itemCol: String,
      existing: DataFrame, existingCol: String,
      outputSuffix: String, overwrite: Boolean = false): DataFrame =
    if (overwrite) workItems
    else workItems.join(
      existing,
      concat(workItems(itemCol), lit("."), lit(outputSuffix)) === existing(existingCol),
      "left_anti")
}

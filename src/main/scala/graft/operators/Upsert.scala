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
}

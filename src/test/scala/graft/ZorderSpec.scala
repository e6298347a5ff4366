package graft

import org.apache.spark.sql.functions._

import graft.operators.Zorder

class ZorderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave: hand-computed bit patterns, sql twin agrees") {
    // a=0b1011 -> even bits 0,2,6 (69); b=0b0110 -> odd bits 3,5 (40)
    val df = Seq((0b1011L, 0b0110L), (0L, 0L), (0xFFFFL, 0L), (0L, 0xFFFFL))
      .toDF("a", "b")
    val got = df.select(Zorder.interleave(col("a"), col("b"), 16).as("z"))
      .as[Long].collect().toSeq
    val evens = (0 until 16).map(i => 1L << (2 * i)).sum      // a mask
    val odds = (0 until 16).map(i => 1L << (2 * i + 1)).sum   // b mask
    assert(got == Seq(109L, 0L, evens, odds), s"got $got")
    val viaSql = df.selectExpr(Zorder.interleaveSql("a", "b", 16) + " AS z")
      .as[Long].collect().toSeq
    assert(viaSql == got, "generated SQL disagrees with the Column form")
  }

  test("z-sorted blocks prune a 2-dim box better than 1-dim layouts") {
    val rows = Tables.events(spark, sf0001)
      .select(col("user_id"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("day"),
        col("event_id"))
      .as[(Long, Long, Long)].collect()
    assert(rows.length > 500)
    val z = rows.map { case (u, d, e) =>
      // driver-side reference interleave
      val zz = (0 until 16).map(i =>
        (((u >> i) & 1L) << (2 * i)) | (((d >> i) & 1L) << (2 * i + 1))).sum
      (u, d, e, zz)
    }
    // The z-order claim is ONE layout serving BOTH predicate shapes: a
    // user-window query AND a day-window query. Any single-column sort
    // wins its own dimension and forfeits the other (a sorted layout
    // leaves the other column's per-block range full-width); the morton
    // layout bounds both ranges per block, so its TOTAL cost across the
    // two workloads beats either specialist.
    val us = rows.map(_._1).distinct.sorted
    val ds = rows.map(_._2).distinct.sorted
    val (uLo, uHi) = (us(us.length / 2), us(us.length / 2 + us.length / 20))
    val (dLo, dHi) = (ds(ds.length / 2), ds(ds.length / 2) + 6)
    val nBlocks = 32
    // a block must be read iff its min/max range on the constrained
    // column overlaps the predicate window — exactly parquet row-group
    // min/max pruning
    def touched(sorted: Seq[(Long, Long)], uBox: Option[(Long, Long)],
        dBox: Option[(Long, Long)]): Int = {
      val blockSize = math.max(1, (sorted.size + nBlocks - 1) / nBlocks)
      sorted.grouped(blockSize).count { blk =>
        uBox.forall { case (lo, hi) =>
          blk.map(_._1).max >= lo && blk.map(_._1).min <= hi } &&
        dBox.forall { case (lo, hi) =>
          blk.map(_._2).max >= lo && blk.map(_._2).min <= hi }
      }
    }
    def cost(sorted: Seq[(Long, Long)]): Int =
      touched(sorted, Some((uLo, uHi)), None) +
        touched(sorted, None, Some((dLo, dHi)))
    val byEventId = cost(z.sortBy(_._3).map(t => (t._1, t._2)).toSeq)
    val byUser = cost(z.sortBy(t => (t._1, t._3)).map(t => (t._1, t._2)).toSeq)
    val byDay = cost(z.sortBy(t => (t._2, t._3)).map(t => (t._1, t._2)).toSeq)
    val byZ = cost(z.sortBy(t => (t._4, t._3)).map(t => (t._1, t._2)).toSeq)
    assert(byZ < byUser, s"z total $byZ !< user-sorted total $byUser")
    assert(byZ < byDay, s"z total $byZ !< day-sorted total $byDay")
    assert(byZ < byEventId, s"z total $byZ !< row-order total $byEventId")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hilbert, Zorder}

/** Hilbert-curve laws: exhaustive bijectivity + the unit-step locality
  * Z-order lacks, generated-SQL/Column anti-drift, and the layout
  * economics (2-dim box pruning beats 1-dim sorts, curve-adjacency
  * fragmentation beats Morton). Values are gate-checked by the DuckDB
  * recursive-CTE oracle on `hilbert_layout`. */
class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference fold — the same s−1 variant. */
  private def ref(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("bits=4 grid: bijective onto [0, 255] and consecutive indexes are grid neighbors") {
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.index(col("x"), col("y"), 4).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(got.forall { case (x, y, h) => h == ref(x, y, 4) },
      "native expression must equal the driver reference")
    val viaFold = grid.toDF("x", "y")
      .select(Hilbert.indexFold(col("x"), col("y"), 4)).as[Long].collect()
    assert(viaFold.toSeq == got.map(_._3).toSeq,
      "the declarative fold twin must agree with the native expression")
    val byH = got.map(t => t._3 -> ((t._1, t._2))).toMap
    assert(byH.keySet == (0L until 256L).toSet, "not a bijection onto the grid")
    val jumps = (0L until 255L).map { h =>
      val (ax, ay) = byH(h); val (bx, by) = byH(h + 1)
      math.abs(ax - bx) + math.abs(ay - by)
    }
    assert(jumps.forall(_ == 1L),
      "the Hilbert curve moves one cell per step — any jump is a bug")
    // contrast: the Z-order curve DOES jump at quadrant boundaries
    val zByKey = grid.map { case (x, y) =>
      (0 until 4).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum ->
        ((x, y))
    }.toMap
    val zJumps = (0L until 255L).map { z =>
      val (ax, ay) = zByKey(z); val (bx, by) = zByKey(z + 1)
      math.abs(ax - bx) + math.abs(ay - by)
    }
    assert(zJumps.max > 1L, "sanity: morton adjacency is not unit-step")
  }

  test("masking: out-of-range inputs reduce like the oracle's x & mask") {
    val df = Seq((65536L + 5L, 131072L + 9L)).toDF("x", "y")
    val a = df.select(Hilbert.index(col("x"), col("y"), 16)).as[Long].head()
    assert(a == ref(5L, 9L, 16))
  }

  test("hilbert layout beats the 1-dim sorts AND fragments boxes less than z-order") {
    val rows = Tables.events(spark, sf0001)
      .select(col("user_id"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("day"),
        col("event_id"))
      .as[(Long, Long, Long)].collect()
    assert(rows.length > 500)
    val keyed = rows.map { case (u, d, e) =>
      val z = (0 until 16).map(i =>
        (((u >> i) & 1L) << (2 * i)) | (((d >> i) & 1L) << (2 * i + 1))).sum
      (u, d, e, z, ref(u & 0xFFFF, d & 0xFFFF, 16))
    }
    val us = rows.map(_._1).distinct.sorted
    val ds = rows.map(_._2).distinct.sorted
    val (uLo, uHi) = (us(us.length / 2), us(us.length / 2 + us.length / 20))
    val (dLo, dHi) = (ds(ds.length / 2), ds(ds.length / 2) + 6)
    val nBlocks = 32
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
    val byUser = cost(keyed.sortBy(t => (t._1, t._3)).map(t => (t._1, t._2)).toSeq)
    val byDay = cost(keyed.sortBy(t => (t._2, t._3)).map(t => (t._1, t._2)).toSeq)
    val byH = cost(keyed.sortBy(t => (t._5, t._3)).map(t => (t._1, t._2)).toSeq)
    assert(byH < byUser, s"hilbert total $byH !< user-sorted total $byUser")
    assert(byH < byDay, s"hilbert total $byH !< day-sorted total $byDay")
    // fragmentation: how many key-contiguous runs does the box shatter
    // into — fewer runs = fewer seeks/ranges at equal selectivity.
    def runs(key: (Long, Long, Long, Long, Long) => Long): Int = {
      val sel = keyed.filter(t =>
          t._1 >= uLo && t._1 <= uHi && t._2 >= dLo && t._2 <= dHi)
        .map(t => key(t._1, t._2, t._3, t._4, t._5)).sorted
      val ranked = keyed.map(t => key(t._1, t._2, t._3, t._4, t._5)).sorted
        .zipWithIndex.toMap
      val pos = sel.map(ranked)
      if (pos.isEmpty) 0
      else 1 + pos.sliding(2).count(w => w.length == 2 && w(1) != w(0) + 1)
    }
    val zRuns = runs((_, _, _, z, _) => z)
    val hRuns = runs((_, _, _, _, h) => h)
    assert(hRuns <= zRuns,
      s"hilbert box fragmentation $hRuns should not exceed morton $zRuns")
  }
}

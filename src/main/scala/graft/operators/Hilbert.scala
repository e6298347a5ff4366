package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert-curve layout clustering — [[Zorder]]'s sibling with strictly
  * better locality: consecutive curve positions are always Manhattan-
  * distance-1 grid neighbors (HilbertSpec proves it exhaustively), where
  * the Z-order curve takes long diagonal jumps at quadrant boundaries.
  * The practical payoff is the same "pay one shuffle at write time,
  * prune forever after" layout economics, with box predicates touching
  * fewer key-contiguous blocks than the Morton key — Delta/Iceberg grew
  * `HILBERT BY` next to `ZORDER BY` for exactly this reason.
  *
  * The index is the classic per-bit fold (quadrant digit + reflection/
  * swap rotation, the s−1 reflection variant on BOTH engines): Spark
  * evaluates it as a runtime `aggregate` fold over the precomputed
  * bit-weight array — ONE expression, no 16-level unrolled tree for
  * Catalyst to blow up, no UDF — and the DuckDB oracle runs the same
  * loop as a recursive CTE with an iteration counter, so the
  * `hilbert_layout` query is fully hash-checked, key values included,
  * like `zorder_layout`. Pure integer arithmetic throughout. */
object Hilbert {

  /** Hilbert index of (x & mask, y & mask) on the 2^bits × 2^bits grid —
    * the native codegen'd expression ([[graft.functions.HilbertIndex]]:
    * a tight primitive loop inside whole-stage codegen; the HOF fold
    * below measured ~3.0 s at sf0.1 against sub-second native, because
    * lambda steps run with boxed struct intermediates outside codegen).
    * 2·bits ≤ 62 keeps the key a positive long. */
  def index(x: Column, y: Column, bits: Int): Column =
    graft.functions.HilbertIndex(x.cast("long"), y.cast("long"), bits)

  /** The same iteration as a runtime `aggregate` fold over the
    * bit-weight array — the declarative reference twin the spec checks
    * the native expression against (and proof the semantics need no
    * custom code, only speed does). */
  def indexFold(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"bits must be in [1, 16] (got $bits)")
    val mask = (1L << bits) - 1
    val weights = array((0 until bits).reverse.map(i => lit(1L << i)): _*)
    val init = struct(
      x.bitwiseAND(lit(mask)).cast("long").as("x"),
      y.bitwiseAND(lit(mask)).cast("long").as("y"),
      lit(0L).as("d"))
    aggregate(
      weights,
      init,
      (acc, s) => {
        val ax = acc.getField("x"); val ay = acc.getField("y")
        val rx = when(ax.bitwiseAND(s) > 0, 1L).otherwise(0L)
        val ry = when(ay.bitwiseAND(s) > 0, 1L).otherwise(0L)
        val d2 = acc.getField("d") +
          s * s * (lit(3L) * rx).bitwiseXOR(ry)
        val refl = ry === 0 && rx === 1
        val xr = when(refl, s - 1 - ax).otherwise(ax)
        val yr = when(refl, s - 1 - ay).otherwise(ay)
        struct(
          when(ry === 0, yr).otherwise(xr).as("x"),
          when(ry === 0, xr).otherwise(yr).as("y"),
          d2.as("d"))
      },
      acc => acc.getField("d"))
  }

  /** The identical loop as a DuckDB recursive CTE: `baseSql` must
    * project columns named in `carry` plus integer `x` and `y` already
    * masked to `bits`; the result exposes `carry` plus the index `h`. */
  def indexSqlCte(baseSql: String, carry: Seq[String], bits: Int): String = {
    require(bits > 0 && bits <= 16)
    val cols = carry.mkString(", ")
    s"""WITH RECURSIVE hc AS (
       |  SELECT $cols, x, y, CAST(0 AS BIGINT) AS d, ${bits - 1} AS i
       |  FROM ($baseSql)
       |  UNION ALL
       |  SELECT $cols,
       |    CASE WHEN ry = 0 THEN yr ELSE xr END AS x,
       |    CASE WHEN ry = 0 THEN xr ELSE yr END AS y,
       |    d + s * s * xor(3 * rx, ry) AS d,
       |    i - 1 AS i
       |  FROM (
       |    SELECT *,
       |      CASE WHEN ry = 0 AND rx = 1 THEN s - 1 - x ELSE x END AS xr,
       |      CASE WHEN ry = 0 AND rx = 1 THEN s - 1 - y ELSE y END AS yr
       |    FROM (
       |      SELECT *, (CAST(1 AS BIGINT) << i) AS s,
       |        CASE WHEN (x & (CAST(1 AS BIGINT) << i)) > 0
       |             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rx,
       |        CASE WHEN (y & (CAST(1 AS BIGINT) << i)) > 0
       |             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ry
       |      FROM hc WHERE i >= 0)))
       |SELECT $cols, d AS h FROM hc WHERE i = -1""".stripMargin
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering — the multi-dimensional data-
  * layout trick behind Delta/Iceberg `ZORDER BY`: interleaving the bits
  * of two sort dimensions makes rows close in EITHER dimension land in
  * the same file/row-group, so min/max (or partition) pruning works for
  * predicates on both columns at once, where a lexicographic sort only
  * prunes its leading column. This operator computes the key; the
  * layout investment is then just `.repartitionByRange(z).sortWithinPartitions(z)
  * .write` — the same "pay one shuffle at write time, prune forever
  * after" economics as the bucketed-join tables.
  *
  * Pure integer bit arithmetic — shifts, masks, ors — so the key is
  * bit-identical in any engine and the registered `zorder_layout` query
  * hash-checks against DuckDB computing the SAME generated expression
  * ([[interleaveSql]] comes from the same loop that builds the Column,
  * the [[TextOps.GopherSql]] anti-drift discipline). ZorderSpec proves
  * the point of the key, not just its value: under a box predicate on
  * (user, day), the z-sorted layout touches strictly fewer row-group-
  * sized blocks than the single-column sort. */
object Zorder {

  /** Morton-interleave the low `bits` of two non-negative longs:
    * result bit 2i is a's bit i, bit 2i+1 is b's bit i. Codegen'd
    * shift/mask/or fold — no UDF. Values must fit in `bits` bits
    * (callers range-reduce first); 2·bits ≤ 62 keeps the key a
    * positive long. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31] (got $bits)")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The identical arithmetic as ANSI SQL, generated from the same
    * loop — `a`/`b` are SQL expression strings. */
  def interleaveSql(a: String, b: String, bits: Int): String = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31] (got $bits)")
    (0 until bits).map { i =>
      s"(((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
  }
}

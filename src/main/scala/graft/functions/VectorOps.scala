package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * the expressions stay inside whole-stage codegen and Catalyst can prune
  * and push down around them.
  *
  * All arithmetic is promoted to double before accumulating: float
  * accumulation loses ~1e-3 relative precision at dim=64 and, worse, makes
  * results depend on evaluation order. `aggregate` folds the array
  * sequentially, so results are bit-deterministic for a given array. */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision — native codegen'd expression
    * ([[FloatVecDot]]); identical left-to-right summation semantics to
    * [[dotHof]] but ~40× faster on all-pairs joins. */
  def dot(a: Column, b: Column): Column = FloatVecDot(a, b)

  /** The same dot product via Spark's built-in higher-order functions —
    * kept as the pure-built-in reference implementation (equality with
    * [[dot]] is property-tested). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ in double precision. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

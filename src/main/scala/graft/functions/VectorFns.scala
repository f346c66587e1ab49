package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built purely
  * from Spark's codegen-friendly higher-order functions (no UDFs): the
  * arithmetic stays inside Catalyst so it survives whole-stage codegen and
  * column pruning at 100 TB scale.
  *
  * All arithmetic is done in double precision regardless of input element
  * type — float32 accumulation would diverge from the (double) oracle.
  * `aggregate` folds left-to-right, which keeps summation order
  * deterministic and identical to DuckDB's list_dot_product.
  */
object VectorFns {
  /** Elementwise dot product with double accumulation — a native Catalyst
    * expression (ArrayExprs.VectorDot): same left-to-right arithmetic as
    * the zip_with+aggregate formulation and DuckDB's list_dot_product, but
    * a compiled loop instead of interpreted per-element lambdas. */
  def dot(a: Column, b: Column): Column = ArrayExprs.vector_dot(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors (returns null
    * via division by zero -> null? No: x/0.0 = null in Spark SQL). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking) —
    * native Catalyst expression (ArrayExprs.VectorL2Sq): identical
    * left-to-right (x-y)^2 accumulation to the old zip_with + aggregate
    * fold, but a compiled loop instead of an interpreted per-element
    * lambda (the r21 x03 profile: the Lloyd-round jobs were
    * allocation-bound in the HOF evaluator). */
  def l2sq(a: Column, b: Column): Column = ArrayExprs.vector_l2sq(a, b)

  /** Random-hyperplane LSH bucket id: sign bits of `nPlanes` pseudo-random
    * hyperplane dot products. The "hyperplanes" are deterministic per
    * (plane, dimension) via a hash mapped to [-1, 1] — fully reproducible
    * across the cluster with no broadcast state. Used to bucket vectors so
    * ANN probes only compare within a bucket (the 100 TB scale path).
    * Native Catalyst expression (ArrayExprs.LshBucket, compiled loop). */
  def lshBucket(vec: Column, nPlanes: Int, seed: Long = 42L): Column =
    ArrayExprs.lsh_bucket(vec, nPlanes, seed)
}

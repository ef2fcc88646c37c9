package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as Catalyst higher-order
  * functions — codegen-friendly, no UDF serialization, and (deliberately)
  * expressed as explicit LEFT FOLDS so the accumulation order is fixed:
  * `aggregate(zip_with(...))` on Spark is bitwise-identical to
  * `list_reduce(list_transform(...))` on DuckDB, which makes cosine scores
  * exactly reproducible across engines — no float tolerance needed.
  *
  * Scale: these are per-row scalar expressions; the expensive part of
  * similarity search is the pairing strategy (see analytics.Similarity),
  * not the arithmetic.
  */
object VectorFunctions {

  /** Left-fold dot product in double precision. Backed by the codegen'd
    * [[DotProduct]] expression (same fold order as the HOF formulation
    * `aggregate(zip_with(...))`, ~10x faster on pair joins). */
  def dot(a: Column, b: Column): Column = NativeExpressions.dotProduct(a, b)

  /** Reference HOF formulation of [[dot]] — kept for the equivalence spec. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm (left fold). */
  def normSq(a: Column): Column = NativeExpressions.dotProduct(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }
}

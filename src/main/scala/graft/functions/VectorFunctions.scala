package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns using codegen'd builtins
  * (`zip_with` + `aggregate` fold — sequential, so the floating-point
  * result is deterministic and matches DuckDB's list_dot_product,
  * which folds in the same order). No UDFs in the hot path.
  */
object VectorFunctions {

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine = dot/(|a|*|b|) with the exact operation order the oracle
    * uses (dot, two sqrts, one multiply, one divide). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine given precomputed norms (the at-scale path: norms are
    * computed once per row, not once per pair). */
  def cosinePrenormed(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}

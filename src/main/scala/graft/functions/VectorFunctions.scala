package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns. The dot product is a
  * native codegen expression (see [[ArrayDotProduct]]); summation is
  * sequential, so the floating-point result is deterministic and
  * matches DuckDB's list_dot_product. No UDFs in the hot path.
  */
object VectorFunctions {

  /** Sequential dot product (native codegen). */
  def dot(a: Column, b: Column): Column = ArrayDotProduct.column(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine = dot/(|a|*|b|) with the exact operation order the oracle
    * uses (dot, two sqrts, one multiply, one divide). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine given precomputed norms (the at-scale path: norms are
    * computed once per row, not once per pair). */
  def cosinePrenormed(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Single-deletion neighborhood of a string as a native codegen
  * expression: the string itself plus every variant with one character
  * removed, distinct, first-occurrence order.
  *
  * This is the SymSpell blocking key set: any two strings within
  * Levenshtein distance 1 (equal, one insertion, one deletion, or one
  * substitution) share a neighborhood element — so a fuzzy join
  * becomes ONE equi-join on the neighborhood element (recall 1), no
  * prefix blocking, no mega-buckets from shared prefixes; the few
  * admitted near-misses (transpositions) are removed by the exact
  * levenshtein verification on candidates. The declarative
  * formulation (`array_distinct(transform(sequence(...)))`) is
  * CodegenFallback (interpreted closure per variant); this compiles to
  * a single helper call.
  */
case class CharDeletions(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DataTypes.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("char_deletions requires a string argument")

  override def dataType: DataType = ArrayType(DataTypes.StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharDeletions.neighborhood(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharDeletions.neighborhood($c)")

  override protected def withNewChildInternal(newChild: Expression): CharDeletions =
    copy(child = newChild)
}

object CharDeletions {

  /** Called from generated code: {s} ∪ {delete(s, i) | i}, distinct,
    * in first-occurrence order (s first, then deletions left to right).
    * Code-point based (matches DuckDB substr character semantics). */
  def neighborhood(s: UTF8String): ArrayData = {
    val n = s.numChars()
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    seen.add(s)
    var i = 0
    while (i < n) {
      seen.add(UTF8String.concat(s.substring(0, i), s.substring(i + 1, n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  val builder: Seq[Expression] => Expression = exprs => CharDeletions(exprs.head)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registration.ensure(spark, "graft_char_deletions", builder)

  /** Column-level API (registers on first use; the supported path is
    * the GraftExtensions session extension). */
  def neighborhoodCol(spark: org.apache.spark.sql.SparkSession,
      str: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_char_deletions", str)
  }
}

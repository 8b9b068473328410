package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Width-parameterized SimHash: `lanes` independent 64-bit SimHash
  * signatures of the same token set, returned as `array<bigint>` —
  * the scale path for [[SimHash64]], whose fixed 64-bit signature
  * saturates the 8-block candidate index near n ≈ 1M documents
  * (256 bucket values per 8-bit block).
  *
  * Lane ℓ votes with `xxhash64(word, seed = 42 + ℓ)`, so lane 0 IS the
  * [[SimHash64]] signature bit-for-bit (same tokens, same seed) and the
  * lanes are pairwise independent. Width = 64·lanes bits; with the
  * block count held at 8 (the d+1 = 8 pigeonhole for Hamming ≤ 7),
  * block keys widen to 8·lanes bits, keeping expected bucket
  * population n/2^(8·lanes) flat as the corpus grows — the
  * `width ≈ blocks · log₂(n/targetPop)` rule (SURVEY §5; Manku et al.,
  * WWW'07, the web-scale regime where the Hamming budget is absolute
  * and the signature grows to keep the index sparse).
  *
  * Like [[SimHash64]] this is a pure per-row projection (one vote pass
  * over distinct tokens, all lanes in one loop) — no shuffle; at 100 TB
  * the signature stage is a map over the corpus.
  */
case class SimHashWide(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DataTypes.StringType, DataTypes.IntegerType) if right.foldable =>
        val lanes = right.eval().asInstanceOf[Number].intValue()
        if (lanes >= 1 && lanes <= 16) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"simhash_wide lanes must be in [1,16], got $lanes")
      case _ => TypeCheckResult.TypeCheckFailure(
        "simhash_wide requires (string, foldable int)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(text: Any, lanes: Any): Any =
    SimHashWide.hash(text.asInstanceOf[UTF8String],
      lanes.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, l) => s"graft.functions.SimHashWide.hash($t, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashWide =
    copy(left = newLeft, right = newRight)
}

object SimHashWide {
  private val Space = UTF8String.fromString(" ")
  private val Seed = 42L // lane 0 = Spark's xxhash64 default seed = SimHash64

  /** Called from generated code. One pass over distinct tokens; per
    * token, one xxhash64 per lane (seeds 42, 43, …). */
  def hash(text: UTF8String, lanes: Int): ArrayData = {
    val words = text.split(Space, -1)
    val seen = new java.util.HashSet[UTF8String](words.length * 2)
    val votes = new Array[Int](64 * lanes)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (seen.add(w)) {
        var lane = 0
        while (lane < lanes) {
          val h = XXH64.hashUnsafeBytes(
            w.getBaseObject, w.getBaseOffset, w.numBytes, Seed + lane)
          val base = lane * 64
          var j = 0
          while (j < 64) {
            votes(base + j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
          lane += 1
        }
      }
      i += 1
    }
    val sig = new Array[Long](lanes)
    var lane = 0
    while (lane < lanes) {
      var acc = 0L
      val base = lane * 64
      var j = 0
      while (j < 64) { if (votes(base + j) > 0) acc |= (1L << j); j += 1 }
      sig(lane) = acc
      lane += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Shared SQL builder (used by register() and GraftExtensions). */
  val builder: Seq[Expression] => Expression =
    exprs => SimHashWide(exprs(0), exprs(1))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registration.ensure(spark, "graft_simhash_wide", builder)
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import graft.operators.TextAnalysis
import graft.sources.Tables
import org.apache.spark.unsafe.types.UTF8String

class TextAnalysisSpec extends SparkSpec {

  test("stats n_chars matches the precomputed documents column") {
    val expected = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars").as("n_chars_expected"))
    val joined = TextAnalysis.stats(spark, sfDir).join(expected, "doc_id")
    assert(joined.where(col("n_chars") =!= col("n_chars_expected")).count() == 0)
    assert(joined.count() == 500)
  }

  test("rolling hash expression matches a reference fold") {
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    Seq("", "a", "hello world", "ünïcødé 漢字").foreach { s =>
      assert(RollingHash.hash(UTF8String.fromString(s)) == ref(s), s)
    }
  }

  test("fingerprint is deterministic and covers all docs") {
    val a = TextAnalysis.fingerprint(spark, sfDir).collect()
    val b = TextAnalysis.fingerprint(spark, sfDir).collect()
    assert(a.sameElements(b))
    assert(a.length == 500)
  }

  test("language id votes deterministically with lexicon hits") {
    val out = TextAnalysis.langId(spark, sfDir).collect()
    assert(out.length == 500)
    assert(out.forall { r =>
      val lang = r.getAs[String]("pred_lang")
      (lang == "unknown") == (r.getAs[Long]("hits") == 0L)
    })
  }

  test("quality score stays in [0,1]") {
    val scores = TextAnalysis.quality(spark, sfDir)
      .select("quality_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("quality plan has no interpreted higher-order lambda (codegen only)") {
    val plan = TextAnalysis.quality(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("token-set hits counts duplicates and honors the set") {
    import graft.functions.TokenSetHits
    val set = TokenSetHits.buildSet(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("the", "a", "of", "and", "is").map(UTF8String.fromString)))
    def hits(s: String): Int = TokenSetHits.hits(UTF8String.fromString(s), set)
    assert(hits("the cat and the hat") == 3) // the, and, the — duplicates counted
    assert(hits("") == 0)
    assert(hits("a a a") == 3)
    assert(hits("theory android") == 0) // whole-token matches only
  }

  test("top ngrams returns 20 rows with positive counts") {
    val rows = TextAnalysis.topNgrams(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }
}

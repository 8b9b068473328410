package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayDotProduct, RollingHash, SimHash64, WordNgrams, WordShingles}

/** Session extension registering graft's native expressions as SQL
  * functions — the supported deployment path for custom Catalyst code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * after which `SELECT graft_simhash64(text) FROM docs` parses and
  * codegens like a builtin. (The same hook would register a custom
  * `Rule[LogicalPlan]` via `injectOptimizerRule` or a `SparkStrategy`
  * via `injectPlannerStrategy` if an operator ever needs a bespoke
  * physical plan; graft's operators so far compose from existing plans,
  * so only functions are injected.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash", "polynomial rolling-hash fingerprint of a string"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit SimHash of space-tokenized text"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "distinct k-word shingles of text"),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs.head, exprs(1).eval().asInstanceOf[Int])))

    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams", "all k-word grams of text in position order"),
      (exprs: Seq[Expression]) =>
        WordNgrams(exprs.head, exprs(1).eval().asInstanceOf[Int])))

    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two array<double> columns"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))))
  }
}

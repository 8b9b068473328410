package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CharDeletions
import graft.sources.Tables

/** Fuzzy entity matching (record linkage) via SymSpell-style
  * deletion-neighborhood blocking.
  *
  * The reference pipeline cleans and loads dimension tables as-is; real
  * retail feeds carry typo'd keys (OCR'd receipts, hand-keyed customer
  * names), and linking them back to the master dimension is the classic
  * silver-layer entity-resolution step. The naive approach — levenshtein
  * over a cross join — is O(n²) and unrunnable at scale; prefix blocking
  * collapses into one mega-bucket whenever names share a common prefix
  * (every customer name here starts with "Customer#").
  *
  * SymSpell blocking instead: any two strings within Levenshtein
  * distance 1 share a single-deletion-neighborhood ({s} ∪ one-char
  * deletions) element — equality, insertion, deletion, and
  * substitution each force one. So candidate generation is ONE
  * equi-join on the neighborhood element (~(L+1) rows per record,
  * near-unique keys — bucket population stays O(dups) regardless of
  * corpus size), and verification is an exact `levenshtein` on the
  * candidates only. Recall is 1 by construction; precision is 1 after
  * the distance filter (which also drops the few admitted lev-2
  * near-misses, e.g. transpositions).
  *
  * The "dirty" side is derived deterministically in-query (delete the
  * character at hash(key) % length), so the operator is self-contained
  * and the DuckDB oracle reproduces it bit-for-bit.
  */
object FuzzyMatch {

  /** `xf_fuzzy_match`: link every dirty customer name to all master
    * names within edit distance 1. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.table(spark, dir, "customer")
    val posSql = s"CAST(1 + ${posHashSql("c_custkey")} % char_length(c_name) AS INT)"
    val dirty = cust.select(
      col("c_custkey").as("d_key"),
      expr(s"concat(substring(c_name, 1, $posSql - 1), " +
        s"substring(c_name, $posSql + 1, char_length(c_name)))").as("d_name"))
    val dv = dirty.select(col("d_key"), col("d_name"),
      explode(CharDeletions.neighborhoodCol(spark, col("d_name"))).as("v"))
    val cv = cust.select(col("c_custkey").as("clean_key"), col("c_name"),
      explode(CharDeletions.neighborhoodCol(spark, col("c_name"))).as("v"))
    dv.join(cv, Seq("v"))
      .select("d_key", "d_name", "clean_key", "c_name").distinct()
      .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      .where(col("dist") <= 1)
      .select("d_key", "d_name", "clean_key", "dist")
      .orderBy("d_key", "clean_key")
  }

  private def posHashSql(idExpr: String): String =
    s"(((($idExpr) % ${Curation.HashMod}) * ${Curation.HashMult}) % ${Curation.HashMod})"

  /** DuckDB mirror of the deletion neighborhood: {s} ∪ one-char
    * deletions, distinct. */
  private def neighborhoodSql(s: String): String =
    s"list_distinct(list_prepend($s, list_transform(" +
      s"generate_series(1, length($s)), i -> substr($s,1,i-1) || substr($s,i+1))))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xf_fuzzy_match" -> fuzzyMatch)

  val oracles: Map[String, String] = Map(
    "xf_fuzzy_match" ->
      s"""WITH dirty AS (
         |  SELECT c_custkey AS d_key,
         |         substr(c_name, 1, CAST(1 + ${posHashSql("c_custkey")}
         |             % length(c_name) AS INT) - 1)
         |         || substr(c_name, CAST(1 + ${posHashSql("c_custkey")}
         |             % length(c_name) AS INT) + 1) AS d_name
         |  FROM customer),
         |dv AS (SELECT d_key, d_name, unnest(${neighborhoodSql("d_name")}) AS v
         |       FROM dirty),
         |cv AS (SELECT c_custkey AS clean_key, c_name,
         |              unnest(${neighborhoodSql("c_name")}) AS v
         |       FROM customer),
         |cand AS (SELECT DISTINCT d_key, d_name, clean_key, c_name
         |         FROM dv JOIN cv USING (v))
         |SELECT d_key, d_name, clean_key, levenshtein(d_name, c_name) AS dist
         |FROM cand WHERE levenshtein(d_name, c_name) <= 1
         |ORDER BY d_key, clean_key""".stripMargin)
}

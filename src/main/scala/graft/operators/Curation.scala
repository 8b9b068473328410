package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Training-corpus curation operators: dedup-cluster resolution
  * (connected components over near-dup pairs), deterministic
  * train/val/test splits, per-stratum deterministic sampling, and the
  * composed filter→dedup curation pass an LLM data pipeline runs before
  * tokenization.
  *
  * Scale design: the split/sample hash is pure per-row arithmetic (no
  * shuffle, engine-portable, ANSI-overflow-safe); stratified sampling
  * uses the bounded-heap [[graft.functions.TopKByScore]] aggregate
  * (map-side partial heaps — never a per-stratum window sort);
  * connected components iterate min-label propagation where every step
  * is a keyed equi-join + partial aggregate, with only an O(1)
  * convergence checksum on the driver.
  */
object Curation {

  /** Multiplicative (Fibonacci) hash, portable across engines: odd
    * multiplier → a bijection mod 2^31, equidistributed buckets over
    * sequential ids. Stays in BIGINT range ((2^31-1)*2654435761 < 2^63)
    * so ANSI Spark and DuckDB compute it identically — unlike
    * xxhash64, which DuckDB lacks. */
  val HashMod = 2147483648L // 2^31
  val HashMult = 2654435761L // 2^32 / golden ratio, odd

  private[graft] def portableHash(id: org.apache.spark.sql.Column) =
    ((id % HashMod) * HashMult) % HashMod

  private[graft] def portableHashSql(idExpr: String): String =
    s"((($idExpr) % $HashMod) * $HashMult) % $HashMod"

  // ---- deterministic train/val/test split --------------------------------

  val TrainPct = 90L
  val ValPct = 5L // test gets the rest

  /** Assign every document to train/val/test by hash bucket — the
    * standard leakage-safe split: membership depends only on doc_id, so
    * re-runs, backfills and cluster resizing never move a document
    * across splits. Pure per-row expression — no shuffle, no state. */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), (portableHash(col("doc_id")) % 100L).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainPct, "train")
          .when(col("bucket") < TrainPct + ValPct, "val")
          .otherwise("test"))
      .orderBy("doc_id")

  // ---- per-stratum deterministic sampling --------------------------------

  val StratumSampleK = 20

  /** Uniform deterministic sample of up to `StratumSampleK` events per
    * event_type: the k smallest portable hashes win (a fixed random
    * permutation of each stratum). Implemented with the bounded-heap
    * top-k aggregate, so a stratum of a billion rows costs one partial
    * aggregation — not a window sort of the stratum. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKByScore.register(spark)
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        // negate: TopKByScore keeps highest-score (ties → smaller id),
        // so -hash keeps the k smallest hashes. < 2^31, exact in double.
        (-portableHash(col("event_id")).cast("double")).as("neg_h"))
      .groupBy("event_type")
      .agg(call_function("graft_top_k_by_score",
        col("neg_h"), col("event_id"), lit(StratumSampleK)).as("topk"))
      .select(col("event_type"), posexplode(col("topk")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as("event_id"))
      .orderBy("event_type", "rn")
  }

  // ---- dedup cluster resolution (connected components) -------------------

  /** Iteration cap for min-label propagation — converges in O(diameter)
    * rounds, and near-dup components are shallow (stars/cliques around
    * a template). A corpus whose dup graph forms 2^30-long chains would
    * need the large-star/small-star variant (O(log n) rounds); the plan
    * shape per round is identical. */
  val MaxCcIterations = 30

  /** Connected components by min-label propagation over an undirected
    * edge list `(a_id, b_id)`: every node's label converges to the
    * smallest doc_id in its component — a unique fixpoint, so the
    * result is deterministic under any partitioning/iteration order.
    * Each round is one keyed join + partial min-aggregate; the only
    * driver-side value is a 1-row convergence checksum (the label sum
    * strictly decreases until the fixpoint, so equal sum ⇔ converged).
    * Returns `(id, lbl)` for nodes that appear in edges. */
  def componentLabels(edges: DataFrame, maxIter: Int = MaxCcIterations): DataFrame = {
    val und = edges.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionAll(edges.select(col("b_id").as("u"), col("a_id").as("v")))
      .localCheckpoint() // reused every round; truncates lineage
    var labels = und.select(col("u").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var sum = labelChecksum(labels)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val nbrMin = und
        .join(labels.select(col("id").as("v"), col("lbl").as("vlbl")), "v")
        .groupBy("u").agg(min("vlbl").as("nbrlbl"))
      val next = labels
        .join(nbrMin.select(col("u").as("id"), col("nbrlbl")), Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbrlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val s = labelChecksum(next)
      done = s == sum
      sum = s
      labels = next
      it += 1
    }
    labels
  }

  private def labelChecksum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("lbl").cast(DecimalType(38, 0)))).first().getDecimal(0)

  /** Resolve exact-Jaccard near-dup pairs into dedup clusters: every
    * document gets a `cluster_id` (the smallest doc_id of its
    * component; singletons are their own cluster) and a canonical flag
    * — the "keep one per near-dup cluster" primitive of corpus dedup. */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccard(spark, dir).select("a_id", "b_id")
    val lbl = componentLabels(pairs)
    Tables.table(spark, dir, "documents").select("doc_id")
      .join(lbl.select(col("id").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  // ---- composed corpus curation ------------------------------------------

  /** The end-to-end curation pass: keep documents that (a) pass quality
    * scoring, (b) are identified as English, and (c) are the canonical
    * copy of their exact-dup group. Composes [[TextAnalysis.quality]],
    * [[TextAnalysis.langId]] and the exact-dedup canonical set — three
    * corpus scans joined on doc_id (each scan is the operator's own
    * optimized plan; the joins are keyed equi-joins). */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val canon = Tables.table(spark, dir, "documents")
      .groupBy(sha2(col("text"), 256))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"), col("passed"))
      .join(TextAnalysis.langId(spark, dir).select("doc_id", "pred_lang"), "doc_id")
      .join(canon, Seq("doc_id"), "left_semi")
      .where(col("passed") && col("pred_lang") === "en")
      .select(col("doc_id"), col("pred_lang"), col("n_tokens"), col("quality_score"))
      .orderBy("doc_id")
  }

  // ---- oracles -----------------------------------------------------------

  val oracles: Map[String, String] = Map(
    "smp_split" ->
      s"""SELECT doc_id,
         |       ${portableHashSql("doc_id")} % 100 AS bucket,
         |       CASE WHEN ${portableHashSql("doc_id")} % 100 < $TrainPct THEN 'train'
         |            WHEN ${portableHashSql("doc_id")} % 100 < ${TrainPct + ValPct} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "smp_stratified" ->
      s"""WITH h AS (
         |  SELECT event_type, event_id,
         |         ${portableHashSql("event_id")} AS hk
         |  FROM events),
         |r AS (
         |  SELECT event_type, event_id,
         |         ROW_NUMBER() OVER (PARTITION BY event_type
         |           ORDER BY hk, event_id) AS rn
         |  FROM h)
         |SELECT event_type, CAST(rn AS INT) AS rn, event_id
         |FROM r WHERE rn <= $StratumSampleK
         |ORDER BY event_type, rn""".stripMargin,
    "dd_components" ->
      s"""WITH RECURSIVE ${Dedup.ngramPairCtes},
         |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(u, r) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, reach.r FROM edges e JOIN reach ON e.u = reach.u),
         |lbl AS (SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY 1),
         |asg AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN lbl l USING (doc_id))
         |SELECT doc_id, cluster_id,
         |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |       doc_id = cluster_id AS is_canonical
         |FROM asg ORDER BY doc_id""".stripMargin,
    "txt_curate" ->
      s"""WITH q AS (SELECT * FROM (${TextAnalysis.oracles("txt_quality")})),
         |l AS (SELECT * FROM (${TextAnalysis.oracles("txt_lang_id")})),
         |canon AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text))
         |SELECT q.doc_id, l.pred_lang, q.n_tokens, q.quality_score
         |FROM q JOIN l ON q.doc_id = l.doc_id
         |WHERE q.passed AND l.pred_lang = 'en'
         |  AND q.doc_id IN (SELECT doc_id FROM canon)
         |ORDER BY q.doc_id""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "smp_split"      -> trainValTestSplit,
    "smp_stratified" -> stratifiedSample,
    "dd_components"  -> dedupComponents,
    "txt_curate"     -> curate)
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Gram matrix, PCA projection and cosine range search. */
class PcaSpec extends SparkSpec {

  private def embeddings(): Array[(Long, Array[Double])] =
    Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getSeq[Double](1).toArray))

  test("gram matrix matches a driver-side fixed-point recompute") {
    val vecs = embeddings()
    val rows = Similarity.gramMatrix(spark, sfDir).collect()
    assert(rows.length == Similarity.Dim * (Similarity.Dim + 1) / 2)
    val got = rows.map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
      r.getAs[Double]("gram")).toMap
    // spot-check a band of entries against the exact fixed-point sum
    for (i <- 0 until 4; j <- i until 8) {
      val exp = vecs.map { case (_, e) =>
        math.floor(e(i) * 10000) * math.floor(e(j) * 10000)
      }.map(_.toLong).sum / 1e8
      assert(math.abs(got((i, j)) - exp) < 1e-12, s"gram($i,$j)")
    }
    // diagonal is a sum of squares: strictly positive
    (0 until Similarity.Dim).foreach(i => assert(got((i, i)) > 0.0))
  }

  test("pca axis is a unit eigenvector with a small residual, stable across runs") {
    val axis = Similarity.pcaAxis(spark, sfDir)
    assert(axis.length == Similarity.Dim)
    assert(math.abs(axis.map(x => x * x).sum - 1.0) < 1e-12)
    // residual ||Cv - λv||∞ / λ small ⇒ converged eigenvector of the
    // SAME fixed-point Gram the axis was iterated on (quantization is
    // part of the operator's contract, not convergence error)
    val d = Similarity.Dim
    val m = Array.ofDim[Double](d, d)
    Similarity.gramMatrix(spark, sfDir).collect().foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val v = r.getAs[Double]("gram")
      m(i)(j) = v
      m(j)(i) = v
    }
    val cv = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * axis(j)).sum)
    val lambda = (0 until d).map(i => axis(i) * cv(i)).sum
    assert(lambda > 0)
    val resid = (0 until d).map(i => math.abs(cv(i) - lambda * axis(i))).max
    // convergence rate is the (data-dependent) eigengap; 200 rounds at
    // the observed λ₂/λ₁ ≈ 0.93 put the residual well under this bound
    assert(resid / lambda < 1e-4, s"eigen residual $resid vs lambda $lambda")
    // determinism: a second full computation is bit-identical
    val again = Similarity.pcaAxis(spark, sfDir)
    assert(axis.sameElements(again))
  }

  test("pca projection equals the driver-side dot with the axis") {
    val axis = Similarity.pcaAxis(spark, sfDir)
    val byId = embeddings().toMap
    val rows = Similarity.pcaProject(spark, sfDir).collect()
    assert(rows.length == byId.size)
    rows.foreach { r =>
      val e = byId(r.getAs[Number](0).longValue)
      val exp = e.indices.map(i => e(i) * axis(i)).sum
      // the native expression accumulates in index order, same as here
      assert(r.getAs[Double]("pc1") == exp, s"vec ${r.get(0)}")
    }
  }

  test("range search returns exactly the above-threshold pairs") {
    val vecs = embeddings()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.indices.map(i => a(i) * a(i)).sum) *
        math.sqrt(b.indices.map(i => b(i) * b(i)).sum))
    }
    val queries = vecs.filter(_._1 % Similarity.QueryModulus == 0)
    val exp = (for {
      (qid, q) <- queries
      (vid, v) <- vecs
      if vid != qid && cos(v, q) >= Similarity.RangeThreshold
    } yield (qid, vid)).toSet
    val got = Similarity.annRange(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(got.toSet == exp)
    assert(got.nonEmpty)
    // plan shape: the query side broadcasts; no cartesian product
    val plan = Similarity.annRange(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}

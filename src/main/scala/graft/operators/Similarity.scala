package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - bruteForceKnn: exact cosine top-k, O(|queries| x |corpus|). Correct
  *    baseline; at scale usable when the query set is small enough to
  *    broadcast (the corpus streams through one pass, no shuffle of the
  *    corpus itself).
  *  - lshKnn: random-hyperplane LSH bucketing (with multi-probe via reduced
  *    bucket prefixes) so candidate generation is an equi join on bucket id
  *    — the 100 TB path, trading a small recall loss for joining only
  *    within buckets.
  */
object Similarity {

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * Ranking is on (rounded sim desc, neighbor id asc) to be reproducible
    * under floating-point summation differences.
    * @return (vec_id, nn_id, sim, rank)
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    roundTo: Int = 4): DataFrame = {
    // norms are precomputed per side so the per-pair work inside the join
    // is a single dot product, not dot + two norm re-computations
    val q = broadcast(queries.select(col(idCol).as("vec_id"), col(vecCol).as("__qv"),
      VectorFns.norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("__cv"),
      VectorFns.norm(col(vecCol)).as("__cn"))
    val scored = q.join(c, col("vec_id") =!= col("nn_id"))
      .withColumn("sim", round(
        VectorFns.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "nn_id", "sim", "rank")
  }

  /** Approximate top-k: candidates restricted to vectors sharing the
    * query's bucket in ANY of `tables` independent random-hyperplane hash
    * tables (nPlanes sign bits each) — the classic (k, L) LSH scheme.
    * Recall/cost tuning: collision probability per table for angle theta
    * is (1 - theta/pi)^nPlanes; L tables union to 1-(1-p)^L. Fewer planes
    * or more tables => higher recall, more candidates. The candidate join
    * stays an equi join on (table, bucket), so the shuffle carries bucket
    * groups — never the n^2 pair space. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nPlanes: Int = 5, tables: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding",
             roundTo: Int = 4): DataFrame = {
    def buckets(df: DataFrame, id: String, vec: String): DataFrame = {
      val tableCols = (0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          VectorFns.lshBucket(col(vec), nPlanes, seed = 1000L + t).as("bucket"))
      }
      df.select(col(id), col(vec), explode(array(tableCols: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.tbl"), col("tb.bucket"))
    }
    val q = buckets(queries, idCol, vecCol)
      .select(col(idCol).as("vec_id"), col(vecCol).as("__qv"), col("tbl"), col("bucket"),
        VectorFns.norm(col(vecCol)).as("__qn"))
    val c = buckets(corpus, idCol, vecCol)
      .select(col(idCol).as("nn_id"), col(vecCol).as("__cv"), col("tbl"), col("bucket"),
        VectorFns.norm(col(vecCol)).as("__cn"))
    val cand = q.join(c, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("nn_id"))
      .select("vec_id", "nn_id", "__qv", "__cv", "__qn", "__cn")
      .dropDuplicates("vec_id", "nn_id")
    val scored = cand.withColumn("sim",
      round(VectorFns.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "nn_id", "sim", "rank")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    * semantic deduplication. Vectors are partitioned into cells, and within
    * each cell a vector is DROPPED when any lower-id cell-mate has rounded
    * cosine >= `threshold` — exactly the paper's upper-triangular
    * similarity-matrix rule (not transitive-closure clustering).
    *
    * The cell here is the sign-bit grid of the first `cellBits` dimensions:
    * deterministic, SQL-portable, zero training. Production at 100 TB swaps
    * in a k-means assignment (operators/Ivf.scala's fitCentroids +
    * nearest-centroid) for balanced data-aware cells — the pair generation,
    * drop rule and shapes below are identical either way.
    *
    * Scale shape: cell assignment is a per-row expression (no shuffle);
    * candidate pairs come from ONE equi self-join on cell (never all-pairs
    * across cells); the drop set is a semi-join back. Cells bound the
    * quadratic term to (corpus/cells)^2 per cell — cells scale with the
    * corpus exactly like SemDeDup's k-means k.
    *
    * @return one row per input vector: (vec_id, cell, kept) — callers
    *         filter kept for the surviving corpus
    */
  def semanticDedup(df: DataFrame, cellBits: Int = 4, threshold: Double = 0.9,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    roundTo: Int = 4): DataFrame = {
    val cell = (0 until cellBits).map { i =>
      when(element_at(col(vecCol), i + 1) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"), cell.as("cell"))
    val dropped = v.as("x").join(v.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") < col("y.id"))
      .filter(round(VectorFns.cosine(col("x.v"), col("y.v")), roundTo) >= threshold)
      .select(col("y.id").as("id")).distinct()
      .withColumn("__drop", lit(1))
    v.join(dropped, Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"), col("__drop").isNull.as("kept"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold among all pairs of
    * a bounded slice (exact); LSH-bucketed for the full corpus. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         roundTo: Int = 4): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .withColumn("sim", round(VectorFns.cosine(col("x.v"), col("y.v")), roundTo))
      .filter(col("sim") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("sim"))
  }
}

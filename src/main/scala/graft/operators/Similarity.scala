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
    * query's LSH bucket under any of `probes` progressively coarser prefix
    * maskings of an nPlanes-bit random-hyperplane signature. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nPlanes: Int = 12, probes: Int = 3,
             idCol: String = "vec_id", vecCol: String = "embedding",
             roundTo: Int = 4): DataFrame = {
    def buckets(df: DataFrame, id: String, vec: String): DataFrame = {
      val sig = VectorFns.lshBucket(col(vec), nPlanes)
      // probe p masks off the top p planes -> coarser bucket, higher recall
      val probeCols = (0 until probes).map { p =>
        struct(lit(p).as("probe"),
          sig.bitwiseAND(lit((1L << (nPlanes - p)) - 1L)).as("bucket"))
      }
      df.select(col(id), col(vec), explode(array(probeCols: _*)).as("pb"))
        .select(col(id), col(vec), col("pb.probe"), col("pb.bucket"))
    }
    val q = buckets(queries, idCol, vecCol)
      .select(col(idCol).as("vec_id"), col(vecCol).as("__qv"), col("probe"), col("bucket"),
        VectorFns.norm(col(vecCol)).as("__qn"))
    val c = buckets(corpus, idCol, vecCol)
      .select(col(idCol).as("nn_id"), col(vecCol).as("__cv"), col("probe"), col("bucket"),
        VectorFns.norm(col(vecCol)).as("__cn"))
    val cand = q.join(c, Seq("probe", "bucket"))
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

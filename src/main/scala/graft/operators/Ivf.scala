package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into cells; a query scans only its
  * `nprobe` nearest cells and reranks exactly.
  *
  * This is the second ANN scale path next to hyperplane LSH: where LSH
  * needs no training, IVF exploits cluster structure in real embedding
  * distributions (and degrades toward nprobe/k of a full scan on
  * structureless data).
  *
  * Scale notes: training iterates over the data with a tiny (k x dim)
  * broadcast state per step — the classic Lloyd iteration as repeated
  * aggregation, no driver-side data. Assignment and search are broadcast
  * joins against the centroid table; the candidate join is an equi join
  * on cell id. Everything distributes.
  */
object Ivf {

  /** Deterministic k-means (Lloyd) over the embedding column. Initial
    * centroids are the first k rows by id (deterministic, no sampling
    * RNG). Returns (cell: Int, centroid: Array[Double]). */
  def fitCentroids(corpus: DataFrame, k: Int, iters: Int = 5,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    // constant partition key: the window runs over exactly k rows (post
    // limit), so a single partition is correct AND intended — naming it
    // silences WindowExec's single-partition warning without changing the
    // plan shape. pmod(id, 1) rather than lit(0): a foldable key would be
    // constant-folded back into an empty partition spec.
    var centroids = vecs.orderBy("__id").limit(k)
      .withColumn("cell", (row_number().over(
        Window.partitionBy(pmod(col("__id"), lit(1))).orderBy("__id")) - 1))
      .select(col("cell"), col("__v").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(vecs, centroids)
      // new centroid = elementwise mean over members: posexplode ->
      // (cell, pos) average -> re-assemble ordered arrays.
      // localCheckpoint (eager) cuts the lineage each iteration — without
      // it the final plan stacks `iters` crossJoin+window layers and
      // planning/execution time grows superlinearly (the same
      // iterative-algorithm rule as the SURVEY §2.8 match-filter note).
      centroids = assigned
        .select(col("cell"), posexplode(col("__v")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), x => x.getField("m")).as("centroid"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Nearest-centroid assignment (broadcast centroids, window argmin).
    * private[operators]: Pq.ivfAdcKnn reuses it for the coarse stage. */
  private[operators] def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val joined = vecs.crossJoin(broadcast(centroids))
      .withColumn("__d", VectorFns.l2sq(col("__v"), col("centroid")))
    val w = Window.partitionBy(col("__id")).orderBy(col("__d"), col("cell"))
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__v"), col("cell"))
  }

  /** IVF search: exact cosine rerank within the query's `nprobe` nearest
    * cells. Returns (vec_id, nn_id, sim, rank). */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nCells: Int = 16, nprobe: Int = 4, iters: Int = 5,
             idCol: String = "vec_id", vecCol: String = "embedding",
             roundTo: Int = 4): DataFrame = {
    val centroids = fitCentroids(corpus, nCells, iters, idCol, vecCol)
    val corpusCells = assign(
      corpus.select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v")), centroids)
      .select(col("__id").as("nn_id"), col("__v").as("__cv"), col("cell"))
      .withColumn("__cn", VectorFns.norm(col("__cv")))
    // query probes: nprobe nearest centroids
    val qv = queries.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("__qv"))
    val probes = qv.crossJoin(broadcast(centroids))
      .withColumn("__d", VectorFns.l2sq(col("__qv"), col("centroid")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("__d"), col("cell"))
    val qCells = probes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .select(col("vec_id"), col("__qv"), col("cell"),
        VectorFns.norm(col("__qv")).as("__qn"))
    val cand = qCells.join(corpusCells, Seq("cell"))
      .filter(col("vec_id") =!= col("nn_id"))
      .dropDuplicates("vec_id", "nn_id")
    val scored = cand.withColumn("sim",
      round(VectorFns.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val wr = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select("vec_id", "nn_id", "sim", "rank")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Scalar quantization (SQ8) for approximate nearest neighbor search: every
  * embedding dimension is linearly quantized to 8 bits against the corpus
  * per-dimension [min, max] range. The quantized corpus is 1 byte/dim
  * (array<tinyint> — 4-8x smaller than the float/double input), which at
  * billion-vector scale is the difference between a scan that fits in
  * cluster memory and one that doesn't. Search dequantizes at scan time
  * (reconstruction at the dimension midpoint) and reranks by exact cosine
  * against the full-precision query — the classic asymmetric scheme, the
  * scalar sibling of PQ/ADC (`Pq.scala`).
  *
  * Everything is deterministic: the quantizer grid comes from exact min/max
  * aggregates and the code is floor arithmetic, so two runs (or 1000
  * executors) always produce identical codes.
  */
object Sq {

  /** Per-dimension [lo, hi] quantizer grid as a single broadcastable row
    * of two aligned arrays. Distributed end-to-end: posexplode -> per-dim
    * min/max hash agg -> re-assemble ordered arrays (no driver collect). */
  private def grid(vecs: DataFrame): DataFrame =
    vecs.select(posexplode(col("__v")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("lo"), max("x").as("hi"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("d"), col("lo"), col("hi")))).as("s"))
      .select(
        transform(col("s"), e => e.getField("lo")).as("__lo"),
        transform(col("s"), e => e.getField("hi")).as("__hi"))

  /** Encode a corpus to SQ8: (id, codes array<tinyint>), code space shifted
    * to [-128, 127] so each dimension is genuinely one byte in storage.
    * code = floor((x - lo) / (hi - lo) * 256) clamped to [0, 255], - 128. */
  def sq8Encode(corpus: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    vecs.crossJoin(broadcast(grid(vecs)))
      .select(col(idCol),
        transform(col("__v"), (x, i) => {
          val lo = element_at(col("__lo"), i + 1)
          val hi = element_at(col("__hi"), i + 1)
          (when(hi <= lo, lit(0)).otherwise(
            least(lit(255), greatest(lit(0),
              floor((x - lo) / (hi - lo) * 256).cast("int")))) - 128)
            .cast("tinyint")
        }).as("codes"))
  }

  /** PORTABLE scalar-quantization twin (x16; the oracled sibling of
    * [[sq8Knn]]/x06, whose float cosine over the midpoint-dequantized
    * corpus has no portable SQL form). Same asymmetric semantics, exact
    * integer arithmetic throughout (the x12 regime): coordinates are
    * [[KmeansPortable.quantize]]d ints; the per-dimension grid is the
    * corpus [lo, hi] (exact integer min/max — the sq8Encode grid);
    * `code = ((v - lo) * levels) div (hi - lo + 1)` lands in
    * [0, levels-1] with NO clamp; reconstruction is the integer cell
    * midpoint `lo + ((2*code + 1) * (hi - lo + 1)) div (2*levels)`;
    * search is exact integer L2² of full-precision queries against the
    * reconstructed corpus, ties on (dist2, nn_id). The two divisions are
    * evaluated as floor-of-double — exact because each true quotient is
    * far from the next integer relative to double rounding error: the
    * code division (by hi-lo+1 ≤ 256) by at least 1/(hi-lo+1) ≥ 1/256,
    * the reconstruction division (by 2*levels) by at least
    * 1/(2*levels) ≥ 1/512 — which is why `levels` is capped at 256; so
    * floor == integer division on both engines. Scale shape matches
    * sq8Knn: the corpus scans compressed
    * (grid is a broadcast single row), queries broadcast, and only
    * k-bounded rows reach the top-k exchange.
    * @return (idCol, nn_id, dist2, rnk), rnk in 1..topK per query */
  def sqSearch(queries: DataFrame, corpus: DataFrame, topK: Int,
               levels: Int = 16, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(levels >= 2 && levels <= 256, s"sqSearch: levels=$levels")
    val qc = KmeansPortable.quantize(corpus, idCol, vecCol)
    // per-dim [lo, hi]: posexplode -> min/max hash agg -> ordered arrays
    // (map-side combinable; one broadcastable row, same as sq8's grid)
    val grid = qc.select(posexplode(col("__q")).as(Seq("__p", "__x")))
      .groupBy("__p").agg(min("__x").as("__lo"), max("__x").as("__hi"))
      .groupBy()
      .agg(array_sort(collect_list(
        struct(col("__p"), col("__lo"), col("__hi")))).as("__s"))
      .select(
        transform(col("__s"), e => e.getField("__lo")).as("__los"),
        transform(col("__s"), e => e.getField("__hi")).as("__his"))
    val recon = qc.crossJoin(broadcast(grid))
      .select(col("__id").as("nn_id"),
        transform(col("__q"), (x, i) => {
          val lo = element_at(col("__los"), i + 1)
          val width = element_at(col("__his"), i + 1) - lo + lit(1L)
          val code = floor((x - lo) * levels / width)
          lo + floor((code * 2 + 1) * width / lit(2L * levels))
        }).as("__rv"))
    val qdf = KmeansPortable.quantize(queries, idCol, vecCol)
      .select(col("__id").as("__qid"), col("__q"))
    val scored = broadcast(qdf)
      .join(recon, col("__qid") =!= col("nn_id"))
      .withColumn("dist2", KmeansPortable.l2(col("__q"), col("__rv")))
    KmeansPortable.topKByDist(scored, topK, idCol, "dist2")
  }

  /** SQ8 ANN: top-k by cosine between full-precision queries and the
    * midpoint-dequantized SQ8 corpus. Same output contract as the exact
    * twin `Similarity.bruteForceKnn` — (vec_id, nn_id, sim, rank), ranked
    * on (rounded sim desc, nn_id asc) for cross-run determinism. The scan
    * side is the compressed corpus; queries broadcast. */
  def sq8Knn(queries: DataFrame, corpus: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             roundTo: Int = 4): DataFrame = {
    val vecs = corpus.select(col(idCol).as("nn_id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val g = broadcast(grid(vecs))
    // dequantize at scan time: x^ = lo + (code + 0.5) * (hi - lo) / 256
    // (dimension-cell midpoint; codes were stored shifted by -128)
    val deq = sq8Encode(corpus, idCol, vecCol).crossJoin(g)
      .select(col(idCol).as("nn_id"),
        transform(col("codes"), (c, i) => {
          val lo = element_at(col("__lo"), i + 1)
          val hi = element_at(col("__hi"), i + 1)
          lo + (c.cast("double") + lit(128.5)) * (hi - lo) / lit(256.0)
        }).as("__cv"))
      .withColumn("__cn", VectorFns.norm(col("__cv")))
    val q = broadcast(queries.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("__qv"))
      .withColumn("__qn", VectorFns.norm(col("__qv"))))
    val scored = q.join(deq, col("vec_id") =!= col("nn_id"))
      .withColumn("sim", round(
        VectorFns.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "nn_id", "sim", "rank")
  }
}

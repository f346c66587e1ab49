package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** PQ/ADC quality + determinism: codebooks must train identically on
  * every run (no RNG), and ADC ranking must keep a recall floor against
  * the exact L2 top-k (PQ ranks by L2 — the cosine brute force is not the
  * right baseline). */
class PqSpec extends SparkSpec {

  private def exactL2(queries: org.apache.spark.sql.DataFrame,
                      corpus: org.apache.spark.sql.DataFrame, k: Int) = {
    val q = queries.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val c = corpus.select(col("vec_id").as("nn_id"),
      transform(col("embedding"), x => x.cast("double")).as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("nn_id"))
    q.crossJoin(c).filter(col("vec_id") =!= col("nn_id"))
      .withColumn("d2", VectorFns.l2sq(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  test("codebooks are deterministic; ADC recall@5 above the floor") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val b1 = Pq.fitCodebooks(emb, m = 16, codes = 32, iters = 3)
      .orderBy("sub", "code").collect().map(_.getSeq[Double](2).head)
    val b2 = Pq.fitCodebooks(emb, m = 16, codes = 32, iters = 3)
      .orderBy("sub", "code").collect().map(_.getSeq[Double](2).head)
    assert(b1.sameElements(b2))

    val queries = emb.filter(col("vec_id") < 50)
    val exact = exactL2(queries, emb, 5)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.pqKnn(queries, emb, 5, m = 16, codes = 32, iters = 3)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"pq adc recall@5 = $recall%.3f")
    // 16x32 codebooks on structureless random embeddings are the worst
    // case for PQ; the floor guards against regressions, not SOTA
    assert(recall >= 0.35, f"PQ recall collapsed: $recall%.3f")
    // every query answered with exactly k candidates
    assert(approx.map(_._1) == exact.map(_._1))
  }

  test("IVFADC prunes candidates and keeps a recall floor") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = exactL2(queries, emb, 5)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val composed = Pq.ivfAdcKnn(queries, emb, 5, nCells = 8, nprobe = 4,
      m = 16, codes = 32, iters = 3)
    val approx = composed.select("vec_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"ivfadc recall@5 = $recall%.3f")
    // the coarse stage throws away (1 - nprobe/nCells) of the corpus and
    // the fine stage quantizes — the compounded floor is necessarily
    // below the pure-ADC 0.35 (structureless worst case)
    assert(recall >= 0.30, f"IVFADC recall collapsed: $recall%.3f")
    assert(approx.map(_._1) == exact.map(_._1)) // every query answered
  }
}

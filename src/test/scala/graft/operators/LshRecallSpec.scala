package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the approximate-ANN quality floor: hyperplane-LSH kNN must keep a
  * minimum recall against the exact brute force on the fixture corpus —
  * a silent bucketing regression (hash change, probe-mask bug) fails here
  * rather than shipping an ANN that returns junk. */
class LshRecallSpec extends SparkSpec {

  test("lshKnn recall@5 against brute force stays above the pinned floor") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceKnn(queries, emb, 5)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshKnn(queries, emb, 5)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"lsh recall@5 = $recall%.3f (${approx.size} returned)")
    assert(recall >= 0.35,
      f"LSH recall collapsed: $recall%.3f — bucketing or probe masking regressed")
    // and candidates evaluated must be well under the full corpus
    // (that's the point of LSH) — every query got SOME neighbors
    assert(approx.map(_._1) == exact.map(_._1))
  }

  test("ivfKnn: deterministic centroids, recall floor vs brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 50)
    val c1 = Ivf.fitCentroids(emb, 8, iters = 3).orderBy("cell")
      .collect().map(_.getSeq[Double](1).head)
    val c2 = Ivf.fitCentroids(emb, 8, iters = 3).orderBy("cell")
      .collect().map(_.getSeq[Double](1).head)
    assert(c1.sameElements(c2)) // no RNG anywhere
    val exact = Similarity.bruteForceKnn(queries, emb, 5)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfKnn(queries, emb, 5, nCells = 8, nprobe = 3, iters = 3)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"ivf recall@5 = $recall%.3f")
    // random embeddings are the no-structure worst case: nprobe/nCells of
    // the corpus is scanned, so recall floors around that fraction + rerank
    assert(recall >= 0.30, f"IVF recall collapsed: $recall%.3f")
  }
}

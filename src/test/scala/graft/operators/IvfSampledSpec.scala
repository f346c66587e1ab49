package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exercises the IVF paths that sf0.001–sf0.1 verification never reaches:
  * the capped-sample training branch (corpus larger than `trainCap`), the
  * NaN-total argmin, and the centroid-literal codegen-size contract.
  * Round-9/10 audits flagged all three as shipping unvalidated. */
class IvfSampledSpec extends SparkSpec {

  // deterministic pseudo-embeddings: two well-separated blobs so that
  // even a tiny training sample recovers the cluster structure
  private def corpus(n: Int, dim: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)), j =>
        (pmod(col("id"), lit(2)) * 10.0 +
          // (id+1): id=0 would otherwise be the all-zero vector, which
          // has no cosine direction
          sin((col("id") + 1) * j.cast("double"))).cast("float"))
        .as("embedding"))

  test("trainCap branch: sampling engages, stays deterministic, recall holds") {
    // parquet-backed so fitCentroids takes the FILE-STATS row-estimate
    // branch (the 100 TB path) rather than the sentinel-stats count
    // fallback that in-memory frames hit
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    corpus(2000, 16).write.mode("overwrite").parquet(s"$dir/emb")
    val emb = spark.read.parquet(s"$dir/emb")
    // capped fit trains on a hash-gated sample; the full fit on everything.
    // If the gate silently never engaged, the two would be identical.
    val capped = Ivf.fitCentroids(emb, 4, iters = 3, trainCap = 64L)
      .orderBy("cell").collect().map(_.getSeq[Double](1))
    val full = Ivf.fitCentroids(emb, 4, iters = 3, trainCap = 1000000L)
      .orderBy("cell").collect().map(_.getSeq[Double](1))
    assert(!capped.zip(full).forall { case (a, b) => a == b },
      "trainCap=64 produced the same centroids as the uncapped fit — " +
        "the sampling gate never engaged")
    // determinism: an identical second fit is bit-identical (hash gate on
    // id, no RNG, same partitioning)
    val capped2 = Ivf.fitCentroids(emb, 4, iters = 3, trainCap = 64L)
      .orderBy("cell").collect().map(_.getSeq[Double](1))
    assert(capped.zip(capped2).forall { case (a, b) => a == b },
      "sampled training is not deterministic across identical fits")
    // the sample-trained quantizer must still separate the two blobs:
    // search recall vs brute force stays above the structured-data floor
    val queries = emb.filter(col("vec_id") < 30)
    val exact = Similarity.bruteForceKnn(queries, emb, 5)
      .select("vec_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfKnn(queries, emb, 5, nCells = 4, nprobe = 2,
        iters = 3).select("vec_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"sampled-ivf recall@5 = $recall%.3f")
    assert(recall >= 0.5, f"sampled-training recall collapsed: $recall%.3f")
    // and the gate is partitioning-invariant: a differently-partitioned
    // corpus selects the SAME training ids (modular hash on vec_id), so
    // the fitted centroids agree to float-sum reordering tolerance
    val cappedRe = Ivf.fitCentroids(emb.repartition(7), 4, iters = 3,
        trainCap = 64L)
      .orderBy("cell").collect().map(_.getSeq[Double](1))
    capped.zip(cappedRe).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9,
          s"partitioning changed the fitted centroids: $x vs $y")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("NaN vector components never error the assign argmin") {
    val dim = 8
    val clean = corpus(200, dim)
    val poisoned = clean.withColumn("embedding",
      when(col("vec_id") === 150,
        array((Seq(lit(Float.NaN)) ++
          Seq.fill(dim - 1)(lit(1.0f))): _*))
        .otherwise(col("embedding")))
    // fit on clean rows only (the production posture: training data is
    // pre-filtered), then search the poisoned corpus — before the nanvl
    // guard this errored in element_at(cellIdArr, 0)
    val res = Ivf.ivfKnn(poisoned.filter(col("vec_id") < 100),
      poisoned, 3, nCells = 4, nprobe = 2, iters = 2)
    assert(res.count() > 0)
    // a fit whose TRAINING data contains the NaN row must also complete:
    // the poisoned centroid's distances go NaN -> +Infinity and it is
    // simply never chosen
    val cents = Ivf.fitCentroids(poisoned, 4, iters = 2)
    assert(cents.count() > 0)
  }

  test("broadcast-join assign is bit-identical to the literal argmin") {
    val emb = corpus(500, 12)
    val vecs = emb.select(col("vec_id").as("__id"),
      transform(col("embedding"), x => x.cast("double")).as("__v"))
    val cents = Ivf.fitCentroids(emb, 6, iters = 2)
    val lit0 = Ivf.assign(vecs, cents)
      .select("__id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val bc = Ivf.assignBroadcast(vecs, cents)
      .select("__id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(lit0 == bc,
      "broadcast argmin diverged from the literal path: " +
        lit0.collect { case (k, v) if bc(k) != v => (k, v, bc(k)) }.take(5))
  }

  test("assign emits exactly one cell per vector, even under exact centroid ties") {
    // the invariant ivfKnn's candidate join RELIES on since the r17
    // dedup removal: one corpus vector -> one cell means a (query, nn)
    // pair can only meet through one cell, so the candidate stream is
    // duplicate-free by construction and needs no dropDuplicates
    // shuffle. Ties are the adversarial case: a vector exactly
    // equidistant from two centroids must still land in ONE cell (the
    // first-minimum / min-cell-id tie-break), on BOTH argmin paths.
    import spark.implicits._
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(2.0, 0.0)), (2, Seq(0.0, 2.0)))
      .toDF("cell", "centroid")
    // (1,0) ties cells 0/1; (0,1) ties cells 0/2; (1,1) ties all three
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
        (3L, Seq(1.0, 1.0)), (4L, Seq(1.9, 0.1)))
      .toDF("__id", "__v")
    for ((name, assigned) <- Seq(
        "literal" -> Ivf.assign(vecs, cents),
        "broadcast" -> Ivf.assignBroadcast(vecs, cents))) {
      val rows = assigned.select("__id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.length == 4, s"$name path duplicated or dropped vectors: ${rows.toSeq}")
      assert(rows.map(_._1).distinct.length == 4, s"$name path: duplicate __id rows")
      // both paths break ties toward the smallest cell id
      val byId = rows.toMap
      assert(byId(1L) == 0 && byId(2L) == 0 && byId(3L) == 0 && byId(4L) == 1,
        s"$name path tie-break drifted: $byId")
    }
  }

  test("a planted duplicate corpus id fails fast instead of eating top-k slots") {
    // the r17 dedup removal made ivfKnn's candidate stream duplicate-free
    // ONLY under unique ids; a silent violation would let duplicate
    // (vec_id, nn_id) pairs occupy rank slots. The guard must reject it.
    val emb = corpus(300, 8)
    val dup = emb.union(emb.filter(col("vec_id") === 42))  // one extra id=42 row
    val queries = emb.filter(col("vec_id") < 10)
    val ex = intercept[IllegalArgumentException] {
      Ivf.ivfKnn(queries, dup, 3, nCells = 4, nprobe = 2, iters = 2)
    }
    assert(ex.getMessage.contains("not unique"), ex.getMessage)
    // duplicate QUERY ids are equally corrupt (row_number over vec_id
    // mixes two different vectors' probe sets) — also rejected
    val ex2 = intercept[IllegalArgumentException] {
      Ivf.ivfKnn(queries.union(queries.limit(1)), emb, 3,
        nCells = 4, nprobe = 2, iters = 2)
    }
    assert(ex2.getMessage.contains("queries"), ex2.getMessage)
    // the opt-out is honored (upstream-enforced contract): same inputs,
    // checkIds=false, completes
    assert(Ivf.ivfKnn(queries, emb, 3, nCells = 4, nprobe = 2, iters = 2,
      checkIds = false).count() > 0)
  }

  test("beyond the literal contract, assignment switches to the broadcast join") {
    // k * dim = 4000 * 40 far beyond the 131072 inlining contract: the
    // fit must COMPLETE through the broadcast-join argmin (round 11
    // turned the hard require into a working fallback), with k distinct
    // cells surviving a 1-vector-per-centroid degenerate fit
    val emb = corpus(4000, 40)
    val cents = Ivf.fitCentroids(emb, 4000, iters = 1, trainCap = 1000000L)
    assert(cents.count() == 4000L)
  }
}

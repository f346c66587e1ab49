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

  /** [[bruteForceKnn]] routed through the custom GroupTopK physical
    * operator instead of a window: the same broadcast + dot-product
    * scoring, but the per-query top-k comes from
    * [[RelationalOps.topKPerGroupExec]] — partial BOUNDED heaps per map
    * partition, a k-bounded exchange, no sort of the |queries| x |corpus|
    * score space anywhere in the plan. The window form materializes and
    * sorts every query's full score column before discarding all but k;
    * at corpus scale the k-bounding BEFORE the exchange is the difference
    * (the q57/WindowTopKRewrite rationale applied to the ANN path). Rank
    * is re-derived by a window over exactly k rows per group —
    * bit-identical to the window form by the GroupTopK ordering
    * contract (x11 shares x01's oracle verbatim). */
  def bruteForceKnnExec(queries: DataFrame, corpus: DataFrame, k: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        roundTo: Int = 4): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("vec_id"), col(vecCol).as("__qv"),
      VectorFns.norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("__cv"),
      VectorFns.norm(col(vecCol)).as("__cn"))
    val scored = q.join(c, col("vec_id") =!= col("nn_id"))
      .withColumn("sim", round(
        VectorFns.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
      .select("vec_id", "nn_id", "sim")
    val top = RelationalOps.topKPerGroupExec(scored, Seq(col("vec_id")),
      Seq(col("sim").desc, col("nn_id").asc), k)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
    top.withColumn("rank", row_number().over(w))
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

  /** PORTABLE hyperplane-LSH search (x17; [[lshKnn]]/x02's oracled twin,
    * completing the ANN twin family x13-x16). Same bucket-join shape,
    * exact integer arithmetic throughout (the x12 regime):
    *  - coordinates are [[KmeansPortable.quantize]]d ints centered at 128;
    *  - hyperplane coefficient (t, p, d) = first md5 byte of the literal
    *    key "t:p:d", minus 128 — an engine-independent pseudo-random draw
    *    DuckDB re-derives with `md5` + hex-char `strpos` parsing;
    *  - bucket(v, t) = sum over planes p of 2^p * [dot(coef_tp, v-128) > 0]
    *    (a zero dot is the 0 bit on both engines);
    *  - candidates are the DISTINCT same-(table, bucket) pairs, reranked
    *    by exact integer L2² with (dist2, nn_id) ties.
    * Scale shape: the corpus side is a zero-shuffle map (literal
    * coefficients — no hyperplane table join), queries broadcast into the
    * bucket equi join; only the bounded candidate set reaches the dedup
    * and top-k exchanges. A query whose buckets hold fewer than topK
    * neighbors returns fewer rows — the method's semantics, re-derived
    * identically by the oracle.
    * @return (idCol, nn_id, dist2, rnk), rnk in 1..topK per query */
  def lshPortable(queries: DataFrame, corpus: DataFrame, topK: Int,
                  tables: Int = 4, nPlanes: Int = 6,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(tables >= 1 && nPlanes >= 1 && nPlanes <= 62,
      s"lshPortable: tables=$tables nPlanes=$nPlanes")
    val dim = KmeansPortable.vectorDim(corpus, vecCol, "lshPortable corpus")
    // a shorter/longer query vector would null-pad zip_with, making dist2
    // NULL — and NULLS FIRST in the ascending top-k window would rank the
    // malformed pair at rnk=1; reject the mismatch up front instead
    // min/max SKIP nulls, so a NULL query embedding would sail past a
    // min/max-only check and still produce the NULL-dist2 rnk=1 bug the
    // guard exists to stop (round-14 ADVICE) — count NULLs in the same
    // single-pass aggregate and reject them first
    locally {
      val d = queries.select(
        count(when(col(vecCol).isNull, 1)).as("__nulls"),
        min(size(col(vecCol))), max(size(col(vecCol)))).head
      require(d.getLong(0) == 0L,
        s"lshPortable: ${d.getLong(0)} query rows have a NULL $vecCol - " +
          "a NULL embedding yields NULL dist2 and would outrank every " +
          "real neighbor under the ascending top-k window")
      require(d.isNullAt(1) || (d.getInt(1) == dim && d.getInt(2) == dim),
        s"lshPortable: query $vecCol dimension " +
          s"${d.getInt(1)}..${d.getInt(2)} != corpus dimension $dim")
    }
    val coefs = Array.tabulate(tables, nPlanes, dim) { (t, p, d) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$t:$p:$d".getBytes("UTF-8"))
      ((h(0) & 0xff) - 128).toLong
    }
    def withBuckets(df: DataFrame): DataFrame = {
      val tb = (0 until tables).map { t =>
        val bucket = (0 until nPlanes).map { p =>
          val dot = aggregate(
            zip_with(col("__q"), array(coefs(t)(p).map(lit(_)): _*),
              (a, b) => (a - 128L) * b),
            lit(0L), (acc, x) => acc + x)
          when(dot > 0, lit(1L << p)).otherwise(lit(0L))
        }.reduce(_ + _)
        struct(lit(t).as("tbl"), bucket.as("bucket"))
      }
      df.withColumn("__tb", explode(array(tb: _*)))
        .select(col("__id"), col("__q"),
          col("__tb.tbl").as("tbl"), col("__tb.bucket").as("bucket"))
    }
    val c = withBuckets(KmeansPortable.quantize(corpus, idCol, vecCol))
      .select(col("__id").as("nn_id"), col("__q").as("__cv"),
        col("tbl"), col("bucket"))
    val q = withBuckets(KmeansPortable.quantize(queries, idCol, vecCol))
      .select(col("__id").as("__qid"), col("__q"), col("tbl"), col("bucket"))
    val cand = broadcast(q).join(c, Seq("tbl", "bucket"))
      .filter(col("__qid") =!= col("nn_id"))
      .dropDuplicates("__qid", "nn_id")
    val scored = cand.withColumn("dist2",
      KmeansPortable.l2(col("__q"), col("__cv")))
    KmeansPortable.topKByDist(scored, topK, idCol, "dist2")
  }

  /** Max-Marginal-Relevance re-ranking (Carbonell & Goldstein 1998): after
    * retrieval, greedily select `k` of each query's candidates maximizing
    * lambda * rel(c) - (1 - lambda) * max sim(c, already-selected) — the
    * standard diversity re-rank between ANN search and context assembly.
    *
    * EXACT-INTEGER regime (the d14 trick): cosines are floor-scaled to
    * BIGINT once, lambda is scaled to lamS/10000, and every greedy score is
    * integer arithmetic with ties on candidate id — so the selection is
    * bit-reproducible across engines and partitionings, which float MMR
    * cannot be.
    *
    * Scale shape: the greedy rounds are all keyed on qid (+cid) — round r
    * joins the remaining candidates to the <= r selected rows per query,
    * never across queries; k greedy rounds are k composed joins in ONE
    * lazy plan. The INITIAL relevance matrix has two modes:
    *  - `candidatePairs = Some(pairs)` — the 100 TB path: `pairs` is the
    *    ANN stage's (qid, cid) output, and rel is built by two equi joins
    *    (pairs -> query vectors on qid, -> candidate vectors on cid), so
    *    each query scores ONLY its own retrieved candidates.
    *  - `candidatePairs = None` — every query scores the full shared
    *    candidate pool (query x pool product); only for a bounded pool
    *    shared by construction (e.g. one retrieval slate re-ranked for a
    *    handful of personas).
    *
    * @param candidatePairs optional (qid, cid) pairs restricting which
    *        candidates each query considers; column names must be
    *        `qid`/`cid`
    * @return (qid, cid, rnk, rel) — rel is the scaled-BIGINT cosine
    */
  def mmrRerank(queries: DataFrame, candidates: DataFrame, k: Int,
                lambda: Double = 0.5, idCol: String = "vec_id",
                vecCol: String = "embedding",
                candidatePairs: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && lambda >= 0 && lambda <= 1,
      s"mmrRerank: need k >= 1, lambda in [0,1]; got $k, $lambda")
    val lamS = math.round(lambda * 10000)
    def simS(a: Column, b: Column): Column =
      floor(VectorFns.cosine(a, b) * 10000 + 0.5).cast("long")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("__cv"))
    val paired = candidatePairs match {
      // SHUFFLE_HASH on the vector sides (round-15, the d27 verify
      // finding): the pair stream is the unbounded side and must never
      // be SORTED carrying an embedding array; the vector tables build
      case Some(p) => p.select(col("qid"), col("cid"))
        .join(q.hint("SHUFFLE_HASH"), Seq("qid"))
        .join(c.hint("SHUFFLE_HASH"), Seq("cid"))
      case None => q.join(c)
    }
    val rel = paired
      .withColumn("rel", simS(col("__qv"), col("__cv")))
      .select("qid", "cid", "__cv", "rel")
    def pick(scored: DataFrame, r: Int): DataFrame = {
      val w = Window.partitionBy("qid").orderBy(col("__score").desc, col("cid"))
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("qid"), col("cid"), col("__cv"), col("rel"),
          lit(r).as("rnk"))
    }
    var selected = pick(rel.withColumn("__score", col("rel")), 1)
    for (r <- 2 to k) {
      val remaining = rel.join(selected.select("qid", "cid"),
        Seq("qid", "cid"), "left_anti")
      val maxsim = remaining.as("c")
        .join(selected.as("s"), col("c.qid") === col("s.qid"))
        .withColumn("__s", simS(col("c.__cv"), col("s.__cv")))
        .groupBy(col("c.qid").as("qid"), col("c.cid").as("cid"))
        .agg(max(col("__s")).as("__ms"))
      val scored = remaining.join(maxsim, Seq("qid", "cid"))
        .withColumn("__score",
          lit(lamS) * col("rel") - lit(10000 - lamS) * col("__ms"))
      selected = selected.unionByName(pick(scored, r))
    }
    selected.select("qid", "cid", "rnk", "rel")
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
    semDedupDropRule(v, threshold, roundTo, idCol)
  }

  /** [[semanticDedup]] with the paper's actual clustering step: cells are
    * k-means assignments (Ivf.fitCentroids — deterministic init, L2
    * argmin), so cell sizes track data density instead of sign-bit
    * geometry. Same upper-triangular drop rule, same output shape. The
    * k-means cells have no portable SQL twin (x09 is rows-only by
    * design); SemanticDedupSpec pins the drop semantics on planted exact
    * duplicates instead, and d15 oracles the rule itself bit-for-bit
    * through the sign-grid cells. */
  def semanticDedupKmeans(df: DataFrame, nCells: Int = 8, iters: Int = 3,
                          threshold: Double = 0.9, idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          roundTo: Int = 4): DataFrame = {
    // shared-fit reuse as in Ivf.ivfKnn / Pq.ivfAdcKnn: sample==corpus →
    // assign on the already-pinned cast copy, no second scan
    val (cents, pinned) = Ivf.fitCentroidsShared(df, nCells, iters, idCol, vecCol)
    val v = Ivf.assign(pinned.getOrElse(df.select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))), cents)
      .select(col("__id").as("id"), col("__v").as("v"), col("cell"))
    semDedupDropRule(v, threshold, roundTo, idCol)
  }

  /** Shared SemDeDup drop rule: within a cell, a vector is dropped when
    * any lower-id cell-mate has rounded cosine >= threshold (one equi
    * self-join on cell + a left join marking drops). */
  private def semDedupDropRule(v: DataFrame, threshold: Double, roundTo: Int,
                               idCol: String): DataFrame = {
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

  /** Deterministic negative sampling for contrastive training: per
    * anchor, `k` corpus items drawn in md5 rank order from a hash-gated
    * POOL, excluding the anchor itself and its known positives — the
    * "hard uniform negatives" mining step of embedding training, made
    * reproducible (the RNG-free property every sampler here has: the
    * same anchor draws the same negatives on any engine, rerun or
    * partitioning, so training is auditable).
    *
    * Scale shape: anchor x CORPUS would be a product — instead the pool
    * is a scan-side hash gate of the corpus (`poolPermille`, salted
    * independently of other samplers) that is BROADCAST against the
    * anchors, positives are removed by an equi anti-pattern on the pair
    * key, and the per-anchor rank windows over pool-size rows (bounded,
    * and anchors spread across tasks). The per-pair hash md5(a|b) makes
    * each anchor's draw independent — anchors do not share negatives
    * beyond chance.
    *
    * @param exclude (vec_id, nn_id) pairs to never emit (the positives)
    * @return (vec_id, neg_id, rnk) with rnk in 1..k
    */
  def negativeSample(anchors: DataFrame, corpus: DataFrame,
                     exclude: DataFrame, k: Int, poolPermille: Int = 100,
                     idCol: String = "vec_id"): DataFrame = {
    require(k >= 1, "negativeSample: k must be >= 1")
    require(poolPermille >= 1 && poolPermille <= 1000,
      "negativeSample: poolPermille must be in [1, 1000]")
    val a = anchors.select(col(idCol).as("vec_id")).distinct()
    val pool = corpus.select(col(idCol).as("__neg"))
      .filter(pmod(Sampling.keyHash(concat(col("__neg").cast("string"),
        lit("#negpool"))), lit(1000L)) < poolPermille)
    val cand = a.join(broadcast(pool), col("__neg") =!= col("vec_id"))
      .join(exclude.select(col("vec_id"), col("nn_id").as("__neg"))
        .withColumn("__ex", lit(true)), Seq("vec_id", "__neg"), "left")
      .filter(col("__ex").isNull)
      .withColumn("__h", Sampling.keyHash(concat(col("vec_id").cast("string"),
        lit("|"), col("__neg").cast("string"))))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("__h"), col("__neg"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("__neg").as("neg_id"), col("rnk"))
  }
}

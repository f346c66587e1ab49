package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.plans.Pins.PinSyntax

/** Product quantization (PQ) approximate nearest neighbor — the
  * memory-compression scale path beside hyperplane LSH (no training,
  * hash-bucketed) and IVF (coarse clustering, cell-pruned):
  *
  * Each D-dim vector splits into `m` subvectors; each subspace trains its
  * own tiny k-means codebook (k codes); a vector is stored as m one-byte
  * codes. At 100 TB that is the difference between scanning 256 B of
  * floats and 8 B of codes per vector — PQ compresses the SCAN, where
  * IVF/LSH prune the candidate set (IVFADC composes both: this encoder
  * over IVF cells).
  *
  * Search is asymmetric distance computation (ADC): the query precomputes
  * a (subspace, code) -> partial-distance table against the codebooks
  * (m x k entries, broadcast-sized), and a candidate's distance is the
  * sum of m table lookups over its codes — an equi join on
  * (subspace, code) plus one hash aggregation, no floating-point work per
  * candidate beyond the add.
  *
  * All training/encode/search steps are joins + aggregations (the Lloyd
  * update trains ALL m codebooks in one pass over the exploded
  * subvectors — not m sequential k-means). Deterministic throughout:
  * codebooks init from the first k rows by id, ties in assignment break
  * on code id.
  */
object Pq {

  /** (id, sub, subvec) exploded view: m subvectors of dsub dims each. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, dsub: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .select(col("__id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("__v"))
      .select(col("__id"), col("sub"),
        slice(col("__v"), col("sub") * dsub + 1, lit(dsub)).as("subvec"))

  /** Nearest-code assignment against broadcast codebooks. */
  private def assign(subs: DataFrame, codebooks: DataFrame): DataFrame = {
    val joined = subs.join(broadcast(codebooks), Seq("sub"))
      .withColumn("__d", VectorFns.l2sq(col("subvec"), col("centroid")))
    val w = Window.partitionBy(col("__id"), col("sub"))
      .orderBy(col("__d"), col("code"))
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("sub"), col("subvec"), col("code"))
  }

  /** Train all m codebooks jointly: deterministic init (first k rows by
    * id), then `iters` Lloyd rounds over the exploded subvectors.
    * Returns (sub, code, centroid). */
  def fitCodebooks(corpus: DataFrame, m: Int, codes: Int, iters: Int = 5,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val dim = KmeansPortable.vectorDim(corpus, vecCol, "fitCodebooks corpus")
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    // deterministic seeds: first k ids; the pmod partition key names the
    // intentionally-single partition over k rows (see Ivf.fitCentroids)
    val seedIds = corpus.select(col(idCol).as("__sid")).orderBy("__sid")
      .limit(codes)
      .withColumn("code",
        (row_number().over(Window.partitionBy(pmod(col("__sid"), lit(1)))
          .orderBy("__sid")) - 1))
    var books = subvectors(corpus, idCol, vecCol, m, dsub)
      .join(seedIds, col("__id") === col("__sid"))
      .select(col("sub"), col("code"), col("subvec").as("centroid"))
      .pinned
    val allSubs = subvectors(corpus, idCol, vecCol, m, dsub)
    for (_ <- 1 to iters) {
      // one Lloyd round for every (sub, code) cell at once; empty cells
      // keep their previous centroid (left join + coalesce)
      val means = assign(allSubs, books)
        .select(col("sub"), col("code"), posexplode(col("subvec")))
        .groupBy("sub", "code", "pos").agg(avg("col").as("mv"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("sub"), col("code"),
          transform(col("pm"), x => x.getField("mv")).as("newc"))
      books = books.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("newc"), col("centroid")).as("centroid"))
        .pinned
    }
    books
  }

  /** PQ-encode the corpus: (id, sub, code) — m bytes per vector at scale. */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int, dsub: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(subvectors(corpus, idCol, vecCol, m, dsub), codebooks)
      .select(col("__id"), col("sub"), col("code"))

  /** ADC top-k: approximate L2^2 = sum over subspaces of the query's
    * precomputed (sub, code) partial against each candidate's codes.
    * Returns (vec_id, nn_id, approx_d2, rank). */
  def pqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
            m: Int = 8, codes: Int = 16, iters: Int = 5,
            idCol: String = "vec_id", vecCol: String = "embedding",
            roundTo: Int = 4): DataFrame = {
    val dim = KmeansPortable.vectorDim(corpus, vecCol, "pqKnn corpus")
    val dsub = dim / m
    val books = fitCodebooks(corpus, m, codes, iters, idCol, vecCol)
    val corpusCodes = encode(corpus, books, m, dsub, idCol, vecCol)
      .select(col("__id").as("nn_id"), col("sub"), col("code"))
    // ADC table: one partial distance per (query, sub, code) — m*k rows
    // per query, the broadcast-sized lookup table of the method
    val adc = subvectors(queries, idCol, vecCol, m, dsub)
      .join(broadcast(books), Seq("sub"))
      .select(col("__id").as("vec_id"), col("sub"), col("code"),
        VectorFns.l2sq(col("subvec"), col("centroid")).as("partial"))
    val scored = adc.join(corpusCodes, Seq("sub", "code"))
      .filter(col("vec_id") =!= col("nn_id"))
      .groupBy("vec_id", "nn_id")
      .agg(round(sum(col("partial")), roundTo).as("approx_d2"),
        count(lit(1)).as("__m"))
    // every candidate must contribute all m subspaces (sanity of the join)
    val complete = scored.filter(col("__m") === m).drop("__m")
    // row_number <= k: rides the WindowTopKRewrite -> GroupTopK fast path
    val w = Window.partitionBy(col("vec_id")).orderBy(col("approx_d2"), col("nn_id"))
    complete.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "nn_id", "approx_d2", "rank")
  }

  /** IVFADC: the composed scale path — IVF cells PRUNE the candidate set
    * (only `nprobe`/`nCells` of the corpus is considered per query) and
    * PQ/ADC COMPRESSES the scoring of what remains (m table lookups per
    * candidate instead of a full-dimension distance). This is the shape
    * a billion-vector index actually runs: neither stage alone bounds
    * both the candidate count and the bytes-per-candidate.
    * Returns (vec_id, nn_id, approx_d2, rank). */
  def ivfAdcKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                nCells: Int = 16, nprobe: Int = 4,
                m: Int = 16, codes: Int = 32, iters: Int = 3,
                idCol: String = "vec_id", vecCol: String = "embedding",
                roundTo: Int = 4): DataFrame = {
    val dim = KmeansPortable.vectorDim(corpus, vecCol, "ivfPq corpus")
    val dsub = dim / m
    // coarse stage: IVF cells (broadcast centroids); when the training
    // sample WAS the corpus (at/under trainCap) reuse the pinned cast
    // copy for assignment instead of a second scan+cast — the same
    // round-14 x03 shared-fit applied to ivfKnn (round-14 ADVICE asked
    // for consistency); above the cap the 100 TB path streams as before
    val (cents, pinned) = Ivf.fitCentroidsShared(corpus, nCells, iters, idCol, vecCol)
    val vecs = pinned.getOrElse(corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v")))
    val corpusCells = Ivf.assign(vecs, cents)
      .select(col("__id").as("nn_id"), col("cell"))
    // fine stage: PQ codes per corpus vector
    val books = fitCodebooks(corpus, m, codes, iters, idCol, vecCol)
    val corpusCodes = encode(corpus, books, m, dsub, idCol, vecCol)
      .select(col("__id").as("nn_id"), col("sub"), col("code"))
      .join(corpusCells, Seq("nn_id"))
    // query probes: nprobe nearest cells
    val qv = queries.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val probes = qv.crossJoin(broadcast(cents))
      .withColumn("__d", VectorFns.l2sq(col("__v"), col("centroid")))
    val wp = Window.partitionBy(col("vec_id")).orderBy(col("__d"), col("cell"))
    val qCells = probes.withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nprobe)
      .select(col("vec_id"), col("cell"))
    // ADC table per query, restricted to candidates in probed cells
    val adc = subvectors(queries, idCol, vecCol, m, dsub)
      .join(broadcast(books), Seq("sub"))
      .select(col("__id").as("vec_id"), col("sub"), col("code"),
        VectorFns.l2sq(col("subvec"), col("centroid")).as("partial"))
    val scored = qCells.join(corpusCodes, Seq("cell"))
      .filter(col("vec_id") =!= col("nn_id"))
      .join(adc, Seq("vec_id", "sub", "code"))
      .groupBy("vec_id", "nn_id")
      .agg(round(sum(col("partial")), roundTo).as("approx_d2"),
        count(lit(1)).as("__m"))
      .filter(col("__m") === m).drop("__m")
    val w = Window.partitionBy(col("vec_id")).orderBy(col("approx_d2"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "nn_id", "approx_d2", "rank")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pins.PinSyntax

/** PORTABLE deterministic k-means — the oracled twin of the engine-native
  * k-means cells path ([[Ivf.fitCentroids]] / x09's SemDeDup clustering),
  * built with the d12/d08 technique: every arithmetic step is either an
  * exact integer operation or an IEEE double expression both engines
  * evaluate identically, so the CELLS THEMSELVES re-derive bit-for-bit in
  * DuckDB (x12's oracle unrolls the rounds as CTEs).
  *
  * Portability ingredients:
  *  - coordinates quantized to ints in [0, 255] (`floor(x*256 + 0.5) +
  *    128`, clamped): the one double expression, identical token-for-token
  *    on both sides, floor'd before any arithmetic that could diverge;
  *  - init = the k corpus vectors with the smallest `(md5(id), id)` — an
  *    engine-independent pseudo-random draw (no RNG state, no xxhash64);
  *  - Lloyd rounds fixed (no convergence test); distances are exact
  *    integer sums; argmin tie-breaks on the FIRST (lowest) cell index;
  *  - centroid update is the elementwise FLOOR-average (`sum DIV count`
  *    on nonnegative ints — truncation == floor on both engines), so
  *    centroids stay integer and round r+1 starts from identical state;
  *  - an emptied cell keeps its previous centroid (the oracle's
  *    `COALESCE` over a left join), so cell ids are stable 0..k-1.
  *
  * Scale posture (mirrors Ivf): each round is ONE map-side-combinable
  * aggregation over the corpus — assignment is a zero-shuffle map against
  * k x dim literal centroids, only k x dim longs ever reach the driver.
  * This twin certifies the clustering semantics; [[Ivf]] (capped-sample
  * training, double arithmetic) remains the production ANN path.
  */
object KmeansPortable {

  /** Quantized copy of the embedding column: int coordinates in [0, 255].
    * `(x * 256.0) + 0.5` is evaluated in double EXACTLY as DuckDB does
    * (float widens exactly; *256 is a power-of-two scale) — both engines
    * round identically, and floor lands the same integer. */
  def quantize(corpus: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x =>
        greatest(lit(0L), least(lit(255L),
          floor(x.cast("double") * 256.0 + 0.5) + 128L))).as("__q"))

  /** Vector dimension of `vecCol`, with a clear failure on an empty frame
    * (a bare `.head` otherwise surfaces as a NoSuchElementException with
    * no hint of which input was empty). */
  private[operators] def vectorDim(df: DataFrame, vecCol: String,
                                   what: String): Int =
    df.select(size(col(vecCol))).head(1).headOption
      .map { r =>
        // size(NULL) is NULL in Spark 3+: a NULL vector in the first row
        // would otherwise surface as a bare NullPointerException from
        // getInt, defeating this helper's clear-failure purpose
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          s"$what has a NULL $vecCol in its first row - cannot infer " +
            "the vector dimension")
        r.getInt(0)
      }
      .getOrElse(throw new IllegalArgumentException(
        s"$what is empty - cannot infer the $vecCol dimension"))

  /** Exact integer L2² between two long-array columns — THE distance the
    * portable-twin oracles certify (x12–x17). Every twin scores through
    * this single definition so the certified semantics cannot drift
    * apart between copies. */
  private[operators] def l2(a: Column, b: Column): Column =
    // native compiled loop (ArrayExprs.VectorL2SqLong) — same exact-integer
    // left-to-right (x-y)^2 sum as the zip_with + aggregate fold it
    // replaces, minus the interpreted per-element lambda cost
    graft.functions.ArrayExprs.vector_l2sq_long(a, b)

  /** Shared top-k epilogue of the twin searches: rnk = row_number over
    * (distance, nn_id) per query — the oracle's tie-break — k-bounded
    * (rides Spark's WindowGroupLimit partial bound before the exchange).
    * Expects columns `__qid`, `nn_id` and `distName`. */
  private[operators] def topKByDist(scored: DataFrame, topK: Int,
                                    idCol: String,
                                    distName: String): DataFrame = {
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col(distName), col("nn_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("__qid").as(idCol), col("nn_id"), col(distName),
        col("rnk"))
  }

  /** The portable seed draw shared by the twin trainers: the k quantized
    * corpus vectors with the smallest `(md5(id), id)` — engine-independent
    * pseudo-randomness, identical for coarse cells and PQ codebooks so a
    * composed index (x15) collects it once. */
  private[operators] def seedRows(q: DataFrame, k: Int): Array[Array[Long]] = {
    val s = q.orderBy(md5(col("__id").cast("string")), col("__id"))
      .limit(k).select(col("__q")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(s.length == k,
      s"seed draw: corpus has fewer than k=$k rows (${s.length})")
    s
  }

  private[operators] def distTo(centroid: Array[Long]): Column =
    // typedLit: the centroid array rides codegen as one reference object,
    // keeping the generated source identical across Lloyd rounds so the
    // codegen cache hits (see Ivf.assign — same fix, same measurement)
    l2(col("__q"), typedlit(centroid.toSeq))

  /** Zero-shuffle nearest-cell assignment against literal centroids;
    * `array_position` of the min picks the FIRST minimum — tie goes to
    * the lowest cell index, the oracle's `ORDER BY d, j` row_number. */
  private[operators] def withCell(q: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val dists = array(cents.map(distTo): _*)
    q.withColumn("__dists", dists)
      .withColumn("cell",
        (array_position(col("__dists"), array_min(col("__dists"))) - 1)
          .cast("int"))
  }

  /** Fixed-round Lloyd iteration; returns the k integer centroids in cell
    * order. One distributed aggregation per round; k x dim driver state
    * (the Ivf literal-centroid contract). */
  def fit(corpus: DataFrame, k: Int, rounds: Int,
          idCol: String = "vec_id",
          vecCol: String = "embedding"): Array[Array[Long]] = {
    // validate BEFORE the eager checkpoint/seed-scan jobs: a bad k or
    // rounds must fail instantly with IllegalArgumentException, not
    // after materializing the corpus (or as limit()'s AnalysisException)
    require(k > 0 && rounds >= 0, s"fit: k=$k rounds=$rounds")
    val q = quantize(corpus, idCol, vecCol).pinned
    fitQ(q, k, rounds, seedRows(q, k))
  }

  /** [[fit]] over a pre-quantized, pinned corpus with pre-collected
    * seeds — lets a composed index (x15's ivfAdcSearch) share ONE
    * quantize pass and ONE seed scan between the coarse quantizer and
    * the PQ codebooks instead of re-running both per trainer. Callers
    * validate k/rounds up front; `seeds` must carry at least k rows
    * (seedRows enforces the corpus-size half of that contract). */
  private[operators] def fitQ(q: DataFrame, k: Int, rounds: Int,
                              seeds: Array[Array[Long]]): Array[Array[Long]] = {
    require(k > 0 && rounds >= 0, s"fit: k=$k rounds=$rounds")
    require(seeds.length >= k,
      s"fitQ: caller passed ${seeds.length} seeds for k=$k")
    // init: k smallest (md5(id), id) — portable, order-independent
    var cents: Array[Array[Long]] = seeds.take(k).map(_.clone())
    val dim = cents.head.length
    for (_ <- 1 to rounds) {
      val sums = Seq.tabulate(dim)(i =>
        sum(element_at(col("__q"), i + 1)).as(s"__s$i"))
      val rows = withCell(q, cents)
        .groupBy("cell").agg(count(lit(1)).as("__n"), sums: _*)
        .collect()
      val next = cents.map(_.clone()) // emptied cell keeps its centroid
      rows.foreach { r =>
        val j = r.getInt(0)
        val n = r.getLong(1)
        next(j) = Array.tabulate(dim)(i => r.getLong(i + 2) / n)
      }
      cents = next
    }
    cents
  }

  /** Portable IVF search — the oracled twin of [[Ivf.ivfKnn]] (x03's last
    * uncertified stage): [[fit]] is the coarse quantizer, each query
    * probes its `nprobe` nearest cells (exact integer centroid distance,
    * ties to the lowest cell index), and candidates in those cells are
    * reranked by exact integer L2² with a (dist2, nn_id) tie-break — so
    * cells, probe ranking AND in-cell distances all re-derive in DuckDB.
    *
    * Scale posture mirrors the production path, and improves on it where
    * portability allows: the probed (query, cell) pairs are BROADCAST, so
    * the candidate join is a zero-shuffle map over the corpus (the corpus
    * never exchanges; only the bounded candidate set — |queries| x
    * nprobe/k of the corpus — reaches the top-k exchange).
    *
    * @return (idCol, nn_id, dist2, rnk), rnk in 1..topK per query
    */
  def ivfSearch(queries: DataFrame, corpus: DataFrame, topK: Int,
                k: Int = 4, rounds: Int = 3, nprobe: Int = 2,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && nprobe <= k, s"ivfSearch: nprobe=$nprobe k=$k")
    val cents = fit(corpus, k, rounds, idCol, vecCol)
    val corpusCells = withCell(quantize(corpus, idCol, vecCol), cents)
      .select(col("__id").as("nn_id"), col("__q").as("__cv"), col("cell"))
    // probe ranking: array_sort over (dist, cell) structs is exactly the
    // oracle's row_number() ORDER BY d, j — first-nprobe prefix after sort
    val probeStructs = array(cents.zipWithIndex.map { case (c, j) =>
      struct(distTo(c).as("d"), lit(j).as("j")) }: _*)
    val qProbes = quantize(queries, idCol, vecCol)
      .withColumn("__probe",
        explode(transform(slice(array_sort(probeStructs), 1, nprobe),
          p => p.getField("j"))))
      .select(col("__id").as("__qid"), col("__q"), col("__probe").as("cell"))
    val cand = broadcast(qProbes).join(corpusCells, Seq("cell"))
      .filter(col("__qid") =!= col("nn_id"))
    val scored = cand.withColumn("dist2", l2(col("__q"), col("__cv")))
    topKByDist(scored, topK, idCol, "dist2")
  }

  /** Cells + SemDeDup-style drop rule at quantization resolution: each
    * vector gets its final cell and exact integer distance; within a
    * (cell, quantized-vector) group only the smallest id is `kept` —
    * exact-duplicate collapse in the quantized space, the portable twin
    * of x09's threshold rule. Output: (vec_id, cell, dist2, kept). */
  def cells(corpus: DataFrame, k: Int, rounds: Int,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val cents = fit(corpus, k, rounds, idCol, vecCol)
    val q = quantize(corpus, idCol, vecCol)
    withCell(q, cents)
      .withColumn("__qkey", array_join(col("__q").cast("array<string>"), ","))
      .withColumn("dist2", element_at(col("__dists"), col("cell") + 1))
      .withColumn("kept", col("__id") === min(col("__id"))
        .over(Window.partitionBy(col("cell"), col("__qkey"))))
      .select(col("__id").as(idCol), col("cell"), col("dist2"), col("kept"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import KmeansPortable.{l2, topKByDist}
import graft.plans.Pins.PinSyntax

/** PORTABLE deterministic product quantization — the oracled twins of the
  * compression ANN family ([[Pq.pqKnn]] / x04 and [[Pq.ivfAdcKnn]] / x05,
  * both engine-seeded `no_oracle` designs), built with the x12/x13
  * technique ([[KmeansPortable]]): integer-quantized coordinates, md5-id
  * init, floor-average centroid updates, exact integer distances, and
  * first-minimum tie-breaks, so EVERY stage — per-subspace codebooks,
  * corpus codes, the query's ADC partial-distance table, and the summed
  * approximate distances — re-derives bit-for-bit in DuckDB (the x14/x15
  * oracles unroll the Lloyd rounds as CTEs with the subspace threaded
  * through every key).
  *
  * Scale posture mirrors and sharpens the production path:
  *  - training is ONE map-side-combinable aggregation per Lloyd round
  *    over the exploded subvectors (all m codebooks in the same pass, the
  *    Pq.fitCodebooks contract); only m x codes x dsub longs reach the
  *    driver — the literal-codebook analog of Ivf's centroid contract;
  *  - corpus encoding is a ZERO-SHUFFLE map against literal codebooks
  *    (no codebook join — compare Pq.assign's broadcast join + window);
  *  - search broadcasts the per-query ADC tables (m x codes longs per
  *    query), so candidate scoring is a zero-shuffle map over the encoded
  *    corpus; only k-bounded rows reach the top-k exchange;
  *  - the composed index ([[ivfAdcSearch]]) quantizes and pins the
  *    corpus ONCE and collects ONE seed scan shared by the coarse
  *    quantizer and the codebooks (the md5 draw is the same for both).
  */
object PqPortable {

  /** books[sub][code][pos] as one literal 3-D array column — typedLit,
    * so the codebooks enter codegen as a single reference object and the
    * generated source stays identical across Lloyd rounds (the Ivf.assign
    * codegen-cache fix; inlining m x codes x dsub longs recompiled the
    * whole stage per round). */
  private def booksLit(books: Array[Array[Array[Long]]]): Column =
    typedlit(books.map(sb => sb.map(_.toSeq).toSeq).toSeq)

  /** All m codes of one quantized vector, zero-shuffle against literal
    * codebooks; `array_position` of the min picks the FIRST minimum —
    * tie to the lowest code, the oracle's `ORDER BY d, c`. */
  private def codesOf(qvec: Column, books: Array[Array[Array[Long]]],
                      dsub: Int): Column =
    transform(sequence(lit(0), lit(books.length - 1)), s => {
      val dists = transform(element_at(booksLit(books), s + 1),
        cb => l2(slice(qvec, s * dsub + 1, lit(dsub)), cb))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })

  /** The query's ADC table: ptab[sub][code] = exact integer L2² between
    * the query's sub-th subvector and codebook centroid (sub, code). */
  private def adcTable(qvec: Column, books: Array[Array[Array[Long]]],
                       dsub: Int): Column =
    transform(sequence(lit(0), lit(books.length - 1)), s =>
      transform(element_at(booksLit(books), s + 1),
        cb => l2(slice(qvec, s * dsub + 1, lit(dsub)), cb)))

  /** ADC score of an encoded candidate: m table lookups, summed exactly. */
  private def adcScore: Column =
    aggregate(zip_with(col("__ptab"), col("__codes"),
      (tab, c) => element_at(tab, c + 1)), lit(0L), (acc, x) => acc + x)

  /** Train all m codebooks jointly with fixed portable Lloyd rounds.
    * Init: the `codes` corpus vectors with the smallest `(md5(id), id)`
    * (the x12 draw), sliced per subspace — so all m books share seed ids.
    * Each round is one distributed aggregation over the exploded
    * subvectors; empty (sub, code) cells keep their previous centroid.
    * Returns books[sub][code] = dsub integer coordinates. */
  def fitBooks(corpus: DataFrame, m: Int, codes: Int, rounds: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): Array[Array[Array[Long]]] = {
    // validate BEFORE the seed-scan job (the fit() rationale)
    require(m > 0 && codes > 0 && rounds >= 0,
      s"fitBooks: m=$m codes=$codes rounds=$rounds")
    val q = KmeansPortable.quantize(corpus, idCol, vecCol)
    fitBooksQ(q, m, codes, rounds, KmeansPortable.seedRows(q, codes))
  }

  /** [[fitBooks]] over a pre-quantized corpus with pre-collected seeds
    * (the fitQ sharing contract — see ivfAdcSearch). */
  private[operators] def fitBooksQ(q: DataFrame, m: Int, codes: Int,
      rounds: Int,
      seeds: Array[Array[Long]]): Array[Array[Array[Long]]] = {
    require(m > 0 && codes > 0 && rounds >= 0,
      s"fitBooks: m=$m codes=$codes rounds=$rounds")
    require(seeds.length >= codes,
      s"fitBooksQ: caller passed ${seeds.length} seeds for codes=$codes")
    val dim = seeds.head.length
    require(dim % m == 0, s"fitBooks: dim $dim not divisible by m=$m")
    val dsub = dim / m
    var books = Array.tabulate(m, codes)((s, c) =>
      seeds(c).slice(s * dsub, (s + 1) * dsub))
    val subs = q
      .select(col("__id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("__q"))
      .select(col("__id"), col("sub"),
        slice(col("__q"), col("sub") * dsub + 1, lit(dsub)).as("__sv"))
      .pinned
    for (_ <- 1 to rounds) {
      // one map-side-combinable agg for every (sub, code) cell at once;
      // assignment against literal books — no join, no second exchange
      val myBook = element_at(booksLit(books), col("sub") + 1)
      val dists = transform(myBook, cb => l2(col("__sv"), cb))
      val sums = Seq.tabulate(dsub)(i =>
        sum(element_at(col("__sv"), i + 1)).as(s"__s$i"))
      val rows = subs
        .withColumn("code",
          (array_position(dists, array_min(dists)) - 1).cast("int"))
        .groupBy("sub", "code").agg(count(lit(1)).as("__n"), sums: _*)
        .collect()
      val next = books.map(_.map(_.clone()))
      rows.foreach { r =>
        val (s, c, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
        next(s)(c) = Array.tabulate(dsub)(i => r.getLong(i + 3) / n)
      }
      books = next
    }
    books
  }

  /** Portable PQ/ADC top-k (x04's oracled twin): full-scan asymmetric
    * distance — each candidate scores as m table lookups into the query's
    * broadcast ADC table, summed exactly in integers; ties break on
    * (approx_d2, nn_id). Full scan is the METHOD's shape (PQ compresses
    * the scan; IVF prunes it — see [[ivfAdcSearch]] for the composition).
    * @return (idCol, nn_id, approx_d2, rnk), rnk in 1..topK per query */
  def pqSearch(queries: DataFrame, corpus: DataFrame, topK: Int,
               m: Int = 4, codes: Int = 4, rounds: Int = 2,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(topK > 0 && m > 0 && codes > 0 && rounds >= 0,
      s"pqSearch: topK=$topK m=$m codes=$codes rounds=$rounds")
    val q = KmeansPortable.quantize(corpus, idCol, vecCol)
      .pinned
    val books = fitBooksQ(q, m, codes, rounds,
      KmeansPortable.seedRows(q, codes))
    val dsub = books.head.head.length
    val enc = q.select(col("__id").as("nn_id"),
      codesOf(col("__q"), books, dsub).as("__codes"))
    val qdf = KmeansPortable.quantize(queries, idCol, vecCol)
      .select(col("__id").as("__qid"),
        adcTable(col("__q"), books, dsub).as("__ptab"))
    val scored = broadcast(qdf)
      .join(enc, col("__qid") =!= col("nn_id"))
      .withColumn("approx_d2", adcScore)
    topKByDist(scored, topK, idCol, "approx_d2")
  }

  /** Portable IVFADC (x05's oracled twin): [[KmeansPortable.fit]] cells
    * PRUNE the candidate set (nprobe nearest cells per query, exact
    * integer centroid distance, ties to the lowest cell) and the PQ books
    * COMPRESS the scoring of what remains — the composed billion-vector
    * shape, with every stage DuckDB-certifiable. Books are trained on the
    * raw (non-residual) corpus, matching [[Pq.ivfAdcKnn]]'s semantics.
    * The corpus is quantized and pinned ONCE; coarse quantizer and
    * codebooks share one collected md5 seed scan.
    * @return (idCol, nn_id, approx_d2, rnk), rnk in 1..topK per query */
  def ivfAdcSearch(queries: DataFrame, corpus: DataFrame, topK: Int,
                   kCells: Int = 4, coarseRounds: Int = 2, nprobe: Int = 2,
                   m: Int = 4, codes: Int = 4, pqRounds: Int = 2,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && nprobe <= kCells,
      s"ivfAdcSearch: nprobe=$nprobe kCells=$kCells")
    require(topK > 0 && coarseRounds >= 0 && m > 0 && codes > 0
        && pqRounds >= 0,
      s"ivfAdcSearch: topK=$topK coarseRounds=$coarseRounds m=$m " +
        s"codes=$codes pqRounds=$pqRounds")
    val q = KmeansPortable.quantize(corpus, idCol, vecCol)
      .pinned
    val seeds = KmeansPortable.seedRows(q, math.max(kCells, codes))
    val cents = KmeansPortable.fitQ(q, kCells, coarseRounds, seeds)
    val books = fitBooksQ(q, m, codes, pqRounds, seeds)
    val dsub = books.head.head.length
    // corpus: final cell + m codes, both zero-shuffle literal assigns
    // over the single pinned quantized corpus
    val enc = KmeansPortable.withCell(q, cents)
      .select(col("__id").as("nn_id"), col("cell"),
        codesOf(col("__q"), books, dsub).as("__codes"))
    // query probes (x13's array_sort prefix = the oracle's ORDER BY d, j)
    // carry the ADC table through the explode — one row per (query, cell)
    val probeStructs = array(cents.zipWithIndex.map { case (c, j) =>
      struct(KmeansPortable.distTo(c).as("d"), lit(j).as("j")) }: _*)
    val qProbes = KmeansPortable.quantize(queries, idCol, vecCol)
      .withColumn("__ptab", adcTable(col("__q"), books, dsub))
      .withColumn("cell",
        explode(transform(slice(array_sort(probeStructs), 1, nprobe),
          p => p.getField("j"))))
      .select(col("__id").as("__qid"), col("__ptab"), col("cell"))
    val scored = broadcast(qProbes).join(enc, Seq("cell"))
      .filter(col("__qid") =!= col("nn_id"))
      .withColumn("approx_d2", adcScore)
    topKByDist(scored, topK, idCol, "approx_d2")
  }
}

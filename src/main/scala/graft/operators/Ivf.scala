package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.plans.Pins.PinSyntax

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
    * RNG). Returns (cell: Int, centroid: Array[Double]).
    *
    * Loop shape: the per-round state is k x dim doubles — driver-scale
    * by contract — so each round is exactly ONE distributed job: the
    * zero-shuffle [[assign]] map feeding a single per-dimension sum
    * aggregation (64 sum columns + a count beats posexplode + two
    * shuffles: the old shape moved |corpus| x dim rows per round). The
    * previous round's centroids enter the next plan as literals (via
    * assign's collect), so lineage NEVER stacks across rounds and no
    * checkpoint is needed inside the loop; the final table is pinned
    * once for its two consumers (corpus assignment + query probes).
    *
    * Training runs on a deterministic hash-gated sample of at most
    * ~`trainCap` vectors, pinned to executor storage for the rounds (the
    * standard ANN-index design: the coarse quantizer trains on a sample,
    * never the full corpus — at 100 TB the full set neither fits pinned
    * storage nor improves 16 centroids). The gate is md5-free modular
    * hashing on the id, so the sample — and therefore the fitted
    * centroids — is reproducible across runs and partitionings. Corpora
    * at or under the cap train on every vector (no behavior change). */
  def fitCentroids(corpus: DataFrame, k: Int, iters: Int = 5,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   trainCap: Long = 100000L): DataFrame =
    fitCentroidsShared(corpus, k, iters, idCol, vecCol, trainCap)._1

  /** [[fitCentroids]] plus the pinned cast corpus when the training
    * sample WAS the whole corpus (modulus == 1, i.e. at or under
    * trainCap): the caller's final cell assignment can then reuse the
    * already-pinned (__id, __v) copy instead of re-scanning and
    * re-casting the source — one fewer full pass in the small-corpus
    * regime (round-14 x03 A/B). Above the cap this returns None and the
    * caller streams the source as before — the 100 TB path never pins
    * the full corpus. */
  private[operators] def fitCentroidsShared(
      corpus: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trainCap: Long = 100000L): (DataFrame, Option[DataFrame]) = {
    val all = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    // sampling modulus from the optimizer's size estimate (file-footer
    // bytes — no job), not an eager full-corpus count(): the modulus only
    // sizes the sample, never affects correctness, and a power-of-two
    // quantization absorbs the estimate's slack while keeping the gate
    // reproducible for a given input. The 64-byte row-width floor biases
    // the row estimate HIGH (embedding rows are wider), so the sample
    // lands AT OR UNDER the cap — the safe direction: the cap bounds
    // pinned executor storage; a somewhat smaller sample still fits
    // k <= a few hundred centroids comfortably.
    val stats = all.queryExecution.optimizedPlan.stats.sizeInBytes
    val sentinel = BigInt(
      all.sparkSession.sessionState.conf.defaultSizeInBytes)
    // RDD-backed plans (localCheckpoint, createDataFrame) report the
    // sentinel default size, not a real estimate — there, pay the exact
    // count (column-pruned to a metadata scan on columnar sources). The
    // file-backed 100 TB path never takes it.
    val estRows =
      if (stats >= sentinel) all.count()
      else (stats / 64).toLong.max(1L)
    val modulus =
      if (estRows <= trainCap) 1L
      else java.lang.Long.highestOneBit(
        ((estRows + trainCap - 1) / trainCap) * 2 - 1)
    val vecs = (if (modulus > 1L)
                  all.filter(pmod(xxhash64(col("__id")), lit(modulus)) === 0)
                else all)
      .pinned
    require(!vecs.isEmpty,
      s"fitCentroids: training sample is empty (modulus=$modulus from " +
        s"row estimate $estRows) — the input's size statistics are " +
        "wildly off; supply a trainCap-sized pre-sample instead")
    val dim = vecs.select(size(col("__v")).as("d")).head().getInt(0)
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
      // new centroid = elementwise mean over members, as dim parallel
      // sums in ONE map-side-combinable aggregation; empty cells drop
      // (unchanged semantics — assign tolerates sparse cell ids)
      val sums = Seq.tabulate(dim)(i =>
        sum(element_at(col("__v"), i + 1)).as(s"__s$i"))
      centroids = assigned.groupBy("cell")
        .agg(count(lit(1)).as("__n"), sums: _*)
        .select(col("cell"), array(Seq.tabulate(dim)(i =>
          col(s"__s$i") / col("__n")): _*).as("centroid"))
    }
    (centroids.pinned,
      if (modulus == 1L) Some(vecs) else None)
  }

  /** Nearest-centroid assignment as a ZERO-SHUFFLE map: the centroid
    * table is k x dim doubles (k <= a few hundred by contract) — small
    * enough to collect and inline as a literal array, so the argmin runs
    * per row inside codegen with no crossJoin and no window exchange.
    * The arithmetic replicates VectorFns.l2sq term-for-term (zip_with
    * square-diff, left-fold sum) and array_position picks the FIRST
    * minimum — the same (distance, cell) tie-break as the old window
    * argmin, so assignments are bit-identical to the join form.
    * private[operators]: Pq.ivfAdcKnn reuses it for the coarse stage. */
  private[operators] def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.orderBy("cell")
      .select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    require(cents.nonEmpty, "assign: empty centroid table")
    // the literal-inlining contract, ENFORCED: the centroid table is
    // collected and inlined into the plan, so k and k x dim must stay
    // codegen-scale — beyond it a JVM "code grows beyond 64 KB" would
    // surface deep in codegen. Larger quantizers switch to the
    // broadcast-join argmin: one corpus-keyed aggregation shuffle
    // instead of zero, but no size ceiling short of driver memory.
    val dim = cents.head._2.length
    if (cents.length > 1024 || cents.length.toLong * dim > 131072)
      return assignBroadcast(vecs, centroids)
    // cells may be SPARSE (a Lloyd round drops emptied cells): the argmin
    // runs over positions, then maps back to the surviving cell ids.
    // typedLit, not array(lit..): an array-typed literal enters codegen as
    // ONE reference object, so the generated source is identical across
    // Lloyd rounds (different centroid VALUES, same references slot) and
    // the codegen cache hits — array(lit..) inlined k x dim doubles as
    // source-level constants, recompiling ~100KB of Java per round
    // (measured r21: the 6 per-round jobs of x03 at sf0.1 each spent
    // 0.25-0.43s on 1.2MB of data, almost all Janino+JIT).
    val cellIdArr = typedlit(cents.map(_._1).toSeq)
    // nanvl: a NaN vector (or centroid) component would make its distance
    // NaN; NaN compares GREATER than every double in Spark's ordering, so
    // array_min skips it — but if EVERY distance were NaN, array_position
    // (primitive == in codegen, NaN != NaN) would return 0 and element_at
    // would fail. Mapping NaN -> +Infinity makes the argmin total: a
    // corrupt vector deterministically lands in the first surviving cell
    // instead of erroring the whole job.
    // One native vector_l2sq per cell inside a plain CreateArray (all
    // codegen) — the old transform(sequence(..)) evaluated an interpreted
    // lambda per (row, cell) with a zip_with allocation per distance. The
    // arithmetic is the same left-to-right (x-y)^2 fold, bit-identical.
    val dists = array(cents.map { case (_, v) =>
      nanvl(VectorFns.l2sq(col("__v"), typedlit(v)),
        lit(Double.PositiveInfinity))
    }: _*)
    vecs.withColumn("__dists", dists)
      .withColumn("cell", element_at(cellIdArr,
        array_position(col("__dists"), array_min(col("__dists"))).cast("int")))
      .select(col("__id"), col("__v"), col("cell"))
  }

  /** Large-k assignment: broadcast the centroid TABLE (not a literal) and
    * take the per-vector argmin as min_by over (distance, cell) — the
    * lexicographic struct order reproduces the literal path's
    * first-minimum / lowest-cell tie-break exactly, and the same
    * nanvl(+Infinity) guard keeps the argmin total. Cost model vs the
    * literal path: the broadcast join is still narrow, but the argmin
    * becomes ONE corpus-keyed aggregation (map-side-combinable partial
    * min per partition, k-fold row expansion only inside the map stage).
    * The distance arithmetic is VectorFns.l2sq — the same zip_with
    * square-diff fold the literal path inlines — so the two paths are
    * bit-identical wherever both apply (pinned by IvfSampledSpec). */
  private[operators] def assignBroadcast(vecs: DataFrame,
                                         centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids
      .select(col("cell").cast("int").as("__c"), col("centroid")))
    vecs.crossJoin(cents)
      .withColumn("__d",
        nanvl(VectorFns.l2sq(col("__v"), col("centroid")),
          lit(Double.PositiveInfinity)))
      .groupBy("__id")
      .agg(first(col("__v")).as("__v"),
        min_by(col("__c"), struct(col("__d"), col("__c"))).as("cell"))
      .select(col("__id"), col("__v"), col("cell"))
  }

  /** Fail fast when `idCol` repeats. One job: a partial-aggregated
    * groupBy(id) count, short-circuited by limit(1) — the map side
    * collapses duplicates before the exchange, so the shuffled stream is
    * the distinct-id set, not the table. */
  private def requireUniqueIds(df: DataFrame, idCol: String,
                               side: String): Unit = {
    val dup = df.groupBy(col(idCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"ivfKnn: $side.$idCol is not unique (e.g. $idCol=" +
        s"${dup.headOption.map(_.get(0)).orNull}): duplicate ids make the " +
        "literal and broadcast assign paths diverge and let duplicate " +
        "(vec_id, nn_id) pairs occupy top-k rank slots. Dedup the input, " +
        "or pass checkIds=false only when uniqueness is enforced upstream.")
  }

  /** IVF search: exact cosine rerank within the query's `nprobe` nearest
    * cells. Returns (vec_id, nn_id, sim, rank).
    *
    * PRECONDITION (ENFORCED): `idCol` must be unique within `queries` and
    * within `corpus` (the usual vector-table contract). The no-dedup
    * candidate argument below relies on it: under a duplicate corpus id
    * the literal assign path keeps every input row while the broadcast
    * path's groupBy collapses them to one, so the two assign flavors
    * would diverge and duplicate (vec_id, nn_id) pairs could occupy
    * top-k rank slots. `lshKnn` dedups regardless because its multi-table
    * join genuinely re-meets pairs; this operator has no such path, so
    * the precondition buys back one corpus-scale shuffle. With
    * `checkIds=true` (the default) a violated precondition FAILS FAST
    * instead of silently corrupting top-k: one partial-aggregated
    * groupBy(id) count per side — cheap next to `iters` k-means corpus
    * scans, and far cheaper than the dropDuplicates shuffle it replaces.
    * Pass `checkIds=false` only when uniqueness is enforced upstream
    * (id is a primary key of the source table). IvfSampledSpec plants a
    * duplicate corpus id and asserts the rejection. */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nCells: Int = 16, nprobe: Int = 4, iters: Int = 5,
             idCol: String = "vec_id", vecCol: String = "embedding",
             roundTo: Int = 4, checkIds: Boolean = true): DataFrame = {
    if (checkIds) {
      requireUniqueIds(corpus, idCol, "corpus")
      requireUniqueIds(queries, idCol, "queries")
    }
    val (centroids, pinned) = fitCentroidsShared(corpus, nCells, iters, idCol, vecCol)
    val corpusCells = assign(
      pinned.getOrElse(corpus.select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))), centroids)
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
    // NO pair dedup (unlike lshKnn's multi-table join, where a pair can
    // meet once per table): assign() emits exactly ONE row per corpus
    // vector (argmin over centroids — literal path computes the cell
    // in-row, broadcast path groups by __id), and qCells is one row per
    // (vec_id, cell) by row_number, so a (vec_id, nn_id) pair can only
    // meet through the corpus vector's single cell. The r17 profile had
    // a dropDuplicates here — a full extra shuffle of the candidate
    // stream (the big intermediate at scale) to dedup a provably
    // duplicate-free set.
    val cand = qCells.join(corpusCells, Seq("cell"))
      .filter(col("vec_id") =!= col("nn_id"))
    val scored = cand.withColumn("sim",
      round(VectorFns.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), roundTo))
    val wr = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select("vec_id", "nn_id", "sim", "rank")
  }
}

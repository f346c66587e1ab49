package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `DataFrame.sample()` draws with a per-partition RNG: the sample changes
  * under re-partitioning, retries and engine versions — unacceptable when
  * a corpus subset must be reproducible (and auditable) across reruns of
  * a 100 TB job. Hash-gate sampling replaces the RNG with a pure function
  * of each row's key: membership is stable everywhere, join-compatible
  * (the same key samples identically in every table) and embarrassingly
  * parallel (a scan-side filter, no shuffle at all).
  *
  * The hash is the first 15 hex digits of md5(key) — 60 bits, portable to
  * any engine with md5 (the DuckDB oracle re-derives the exact sample).
  */
object Sampling {

  /** 60-bit portable key hash (uniform on [0, 2^60)). */
  def keyHash(key: Column): Column =
    // native compiled digest (ArrayExprs.Md5PrefixLong) — bit-identical
    // to conv(substring(md5(key), 1, 15), 16, 10): first 15 hex digits
    // of the md5, as a long. The SQL chain allocated three intermediate
    // strings per row (hex, substring, base-conv); the expression does
    // one digest and a shift. Portability contract unchanged — oracles
    // replay the same '0x'||substr(md5(..),1,15) arithmetic.
    graft.functions.ArrayExprs.md5_prefix_long(key.cast("string"))

  /** Keep rows whose hash bucket (of 1000) falls below `permille` — a
    * deterministic ~permille/1000 sample. Scan-side filter; no shuffle. */
  def hashSample(df: DataFrame, key: Column, permille: Int): DataFrame =
    df.filter(pmod(keyHash(key), lit(1000L)) < permille)

  /** Exactly `n` rows per stratum: the first n under the hash order (a
    * stable pseudo-random order), ties broken by the key itself. One
    * shuffle on the stratum columns. */
  def stratifiedSample(df: DataFrame, strata: Seq[Column], key: Column,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(keyHash(key), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES:
    * priority u^(1/w), keep the top n), restricted to POWER-OF-TWO weights
    * so it stays deterministic AND cross-engine bit-exact: u^(1/2^k) is k
    * nested sqrts, and sqrt — unlike pow/log — is IEEE correctly rounded,
    * so every engine computes the identical priority bits and the ranking
    * can be certified by an external oracle. u is the 60-bit md5 key hash
    * mapped to (0,1): reproducible under re-partitioning/retries like
    * every sampler here. Power-of-two weight CLASSES (1/2/4/8...) are the
    * practical shape anyway — corpus mixtures are tuned in coarse ratios.
    *
    * `log2Weight` must be an integer column in [0, 6]. Top-n is a
    * TakeOrderedAndProject — no shuffle, scan-side priorities. */
  def weightedSample(df: DataFrame, key: Column, log2Weight: Column,
                     n: Int): DataFrame = {
    val u = (keyHash(key).cast("double") + 0.5) / lit(1.152921504606846976e18)
    val p = (0 to 6).foldLeft(when(lit(false), lit(0.0))) { (acc, k) =>
      acc.when(log2Weight === k,
        (0 until k).foldLeft(u)((c, _) => sqrt(c)))
    }.otherwise(raise_error(concat(
      // fail loudly: an unmatched weight would otherwise yield a NULL
      // priority that silently sorts the row out of the sample
      lit("weightedSample: log2Weight outside the [0,6] contract: "),
      coalesce(log2Weight.cast("string"), lit("NULL")))))
    df.withColumn("__p", p)
      .orderBy(col("__p").desc, key)
      .limit(n)
      .drop("__p")
  }

  /** Domain-mixture quota sampling: draw the LARGEST corpus subset whose
    * domain proportions match integer `parts` (the DoReMi/Pile-style
    * mixture knob, e.g. en:5 de:2 ...). The binding domain m minimizes
    * n_d / w_d; every domain's quota is then w_d * n_m / w_m (integer
    * division — exact, oracle-portable), and each domain keeps its first
    * `quota` rows in the stable md5-hash order (ties on the key), so the
    * subset is deterministic under re-partitioning and certified row-set
    * by the oracle.
    *
    * Scale shape: domain counts are ONE metadata-scale aggregate (domains
    * number dozens, not rows — the only driver-side state); selection is
    * one window over a shuffle on the domain column. */
  def mixtureSample(df: DataFrame, domainCol: String, key: Column,
                    parts: Map[String, Int]): DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      "mixtureSample: parts must be positive")
    val counts = df.groupBy(domainCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = parts.keySet.diff(counts.keySet)
    require(missing.isEmpty, s"mixtureSample: empty domains $missing")
    // binding domain: min n/w, ties on domain name (kept deterministic)
    val (_, (nm, wm)) = parts.toSeq.sortBy { case (d, w) =>
      (counts(d).toDouble / w, d)
    }.map { case (d, w) => d -> (counts(d), w) }.head
    val quotas = parts.map { case (d, w) => d -> (w.toLong * nm) / wm }
    val quotaCol = parts.keys.toSeq.sorted.foldLeft(when(lit(false), lit(0L))) {
      (acc, d) => acc.when(col(domainCol) === d, lit(quotas(d)))
    }.otherwise(lit(0L))
    val w = Window.partitionBy(col(domainCol)).orderBy(keyHash(key), key)
    df.filter(col(domainCol).isin(parts.keys.toSeq: _*))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quotaCol)
      .drop("__rn")
  }

  /** Fractional-epoch mixture upsampling: repeat each document
    * `epochs(domain)` times, where epochs is fractional — the standard
    * multi-epoch mixture knob ("wiki 2.5 epochs, web 0.7") for training
    * corpora. Every doc gets floor(e) full copies; the fractional
    * remainder is a deterministic hash gate (one EXTRA copy iff the
    * doc's 60-bit md5 hash bucket < frac(e)·1000), so the realized
    * corpus hits the requested epoch count in expectation with ZERO
    * coordination — membership is a pure row function, reproducible
    * under re-partitioning and certifiable by an external oracle.
    * epochs < 1 degenerates to hash-gate downsampling; the gate hashes
    * key||"#epoch" so it is independent of hashSample's gate on the
    * same key.
    *
    * Scan-side: one filter + one bounded explode, no shuffle at all.
    * Epochs are integer PERMILLE (2500 = 2.5 epochs) — never a double,
    * so the gate threshold is exact on every engine.
    *
    * @return input rows with an `epoch_idx` column (1..copies); rows
    *         whose domain draws zero copies are dropped
    */
  def epochUpsample(df: DataFrame, domainCol: String, key: Column,
                    epochsPermille: Map[String, Int]): DataFrame = {
    require(epochsPermille.nonEmpty && epochsPermille.values.forall(_ > 0),
      "epochUpsample: epochsPermille must be positive")
    def byDomain(f: Int => Long): Column =
      epochsPermille.keys.toSeq.sorted.foldLeft(when(lit(false), lit(0L))) {
        (acc, d) => acc.when(col(domainCol) === d, lit(f(epochsPermille(d))))
      }.otherwise(lit(0L))
    val gate = pmod(keyHash(concat(key.cast("string"), lit("#epoch"))),
      lit(1000L)) < byDomain(_ % 1000L)
    val copies = byDomain(_ / 1000L) + when(gate, lit(1L)).otherwise(lit(0L))
    df.filter(col(domainCol).isin(epochsPermille.keys.toSeq: _*))
      .withColumn("__copies", copies)
      .filter(col("__copies") >= 1)
      .withColumn("epoch_idx", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Temperature (alpha = 0.5) mixture resampling — the standard
    * multilingual rebalancing step: the target distribution is
    * q_d ∝ p_d^0.5, realized DOWNSAMPLE-ONLY by keeping each domain at
    * rate r_d = sqrt(n_min / n_d) (the rarest domain keeps 100%, a
    * domain 100x larger keeps 10%), applied through [[epochUpsample]]'s
    * deterministic hash gate. alpha is fixed at 0.5 because sqrt is the
    * one power IEEE rounds correctly — the rate expression
    * floor(1000·sqrt(n_min)/sqrt(n_d)) is a fixed tree of
    * correctly-rounded ops, hence bit-identical on every engine, which
    * keeps the realized corpus certifiable. Domain counts (a handful of
    * rows) are the only driver state, as in [[mixtureSample]].
    *
    * @return input rows surviving the temperature gate, plus
    *         `epoch_idx` (always 1 — rates are <= 1000 permille)
    */
  def temperatureResample(df: DataFrame, domainCol: String,
                          key: Column): DataFrame = {
    val counts = df.groupBy(col(domainCol).cast("string").as("__d"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureResample: empty input")
    val nMin = counts.values.min
    val permille = counts.map { case (d, n) =>
      d -> math.max(1, math.floor(
        1000.0 * math.sqrt(nMin.toDouble) / math.sqrt(n.toDouble)).toInt)
    }
    epochUpsample(df, domainCol, key, permille)
  }

  /** Exact-quota train/val/test split with per-domain proportions: within
    * each domain, rows are ranked by md5(key) (hash order — stable under
    * re-partitioning and engine changes, and uncorrelated with any data
    * column) and the first floor(n*trainPermille/1000) go to train, the
    * next floor(n*valPermille/1000) to val, the remainder to test. Unlike
    * [[hashSample]]'s gate (proportions hold only in expectation), the
    * quotas here are EXACT per domain — the contract an eval set needs.
    *
    * The rank is DISTRIBUTED (round-7's `Window.partitionBy(domain)`
    * put each domain's entire row set in one task — a corpus with 5
    * languages would rank 100 TB on 5 executors): rows are range-
    * partitioned on (domain, hash, key) so every task holds a contiguous
    * slice of exactly one region of the global per-domain order, a tiny
    * count pass (one row per (partition, domain) — partitions x domains,
    * driver-side) yields each slice's global rank offset via a running
    * sum, and the final pass assigns offset + local position against the
    * integer quota boundaries inside `mapPartitions` — the standard
    * two-pass distributed-rank construction. No window, no per-domain
    * sort task; both passes reuse the same deterministic range exchange.
    *
    * @return input rows plus a `split` column ('train'/'val'/'test')
    */
  def splitAssign(df: DataFrame, domainCol: String, key: Column,
                  trainPermille: Int = 800, valPermille: Int = 100): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      "splitAssign: permille quotas must be non-negative and sum <= 1000")
    val (ranked, totals) = hashRank(df, col(domainCol).cast("string"), key)
    // integer quota boundaries, never double division: a domain past
    // 2^53/1000 rows would round the boundary
    val bounds: Map[String, (Long, Long)] = totals.map { case (d, n) =>
      d -> (n * trainPermille / 1000, n * trainPermille / 1000 +
        n * valPermille / 1000)
    }
    val bcBounds = df.sparkSession.sparkContext.broadcast(bounds)
    val split = udfFreeSplit(bcBounds)
    ranked
      .withColumn("split", split(col("__d"), col("__rank")))
      .drop("__d", "__rank")
  }

  /** The split CASE over the broadcast per-domain quota map, as a pure
    * when-chain when the domain set is small (it always is: languages /
    * sources — the map was collected driver-side already). */
  private def udfFreeSplit(bc: org.apache.spark.broadcast.Broadcast[
      Map[String, (Long, Long)]]): (Column, Column) => Column =
    (d, rank) => bc.value.foldLeft(when(lit(false), lit(""))) {
      case (acc, (dom, (trainQ, valQ))) =>
        acc.when(d <=> lit(dom),
          when(rank <= trainQ, lit("train"))
            .when(rank <= valQ, lit("val")).otherwise(lit("test")))
    }.otherwise(lit("test"))

  /** Deterministic corpus shuffle + shard assignment — the LAST step of
    * every training-data pipeline: rows are put in md5(key) hash order (a
    * stable pseudo-random permutation — reproducible across reruns,
    * engines and partitionings, unlike `ORDER BY rand()`) and dealt
    * ROUND-ROBIN into `nShards` shards, so every shard is a same-size
    * (±1) unbiased sample of the corpus and `shard_pos` is each row's
    * position within its shard file. One range-partition shuffle plus the
    * tiny count pass ([[hashRank]]) — no global single-task sort, no
    * window, no nondeterministic RNG.
    *
    * @return input rows plus `shard` (int, 0-based) and `shard_pos`
    *         (long, 0-based within shard)
    */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, "shuffleShards: nShards must be >= 1")
    val (ranked, _) = hashRank(df, lit(""), key)
    ranked
      .withColumn("shard", ((col("__rank") - 1) % nShards).cast("int"))
      // integer `div`, not `/` (double division) — exact at any rank
      .withColumn("shard_pos", expr(s"(__rank - 1) div $nShards"))
      .drop("__d", "__rank")
  }

  /** Distributed within-domain hash rank — the shared two-pass machinery
    * of [[splitAssign]] and [[shuffleShards]]: range-partition on
    * (domain, md5-hash, key) so each task holds a contiguous slice of one
    * region of the global per-domain order, count rows per (partition,
    * domain) (a partitions x domains result — driver-scale at any corpus
    * size), turn the counts into per-slice global offsets by a running
    * sum in partition order, then emit offset + local position from
    * `mapPartitions`. Equivalent to `row_number() over (partition by
    * domain order by hash, key)` WITHOUT a window: the window form puts
    * each domain's entire row set in one task — with a handful of
    * domains over 100 TB that is a single-executor sort.
    *
    * Returns (rows + `__d` (domain as string) + `__rank` (1-based within
    * domain), per-domain row totals).
    */
  private def hashRank(df: DataFrame, domain: Column,
                       key: Column): (DataFrame, Map[String, Long]) =
    rankWithin(df, domain, Seq(keyHash(key), key))

  /** Public face of the two-pass distributed rank for a SINGLE global
    * order (domain = the whole frame): appends `__rank` (1-based) in
    * ascending `order` without any window or single-task sort — the
    * sortedNeighborhood blocking stage and any other "position in a
    * global sort" consumer build on this. The order must be total
    * (include a unique key last) for the rank to be deterministic. */
  def orderedRank(df: DataFrame, order: Seq[Column]): DataFrame =
    rankWithin(df, lit(""), order)._1.drop("__d")

  /** The general within-domain exact rank over ANY ascending order —
    * [[hashRank]] instantiates it with (md5-hash, key) for pseudo-random
    * order; [[qualityGate]] with (-score, hash, key) for score order. */
  private def rankWithin(df: DataFrame, domain: Column,
                         order: Seq[Column]): (DataFrame, Map[String, Long]) = {
    val spark = df.sparkSession
    val oNames = order.indices.map(i => s"__o$i")
    // __d normalizes the domain to a string ONCE (Catalyst cast), so the
    // driver-side maps and the executor-side row reads agree on the key
    val withOrd = order.zip(oNames).foldLeft(
      df.withColumn("__d", domain.cast("string"))) {
      case (acc, (c, n)) => acc.withColumn(n, c)
    }
    val sortCols = col("__d") +: oNames.map(col)
    val ranged = withOrd
      // explicit partition count: a bare repartitionByRange is an AQE
      // coalesce target, and the two passes shuffle different column sets
      // (pruned vs full rows) — AQE could coalesce them DIFFERENTLY,
      // desynchronizing partition ids between the count and rank jobs
      .repartitionByRange(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      // lazy localCheckpoint — CORRECTNESS-CRITICAL, not a cache hint: the
      // range exchange SAMPLES its boundaries with a seed derived from the
      // RDD id, which differs between the count job and the rank job, so
      // re-planning the exchange twice can place boundary rows in
      // DIFFERENT partitions and silently corrupt every downstream rank
      // (caught by the sf0.1 cross-sweep: below the ~sampleSize row count
      // the "sample" is the whole input and the two jobs agree by luck).
      // Checkpointing materializes the partitioning ONCE at the count
      // pass; the rank pass reads the identical blocks. The cost — one
      // corpus materialization — is the honest price of exact global
      // ranks; blocks are ContextCleaner-reclaimed when the frame goes
      // out of scope (the minhashTopPairs pattern).
      .localCheckpoint(false)
    // pass 1: rows per (physical partition, domain); column pruning keeps
    // the shuffled payload to the three helper columns
    val counts: Array[((Int, String), Long)] = ranged
      .groupBy(spark_partition_id().as("__pid"), col("__d"))
      .count()
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    val totals: Map[String, Long] =
      counts.groupBy(_._1._2).map { case (d, xs) => d -> xs.map(_._2).sum }
    // global rank offset of each (partition, domain) slice: running sum
    // over partitions in range order (partition ids ARE the range order)
    val offsets: Map[(Int, String), Long] = {
      val run = collection.mutable.HashMap.empty[String, Long]
      counts.sortBy(_._1._1).map { case ((pid, d), c) =>
        val off = run.getOrElse(d, 0L)
        run(d) = off + c
        (pid, d) -> off
      }.toMap
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val schema = ranged.schema
    val dIdx = schema.fieldIndex("__d")
    val outSchema = schema.add("__rank", org.apache.spark.sql.types.LongType)
    // pass 2: same exchange, same within-partition sort — local position
    // + broadcast offset IS the within-domain row_number.
    // mapPartitionsWithIndex, NOT Dataset.mapPartitions + TaskContext:
    // the task partition id is the STAGE's index, which only equals the
    // RDD partition index while the stage wraps this RDD alone. Put the
    // ranked frame under a Union of two narrow (broadcast-join) branches
    // — sortedNeighborhood's candidate shape — and the second child's
    // tasks run with pids offset by the first child's partition count:
    // the offset lookup misses and every rank silently collapses to its
    // partition-local value. The RDD-level index is immune to stage
    // composition, and a missed offset now fails loudly instead.
    val rankedRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val seen = collection.mutable.HashMap.empty[String, Long]
      it.map { row =>
        val d = row.getString(dIdx)
        val rank = seen.getOrElse(d, bcOff.value.getOrElse((pid, d),
          throw new IllegalStateException(
            s"rankWithin: no offset for partition $pid domain '$d' — " +
              "partition ids desynchronized between the count and rank " +
              "passes"))) + 1L
        seen(d) = rank
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ rank)
      }
    }
    val ranked = spark.createDataFrame(rankedRdd, outSchema)
    (ranked.drop(oNames: _*), totals)
  }

  /** Per-domain exact quantile gate — keep each domain's TOP
    * `keepPermille`/1000 rows by `score` (exact integer quota, ties
    * broken by the md5 hash order then the key, so the kept set is
    * deterministic and engine-portable). The curation step "keep the
    * best 30% of every language by quality score" — whose textbook form,
    * `row_number() over (partition by lang order by score desc)`, puts
    * each language's ENTIRE corpus in one task. This runs on the same
    * two-pass distributed-rank construction as [[splitAssign]]: one
    * range exchange on (domain, -score, hash), a driver-scale count
    * pass, no window anywhere in the plan.
    *
    * `score` must be numeric (it is ranked via arithmetic negation).
    *
    * @return the kept input rows, schema unchanged
    */
  def qualityGate(df: DataFrame, domainCol: String, score: Column,
                  key: Column, keepPermille: Int): DataFrame = {
    require(keepPermille >= 0 && keepPermille <= 1000,
      "qualityGate: keepPermille must be in [0, 1000]")
    val (ranked, totals) = rankWithin(df, col(domainCol).cast("string"),
      Seq(-score, keyHash(key), key))
    // integer quota, never double division (the splitAssign rationale)
    val bounds: Map[String, Long] =
      totals.map { case (d, n) => d -> n * keepPermille / 1000 }
    val bcBounds = df.sparkSession.sparkContext.broadcast(bounds)
    val quota = bcBounds.value.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (dom, q)) => acc.when(col("__d") <=> lit(dom), lit(q))
    }.otherwise(lit(0L))
    ranked.filter(col("__rank") <= quota).drop("__d", "__rank")
  }

  /** Sequence packing: assign each document to a training sequence (bin)
    * of ~`budget` tokens. Documents are first sharded by key hash (so the
    * cumulative sum parallelizes — a single global running sum would move
    * every row to one task), then packed in hash order within the shard:
    * bin = shard * 2^40 + floor(exclusive-prefix-tokens / budget).
    * The 2^40 shard stride keeps bin ids collision-free up to 2^40 bins
    * (~562 TRILLION tokens per shard at budget=512) — a 2^20 stride would
    * silently alias bins into the next shard's number space at ~537M
    * tokens/shard, real at corpus scale. seq_id stays within Long for any
    * shards <= 2^23. Deterministic, one shuffle, and every bin except a
    * shard's last holds >= budget - max_doc_tokens of payload (the classic
    * streaming-packing bound). Adds `seq_id` and `seq_offset` (token start
    * within the bin's running stream). */
  def packSequences(df: DataFrame, key: Column, tokens: Column,
                    budget: Int, shards: Int): DataFrame = {
    // materialize the shard once and emit BOTH derived columns in ONE
    // projection: separate withColumn layers re-instantiate the window
    // spec with fresh expression ids, and the analyzer then plans TWO
    // Window operators — two shuffles for what is one pass
    val withShard = df.withColumn("__shard", pmod(keyHash(key), lit(shards.toLong)))
    val w = Window.partitionBy(col("__shard")).orderBy(keyHash(key), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumExcl = sum(tokens).over(w) - tokens
    // integral division, not floor(double/): a double quotient silently
    // loses exactness once cumulative tokens pass 2^53 (real at corpus
    // scale)
    def intDiv(a: Column, b: Long): Column = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b)))
    withShard.select(df.columns.toIndexedSeq.map(col) ++ Seq(
      ((col("__shard") * (1L << 40)) + intDiv(cumExcl, budget.toLong)).as("seq_id"),
      pmod(cumExcl, lit(budget.toLong)).as("seq_offset")): _*)
  }
}

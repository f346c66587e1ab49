package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.scalatest.BeforeAndAfterAll
import graft.SparkSpec

/** Plan-quality gates: these assertions pin the physical-plan properties
  * that make the catalog queries scale — predicate pushdown to the parquet
  * scan, column pruning, broadcast joins for dimensions. A regression that
  * silently turns a broadcast join into a cross join, or lifts a filter
  * off the scan, fails here long before it would show up as a 100 TB
  * incident. */
class PlanQualitySpec extends SparkSpec with BeforeAndAfterAll {

  // the shared test session has no spark.sql.extensions; install the
  // rewrite the same way RangeJoinRewriteSpec does (production sessions get
  // it via GraftExtensions), restoring on exit so other suites' plan-shape
  // assertions stay order-independent
  private var saved: Seq[Rule[LogicalPlan]] = Nil
  private var savedStrategies: Seq[org.apache.spark.sql.execution.SparkStrategy] = Nil
  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = spark.experimental.extraOptimizations
    savedStrategies = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations =
      saved.filterNot(r => r == graft.plans.RangeJoinRewrite ||
        r == graft.plans.WindowTopKRewrite) :+
        graft.plans.RangeJoinRewrite :+ graft.plans.WindowTopKRewrite
    spark.experimental.extraStrategies =
      savedStrategies.filterNot(_ == graft.plans.GroupTopKStrategy) :+
        graft.plans.GroupTopKStrategy
  }
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = saved
    spark.experimental.extraStrategies = savedStrategies
    super.afterAll()
  }

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Catalog.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02: filters are pushed to the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters"))
    // (the toString truncates the filter list, so match the prefix)
    assert(p.contains("GreaterThan(l_quantity"))
    assert(p.contains("PushedFilters: [IsNotNull"))
  }

  test("q02: scan reads only the referenced columns") {
    val p = plan("q02_filter")
    // ReadSchema must not include untouched wide columns
    assert(!p.contains("l_comment") && !p.contains("l_shipinstruct"))
    assert(p.contains("l_orderkey") && p.contains("l_linenumber"))
  }

  test("q04/q05: dimension joins broadcast") {
    assert(plan("q04_join_agg").contains("BroadcastHashJoin"))
    val p5 = plan("q05_multijoin")
    assert(p5.contains("BroadcastHashJoin"))
    assert(!p5.contains("CartesianProduct") && !p5.contains("BroadcastNestedLoopJoin"))
  }

  test("q09: bucketed range join is an equi hash join, not a nested loop") {
    val p = plan("q09_rangejoin")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q22: array query prunes to the two referenced columns") {
    val p = plan("q22_array")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>"))
    assert(!p.contains("label"))
  }

  test("q17: global top-k is TakeOrderedAndProject, not a full sort") {
    assert(plan("q17_topk_global").contains("TakeOrderedAndProject"))
  }

  test("q11: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q11_tpch1")
    assert(p.contains("partial_"))
  }

  test("d06: LSH candidate generation joins on equi keys") {
    val p = plan("d06_minhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("t10: hash-gate sampling is a scan-side filter — zero shuffles") {
    val df = graft.operators.Sampling.hashSample(
      graft.Tables.documents(spark, dir),
      org.apache.spark.sql.functions.col("doc_id"), 100)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }

  test("t12: sequence packing shuffles exactly once (the shard window)") {
    val docs = graft.Tables.documents(spark, dir)
      .withColumn("n_tok", org.apache.spark.sql.functions.size(
        graft.functions.TextFns.words(
          org.apache.spark.sql.functions.col("text"))).cast("long"))
    val df = graft.operators.Sampling.packSequences(docs,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("n_tok"), 512, 4)
    val p = df.queryExecution.executedPlan.toString
    assert(p.split("Exchange").length - 1 == 1, s"expected ONE Exchange:\n$p")
  }

  test("q54: un-keyed interval join plans as hash join via the rewrite") {
    val p = plan("q54_rangejoin_unkeyed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q14: GroupTopK rewrite fires AND the scan stays column-pruned") {
    val p = plan("q14_topk_group")
    assert("GroupTopK \\[".r.findAllIn(p).size == 2, p)
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"), p)
    assert(!p.contains("o_orderdate"), p)
  }

  test("d10/d11: clustering pipelines never plan a cartesian product") {
    // the star-CC rounds and the composed prep pipeline are join-heavy;
    // every join must stay equi (LSH band digests / cluster labels)
    for (q <- Seq("d10_cc_star", "d11_pipeline")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("q55: salting spreads the hot key — join is equi on (key, salt)") {
    val p = plan("q55_salted_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("xxhash64"), s"deterministic salt missing:\n$p")
  }

  test("t14: weighted sampling is TakeOrdered over scan-side priorities") {
    val p = plan("t14_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"top-n must not full-sort:\n$p")
  }

  test("q61: scd2 runs all three windows + the run agg over ONE hash exchange") {
    // lag/running-sum windows, the (key, run) aggregate, and the lead
    // window all cluster on user_id: hashpartitioning(user_id) satisfies
    // every downstream requirement, so the only other exchange is the
    // final orderBy's range partitioning
    val p = plan("q61_scd2")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
  }

  test("q75/q76: window-dialect rows ride ONE hash exchange on user_id") {
    // q75's five ignore-nulls functions share one (partition, order); q76
    // runs a ROWS frame, a RANGE frame and the RANGE 0-0 peer frame —
    // all cluster on user_id, so hashpartitioning(user_id) satisfies
    // every window (different sort keys re-sort, never re-shuffle); the
    // only other exchange is the final orderBy's range partitioning
    for (q <- Seq("q75_ignore_nulls_nav", "q76_frame_exclude")) {
      val p = plan(q)
      val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashEx == 1, s"$q: expected 1 hash exchange, got $hashEx:\n$p")
    }
  }

  test("t20/d15/d16/x07: curation operators never plan a cartesian product") {
    for (q <- Seq("t20_lm_perplexity", "d15_semantic_dedup", "d16_curate2",
        "x07_mmr_rerank")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("t21/d16: chunking stays shuffle-free up to the explode") {
    // chunkDocs is per-row expressions + posexplode: the only exchange in
    // the standalone query is the final orderBy
    val p = plan("t21_chunking")
    assert(!p.contains("Exchange hashpartitioning"), s"t21 must not shuffle:\n$p")
  }

  test("t22: BPE join-back is equi on word; scan prunes to (doc_id, text)") {
    val p = plan("t22_bpe_tokenize")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("n_chars"), s"scan must prune unused columns:\n$p")
  }

  test("q65: bloom prefilter applies as broadcast word lookups — probe never hash-shuffles") {
    val probe = graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey")
    val build = graft.Tables.customer(spark, dir)
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
    val df = graft.operators.Layout.bloomPrefilter(probe,
      org.apache.spark.sql.functions.col("o_custkey"),
      build, org.apache.spark.sql.functions.col("c_custkey"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"word lookups must broadcast:\n$p")
    // the only hash exchanges allowed are on the <=128-row words side
    // (building the filter), never on the probe scan: every probe-side
    // join is a BroadcastHashJoin, so a probe hash-shuffle would surface
    // as a SortMergeJoin or ShuffledHashJoin
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"probe side must not shuffle:\n$p")
  }

  test("q64/d20: layout audit and span dedup never plan a cartesian product") {
    for (q <- Seq("q64_zorder_layout", "d20_span_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("t28: epoch upsampling is scan-side — zero shuffles") {
    val df = graft.operators.Sampling.epochUpsample(
      graft.Tables.documents(spark, dir), "lang",
      org.apache.spark.sql.functions.col("doc_id"),
      Map("en" -> 1500, "de" -> 700))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"upsampling must not shuffle:\n$p")
  }

  test("t27: DSIR bucket ratios broadcast to the per-document join") {
    val p = plan("t27_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket log-ratio table must broadcast:\n$p")
  }

  test("q71: OHLC is a partial hash aggregation — no window anywhere") {
    val p = plan("q71_ohlc")
    assert(p.contains("partial_"), s"map-side combine missing:\n$p")
    assert(!p.contains("Window"), s"min_by/max_by must replace windows:\n$p")
  }

  test("q69/d26: recursive SQL and SNM never plan a cartesian product") {
    for (q <- Seq("q69_recursive_sql", "d26_snm_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("d27/d28/mwa22: candidate generation and peeling stay equi-join") {
    // d27's lazy tail (hot-bucket fallback + verification joins) must
    // stay keyed — a cartesian here is the exact failure the prefix
    // design exists to prevent. d28's build runs the full peel loop at
    // sf0.001 (its per-round joins execute inside; the returned plan is
    // checkpoint-collapsed, so this doubles as a loop smoke-run). mwa22's
    // flagged-ant anti join legitimately BNL-broadcasts its 1-row
    // flagged dim, so only the cartesian check applies there.
    for (q <- Seq("d27_prefix_jaccard", "d28_kcore")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
    assert(!plan("mwa22_select_surface").contains("CartesianProduct"))
  }

  test("d27: verification joins hash, never sort, the candidate stream") {
    // round-15 sf10 finding: a sort-merge verify would SORT the
    // candidate-many stream twice — and after the first join every row
    // carries a full shingle array (103 GB of sort spill per sf10 bench
    // session before the SHUFFLE_HASH hint; disk exhaustion on the
    // pre-fix corpus). The corpus side is the bounded build side; the
    // unbounded candidate stream must only ever stream.
    // AQE's wrapper node has no children, so tree collect sees nothing —
    // plan the query without it for this structural check
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exec =
      try Catalog.queries("d27_prefix_jaccard")(spark, dir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    val shj = exec.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
    assert(shj.count(_.output.exists(_.name.startsWith("__s"))) == 2,
      s"d27 verify joins lost the SHUFFLE_HASH hint:\n$exec")
    // other pipeline joins (token freq, hot-bucket fallback) may sort —
    // their rows are bounded scalars; the ARRAY stream must not
    val smj = exec.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(!smj.exists(_.output.exists(_.name.startsWith("__s"))),
      s"a sort-merge join touches the shingle-array stream:\n$exec")
  }

  test("x12: portable k-means assigns with literal centroids — no join, no cartesian") {
    // the Lloyd rounds run eagerly inside the build (driver collects only
    // k x dim longs); the RETURNED plan is final-assignment + one window —
    // centroids must appear as literals, never as a joined table
    val p = plan("x12_kmeans_portable")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // exactly one exchange family feeds the kept-window (cell, qkey);
    // a centroid JOIN would add a second join-side exchange
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("x14/x15/x16/x17: the twin searches broadcast the query side — corpus never shuffles for candidates") {
    // same scale contract as x13 across the rest of the twin family:
    // x14's ADC scan, x16's reconstructed scan, and x17's bucket join
    // build from a BROADCAST query side (BNLJ for the full scans, BHJ
    // for bucket/cell equi joins); x15's cell join likewise. A
    // SortMergeJoin/ShuffledHashJoin would mean the corpus exchanges for
    // candidate generation — the shape that dies at 100 TB.
    // (Codebooks/centroids/grids/hyperplanes are literals or broadcast
    // single rows by construction, so no join can even appear for them.)
    for (q <- Seq("x14_pq_portable", "x15_ivfadc_portable",
                  "x16_sq_portable", "x17_lsh_portable")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
        && !p.contains("CartesianProduct"), s"$q:\n$p")
      assert(p.contains("Broadcast"), s"$q must broadcast the query side:\n$p")
    }
  }

  test("x13: portable IVF candidate join broadcasts the probes — corpus never shuffles for it") {
    // the scale contract in KmeansPortable.ivfSearch's scaladoc: the
    // (query, probed-cell) side is broadcast, so the candidate join is a
    // zero-shuffle map over the corpus; only the bounded candidate set
    // reaches the top-k window exchange. A SortMergeJoin/ShuffledHashJoin
    // here would mean the CORPUS exchanges on cell — the shape that dies
    // at 100 TB (k cells ≪ partitions ⇒ skew).
    val p = plan("x13_ivf_portable")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"), p)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dev-only A/B harness for VERDICT r18 task 2: d11_pipeline's spill
  * boundary is STRUCTURAL — the round-18 probe (commit 625b0bb) showed a
  * monotone capped-Up curve no sizing knob fixes, with 67 GB of spill at
  * sf10. Hypothesis: the composed plan re-executes whole stages —
  *   - `uniq` (the exact-dedup hash agg over the corpus) is consumed by
  *     the LSH signature scan, BOTH verify-join text sides, and the
  *     survivor anti join — four full recomputes;
  *   - `pairs` (the LSH candidate+verify join, the expensive stage) is
  *     re-derived from scratch on EVERY label-propagation round inside
  *     duplicateClusters, because only the label table is pinned there;
  *   - `kept` is consumed twice (token counting + language ID).
  * Stage materialization (localCheckpoint at the seams) releases each
  * stage's working set before the next starts and makes every reuse read
  * the pinned copy. This harness measures composed vs pin-pairs vs
  * pin-all at sf10 with per-run shuffle-spill deltas, reversed-order
  * sessions, exactly the KCORE_AB_sf10_r18 protocol.
  *
  * Usage: runMain graft.ProbeD11Mat [sfDir] [variantsCsv] [runs] [outJson] [skipAgree]
  *   variantsCsv from {composed, pin-pairs, pin-all}; csv order = session
  *   order (run a reversed second session for position control).
  */
object ProbeD11Mat {

  /** d11_pipeline's exact body (queries/Catalog.scala d11), with the
    * three stage seams optionally materialized. pinUniq/pinPairs/pinKept
    * all false = the shipped composed plan, byte-for-byte semantics. */
  def d11(s: SparkSession, d: String, pinUniq: Boolean, pinPairs: Boolean,
          pinKept: Boolean): DataFrame = {
    def pin(df: DataFrame, on: Boolean): DataFrame =
      if (on) df.localCheckpoint(true) else df
    val uniq = pin(Dedup.exactRows(Tables.documents(s, d), "doc_id", "text"),
      pinUniq)
    val pairs = pin(Dedup.minhashLsh(uniq, "doc_id", "text",
      shingleN = 3, k = 128, bands = 32, threshold = 0.7)
      .select("id_a", "id_b"), pinPairs)
    val dupes = Dedup.duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val kept = pin(uniq.join(dupes, Seq("doc_id"), "left_anti"), pinKept)
    val toks = kept.select(col("doc_id"),
      size(graft.functions.TextFns.words(col("text"))).cast("int")
        .as("n_tokens"))
    TextAnalysis.languageId(kept)
      .join(toks, Seq("doc_id"))
      .filter(col("n_tokens") >= 5)
      .select("doc_id", "pred_lang", "n_tokens")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val variantNames = (if (args.length > 1) args(1)
      else "composed,pin-pairs,pin-all").split(",").toSeq
    // fail fast BEFORE the Spark session comes up (round-19 ADVICE): a
    // typo'd variant would otherwise surface as a bare
    // NoSuchElementException mid-session
    val validVariants = Set("composed", "pin-pairs", "pin-all")
    require(variantNames.forall(validVariants.contains),
      s"unknown variant in $variantNames; valid: ${validVariants.mkString(",")}")
    val runs = if (args.length > 2) args(2).toInt else 3
    val outJson = if (args.length > 3) Some(args(3)) else None
    val skipAgree = args.length > 4 && args(4) == "skipAgree"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    def spillSnap(): (Long, Long) = {
      spark.range(1).count()
      var prev = (spillMem.get(), spillDisk.get())
      var settled = false
      var waited = 0
      while (!settled && waited < 1000) {
        Thread.sleep(50); waited += 50
        val cur = (spillMem.get(), spillDisk.get())
        settled = cur == prev
        prev = cur
      }
      prev
    }

    val impls: Map[String, () => Long] = Map(
      "composed" -> (() => d11(spark, sfDir, false, false, false).count()),
      "pin-pairs" -> (() => d11(spark, sfDir, false, true, false).count()),
      "pin-all" -> (() => d11(spark, sfDir, true, true, true).count()))

    val results = variantNames.map { name =>
      val f = impls(name)
      var rowsOut = -1L
      val recs = (1 to runs).map { r =>
        spark.catalog.clearCache()
        // localCheckpoint pins release via the ContextCleaner on GC;
        // force it between runs so one run's pinned corpus copies don't
        // squat block-manager storage during the next
        System.gc(); Thread.sleep(2000)
        val (m0, d0) = spillSnap()
        val t0 = System.nanoTime()
        val n = f()
        val dt = (System.nanoTime() - t0) / 1e9
        val (m1, d1) = spillSnap()
        if (rowsOut < 0) rowsOut = n
        assert(n == rowsOut, s"$name: nondeterministic result $n vs $rowsOut")
        System.err.println(f"[d11-ab] $name run $r: $dt%7.2fs  " +
          f"spill_mem ${(m1 - m0) / 1e9}%.1f GB  disk ${(d1 - d0) / 1e9}%.1f GB")
        (dt, m1 - m0, d1 - d0)
      }
      val ts = recs.map(_._1)
      System.err.println(
        f"[d11-ab] $name%-10s best ${ts.min}%7.2fs  median ${ts.sorted.apply(ts.size / 2)}%7.2fs  rows=$rowsOut")
      (name, recs, rowsOut)
    }
    if (!skipAgree) {
      val a = d11(spark, sfDir, false, false, false)
      val b = d11(spark, sfDir, true, true, true)
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      assert(diff == 0, s"variants disagree by $diff rows")
      System.err.println("[d11-ab] composed and pin-all agree exactly")
    }
    outJson.foreach { path =>
      val vjson = results.map { case (name, recs, rows) =>
        val times = recs.map(r => f"${r._1}%.3f").mkString("[", ",", "]")
        val sm = recs.map(r => f"${r._2 / 1e9}%.2f").mkString("[", ",", "]")
        val sd = recs.map(r => f"${r._3 / 1e9}%.2f").mkString("[", ",", "]")
        s"""{"variant":"$name","times_sec":$times,""" +
          s""""spill_mem_gb":$sm,"spill_disk_gb":$sd,"result_rows":$rows}"""
      }.mkString("[", ",", "]")
      val json = s"""{"sf":"$sfDir","runs_per_variant":$runs,""" +
        s""""session_order":${variantNames.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""variants":$vjson}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
      System.err.println(s"[d11-ab] wrote $path")
    }
    spark.stop()
  }
}

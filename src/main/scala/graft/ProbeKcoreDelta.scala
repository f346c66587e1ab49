package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for VERDICT r12 task 3: re-measure DELTA peeling
  * for k-core against the full-rescan peel (graft.operators.Graph.kCore)
  * at sf1, where the d28 cascade is deep (d28 is the repo's worst scale
  * slope). Not part of the engine surface; the kept winner lives in
  * Graph.scala with the measurement in its scaladoc.
  *
  * The delta variant is the Matula–Beck trick expressed relationally:
  * keep a running (id, deg) table, and each round subtract from the
  * still-alive nodes only the edges they lose to the nodes removed LAST
  * round (one semi join of the pinned edge set against the removed set,
  * one count, one left join), instead of recounting every alive degree
  * from scratch. Same fixpoint, same result set.
  *
  * Usage: runMain graft.ProbeKcoreDelta [sfDir] [k]
  */
object ProbeKcoreDelta {

  /** Delta-peeling k-core: identical contract to Graph.kCore. */
  def kCoreDelta(edges: DataFrame, k: Int, maxRounds: Int = 40): DataFrame = {
    require(k >= 1, "kCoreDelta: k must be >= 1")
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
      .localCheckpoint(true)
    val degs = dir.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
      .localCheckpoint(true)
    var removed = degs.filter(col("deg") < k).select("id").localCheckpoint(true)
    var alive = degs.filter(col("deg") >= k).localCheckpoint(true)
    var nRemoved = removed.count()
    var rounds = 0
    while (nRemoved > 0) {
      require(rounds < maxRounds,
        s"kCoreDelta: cascade exceeded maxRounds=$maxRounds")
      rounds += 1
      // edges whose dst was just removed, grouped by surviving src:
      // exactly the degree each alive node loses this round
      val losses = dir
        .join(removed, dir("dst") === removed("id"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("__loss"))
      val updated = alive
        .join(losses, alive("id") === losses("src"), "left")
        .select(alive("id"),
          (col("deg") - coalesce(col("__loss"), lit(0L))).as("deg"))
        .localCheckpoint(true)
      removed = updated.filter(col("deg") < k).select("id")
        .localCheckpoint(true)
      alive = updated.filter(col("deg") >= k).localCheckpoint(true)
      nRemoved = removed.count()
    }
    alive.select("id")
  }

  /** Third variant: full-rescan peel that SHRINKS the pinned edge set
    * whenever the surviving node count halves since the last pin — later
    * rounds scan a smaller table, at the price of an O(E_surviving)
    * re-checkpoint per shrink. Same fixpoint, same result. */
  def kCoreShrink(edges: DataFrame, k: Int, maxRounds: Int = 40): DataFrame = {
    require(k >= 1, "kCoreShrink: k must be >= 1")
    var dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
      .localCheckpoint(true)
    var nodes = dir.select(col("src").as("id")).distinct().localCheckpoint(true)
    var nNodes = nodes.count()
    var pinnedAt = nNodes
    var rounds = 0
    var stable = false
    while (!stable) {
      require(rounds < maxRounds,
        s"kCoreShrink: cascade exceeded maxRounds=$maxRounds")
      rounds += 1
      if (nNodes * 2 < pinnedAt) {
        // surviving nodes halved: re-pin the edge set restricted to them
        val a = dir.join(nodes, dir("src") === nodes("id"), "left_semi")
        dir = a.join(nodes, a("dst") === nodes("id"), "left_semi")
          .localCheckpoint(true)
        pinnedAt = nNodes
      }
      val alive = dir.join(nodes, dir("src") === nodes("id"), "left_semi")
      val next = alive
        .join(nodes, alive("dst") === nodes("id"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint(true)
      val n = next.count()
      stable = n == nNodes
      nodes = next
      nNodes = n
    }
    nodes
  }

  /** Fourth variant (round-14 verdict task 4, "bucket peeling"): FUSE TWO
    * cascade levels into every Spark round. The full-rescan peel already
    * removes ALL deg<k vertices per round, so its round count equals the
    * cascade depth — the measured cost driver (each round pays a fixed
    * checkpoint + count + scheduling overhead). Here a round additionally
    * peels, in the same job, the survivors whose degree minus the edges
    * they just lost to this round's removals drops below k — one extra
    * semi join + count + left join per round, for half the rounds. The
    * fixpoint (and the k-core, which is unique) is unchanged: any node
    * the 2-level peel removes would have been removed by two 1-level
    * rounds, and stability (no removal in a fused round) implies
    * stability of the 1-level peel. */
  def kCoreFused(edges: DataFrame, k: Int, maxRounds: Int = 40): DataFrame = {
    require(k >= 1, "kCoreFused: k must be >= 1")
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .distinct()
      .localCheckpoint(true)
    var nodes = dir.select(col("src").as("id")).distinct().localCheckpoint(true)
    var nNodes = nodes.count()
    var rounds = 0
    var stable = false
    while (!stable) {
      require(rounds < maxRounds,
        s"kCoreFused: cascade exceeded maxRounds=$maxRounds")
      rounds += 1
      val alive = dir.join(nodes, dir("src") === nodes("id"), "left_semi")
      val deg = alive
        .join(nodes, alive("dst") === nodes("id"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("__deg"))
      // level 1: this round's removals; level 2: survivors that fall
      // below k once level-1's incident edges are subtracted
      val rem1 = deg.filter(col("__deg") < k).select(col("src").as("rid"))
      val surv1 = deg.filter(col("__deg") >= k)
      val losses = dir
        .join(rem1, dir("dst") === col("rid"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("__loss"))
        .select(col("src").as("lid"), col("__loss"))
      val next = surv1
        .join(losses, surv1("src") === col("lid"), "left")
        .filter(col("__deg") - coalesce(col("__loss"), lit(0L)) >= k)
        .select(col("src").as("id"))
        .localCheckpoint(true)
      val n = next.count()
      stable = n == nNodes
      nodes = next
      nNodes = n
    }
    nodes
  }

  /** A/B session. Args: sfDir k variantsCsv runs [outJson] [skipAgree]
    * variantsCsv from {full-rescan, delta-peel, shrink-pin, fused-2lvl};
    * order within the csv IS the session order (run a second session
    * reversed to control position-in-session bias). Session posture =
    * the sf10 bench protocol exactly: local[32], 8g heap (build.sbt) +
    * 4g off-heap, shuffle.partitions=32, sizing rule ON via
    * GraftExtensions, AQE on. The JSON artifact carries per-run wall
    * times AND per-run shuffle-spill deltas (the r18 question is
    * precisely whether delta-peeling wins in the SPILL regime). */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val k = if (args.length > 1) args(1).toInt else 6
    val variantNames = (if (args.length > 2) args(2)
      else "full-rescan,delta-peel,shrink-pin,fused-2lvl").split(",").toSeq
    val runs = if (args.length > 3) args(3).toInt else 3
    val outJson = if (args.length > 4) Some(args(4)) else None
    val skipAgree = args.length > 5 && args(5) == "skipAgree"
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

    def edges() = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("src"),
        (lit(1000000000L) + col("l_partkey")).as("dst"))
      .distinct()

    val impls: Map[String, () => Long] = Map(
      "full-rescan" -> (() => graft.operators.Graph.kCore(edges(), k).count()),
      "delta-peel" -> (() => kCoreDelta(edges(), k).count()),
      "shrink-pin" -> (() => kCoreShrink(edges(), k).count()),
      "fused-2lvl" -> (() => kCoreFused(edges(), k).count()))

    val results = variantNames.map { name =>
      val f = impls(name)
      var core = -1L
      val recs = (1 to runs).map { r =>
        spark.catalog.clearCache()
        val (m0, d0) = spillSnap()
        val t0 = System.nanoTime()
        val n = f()
        val dt = (System.nanoTime() - t0) / 1e9
        val (m1, d1) = spillSnap()
        if (core < 0) core = n
        assert(n == core, s"$name: nondeterministic result $n vs $core")
        System.err.println(f"[kcore-ab] $name run $r: $dt%7.2fs  " +
          f"spill_mem ${(m1 - m0) / 1e9}%.1f GB  disk ${(d1 - d0) / 1e9}%.1f GB")
        (dt, m1 - m0, d1 - d0)
      }
      val ts = recs.map(_._1)
      System.err.println(
        f"[kcore-ab] $name%-12s best ${ts.min}%7.2fs  median ${ts.sorted.apply(ts.size / 2)}%7.2fs  core=$core rows")
      (name, recs, core)
    }
    if (!skipAgree) {
      val a = graft.operators.Graph.kCore(edges(), k)
      for (v <- Seq(kCoreDelta(edges(), k), kCoreFused(edges(), k))) {
        val diff = a.exceptAll(v).count() + v.exceptAll(a).count()
        assert(diff == 0, s"variants disagree by $diff rows")
      }
      System.err.println("[kcore-ab] variants agree exactly")
    }
    outJson.foreach { path =>
      val vjson = results.map { case (name, recs, core) =>
        val times = recs.map(r => f"${r._1}%.3f").mkString("[", ",", "]")
        val sm = recs.map(r => f"${r._2 / 1e9}%.2f").mkString("[", ",", "]")
        val sd = recs.map(r => f"${r._3 / 1e9}%.2f").mkString("[", ",", "]")
        s"""{"variant":"$name","times_sec":$times,""" +
          s""""spill_mem_gb":$sm,"spill_disk_gb":$sd,"core_rows":$core}"""
      }.mkString("[", ",", "]")
      val json = s"""{"sf":"$sfDir","k":$k,"runs_per_variant":$runs,""" +
        s""""session_order":${variantNames.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""variants":$vjson}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
      System.err.println(s"[kcore-ab] wrote $path")
    }
    spark.stop()
  }
}

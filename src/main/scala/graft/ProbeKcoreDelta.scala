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

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val k = if (args.length > 1) args(1).toInt else 6
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

    def edges() = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("src"),
        (lit(1000000000L) + col("l_partkey")).as("dst"))
      .distinct()

    def time(name: String)(f: => Long): Unit = {
      val warm = f // warmup (JIT + codegen)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        assert(n == warm, s"$name: nondeterministic result $n vs $warm")
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[kcore-ab] $name%-12s best ${ts.min}%6.2fs  median ${ts.sorted.apply(1)}%6.2fs  core=$warm rows")
    }

    // order is reversible (3rd arg "reverse") to control for position-
    // in-session bias: heap/GC state accumulates, so a variant's slot in
    // the sequence is itself a treatment
    val variants: Seq[(String, () => Long)] = Seq(
      "full-rescan" -> (() => graft.operators.Graph.kCore(edges(), k).count()),
      "delta-peel" -> (() => kCoreDelta(edges(), k).count()),
      "shrink-pin" -> (() => kCoreShrink(edges(), k).count()),
      "fused-2lvl" -> (() => kCoreFused(edges(), k).count()))
    val ordered = if (args.length > 2 && args(2) == "reverse")
      variants.reverse else variants
    for ((name, f) <- ordered) time(name)(f())
    // cross-check the variants agree exactly
    val a = graft.operators.Graph.kCore(edges(), k)
    for (v <- Seq(kCoreDelta(edges(), k), kCoreFused(edges(), k))) {
      val diff = a.exceptAll(v).count() + v.exceptAll(a).count()
      assert(diff == 0, s"variants disagree by $diff rows")
    }
    System.err.println("[kcore-ab] variants agree exactly")
    spark.stop()
  }
}

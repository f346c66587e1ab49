package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe for the d27 exact prefix-Jaccard join at scale: counts
  * each stage of [[graft.operators.Dedup.prefixJaccardPairs]]'s candidate
  * funnel so a scale failure can be attributed to a SPECIFIC volume
  * (bucket expansion? filter survivors? verification payload?) instead of
  * guessed at. Written for the round-15 sf10 finding: the 8-query sf10
  * session AND an isolated fresh-JVM run both died with
  * SPILL_OUT_OF_MEMORY ("No space left on device") in the sort feeding
  * the second verification sort-merge join — the stage where every
  * surviving candidate row is already carrying a full hashed-shingle
  * array. Not part of the engine surface; mirrors the operator's internal
  * pipeline read-only (same shingles, same rarest-first order, same
  * filters) and additionally evaluates PPJoin's ACCUMULATED positional
  * filter (Xiao et al. WWW'08: per-pair shared-prefix count alpha plus
  * the last-shared-position tail bound) — measured-rejected at sf0.1
  * (cut ~4%) but re-measured here at each decade because the sf10
  * replica corpus has a different false-positive class (cross-replica
  * permutation-invariant shingle collisions) that a per-occurrence bound
  * cannot see but a per-pair accumulated bound can.
  *
  * Usage: runMain graft.ProbeD27 <sfDir> [maxStage]
  */
object ProbeD27 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val maxStage = if (args.length > 1) args(1).toInt else 99
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val threshold = 0.5
    val shingleN = 3
    def p(s: String): Unit = System.err.println(s"[d27probe] $s")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      p(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    val sets = docs.select(col("doc_id").as("id"),
        graft.functions.TextFns.wordShingles(col("text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true)
    p(s"docs with shingles: ${sets.count()}")

    val tokens = sets.select(col("id"), explode(col("sh")).as("tok"))
    val freq = tokens.groupBy("tok").agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    timed("token dictionary")(p(s"  distinct tokens: ${freq.count()}"))

    val docArr = tokens.join(freq, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("arr"))
      .withColumn("sz", size(col("arr")))
      .withColumn("p",
        col("sz") - ceil(lit(threshold) * col("sz")).cast("int") + 1)
    val prefixes = docArr
      .select(col("id"), col("sz"),
        posexplode(slice(col("arr"), lit(1), col("p")))
          .as(Seq("i0", "e")))
      .select(col("e.tok").as("tok"), col("id"), col("sz"),
        (col("i0") + 1).as("pos"))
      .localCheckpoint(true)
    timed("prefix occurrences")(p(s"  rows: ${prefixes.count()}"))

    // bucket-size distribution: where does the pair expansion come from?
    val bsz = prefixes.groupBy("tok").agg(count(lit(1)).as("d"))
      .filter(col("d") > 1)
      .localCheckpoint(true)
    val expansion = bsz.agg(
      count(lit(1)).as("buckets"),
      sum(col("d") * (col("d") - 1) / 2).as("raw_pairs"),
      max(col("d")).as("max_bucket")).head()
    p(s"buckets>1: ${expansion.get(0)}  raw pair expansions: " +
      s"${expansion.get(1)}  max bucket: ${expansion.get(2)}")
    p("top-12 prefix-token buckets (the colliding class, verbatim):")
    bsz.orderBy(col("d").desc).limit(12).collect().foreach { r =>
      p(f"  df=${r.getLong(1)}%8d  tok='${r.getString(0)}'")
    }
    if (maxStage < 2) { spark.stop(); return }

    // candidate stream with the CURRENT per-occurrence filters, counted
    // WITHOUT materializing (count aggregates stream partition-locally)
    val hotCap = 512
    val buckets = prefixes
      .groupBy("tok")
      .agg(collect_list(struct(col("id"), col("sz"), col("pos"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .localCheckpoint(true)
    val inPlace = buckets.filter(size(col("ids")) <= hotCap)
      .select(explode(graft.functions.ArrayExprs.pair_combos(col("ids"))).as("p"))
      .select(col("p.x.id").as("ia"), col("p.x.sz").as("sa"),
        col("p.x.pos").as("pa"),
        col("p.y.id").as("ib"), col("p.y.sz").as("sb"),
        col("p.y.pos").as("pb"))
    val hot = buckets.filter(size(col("ids")) > hotCap)
      .select(col("tok"), explode(col("ids")).as("e"))
      .select(col("tok"), col("e.id").as("id"), col("e.sz").as("sz"),
        col("e.pos").as("pos"))
    val hotPairs = hot.as("x").join(hot.as("y"),
        col("x.tok") === col("y.tok") && col("x.id") < col("y.id"))
      .select(col("x.id").as("ia"), col("x.sz").as("sa"),
        col("x.pos").as("pa"),
        col("y.id").as("ib"), col("y.sz").as("sb"),
        col("y.pos").as("pb"))
    val occFiltered = inPlace.union(hotPairs)
      .filter((lit(1.0) +
          least(col("sa") - col("pa"), col("sb") - col("pb")).cast("double")) >=
        lit(threshold / (1.0 + threshold)) *
          (col("sa") + col("sb")).cast("double") - lit(1e-9))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        // sizes and positions normalized to the (id_a, id_b) orientation:
        // sA/ppa belong to whichever id became id_a (NOT least/greatest of
        // the sizes — the accumulated tail bound pairs each size with ITS
        // OWN last position)
        when(col("ia") < col("ib"), col("sa")).otherwise(col("sb")).as("sA"),
        when(col("ia") < col("ib"), col("sb")).otherwise(col("sa")).as("sB"),
        when(col("ia") < col("ib"), col("pa")).otherwise(col("pb")).as("ppa"),
        when(col("ia") < col("ib"), col("pb")).otherwise(col("pa")).as("ppb"))
      .filter(least(col("sA"), col("sB")).cast("double") >=
        lit(threshold) * greatest(col("sA"), col("sB")).cast("double") - lit(1e-9))
    val preDistinct = timed("occurrence-filtered pair stream") {
      occFiltered.count()
    }
    p(s"  pre-distinct candidates: $preDistinct")
    if (maxStage < 3) { spark.stop(); return }
    if (preDistinct > 3_000_000_000L) {
      p("  pre-distinct stream too large for the sandbox disk; stopping")
      spark.stop(); return
    }

    // the ACCUMULATED filter evaluated as a hash aggregation over bare
    // pair rows (alpha = shared prefix tokens; tail bound from the LAST
    // shared positions): ubound = alpha + min(sa-paMax, sb-pbMax)
    val agg = occFiltered
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("alpha"),
        max(col("ppa")).as("paMax"), max(col("ppb")).as("pbMax"),
        first(col("sA")).as("sA"), first(col("sB")).as("sB"))
      .localCheckpoint(true)
    val postDistinct = timed("distinct candidates (via agg)")(agg.count())
    p(s"  post-distinct candidates: $postDistinct")
    val survivors = agg.filter(
      (col("alpha") +
        least(col("sA") - col("paMax"), col("sB") - col("pbMax")))
          .cast("double") >=
      lit(threshold / (1.0 + threshold)) *
        (col("sA") + col("sB")).cast("double") - lit(1e-9))
    val nSurv = timed("accumulated-filter survivors")(survivors.count())
    p(s"  survivors: $nSurv  (cut ${postDistinct - nSurv} = " +
      f"${100.0 * (postDistinct - nSurv) / math.max(postDistinct, 1)}%.1f%%)")
    // verification payload estimate: bytes of hashed-shingle arrays that
    // would ride through the verify joins for survivors vs all distinct
    val paySurv = survivors.agg(sum((col("sA") + col("sB")) * 8L)).head()
    val payAll = agg.agg(sum((col("sA") + col("sB")) * 8L)).head()
    p(s"verify payload (8B/token): survivors ${paySurv.get(0)} bytes, " +
      s"all distinct ${payAll.get(0)} bytes")
    if (maxStage < 4) { spark.stop(); return }

    // round-16 (verdict task 5): the denominator of the slope
    // adjudication — the TRUE qualifying pair count from the full
    // operator, so candidates/true can be compared across decades. A
    // flat ratio means the sf1->sf10 slope is the ANSWER growing, not
    // filter degradation; a growing ratio means the prefix filters are
    // losing selectivity with scale.
    val truePairs = timed("TRUE qualifying pairs (full operator)") {
      graft.operators.Dedup.prefixJaccardPairs(
        docs, "doc_id", "text", shingleN, threshold).count()
    }
    p(f"  true pairs: $truePairs  candidates/true = " +
      f"${postDistinct.toDouble / math.max(truePairs, 1)}%.2f")
    spark.stop()
  }
}

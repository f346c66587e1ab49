package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Certifies the hot-bucket contract of the LSH candidate expansion
  * (Dedup.bucketPairs): a degenerate bucket — 10^4 identical templated
  * documents piling into one (band, digest) bucket — must stream its
  * n(n-1)/2 candidate pairs through the equi-join fallback spread across
  * tasks, never materialize them as one O(n^2) in-memory array in a
  * single row. Buckets at or under the cap keep the cheap in-place
  * `pair_combos` expansion; the two paths must produce the identical
  * pair set.
  */
class HotBucketSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(band: Int, digest: String, ids: Seq[Long]) =
    (band, digest, ids)

  test("degenerate 10^4-id bucket streams through the join fallback, no single-row pair array") {
    val n = 10000
    val buckets = Seq(bucket(0, "hot", (1L to n.toLong)))
      .toDF("band", "digest", "ids")
    val pairs = Dedup.bucketPairs(buckets, cap = 512)

    // the hot bucket is ABOVE the cap, so the in-place branch contributes
    // nothing: the physical plan's Generate (pair_combos explode) sits
    // behind a size <= cap filter, and the pairs themselves come from the
    // streaming self-join. Assert the plan carries the join.
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("Join"), s"expected a join fallback in plan:\n$plan")

    // full pair count, exact: n(n-1)/2 — counted, never collected
    assert(pairs.count() === n.toLong * (n - 1) / 2)

    // spot-check ordering contract id_a < id_b on a bounded slice
    val head = pairs.filter(col("id_a") === 1L).agg(
      count(lit(1)), min(col("id_b")), max(col("id_b"))).head()
    assert(head.getLong(0) === (n - 1).toLong)
    assert(head.getLong(1) === 2L && head.getLong(2) === n.toLong)
  }

  test("in-place and join paths produce the identical pair set") {
    // mixed bucket sizes straddling a tiny cap: 8-id bucket (hot under
    // cap=4), 3-id bucket (in-place), shared ids across buckets so the
    // union must still be a clean set after distinct
    val buckets = Seq(
      bucket(0, "a", Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
      bucket(1, "b", Seq(2L, 3L, 9L)),
      bucket(2, "c", Seq(7L, 8L))
    ).toDF("band", "digest", "ids")

    def pairSet(cap: Int): Set[(Long, Long)] =
      Dedup.bucketPairs(buckets, cap).distinct()
        .as[(Long, Long)].collect().toSet

    val allInPlace = pairSet(cap = 1000) // everything under the cap
    val allJoined = pairSet(cap = 1)     // everything over the cap
    val mixed = pairSet(cap = 4)         // both branches active
    assert(allInPlace === allJoined)
    assert(mixed === allInPlace)
    assert(allInPlace.contains((1L, 8L)) && allInPlace.contains((2L, 9L)))
    assert(allInPlace.forall { case (a, b) => a < b })
  }

  test("minhashLsh over a template pileup above the production cap stays correct") {
    // 1200 identical documents — one (band, digest) bucket of 1200 ids per
    // band, 2.3x the production hotBucketCap of 512, so minhashLsh's real
    // candidate path (no test-only cap override) exercises the fallback
    val n = 1200
    assert(n > Dedup.hotBucketCap)
    val docs = spark.range(1, n + 1).select(
      col("id").as("doc_id"),
      lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, threshold = 0.9)
    // every pair is an exact duplicate: full n(n-1)/2 output, jaccard 1.0
    val agg = pairs.agg(count(lit(1)), min(col("jaccard")), max(col("jaccard"))).head()
    assert(agg.getLong(0) === n.toLong * (n - 1) / 2)
    assert(agg.getDouble(1) === 1.0 && agg.getDouble(2) === 1.0)
  }

  test("minhashLshClusters collapses a 10^4-copy template before banding") {
    // the SEMANTIC fix for template pileups: 10^4 byte-identical docs must
    // contribute ONE row to LSH banding and come back as one cluster via
    // n-1 representative edges — linear, where the pair-list contract is
    // quadratic by construction. Wall-clock is the proof: this runs in
    // seconds because no stage ever sees the 5*10^7 intra-group pairs.
    val n = 10000
    val docs = spark.range(n.toLong).select(
      col("id").as("doc_id"),
      lit("all work and no play makes a dull corpus of templated boilerplate text").as("text"))
    val clusters = Dedup.minhashLshClusters(docs, "doc_id", "text")
    val agg = clusters.agg(count(lit(1)), countDistinct(col("cluster_id")),
      min(col("cluster_id")), max(col("cluster_id"))).head()
    assert(agg.getLong(0) === n.toLong, "every copy is in the cluster")
    assert(agg.getLong(1) === 1L, "exactly one cluster")
    assert(agg.getLong(2) === 0L && agg.getLong(3) === 0L, "labelled by min id")
  }
}

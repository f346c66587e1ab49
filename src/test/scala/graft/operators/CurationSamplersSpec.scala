package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge contracts of the round-8 curation samplers, beyond their oracled
  * happy paths: negativeSample's exclusion/self/count guarantees and
  * temperatureResample's degenerate regimes. */
class CurationSamplersSpec extends SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong).select(col("id").as("vec_id"))
  }

  test("negativeSample: k per anchor, never self, never a positive") {
    import spark.implicits._
    val anchors = ids(10)
    val corpus = ids(500)
    // positives: each anchor's 3 successors
    val pos = anchors.select(col("vec_id"),
        explode(array((1 to 3).map(i => col("vec_id") + i): _*)).as("nn_id"))
    val negs = Similarity.negativeSample(anchors, corpus, pos, k = 8,
      poolPermille = 300).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byAnchor = negs.groupBy(_._1)
    assert(byAnchor.keySet == (0L until 10L).toSet)
    byAnchor.values.foreach { rows =>
      assert(rows.length == 8)
      assert(rows.map(_._3).sorted.sameElements(1 to 8))
      assert(rows.map(_._2).distinct.length == 8)
    }
    val posSet = pos.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    negs.foreach { case (a, n, _) =>
      assert(a != n, s"self negative for $a")
      assert(!posSet.contains((a, n)), s"positive ($a,$n) leaked")
    }
    // deterministic: a rerun draws the identical set
    val again = Similarity.negativeSample(anchors, corpus, pos, k = 8,
      poolPermille = 300).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(negs.toSet == again.toSet)
  }

  test("negativeSample: a pool smaller than k yields fewer, valid rows") {
    import spark.implicits._
    val anchors = ids(4)
    val corpus = ids(30) // permille 100 -> expect ~3 pool members
    val pos = Seq.empty[(Long, Long)].toDF("vec_id", "nn_id")
    val negs = Similarity.negativeSample(anchors, corpus, pos, k = 50,
      poolPermille = 100).collect()
    val poolSize = corpus.filter(pmod(Sampling.keyHash(
      concat(col("vec_id").cast("string"), lit("#negpool"))),
      lit(1000L)) < 100).count()
    assert(poolSize < 50)
    // each anchor draws at most the pool (minus itself if gated in)
    negs.groupBy(_.getLong(0)).values.foreach(rows =>
      assert(rows.length <= poolSize))
  }

  test("temperatureResample: single domain is the identity") {
    import spark.implicits._
    val df = spark.range(200).select(col("id").as("doc_id"), lit("en").as("lang"))
    val out = Sampling.temperatureResample(df, "lang", col("doc_id"))
    assert(out.count() == 200L)
    assert(out.select("epoch_idx").distinct().collect()
      .map(_.getLong(0)).sameElements(Array(1L)))
  }

  test("temperatureResample: a 100x-larger domain keeps ~10%") {
    import spark.implicits._
    val small = spark.range(100).select(col("id").as("doc_id"), lit("rare").as("lang"))
    val big = spark.range(10000).select((col("id") + 1000L).as("doc_id"),
      lit("common").as("lang"))
    val out = Sampling.temperatureResample(small.unionByName(big), "lang",
      col("doc_id"))
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rare") == 100L) // n_min keeps everything
    // rate = floor(1000*sqrt(100)/sqrt(10000)) = 100 permille, md5 gate
    // realizes it in expectation — allow generous binomial slack
    assert(counts("common") > 700L && counts("common") < 1300L,
      s"common kept ${counts("common")}, expected ~1000")
  }
}

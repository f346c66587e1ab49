package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend data derivation: writes an N-times-larger copy of a
  * testdata scale-factor directory by unioning N key-shifted replicas of
  * each table, preserving referential integrity (every FK shifts by the
  * same per-copy offset as its PK) so join/agg output sizes scale
  * linearly — the data side of the "would this plan survive a 10x
  * scale-up" check.
  *
  * Documents get a per-copy PERMUTATION of common letters applied to the
  * text (translate with a bijection), which preserves within-copy shingle
  * structure exactly (bijections preserve set equality, so near-dup pairs
  * and exact-dup groups replicate per copy) while making cross-copy texts
  * dissimilar — otherwise every replica of a document is an exact dup of
  * 9 others and dedup candidate pairs grow quadratically instead of
  * linearly, which is a different (skew) experiment, not a scale trend.
  *
  * A 4th argument `hot=<N>` plants a degenerate template cluster: N
  * byte-identical copies of one templated document (doc_ids in a reserved
  * range ABOVE every shifted copy — max(1e9, (factor+1)*K), so no copy's
  * bumped ids can collide with cluster ids at any factor), the worst case
  * of a template-heavy corpus for the LSH
  * banding path — every band maps the whole cluster into ONE bucket, so
  * the hot-bucket join fallback (Dedup.bucketPairs) is exercised at its
  * design limit instead of assumed. Off by default because it is a skew
  * experiment, not a scale trend: candidate pairs grow as N^2 by
  * CONSTRUCTION (those near-dup pairs really exist), which would swamp
  * the linear-slope signal the plain sweep measures.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor> [hot=<N>]
  */
object ScaleUp {

  // per-copy bijections on frequent letters ("etaoins" rotated): copy 0 is
  // identity so the original corpus is a subset of the scaled one
  private val alphabet = "etaoins"
  private def perm(i: Int): String =
    alphabet.drop(i % alphabet.length) + alphabet.take(i % alphabet.length)

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleUp <srcDir> <dstDir> <factor> [hot=<N>]")
    val (src, dst, n) = (args(0), args(1), args(2).toInt)
    val hot = args.drop(3).headOption
      .map { a => require(a.startsWith("hot="), s"bad arg $a"); a.drop(4).toInt }
      .getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val K = 10000000L // key offset per copy, far above any sf0.1 key space

    def copies(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until n).map(i => shift(base, i)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[scaleup] $name x$n written")
    }

    def bump(c: String, i: Int)(df: DataFrame): DataFrame =
      df.withColumn(c, col(c) + lit(i * K))

    // dims stay as-is (every copy references the same nations/regions)
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    copies("customer")((df, i) => bump("c_custkey", i)(df))
    copies("supplier")((df, i) => bump("s_suppkey", i)(df))
    copies("part")((df, i) => bump("p_partkey", i)(df))
    copies("orders")((df, i) =>
      bump("o_orderkey", i)(bump("o_custkey", i)(df)))
    copies("lineitem")((df, i) =>
      bump("l_orderkey", i)(bump("l_partkey", i)(bump("l_suppkey", i)(df))))
    copies("events")((df, i) =>
      bump("event_id", i)(bump("user_id", i)(df)))
    locally {
      val base = spark.read.parquet(s"$src/documents.parquet")
      val scaled = (0 until n).map(i =>
        bump("doc_id", i)(base)
          .withColumn("text", translate(col("text"), alphabet, perm(i))))
        .reduce(_ unionAll _)
      val out = if (hot == 0) scaled else {
        val template = "breaking news update please subscribe to our newsletter " +
          "for the latest breaking news update delivered daily to your inbox"
        // reserved id range strictly above copy n-1's bumped key space:
        // copy i shifts by i*K over a base key space << K, so (n+1)*K is
        // collision-free at any factor (round-7's fixed 9e7 base collided
        // with copy 9 at factor 10)
        val clusterBase = math.max(1000000000L, (n.toLong + 1) * K)
        val cluster = spark.range(hot.toLong)
          .select((col("id") + clusterBase).as("doc_id"),
            lit(template).as("text"),
            lit("en").as("lang"),
            concat(lit("template-"), (col("id") % 5)).as("source"),
            lit(template.length.toLong).as("n_chars"))
        scaled.unionByName(cluster)
      }
      out.write.mode("overwrite").parquet(s"$dst/documents.parquet")
      System.err.println(s"[scaleup] documents x$n written" +
        (if (hot > 0) s" + $hot-copy hot template cluster" else ""))
    }
    copies("embeddings")((df, i) => bump("vec_id", i)(df))

    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-bucket stress driver (the BENCH_sf1.json `lsh_hot_bucket_stress`
  * protocol): runs the production cluster contract — and optionally the
  * O(pileup²)-by-construction pair-list contract — over a ScaleUp corpus
  * with a planted 10^4-copy byte-identical template cluster
  * (`ScaleUp ... hot=10000`). Prints one JSON line per contract.
  *
  * Usage: runMain graft.HotStress <hotDir> [pairs]
  */
object HotStress {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runPairs = args.contains("pairs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val nIds = docs.select(countDistinct(col("doc_id"))).head().getLong(0)
    System.err.println(s"[hot] corpus $n docs, $nIds distinct ids")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (cl, tCl) = timed {
      val c = graft.operators.Dedup
        .minhashLshClusters(docs, "doc_id", "text")
        .localCheckpoint(true)
      (c.count(), c.select(countDistinct(col("cluster_id"))).head().getLong(0))
    }
    println(f"""{"contract":"minhashLshClusters","wall_sec":$tCl%.1f,"members":${cl._1},"clusters":${cl._2},"corpus_docs":$n,"distinct_doc_ids":$nIds}""")
    if (runPairs) {
      val (np, tP) = timed {
        graft.operators.Dedup.minhashLsh(docs, "doc_id", "text").count()
      }
      println(f"""{"contract":"d03_minhash_pairs","wall_sec":$tP%.1f,"pairs":$np,"completed":true,"oom":false}""")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-probe: times isolated stages of a pipeline to attribute
  * cost (generation vs shuffle vs window) before optimizing. Not part of
  * the engine surface; Bench is the reported benchmark. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.mwa._

    val spec = VisGenerator.Spec(nTimes = 24, nAnts = 16, nCoarse = 12,
      nFine = 32, pols = Seq("XX", "YY", "XY", "YX"))
    val cfg = GraftConfig(removeFlaggedAnts = false)

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[probe] $name%-28s ${ts.min}%6.2fs")
    }

    time("gen_both_sum") {
      VisGenerator.vis(spark, spec)
        .agg(sum(col("vis_re") + col("vis_im"))).collect()
    }
    time("gen_diff_both") {
      VisOps.diff(VisOps.selectSurface(VisGenerator.vis(spark, spec), cfg))
        .agg(sum(col("vis_re") + col("vis_im"))).collect()
    }
    time("gen_diff_ins") {
      VisOps.ins(VisOps.diff(VisOps.selectSurface(VisGenerator.vis(spark, spec), cfg)))
        .agg(sum(col("metric"))).collect()
    }
    time("full_spectrum") {
      VisOps.spectrum(VisGenerator.vis(spark, spec), cfg)
        .agg(sum(col("metric"))).collect()
    }
    val insCached = VisOps.ins(VisOps.diff(VisOps.selectSurface(
      VisGenerator.vis(spark, spec), cfg))).cache()
    insCached.count()
    time("zscore_on_cached_ins") {
      VisOps.zscore(insCached).agg(sum(col("z"))).collect()
    }
    VisOps.spectrum(VisGenerator.vis(spark, spec), cfg)
      .agg(sum(col("metric"))).explain("formatted")
    spark.stop()
  }
}

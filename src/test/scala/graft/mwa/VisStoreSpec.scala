package graft.mwa

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition layout + pruning proof, and TSV sink round-trip. */
class VisStoreSpec extends SparkSpec {

  test("vis parquet is partitioned by (obsid, coarse_chan) and scans prune") {
    val dir = tmpDir("graft_vis")
    val spec = VisGenerator.Spec(nTimes = 4, nAnts = 4, nCoarse = 3, nFine = 4)
    VisStore.write(VisGenerator.vis(spark, spec), dir)

    // physical layout: one directory per (obsid, coarse_chan)
    val chanDirs = new java.io.File(s"$dir/obsid=${spec.obsid}").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(chanDirs.toSeq == Seq("coarse_chan=0", "coarse_chan=1", "coarse_chan=2"))

    // partition pruning: a coarse_chan filter must appear as a
    // PartitionFilter, not a data filter over a full scan
    val q = VisStore.read(spark, dir).filter(col("coarse_chan") === 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("coarse_chan"))
    assert(q.count() == spec.nTimes.toLong * 10 * spec.nFine * spec.pols.size)

    // row-group predicate pushdown on time_idx (F7 time-slice)
    val t = VisStore.read(spark, dir).filter(col("time_idx") === 2)
    val tPlan = t.queryExecution.executedPlan.toString
    assert(tPlan.contains("PushedFilters") && tPlan.contains("time_idx"))
  }

  test("JSON and CSV sources round-trip the manifest (S9)") {
    val dir = tmpDir("graft_fmt")
    val m = Manifest.fromPaths(spark, Seq(
      "/d/111_gpubox01.fits", "/d/111.metafits", "/d/222_ch133.fits"))
    m.write.mode("overwrite").json(s"$dir/j")
    val fromJson = spark.read.json(s"$dir/j")
    assert(fromJson.count() == 3)
    assert(fromJson.columns.toSet == m.columns.toSet)
    m.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val fromCsv = spark.read.option("header", "true").csv(s"$dir/c")
    assert(fromCsv.count() == 3)
  }

  test("TSV sink round-trips the INS spectrum (S8 export_tsv)") {
    val dir = tmpDir("graft_tsv")
    val cfg = GraftConfig(removeFlaggedAnts = false)
    val insDf = VisOps.ins(VisOps.diff(VisOps.selectSurface(
      VisGenerator.vis(spark, VisGenerator.Spec(nTimes = 4, nAnts = 4,
        nCoarse = 1, nFine = 4)), cfg)))
    VisStore.writeTsv(insDf, dir)
    val back = VisStore.readTsv(spark, dir)
    assert(back.count() == insDf.count())
    assert(back.columns.toSet == insDf.columns.toSet)
  }
}

package graft.sources

import graft.SparkSpec
import graft.mwa.VisGenerator
import org.apache.spark.sql.functions._

/** DSv2 source: partition planning, column pruning, and bit-parity with
  * the DataFrame generator. */
class VisSourceSpec extends SparkSpec {

  private def load(slice: Int = 4) = spark.read.format("graft-vis")
    .option("ntimes", "8").option("nants", "4")
    .option("ncoarse", "2").option("nfine", "4")
    .option("timeslice", slice.toString)
    .load()

  test("rows are bit-identical to the expression-based generator") {
    val spec = VisGenerator.Spec(nTimes = 8, nAnts = 4, nCoarse = 2, nFine = 4)
    val fromExpr = VisGenerator.vis(spark, spec)
    val fromDsv2 = load()
    assert(fromDsv2.schema.map(f => (f.name, f.dataType)) ==
      fromExpr.schema.map(f => (f.name, f.dataType)))
    assert(fromDsv2.count() == fromExpr.count())
    // keys + integral columns match exactly; the float payload matches to
    // 1e-9 (Math.cos/sqrt can differ by 1 ulp between JIT tiers, so exact
    // bit equality across two evaluation paths is not guaranteed by the JVM)
    val keys = Seq("time_idx", "ant1", "ant2", "freq_hz", "pol")
    val j = fromExpr.as("a").join(fromDsv2.as("b"), keys)
    assert(j.count() == fromExpr.count())
    val bad = j.filter(
      abs(col("a.vis_re") - col("b.vis_re")) > 1e-9 ||
      abs(col("a.vis_im") - col("b.vis_im")) > 1e-9 ||
      col("a.baseline") =!= col("b.baseline") ||
      col("a.coarse_chan") =!= col("b.coarse_chan") ||
      col("a.time_jd") =!= col("b.time_jd")).count()
    assert(bad == 0)
  }

  test("plans one partition per (coarse_chan, time-slice)") {
    // 2 chans x ceil(8/4)=2 slices -> 4 partitions
    assert(load(4).rdd.getNumPartitions == 4)
    assert(load(2).rdd.getNumPartitions == 8)
  }

  test("column pruning reaches the source (metadata-only S3 pass)") {
    val q = load().select("time_idx", "time_jd").distinct()
    val scans = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) == Seq("time_idx", "time_jd"))
    assert(q.count() == 8)
  }

  test("filter pushdown prunes (time, chan) partitions at the source") {
    // builder-level: time_idx < 4 with slice 2 keeps slices [0,2) and [2,4)
    // per chan -> 4 of 8 partitions; coarse_chan = 1 halves again
    import org.apache.spark.sql.sources.{EqualTo, LessThan}
    val spec = VisGenerator.Spec(nTimes = 8, nAnts = 4, nCoarse = 2, nFine = 4)
    def partsWith(fs: org.apache.spark.sql.sources.Filter*) = {
      val b = new VisScanBuilder(spec, 2)
      b.pushFilters(fs.toArray)
      b.build().toBatch.planInputPartitions().length
    }
    assert(partsWith() == 8)
    assert(partsWith(LessThan("time_idx", 4)) == 4)
    assert(partsWith(LessThan("time_idx", 4), EqualTo("coarse_chan", 1)) == 2)
    assert(partsWith(EqualTo("time_idx", 0)) == 2)

    // end-to-end: the filtered read returns exactly the filtered rows and
    // scans fewer partitions than the unfiltered read
    val q = load(2).filter(col("time_idx") < 4 && col("coarse_chan") === 1)
    assert(q.rdd.getNumPartitions == 2)
    assert(q.count() == 4L * 10 * 4 * 2) // times x baselines x fine x pols
  }

  test("the SSINS chain runs unchanged on the DSv2 source") {
    val cfg = graft.mwa.GraftConfig(removeFlaggedAnts = false)
    val ins = graft.mwa.VisOps.ins(graft.mwa.VisOps.diff(
      graft.mwa.VisOps.selectSurface(load(), cfg)))
    assert(ins.count() == 7L * 8 * 2) // (nTimes-1) x freqs x pols
  }
}

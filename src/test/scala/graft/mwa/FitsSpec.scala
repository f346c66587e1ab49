package graft.mwa

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FITS binary I/O: standard conformance of the writer, generic BINTABLE
  * decode, bit-exact round trip against the portable generator, and
  * time/channel pushdown pruning real (file, HDU-slice) partitions. */
class FitsSpec extends SparkSpec {

  private lazy val spec = VisGenerator.Spec(nTimes = 6, nAnts = 3)
  private lazy val dir = {
    val d = java.nio.file.Paths.get(tmpDir("graft_fits_spec"))
    Fits.writeVis(d, spec)
    d
  }

  private def load(slice: Int = 4) = spark.read.format("graft-vis")
    .option("path", dir.toString).option("timeslice", slice.toString).load()

  test("writer emits standard FITS: 2880-byte records, parseable headers") {
    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".fits")).sorted
    assert(files.length == spec.nCoarse)
    files.foreach { f =>
      assert(f.length() % Fits.RecordLen == 0)
      val hdus = Fits.readHeaders(f.getPath)
      // primary + one BINTABLE per integration
      assert(hdus.length == 1 + spec.nTimes)
      assert(hdus.head.str("SIMPLE") == "T" || hdus.head.cards("SIMPLE").trim == "T")
      hdus.tail.foreach { h =>
        assert(h.str("XTENSION") == "BINTABLE")
        assert(h.int("NAXIS") == 2)
        assert(h.int("TFIELDS") == Fits.VisFields.length)
      }
      // TIMEIDX sequence is dense and ordered
      assert(hdus.tail.map(_.int("TIMEIDX")) == (0 until spec.nTimes))
    }
  }

  test("decoded rows are bit-identical to the portable generator") {
    val fromFits = load()
    val fromExpr = VisGenerator.portable(spark, spec)
    assert(fromFits.schema.map(f => (f.name, f.dataType)) ==
      fromExpr.schema.map(f => (f.name, f.dataType)))
    assert(fromFits.count() == fromExpr.count())
    // exact join on every column: dyadic values survive the big-endian
    // round trip bit-for-bit, so an exact match is required, not approximate
    val cols = fromExpr.columns.toSeq
    assert(fromExpr.join(fromFits, cols).count() == fromExpr.count())
  }

  test("time/channel pushdown prunes (file, HDU-slice) partitions") {
    // 2 files x ceil(6/2)=3 slices -> 6 partitions unfiltered
    assert(load(2).rdd.getNumPartitions == 6)
    val q = load(2).filter(col("time_idx") < 2 && col("coarse_chan") === 1)
    assert(q.rdd.getNumPartitions == 1)
    assert(q.count() ==
      2L * (spec.nAnts * (spec.nAnts + 1) / 2) * spec.nFine * spec.pols.length)
  }

  test("column pruning reaches the FITS scan") {
    val q = load().select("time_idx", "time_jd").distinct()
    val scans = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) == Seq("time_idx", "time_jd"))
    assert(q.count() == spec.nTimes)
  }
}

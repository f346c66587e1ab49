package graft.mwa

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** kwargs_for_read behaviors: flag_init, flag_choice, coarse-band removal,
  * Van Vleck shape, and the chained read. */
class ReadOpsSpec extends SparkSpec {

  private val spec = VisGenerator.Spec(nTimes = 8, nAnts = 4, nCoarse = 2, nFine = 8)
  private val layout = ReadOps.FreqLayout(spec.freq0Hz, spec.dfHz, spec.nFine)

  test("flag_init flags band edges, center channel and initial times") {
    val flagged = ReadOps.flagInit(VisGenerator.vis(spark, spec), layout)
    val pos = ReadOps.finePos(layout)
    // edge positions 0 and 7, center 4 flagged everywhere
    assert(flagged.filter(pos.isin(0, 7, 4) && !col("flag")).count() == 0)
    // first time flagged everywhere
    assert(flagged.filter(col("time_idx") === 0 && !col("flag")).count() == 0)
    // interior positions at later times unflagged
    assert(flagged.filter(pos.isin(1, 2, 3, 5, 6) && col("time_idx") > 0 &&
      col("flag")).count() == 0)
  }

  test("flag_choice None clears flags; 'original' keeps them") {
    val vis = VisGenerator.vis(spark, spec).withColumn("flag", col("time_idx") === 1)
    assert(ReadOps.applyFlagChoice(vis, None).filter(col("flag")).count() == 0)
    assert(ReadOps.applyFlagChoice(vis, Some("original"))
      .filter(col("flag")).count() > 0)
    intercept[IllegalArgumentException](ReadOps.applyFlagChoice(vis, Some("bogus")))
  }

  test("remove_coarse_band flattens a planted bandpass ripple") {
    val rippled = VisGenerator.vis(spark,
      spec.copy(bandRipple = 0.8, noiseSigma = 0.01, rfiAmp = 0, streakAmp = 0))
    val pos = ReadOps.finePos(layout)
    def spread(df: org.apache.spark.sql.DataFrame): Double = {
      val amps = df.groupBy(pos.as("p"))
        .agg(avg(sqrt(col("vis_re") * col("vis_re") + col("vis_im") * col("vis_im"))).as("a"))
        .agg(max("a"), min("a")).head
      amps.getDouble(0) / amps.getDouble(1)
    }
    assert(spread(rippled) > 1.5) // ripple visible before correction
    val corrected = ReadOps.removeCoarseBand(rippled, layout)
    assert(spread(corrected) < 1.05) // flat after
  }

  test("readChain applies the configured stages in order") {
    val cfg = GraftConfig(flagInit = true, removeCoarseBand = true,
      correctVanVleck = false, flagChoice = None)
    val out = ReadOps.readChain(VisGenerator.vis(spark, spec.copy(bandRipple = 0.5)),
      cfg, layout)
    assert(out.filter(col("time_idx") === 0 && !col("flag")).count() == 0)
    assert(out.count() == VisGenerator.vis(spark, spec).count())
  }

  test("van vleck correction is deterministic, sign-preserving, bounded") {
    val vis = VisGenerator.vis(spark, spec.copy(noiseSigma = 0.2, skyAmp = 0.3,
      rfiAmp = 0, streakAmp = 0))
    val c1 = ReadOps.correctVanVleck(vis).agg(sum("vis_re")).head.getDouble(0)
    val c2 = ReadOps.correctVanVleck(vis).agg(sum("vis_re")).head.getDouble(0)
    assert(c1 == c2)
    val signFlips = ReadOps.correctVanVleck(vis).alias("c")
      .join(vis.alias("o"), Seq("time_idx", "ant1", "ant2", "freq_hz", "pol"))
      .filter(signum(col("c.vis_re")) =!= signum(col("o.vis_re")) &&
        abs(col("o.vis_re")) > 1e-9)
      .count()
    assert(signFlips == 0)
  }
}

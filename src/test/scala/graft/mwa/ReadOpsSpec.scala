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

  test("portable bandpass removal is IEEE-exact: corrected = 2 * ungained") {
    val bpSpec = VisGenerator.Spec(nTimes = 16, nAnts = 4)
    val bpLayout = ReadOps.FreqLayout(bpSpec.freq0Hz, bpSpec.dfHz, bpSpec.nFine)
    val vis = VisGenerator.portableBandpass(spark, bpSpec)
    val corrected = ReadOps.removeCoarseBand(vis, bpLayout)
    // template mean is exactly 11.5 by construction, gains divide out
    // exactly: corrected == 2 * (raw / gain) bit-for-bit, no tolerance
    val gain = (lit(1) + ReadOps.finePos(bpLayout) % 2 * 2).cast("double")
    val bad = corrected.alias("c")
      .join(vis.alias("o"), Seq("time_idx", "ant1", "ant2", "freq_hz", "pol"))
      .filter(col("c.vis_re") =!= col("o.vis_re") / gain * 2 ||
        col("c.vis_im") =!= lit(0.0))
      .count()
    assert(bad == 0)
  }

  test("readChain applies the configured stages in order") {
    val cfg = GraftConfig(flagInit = true, removeCoarseBand = true,
      correctVanVleck = false, flagChoice = None)
    val out = ReadOps.readChain(VisGenerator.vis(spark, spec.copy(bandRipple = 0.5)),
      cfg, layout)
    assert(out.filter(col("time_idx") === 0 && !col("flag")).count() == 0)
    assert(out.count() == VisGenerator.vis(spark, spec).count())
  }

  test("van vleck: crosses follow the arcsine law, autos pass through") {
    import spark.implicits._
    // 2 ants, 1 time/freq/pol: autos p=4 and p=9 (norm=6), cross c=3
    // -> rho_hat=0.5, corrected = sin(pi/4)*6
    val vis = Seq(
      (1L, 0, 2460000.5, 0, 0, 0L, 0, 1.0e8, "XX", 4.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 1, 1, 2049L, 0, 1.0e8, "XX", 9.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 0, 1, 1L, 0, 1.0e8, "XX", 3.0, 1.5, false, 1.0))
      .toDF("obsid", "time_idx", "time_jd", "ant1", "ant2", "baseline",
        "coarse_chan", "freq_hz", "pol", "vis_re", "vis_im", "flag", "nsample")
    val out = ReadOps.correctVanVleck(vis)
      .select("ant1", "ant2", "vis_re", "vis_im")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(out((0, 0)) == ((4.0, 0.0))) // autos unchanged
    assert(out((1, 1)) == ((9.0, 0.0)))
    val (re, im) = out((0, 1))
    assert(math.abs(re - math.sin(math.Pi / 2 * 0.5) * 6.0) < 1e-15)
    assert(math.abs(im - math.sin(math.Pi / 2 * 0.25) * 6.0) < 1e-15)
  }

  test("van vleck CONTRACT: exact 1-bit inversion; named divergence from " +
      "pyuvdata's multi-level correction") {
    import spark.implicits._
    def mkVis(cross: Double) = Seq(
      (1L, 0, 2460000.5, 0, 0, 0L, 0, 1.0e8, "XX", 4.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 1, 1, 2049L, 0, 1.0e8, "XX", 9.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 0, 1, 1L, 0, 1.0e8, "XX", cross, 0.0, false, 1.0))
      .toDF("obsid", "time_idx", "time_jd", "ant1", "ant2", "baseline",
        "coarse_chan", "freq_hz", "pol", "vis_re", "vis_im", "flag", "nsample")
    def corrected(cross: Double): Double =
      ReadOps.correctVanVleck(mkVis(cross))
        .filter(col("ant1") =!= col("ant2"))
        .select("vis_re").head.getDouble(0)
    // (1) the curve is certified against the PUBLISHED law, not its own
    // output: a hard (1-bit) quantizer measures m = (2/pi)*asin(rho)
    // (Van Vleck & Middleton 1966); feeding that measurement in must
    // recover the true rho exactly
    val rho = 0.6
    val m = 2.0 / math.Pi * math.asin(rho)
    assert(math.abs(corrected(m * 6.0) - rho * 6.0) < 1e-12,
      "arcsine inversion must invert the 1-bit quantizer law")
    // (2) the DIVERGENCE, named and sized: pyuvdata's mwa_corr_fits
    // implements the MULTI-LEVEL (4+4-bit integer) correction, whose
    // quantization bias vanishes as levels grow — the correct multi-level
    // correction of a small coefficient tends to the identity. The 1-bit
    // law instead scales small coefficients by sin(pi/2 m)/m -> pi/2
    // (~1.5708x). This pins that worst-case over-correction factor: the
    // contract is the 1966 arcsine law; enabling it on many-level data
    // inflates weak correlations by up to this factor. (Implementing the
    // true MWA integer-level curve needs pyuvdata's reference outputs to
    // certify against, which are unavailable offline — same evidence bar
    // as the ms descope.)
    val tiny = 0.01
    assert(math.abs(corrected(tiny * 6.0) / (tiny * 6.0) - math.Pi / 2) < 1e-3,
      "small-coefficient over-correction factor must be pi/2")
  }

  test("van vleck: clamps |rho|>1 and keeps raw value on non-positive autos") {
    import spark.implicits._
    val vis = Seq(
      // autos 1 and 1 -> norm 1; cross 2 -> rho clamps to 1 -> corrected 1
      (1L, 0, 2460000.5, 0, 0, 0L, 0, 1.0e8, "XX", 1.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 1, 1, 2049L, 0, 1.0e8, "XX", 1.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 0, 1, 1L, 0, 1.0e8, "XX", 2.0, 0.0, false, 1.0),
      // negative auto power at freq 2e8 -> cross kept raw
      (1L, 0, 2460000.5, 0, 0, 0L, 1, 2.0e8, "XX", -1.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 1, 1, 2049L, 1, 2.0e8, "XX", 4.0, 0.0, false, 1.0),
      (1L, 0, 2460000.5, 0, 1, 1L, 1, 2.0e8, "XX", 0.5, 0.0, false, 1.0))
      .toDF("obsid", "time_idx", "time_jd", "ant1", "ant2", "baseline",
        "coarse_chan", "freq_hz", "pol", "vis_re", "vis_im", "flag", "nsample")
    val out = ReadOps.correctVanVleck(vis)
      .filter(col("ant1") =!= col("ant2"))
      .select("freq_hz", "vis_re").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(1.0e8) == 1.0) // sin(pi/2 * 1) * 1
    assert(out(2.0e8) == 0.5) // guard: raw
  }

  test("van vleck correction is deterministic and sign-preserving") {
    val vis = VisGenerator.vis(spark, spec.copy(noiseSigma = 0.2, skyAmp = 0.3,
      rfiAmp = 0, streakAmp = 0))
    // per-ROW bit equality across two evaluations — an aggregate sum would
    // also fold in shuffle-fetch arrival order, which is not deterministic
    // under load and is not the correction's property being pinned here
    val key = Seq("time_idx", "ant1", "ant2", "freq_hz", "pol")
    val c1 = ReadOps.correctVanVleck(vis).alias("a")
    val c2 = ReadOps.correctVanVleck(vis).alias("b")
    val diff = c1.join(c2, key)
      .filter(col("a.vis_re") =!= col("b.vis_re") ||
        col("a.vis_im") =!= col("b.vis_im"))
      .count()
    assert(diff == 0)
    // sin(pi/2 * clamp(rho)) has rho's sign, and the raw-value guard is
    // trivially sign-preserving
    val signFlips = ReadOps.correctVanVleck(vis).alias("c")
      .join(vis.alias("o"), Seq("time_idx", "ant1", "ant2", "freq_hz", "pol"))
      .filter(signum(col("c.vis_re")) =!= signum(col("o.vis_re")) &&
        abs(col("o.vis_re")) > 1e-9)
      .count()
    assert(signFlips == 0)
  }
}

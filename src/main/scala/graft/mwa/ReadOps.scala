package graft.mwa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The remaining `kwargs_for_read` behaviors (`configurators.py:216-225`)
  * as executable vis transforms — in the reference these run inside
  * pyuvdata/SSINS during the read; here they are declarative stages
  * applied between the scan and the select surface.
  *
  * Channel positions are derived arithmetically from the frequency axis
  * (`fine_pos = round((freq_hz - freq0) / df) mod nFine`) — a pure column
  * expression, no shuffle — so every stage stays a scan-side map.
  */
object ReadOps {

  final case class FreqLayout(freq0Hz: Double, dfHz: Double, nFine: Int)

  def finePos(layout: FreqLayout): Column =
    pmod(round((col("freq_hz") - layout.freq0Hz) / layout.dfHz, 0).cast("long"),
      lit(layout.nFine)).cast("int")

  /** `flag_init` (MWA convention, public SSINS/pyuvdata semantics): flag
    * the coarse-band edge fine channels, the coarse-band center fine
    * channel, and the first `initTimes` integrations — the samples known
    * a-priori to be corrupted by the polyphase filterbank roll-off and
    * receiver settling. */
  def flagInit(vis: DataFrame, layout: FreqLayout,
               edgeChannels: Int = 1, flagCenter: Boolean = true,
               initTimes: Int = 1): DataFrame = {
    val pos = finePos(layout)
    val edge = pos < edgeChannels || pos >= layout.nFine - edgeChannels
    val center = if (flagCenter) pos === layout.nFine / 2 else lit(false)
    vis.withColumn("flag",
      col("flag") || edge || center || col("time_idx") < initTimes)
  }

  /** `flag_choice`: "original" keeps the flags that came with the data;
    * None clears them before analysis (SSINS semantics). */
  def applyFlagChoice(vis: DataFrame, choice: Option[String]): DataFrame =
    choice match {
      case Some("original") => vis
      case None => vis.withColumn("flag", lit(false))
      case Some(other) =>
        throw new IllegalArgumentException(s"Unknown flag_choice: $other")
    }

  /** `remove_coarse_band`: divide out the coarse-band shape — the
    * per-fine-position gain template of the polyphase filterbank. The
    * template is estimated from the data itself (mean unflagged amplitude
    * per fine position, normalized to unit mean) and applied with a
    * broadcast join: one tiny aggregation + a map stage, no wide shuffle
    * of the vis table. */
  def removeCoarseBand(vis: DataFrame, layout: FreqLayout): DataFrame = {
    val withPos = vis.withColumn("__pos", finePos(layout))
    val amp = sqrt(col("vis_re") * col("vis_re") + col("vis_im") * col("vis_im"))
    val template = withPos
      .groupBy("__pos")
      .agg(avg(when(!col("flag"), amp)).as("__gain"))
    val meanGain = template.agg(avg("__gain")).head().getDouble(0)
    withPos
      .join(broadcast(template), Seq("__pos"))
      .withColumn("__g", col("__gain") / meanGain)
      .withColumn("vis_re", col("vis_re") / col("__g"))
      .withColumn("vis_im", col("vis_im") / col("__g"))
      .drop("__pos", "__gain", "__g")
  }

  /** `correct_van_vleck`: quantization-bias correction. The exact MWA
    * correction integrates the 4+4-bit quantizer transfer function
    * (mwalib/pyuvdata carry lookup tables); here the standard continuous
    * arcsine-law approximation corrects the correlation amplitude —
    * the Spark-side shape (per-row scalar map, codegen-friendly) is what
    * a table-driven kernel would drop into. */
  def correctVanVleck(vis: DataFrame, sigmaQ: Double = 1.0): DataFrame = {
    val scale = lit(2.0 / math.Pi) * lit(sigmaQ * sigmaQ)
    def corrected(c: Column): Column = {
      val rho = (c / (sigmaQ * sigmaQ)).cast("double")
      // clamp into asin's domain; identity-like for small correlations
      scale * asin(greatest(lit(-1.0), least(lit(1.0), rho * (math.Pi / 2) / lit(1.0))))
    }
    vis.withColumn("vis_re", corrected(col("vis_re")))
      .withColumn("vis_im", corrected(col("vis_im")))
  }

  /** The full read chain in the reference's kwargs_for_read order:
    * flag_choice -> flag_init -> van-vleck -> coarse-band removal. The
    * select surface and diff follow (VisOps). */
  def readChain(vis: DataFrame, config: GraftConfig, layout: FreqLayout): DataFrame = {
    var df = applyFlagChoice(vis, config.flagChoice)
    if (config.flagInit) df = flagInit(df, layout)
    if (config.correctVanVleck) df = correctVanVleck(df)
    if (config.removeCoarseBand) df = removeCoarseBand(df, layout)
    df
  }
}

package graft.mwa

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed data model mirroring the reference's fixed schemas.
  *
  * Schemas derive from the reference's metadata extractors:
  *  - FileEntry:      `src/mwa_utils/utils.py:92-97` (obsid, channel,
  *    file_path, file_type) plus size_mb (`utils.py:172-188`).
  *  - CoarseChannel:  `src/mwa_utils/utils.py:136-142`.
  *  - Antenna:        `src/mwa_utils/utils.py:150-168` (flagged =
  *    rfinput_x.flagged OR rfinput_y.flagged, utils.py:160; rec_type
  *    enum-prefix stripped, utils.py:166-168).
  *  - GraftConfig:    `src/mwa_utils/configurators.py:65-97` (read
  *    options, select options, INS/MF thresholds).
  */
final case class FileEntry(
    obsid: String,
    channel: Option[Int],
    file_path: String,
    file_type: String,
    size_mb: Long)

final case class CoarseChannel(
    obsid: Long,
    gpubox_number: Int,
    rec_chan_number: Int,
    chan_start_hz: Double,
    chan_centre_hz: Double,
    chan_end_hz: Double)

final case class Antenna(
    obsid: Long,
    ant: Int,
    tile_id: Int,
    tile_name: String,
    electrical_length_m: Double,
    east_m: Double,
    north_m: Double,
    height_m: Double,
    flagged: Boolean,
    rec_number: Int,
    flavour: String,
    has_whitening_filter: Boolean,
    rec_type: String)

/** One row per (time, baseline, freq, pol): the long-format visibility
  * fact table (SURVEY §1.3). Complex values split re/im — Spark has no
  * complex type, and two double columns stay codegen-friendly where a
  * struct would box. */
final case class Vis(
    obsid: Long,
    time_idx: Int,
    time_jd: Double,
    ant1: Int,
    ant2: Int,
    baseline: Long,
    coarse_chan: Int,
    freq_hz: Double,
    pol: String,
    vis_re: Double,
    vis_im: Double,
    flag: Boolean,
    nsample: Double)

sealed abstract class SpectrumType(val name: String)
object SpectrumType {
  case object All extends SpectrumType("all")
  case object Auto extends SpectrumType("auto")
  case object Cross extends SpectrumType("cross")
}

sealed abstract class OnError(val name: String)
object OnError {
  case object Raise extends OnError("raise")
  case object Warn extends OnError("warn")
  case object Ignore extends OnError("ignore")
}

/** Flat configuration record mirroring `configurators.py:65-97`. */
final case class GraftConfig(
    // read options (kwargs_for_read, configurators.py:216-225)
    diff: Boolean = true,
    flagInit: Boolean = true,
    removeCoarseBand: Boolean = false,
    correctVanVleck: Boolean = false,
    removeFlaggedAnts: Boolean = true,
    flagChoice: Option[String] = None, // "original" | None
    // select options (configurators.py:73-78)
    selAnts: Seq[Int] = Nil,
    skipAnts: Seq[Int] = Nil,
    selPols: Seq[String] = Nil,
    freqRange: Option[(Double, Double)] = None,
    timeLimit: Option[Int] = None,
    // common
    suffix: String = "",
    // INS options (configurators.py:86)
    spectrumType: SpectrumType = SpectrumType.Cross,
    // MF options (configurators.py:89-92)
    threshold: Double = 5.0,
    narrow: Double = 7.0,
    streak: Double = 8.0,
    tbAggro: Double = 0.6,
    // named sub-band shapes (freq_hz lo..hi inclusive), tested at
    // `threshold` — the SSINS shape_dict surface (generic shapes tier)
    shapes: Map[String, (Double, Double)] = Map.empty) {

  /** Derived suffix, mirroring `configurators.py:125-134` exactly. */
  def derivedSuffix: String = {
    var s = suffix
    if (spectrumType != SpectrumType.All && s.isEmpty) s = s".${spectrumType.name}"
    if (diff) s = s".diff$s"
    if (selAnts.length == 1) s += s".${selAnts.head}"
    else if (skipAnts.length == 1) s += s".no${skipAnts.head}"
    if (selPols.length == 1) s += s".${selPols.head}"
    s
  }
}

object Model {
  /** Supported extension set (`configurators.py:43-48`). */
  val supportedTypes: Set[String] = Set("fits", "metafits", "ms", "uvfits", "uvf", "uvh5")

  /** C5 as a COLUMN expression: the derived-suffix synthesis
    * (`configurators.py:125-134`) over relational config rows, so suffix
    * derivation can run for millions of stored configurations in one scan
    * instead of a driver loop. Branch-for-branch twin of
    * [[GraftConfig.derivedSuffix]]; `mwa24_suffix` pins the two against
    * each other AND against a cross-engine SQL oracle. */
  def suffixColumn(spectrumType: Column, diff: Column, selAnts: Column,
                   skipAnts: Column, selPols: Column, base: Column): Column = {
    val s1 = when(spectrumType =!= "all" && base === "",
      concat(lit("."), spectrumType)).otherwise(base)
    val s2 = when(diff, concat(lit(".diff"), s1)).otherwise(s1)
    val s3 = when(size(selAnts) === 1,
        concat(s2, lit("."), element_at(selAnts, 1).cast("string")))
      .when(size(skipAnts) === 1,
        concat(s2, lit(".no"), element_at(skipAnts, 1).cast("string")))
      .otherwise(s2)
    when(size(selPols) === 1, concat(s3, lit("."), element_at(selPols, 1)))
      .otherwise(s3)
  }

  /** Batch-count formula (`utils.py:20-47`): planning-time heuristic for
    * memory-bounded splitting. Survives in the rebuild only as a sizing
    * note — Spark bounds memory via maxPartitionBytes + spill — but is
    * kept (and tested) for parity with the reference contract. */
  def computeOptimalBatches(sizeGb: Long, leakageFactor: Long = 7, availMemGb: Long): Long = {
    require(sizeGb > 0, "File size must be greater than 0")
    val predicted = sizeGb * leakageFactor
    if (predicted < availMemGb) 1L else (predicted / availMemGb) * 2L
  }
}

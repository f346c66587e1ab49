package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.mwa.VisGenerator.Spec

/** DataSource V2 for the synthetic visibility table: `format("graft-vis")`.
  *
  * This is the SURVEY §2.1 S2 Phase-2 shape: a custom TableProvider whose
  * Batch plans ONE InputPartition PER (coarse_chan, time-slice) — exactly
  * the two axes the reference's batched reader splits work by
  * (`processors.py:166-172`, gpubox files × time batches) — so a real
  * correlator-format reader drops in by replacing the row kernel with a
  * file decoder, keeping the planning identical. Implements
  * SupportsPushDownRequiredColumns, so narrow projections (e.g. the
  * metadata-only time scan, S3) never materialize payload columns.
  *
  * Values are bit-identical to VisGenerator.vis: VisKernel reproduces the
  * Catalyst xxhash64 seed chain of the column-expression generator.
  */
class VisSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-vis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VisSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VisTable(VisSource.specFrom(new CaseInsensitiveStringMap(properties)))
}

/** One gpubox FITS file of an observation: its coarse channel and the
  * geometry keywords from its primary header (parsed once, driver-side,
  * at planning time — the reference's manifest scan). */
case class FitsFileMeta(path: String, obsid: Long, coarseChan: Int,
                        nTimes: Int, nFine: Int,
                        freq0Hz: Double, dfHz: Double,
                        jd0: Double, dtDays: Double)

object FitsFileMeta {
  def fromPrimary(path: String): FitsFileMeta = {
    val h = graft.mwa.Fits.readHeaders(path).head
    FitsFileMeta(path, h.long("OBSID"), h.int("COARSE"), h.int("NTIMES"),
      h.int("NFINE"), h.double("FREQ0"), h.double("DFHZ"),
      h.double("JD0"), h.double("DTDAYS"))
  }
}

object VisSource {
  val schema: StructType = StructType(Seq(
    StructField("obsid", LongType, nullable = false),
    StructField("time_idx", IntegerType, nullable = false),
    StructField("time_jd", DoubleType, nullable = false),
    StructField("ant1", IntegerType, nullable = false),
    StructField("ant2", IntegerType, nullable = false),
    StructField("baseline", LongType, nullable = false),
    StructField("coarse_chan", IntegerType, nullable = false),
    StructField("freq_hz", DoubleType, nullable = false),
    StructField("pol", StringType, nullable = false),
    StructField("vis_re", DoubleType, nullable = false),
    StructField("vis_im", DoubleType, nullable = false),
    StructField("flag", BooleanType, nullable = false),
    StructField("nsample", DoubleType, nullable = false)))

  def specFrom(o: CaseInsensitiveStringMap): Spec = Spec(
    obsid = o.getLong("obsid", Spec().obsid),
    nTimes = o.getInt("ntimes", Spec().nTimes),
    nAnts = o.getInt("nants", Spec().nAnts),
    nCoarse = o.getInt("ncoarse", Spec().nCoarse),
    nFine = o.getInt("nfine", Spec().nFine),
    seed = o.getLong("seed", Spec().seed),
    noiseSigma = o.getDouble("noisesigma", Spec().noiseSigma))

  def timeSlice(o: CaseInsensitiveStringMap): Int = o.getInt("timeslice", 4)

  def path(o: CaseInsensitiveStringMap): Option[String] =
    Option(o.get("path")).filter(_.nonEmpty)
}

class VisTable(spec: Spec) extends Table with SupportsRead {
  override def name(): String = s"graft_vis_${spec.obsid}"
  override def schema(): StructType = VisSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VisScanBuilder(VisSource.specFrom(options), VisSource.timeSlice(options),
      VisSource.path(options))
}

class VisScanBuilder(spec: Spec, slice: Int, path: Option[String] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = VisSource.schema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept simple comparisons on the two partition axes (time_idx,
    * coarse_chan) — the reference's `times=…`/gpubox-file selection pushed
    * into the reader (`processors.py:170-172`). Everything is ALSO returned
    * as a residual for Spark to re-check: pushdown here prunes partitions,
    * it does not take over row-level evaluation. */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters.filter(VisScan.supported)
    filters
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = path match {
    case Some(p) if UvfitsVisScan.hasUvfits(p) =>
      new UvfitsVisScan(p, slice, required, pushed)
    case Some(p) if Uvh5VisScan.hasUvh5(p) =>
      new Uvh5VisScan(p, slice, required, pushed)
    case Some(p) if MsFormat.hasMs(p) => throw MsFormat.unsupported(p)
    case Some(p) => new FitsVisScan(p, slice, required, pushed)
    case None => new VisScan(spec, slice, required, pushed)
  }
}

/** CASA MeasurementSet: typed + validated as an input family
  * (`mwa/FileSet.scala`, `mwa/Validation.scala` — the reference accepts
  * `ms` through pyuvdata, `configurators.py:43-48`) but DELIBERATELY not
  * decoded. The deciding difference from the uvfits/uvh5 decoders: FITS
  * and HDF5 are publicly SPECIFIED, self-describing container formats
  * (NASA FITS standard; the HDF5 file-format spec), so a from-scratch
  * decoder can be written to the spec and certified by round-trip. The
  * CASA Table Data System's on-disk layout (AipsIO object streams +
  * StandardStMan bucket files across a directory of tables) is defined
  * only by the casacore implementation — no byte-level spec exists to
  * build against, and with no casacore available there are no
  * reference-written bytes to certify a decoder against. A decoder that
  * merely round-trips its own guess at that layout would CLAIM
  * casacore compatibility without evidence; failing loudly with the
  * conversion path (every MS exports losslessly to uvfits/uvh5, both
  * decoded natively here) is the honest contract. */
object MsFormat {
  def listMs(path: String): Seq[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.endsWith(".ms"))
      .sortBy(_.getName).map(_.getPath).toSeq
  def hasMs(path: String): Boolean = listMs(path).nonEmpty
  def unsupported(path: String): MsNotSupportedException =
    new MsNotSupportedException(
      s"CASA MeasurementSet input is typed and validated but not decoded " +
        s"(found: ${listMs(path).mkString(", ")}). The CASA Table Data " +
        "System has no public byte-level specification to decode against " +
        "(its layout is defined by the casacore implementation only). " +
        "Convert to uvfits or uvh5 — both are decoded natively by this " +
        "source (e.g. pyuvdata: UVData.from_file(ms).write_uvh5(...)).")
}

class MsNotSupportedException(msg: String)
    extends UnsupportedOperationException(msg)

object VisScan {
  private val axes = Set("time_idx", "coarse_chan")
  def supported(f: sources.Filter): Boolean = f match {
    case sources.EqualTo(a, _) => axes(a)
    case sources.LessThan(a, _) => axes(a)
    case sources.LessThanOrEqual(a, _) => axes(a)
    case sources.GreaterThan(a, _) => axes(a)
    case sources.GreaterThanOrEqual(a, _) => axes(a)
    case sources.In(a, _) => axes(a)
    case _ => false
  }

  /** Does value v satisfy filter f on axis `name`? (non-matching filters
    * pass vacuously — they constrain the other axis) */
  private def sat(f: sources.Filter, name: String, v: Int): Boolean = f match {
    case sources.EqualTo(a, x: Int) if a == name => v == x
    case sources.LessThan(a, x: Int) if a == name => v < x
    case sources.LessThanOrEqual(a, x: Int) if a == name => v <= x
    case sources.GreaterThan(a, x: Int) if a == name => v > x
    case sources.GreaterThanOrEqual(a, x: Int) if a == name => v >= x
    case sources.In(a, xs) if a == name => xs.exists(_ == v)
    case _ => true
  }

  def keepPartition(p: VisPartition, pushed: Array[sources.Filter]): Boolean =
    keepSlice(p.coarseChan, p.timeStart, p.timeEnd, pushed)

  /** Time-axis-only pruning for partitions that span every coarse channel
    * (uvfits groups carry the whole frequency axis per visibility). */
  def keepTimeSlice(timeStart: Int, timeEnd: Int,
                    pushed: Array[sources.Filter]): Boolean =
    (timeStart until timeEnd).exists(t =>
      pushed.forall(f => sat(f, "time_idx", t)))

  def keepSlice(coarseChan: Int, timeStart: Int, timeEnd: Int,
                pushed: Array[sources.Filter]): Boolean =
    pushed.forall(f => sat(f, "coarse_chan", coarseChan)) &&
      (timeStart until timeEnd).exists(t =>
        pushed.forall(f => sat(f, "time_idx", t)))
}

class VisScan(spec: Spec, slice: Int, required: StructType,
              pushed: Array[sources.Filter] = Array.empty) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-vis PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    (for {
      chan <- 0 until spec.nCoarse
      t0 <- 0 until spec.nTimes by slice
      p = VisPartition(chan, t0, math.min(t0 + slice, spec.nTimes))
      if VisScan.keepPartition(p, pushed)
    } yield p: InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new VisReaderFactory(spec, required)
}

case class VisPartition(coarseChan: Int, timeStart: Int, timeEnd: Int)
    extends InputPartition

class VisReaderFactory(spec: Spec, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VisPartitionReader(partition.asInstanceOf[VisPartition], spec, required)
}

class VisPartitionReader(part: VisPartition, spec: Spec, required: StructType)
    extends PartitionReader[InternalRow] {
  private val baselines =
    (for (a1 <- 0 until spec.nAnts; a2 <- a1 until spec.nAnts) yield (a1, a2)).toArray
  private val fieldIdx = required.fieldNames.map(n =>
    n -> VisSource.schema.fieldIndex(n)).toMap
  private val it: Iterator[InternalRow] = for {
    t <- (part.timeStart until part.timeEnd).iterator
    (a1, a2) <- baselines.iterator
    f <- (0 until spec.nFine).iterator
    pol <- spec.pols.iterator
  } yield makeRow(t, a1, a2, part.coarseChan * spec.nFine + f, pol)
  private var current: InternalRow = _

  private def makeRow(t: Int, a1: Int, a2: Int, freqIdx: Int, pol: String): InternalRow = {
    val baseline = a1.toLong * 2048 + a2
    val k = VisKernel
    val sky = k.uniform(spec.seed, 1, None, baseline, freqIdx, pol) * spec.skyAmp
    val narrow = if (freqIdx == spec.rfiFreqIdx &&
      t >= spec.rfiTimes._1 && t <= spec.rfiTimes._2) spec.rfiAmp else 0.0
    val streak = if (t == spec.streakTime) spec.streakAmp else 0.0
    val gain = 1.0 + spec.bandRipple *
      math.sin(math.Pi * (freqIdx % spec.nFine) / (spec.nFine - 1))
    val re = gain * (sky + narrow + streak +
      k.gaussian(spec.seed, 3, Some(t), baseline, freqIdx, pol) * spec.noiseSigma)
    val im = gain * (sky + narrow + streak +
      k.gaussian(spec.seed, 5, Some(t), baseline, freqIdx, pol) * spec.noiseSigma)
    val full: Array[Any] = Array(
      spec.obsid, t, spec.jd0 + t * spec.dtDays, a1, a2, baseline,
      freqIdx / spec.nFine, spec.freq0Hz + freqIdx * spec.dfHz,
      UTF8String.fromString(pol), re, im, false, 1.0)
    new GenericInternalRow(required.fieldNames.map(n => full(fieldIdx(n))))
  }

  override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

// ------------------------------------------------------- FITS-backed variant

/** Scan over real gpubox FITS files (option `path`): plans one partition
  * per (file=coarse channel, time-slice) from the primary headers —
  * driver-side metadata only, no payload bytes — and lets the pushed
  * time_idx/coarse_chan filters prune whole files and HDU ranges before
  * any data is opened. This is the same planning shape the synthetic scan
  * uses, with the row kernel replaced by the binary-table decoder. */
class FitsVisScan(path: String, slice: Int, required: StructType,
                  pushed: Array[sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-vis fits path=$path PushedFilters: [${pushed.mkString(", ")}]"

  private lazy val files: Seq[FitsFileMeta] = {
    val dir = new java.io.File(path)
    val fits = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".fits")).sortBy(_.getName)
    require(fits.nonEmpty, s"No .fits files under $path")
    fits.toSeq.map(f => FitsFileMeta.fromPrimary(f.getPath))
  }

  override def planInputPartitions(): Array[InputPartition] =
    (for {
      m <- files
      t0 <- 0 until m.nTimes by slice
      p = FitsVisPartition(m, t0, math.min(t0 + slice, m.nTimes))
      if VisScan.keepSlice(m.coarseChan, p.timeStart, p.timeEnd, pushed)
    } yield p: InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new FitsReaderFactory(required)
}

case class FitsVisPartition(meta: FitsFileMeta, timeStart: Int, timeEnd: Int)
    extends InputPartition

class FitsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FitsPartitionReader(partition.asInstanceOf[FitsVisPartition], required)
}

/** Decodes the BINTABLE HDUs whose TIMEIDX falls in this partition's
  * slice. Headers are walked sequentially (cheap: 2880-byte records);
  * only in-slice data units are read. */
class FitsPartitionReader(part: FitsVisPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  import graft.mwa.Fits

  private val m = part.meta
  private val raf = new java.io.RandomAccessFile(m.path, "r")
  private val fieldIdx = required.fieldNames.map(n =>
    n -> VisSource.schema.fieldIndex(n)).toMap

  private val hdus: Seq[Fits.Header] = {
    val out = Seq.newBuilder[Fits.Header]
    var off = 0L
    var h = Fits.readHeader(raf, off)
    while (h.isDefined) {
      val hd = h.get
      if (hd.has("TIMEIDX") &&
        hd.int("TIMEIDX") >= part.timeStart && hd.int("TIMEIDX") < part.timeEnd)
        out += hd
      off = hd.nextHduOffset
      h = Fits.readHeader(raf, off)
    }
    out.result()
  }

  private val colOf = Fits.VisFields.map(_.name).zipWithIndex.toMap

  private val it: Iterator[InternalRow] = hdus.iterator.flatMap { h =>
    val t = h.int("TIMEIDX")
    val jd = h.double("TIMEJD")
    Fits.readRows(raf, h).map { r =>
      val a1 = r(colOf("ANT1")).asInstanceOf[Int]
      val a2 = r(colOf("ANT2")).asInstanceOf[Int]
      val fine = r(colOf("FINECH")).asInstanceOf[Int]
      val freqIdx = m.coarseChan * m.nFine + fine
      val full: Array[Any] = Array(
        m.obsid, t, jd, a1, a2, a1.toLong * 2048 + a2,
        m.coarseChan, m.freq0Hz + freqIdx * m.dfHz,
        UTF8String.fromString(r(colOf("POL")).asInstanceOf[String]),
        r(colOf("VISRE")).asInstanceOf[Double],
        r(colOf("VISIM")).asInstanceOf[Double],
        r(colOf("FLAG")).asInstanceOf[Boolean],
        r(colOf("NSAMP")).asInstanceOf[Double])
      new GenericInternalRow(required.fieldNames.map(n => full(fieldIdx(n))))
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = raf.close()
}

// ----------------------------------------------------- uvfits-backed variant

/** One uvfits (FITS random-groups) file: whole-observation geometry from
  * the primary header — parsed driver-side at planning time, like the
  * gpubox manifest scan. */
case class UvfitsFileMeta(path: String, obsid: Long, nTimes: Int, nAnts: Int,
                          nFine: Int, nCoarse: Int, pols: Seq[String],
                          freq0Hz: Double, dfHz: Double,
                          jd0: Double, dtDays: Double)

object UvfitsFileMeta {
  def fromPrimary(path: String): UvfitsFileMeta = {
    val h = graft.mwa.Fits.readHeaders(path).head
    require(h.has("GROUPS") && h.int("PCOUNT") > 0,
      s"$path is not a FITS random-groups (uvfits) file")
    UvfitsFileMeta(path, h.long("OBSID"), h.int("NTIMES"), h.int("NANTS"),
      h.int("NFINE"), h.int("NCOARSE"), h.str("POLS").split(',').toSeq,
      h.double("FREQ0"), h.double("DFHZ"), h.double("JD0"), h.double("DTDAYS"))
  }
}

/** Scan over uvfits files: one partition per (file, time-slice). A group is
  * one (time, baseline) visibility carrying the full frequency axis, so the
  * time axis prunes by direct seek (fixed group size) while coarse_chan
  * filters stay residual — Spark re-checks them row-level, the scan just
  * cannot skip bytes for them (the reference's pyuvdata read has the same
  * shape: `select` on times subsets groups, frequencies post-filter). */
class UvfitsVisScan(path: String, slice: Int, required: StructType,
                    pushed: Array[sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-vis uvfits path=$path PushedFilters: [${pushed.mkString(", ")}]"

  private lazy val files: Seq[UvfitsFileMeta] = {
    val uv = UvfitsVisScan.listUvfits(path)
    require(uv.nonEmpty, s"No .uvfits files under $path")
    uv.map(f => UvfitsFileMeta.fromPrimary(f))
  }

  override def planInputPartitions(): Array[InputPartition] =
    (for {
      m <- files
      t0 <- 0 until m.nTimes by slice
      p = UvfitsVisPartition(m, t0, math.min(t0 + slice, m.nTimes))
      if VisScan.keepTimeSlice(p.timeStart, p.timeEnd, pushed)
    } yield p: InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new UvfitsReaderFactory(required)
}

object UvfitsVisScan {
  def listUvfits(path: String): Seq[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".uvfits")).sortBy(_.getName).map(_.getPath).toSeq
  def hasUvfits(path: String): Boolean = listUvfits(path).nonEmpty
}

case class UvfitsVisPartition(meta: UvfitsFileMeta, timeStart: Int, timeEnd: Int)
    extends InputPartition

class UvfitsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new UvfitsPartitionReader(partition.asInstanceOf[UvfitsVisPartition], required)
}

/** Decodes the random groups of this partition's time-slice: seeks straight
  * to group timeStart*nBaselines (no bytes touched for pruned times),
  * unpacks the AIPS baseline code and DATE offset, and emits one row per
  * (freq, pol) cell of each group. time_idx/time_jd are re-derived from the
  * header's time grid so float32 DATE rounding cannot leak into the output. */
class UvfitsPartitionReader(part: UvfitsVisPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  import graft.mwa.Fits

  private val m = part.meta
  private val raf = new java.io.RandomAccessFile(m.path, "r")
  private val fieldIdx = required.fieldNames.map(n =>
    n -> VisSource.schema.fieldIndex(n)).toMap
  private val head = Fits.readHeader(raf, 0L).getOrElse(
    throw new IllegalStateException(s"empty FITS file ${m.path}"))
  private val nBl = Fits.Uvfits.nBaselines(m.nAnts)
  private val nPol = m.pols.length
  private val nFreq = m.nCoarse * m.nFine
  private val polU = m.pols.map(UTF8String.fromString).toArray

  private val it: Iterator[InternalRow] =
    Fits.Uvfits.readGroups(raf, head, part.timeStart * nBl, part.timeEnd * nBl)
      .flatMap { case (params, data) =>
        val bl = math.round(params(3)).toInt
        val a1 = bl / 256 - 1
        val a2 = bl % 256 - 1
        val t = math.round(params(4) / m.dtDays).toInt
        val jd = m.jd0 + t * m.dtDays
        for (f <- (0 until nFreq).iterator; pi <- (0 until nPol).iterator) yield {
          val base = (f * nPol + pi) * 3
          val wt = data(base + 2)
          val full: Array[Any] = Array(
            m.obsid, t, jd, a1, a2, a1.toLong * 2048 + a2,
            f / m.nFine, m.freq0Hz + f * m.dfHz, polU(pi),
            data(base).toDouble, data(base + 1).toDouble,
            wt <= 0f, math.abs(wt).toDouble)
          new GenericInternalRow(required.fieldNames.map(n => full(fieldIdx(n))))
        }
      }

  private var current: InternalRow = _
  override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = raf.close()
}

// ------------------------------------------------------ uvh5-backed variant

/** One uvh5 file's planning metadata, parsed driver-side from the HDF5
  * /Header datasets (scalars + the tiny freq/pol arrays — no /Data bytes
  * are touched at planning time). */
case class Uvh5FileMeta(path: String, obsid: Long, nTimes: Int, nBls: Int,
                        nFine: Int, freqs: Array[Double], pols: Seq[String],
                        jd0: Double, dtDays: Double)

object Uvh5FileMeta {
  def fromHeader(path: String): Uvh5FileMeta = {
    import graft.mwa.Hdf5
    val ds = Hdf5.datasets(path)
    def scalar(n: String): Long = Hdf5.scalarLong(path, ds(s"Header/$n"))
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val nBls = scalar("Nbls").toInt
      val nFreq = scalar("Nfreqs").toInt
      val nPol = scalar("Npols").toInt
      val freqs = Hdf5.readDoubles(raf, ds("Header/freq_array"), 0, nFreq)
      val pols = Hdf5.readLongs(raf, ds("Header/polarization_array"), 0, nPol)
        .map(graft.mwa.Uvh5.PolName).toSeq
      // time grid from the blt-major time_array: jd0 = first entry, dt =
      // first step (one row per baseline per time, time-major)
      val t01 = Hdf5.readDoubles(raf, ds("Header/time_array"), 0, 1) ++
        Hdf5.readDoubles(raf, ds("Header/time_array"), nBls.toLong, 1)
      Uvh5FileMeta(path, scalar("obsid"), scalar("Ntimes").toInt, nBls,
        scalar("nfine").toInt, freqs, pols, t01(0), t01(1) - t01(0))
    } finally raf.close()
  }
}

/** Scan over uvh5 (HDF5) files: one partition per (file, time-slice).
  * The /Data arrays are blt-major with contiguous layout, so a
  * time-slice is a contiguous element range of every dataset — pruning
  * is a seek, exactly like the uvfits group seek; coarse_chan filters
  * stay residual (each blt row carries the whole frequency axis). */
class Uvh5VisScan(path: String, slice: Int, required: StructType,
                  pushed: Array[sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-vis uvh5 path=$path PushedFilters: [${pushed.mkString(", ")}]"

  private lazy val files: Seq[Uvh5FileMeta] = {
    val uv = Uvh5VisScan.listUvh5(path)
    require(uv.nonEmpty, s"No .uvh5 files under $path")
    uv.map(Uvh5FileMeta.fromHeader)
  }

  override def planInputPartitions(): Array[InputPartition] =
    (for {
      m <- files
      t0 <- 0 until m.nTimes by slice
      p = Uvh5VisPartition(m, t0, math.min(t0 + slice, m.nTimes))
      if VisScan.keepTimeSlice(p.timeStart, p.timeEnd, pushed)
    } yield p: InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new Uvh5ReaderFactory(required)
}

object Uvh5VisScan {
  def listUvh5(path: String): Seq[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".uvh5")).sortBy(_.getName).map(_.getPath).toSeq
  def hasUvh5(path: String): Boolean = listUvh5(path).nonEmpty
}

case class Uvh5VisPartition(meta: Uvh5FileMeta, timeStart: Int, timeEnd: Int)
    extends InputPartition

class Uvh5ReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Uvh5PartitionReader(partition.asInstanceOf[Uvh5VisPartition], required)
}

/** Decodes the blt rows of this partition's time-slice: one bulk read per
  * /Data dataset over the contiguous element range [blt0*F*P, blt1*F*P)
  * — bytes outside the slice are never touched. time_idx is the blt's
  * time ordinal (blt / Nbls), bit-identical to the other decoders. */
class Uvh5PartitionReader(part: Uvh5VisPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  import graft.mwa.Hdf5

  private val m = part.meta
  private val raf = new java.io.RandomAccessFile(m.path, "r")
  private val fieldIdx = required.fieldNames.map(n =>
    n -> VisSource.schema.fieldIndex(n)).toMap
  private val ds = Hdf5.datasets(m.path)
  private val nFreq = m.freqs.length
  private val nPol = m.pols.length
  private val polU = m.pols.map(UTF8String.fromString).toArray

  private val blt0 = part.timeStart * m.nBls
  private val blt1 = part.timeEnd * m.nBls
  private val nBlt = blt1 - blt0
  private val cells = nBlt * nFreq * nPol
  private val ant1 = Hdf5.readLongs(raf, ds("Header/ant_1_array"), blt0, nBlt)
  private val ant2 = Hdf5.readLongs(raf, ds("Header/ant_2_array"), blt0, nBlt)
  // time_jd comes from time_array VERBATIM (pyuvdata semantics) — deriving
  // the grid step by subtracting two ~2.46e6 JDs cancels ~18 bits and
  // perturbs reconstructed times in the last ulps
  private val timeJd = Hdf5.readDoubles(raf, ds("Header/time_array"), blt0, nBlt)
  private val vis = Hdf5.readBytesOf(raf, ds("Data/visdata"),
    blt0.toLong * nFreq * nPol, cells)
  private val flg = Hdf5.readBytesOf(raf, ds("Data/flags"),
    blt0.toLong * nFreq * nPol, cells)
  private val nsm = Hdf5.readBytesOf(raf, ds("Data/nsamples"),
    blt0.toLong * nFreq * nPol, cells)

  private val it: Iterator[InternalRow] =
    (0 until nBlt).iterator.flatMap { b =>
      val t = (blt0 + b) / m.nBls
      val jd = timeJd(b)
      val a1 = ant1(b).toInt
      val a2 = ant2(b).toInt
      for (f <- (0 until nFreq).iterator; pi <- (0 until nPol).iterator) yield {
        val c = (b * nFreq + f) * nPol + pi
        val full: Array[Any] = Array(
          m.obsid, t, jd, a1, a2, a1.toLong * 2048 + a2,
          f / m.nFine, m.freqs(f), polU(pi),
          vis.getFloat(8 * c).toDouble, vis.getFloat(8 * c + 4).toDouble,
          flg.get(c) != 0, nsm.getFloat(4 * c).toDouble)
        new GenericInternalRow(required.fieldNames.map(n => full(fieldIdx(n))))
      }
    }

  private var current: InternalRow = _
  override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = raf.close()
}

/** Scala twin of the generator's Catalyst hash chain: xxhash64(lit(seed),
  * lit(salt), [time_idx,] baseline, freq_idx, pol) with Spark's seed-42
  * accumulation, then the same uniform/Box-Muller mapping — so DSv2 rows
  * are bit-identical to the DataFrame generator's. */
object VisKernel {
  private def hashChain(seed: Long, salt: Int, time: Option[Int],
                        baseline: Long, freqIdx: Int, pol: String): Long = {
    var h = 42L
    h = XXH64.hashLong(seed, h)
    h = XXH64.hashInt(salt, h)
    time.foreach(t => h = XXH64.hashInt(t, h))
    h = XXH64.hashLong(baseline, h)
    h = XXH64.hashInt(freqIdx, h)
    h = XXH64.hashUTF8String(UTF8String.fromString(pol), h)
    h
  }

  def uniform(seed: Long, salt: Int, time: Option[Int], baseline: Long,
              freqIdx: Int, pol: String): Double = {
    val h = hashChain(seed, salt, time, baseline, freqIdx, pol)
    val m = 1048576L
    val mod = ((h % m) + m) % m
    (mod.toDouble + 0.5) / 1048576.0
  }

  def gaussian(seed: Long, salt: Int, time: Option[Int], baseline: Long,
               freqIdx: Int, pol: String): Double =
    math.sqrt(-2.0 * math.log(uniform(seed, salt * 2 + 1, time, baseline, freqIdx, pol))) *
      math.cos(2.0 * math.Pi * uniform(seed, salt * 2 + 2, time, baseline, freqIdx, pol))
}

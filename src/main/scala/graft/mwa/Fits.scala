package graft.mwa

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Real FITS binary I/O (NASA FITS 4.0 standard: 2880-byte logical records,
  * 80-character header cards, big-endian BINTABLE extensions) — the actual
  * on-disk input family of the reference pipeline (gpubox FITS files read
  * via mwalib/pyuvdata, `processors.py:163-172`).
  *
  * Layout written/read here (gpubox-shaped): one file per coarse channel,
  * named `<obsid>_gpubox<NN>_00.fits`; a primary HDU carrying the
  * observation geometry as keywords; then ONE BINTABLE HDU PER INTEGRATION
  * (the gpubox convention of an HDU per timestep), each row a
  * (ant1, ant2, fine_chan, pol) visibility sample. The DSv2 source plans
  * one Spark partition per (file, time-slice) and the reader decodes only
  * the HDUs inside its slice — so time/channel pushdown prunes real bytes,
  * exactly like the reference's gpubox-file x time-batch read planning.
  *
  * The decoder is a generic BINTABLE reader (TFORMn-driven: J/D/L/A
  * repeat-counted fields), not a struct hardcoded to this writer, so any
  * standard-conforming table with these column names decodes.
  */
object Fits {

  val RecordLen = 2880
  val CardLen = 80

  // ------------------------------------------------------------- header cards

  private def pad(s: String, n: Int): String =
    if (s.length >= n) s.take(n) else s + (" " * (n - s.length))

  /** Fixed-format FITS card: keyword in cols 1-8, "= " in 9-10, value
    * right-justified to col 30 (strings left-justified, quoted). */
  def card(key: String, value: String, quoted: Boolean = false): String = {
    // a quoted value >= 19 chars would be truncated by pad() and could
    // lose its closing quote — reject rather than emit a malformed card
    require(!quoted || value.length <= 18,
      s"FITS quoted card value too long (${value.length} > 18): $key='$value'")
    val v = if (quoted) pad(s"'${value}'", 20) else {
      val s = value
      if (s.length >= 20) s else (" " * (20 - s.length)) + s
    }
    pad(pad(key, 8) + "= " + v, CardLen)
  }

  def cardInt(key: String, value: Long): String = card(key, value.toString)
  def cardBool(key: String, value: Boolean): String = card(key, if (value) "T" else "F")
  /** %.17E round-trips any IEEE double exactly through parseDouble. */
  def cardDouble(key: String, value: Double): String =
    card(key, "%.17E".format(value))

  private def endPad(cards: Seq[String]): Array[Byte] = {
    val body = cards.mkString + pad("END", CardLen)
    val padded = body + (" " * (RecordLen - body.length % RecordLen) match {
      case s if s.length == RecordLen => ""
      case s => s
    })
    padded.getBytes(StandardCharsets.US_ASCII)
  }

  private def dataPad(len: Long): Int =
    ((RecordLen - len % RecordLen) % RecordLen).toInt

  // ------------------------------------------------------------------ writing

  final case class Field(name: String, tform: String)

  /** Bytes per element for a TFORM type code. */
  private def elemSize(c: Char): Int = c match {
    case 'J' => 4; case 'D' => 8; case 'E' => 4; case 'K' => 8
    case 'L' => 1; case 'A' => 1; case 'I' => 2; case 'B' => 1
    case other => throw new IllegalArgumentException(s"Unsupported TFORM type $other")
  }

  private def tformCount(tform: String): Int = {
    val digits = tform.takeWhile(_.isDigit)
    if (digits.isEmpty) 1 else digits.toInt
  }
  private def tformType(tform: String): Char = tform.dropWhile(_.isDigit).head

  def rowBytes(fields: Seq[Field]): Int =
    fields.map(f => tformCount(f.tform) * elemSize(tformType(f.tform))).sum

  /** Serialize one BINTABLE HDU (header + big-endian data, both padded to
    * the 2880-byte record boundary). `rows` supplies one Seq[Any] per row,
    * aligned with `fields` (Int/Double/Boolean/String). */
  def binTable(fields: Seq[Field], rows: Iterator[Seq[Any]], nRows: Int,
               extra: Seq[String] = Nil): Array[Byte] = {
    val nax1 = rowBytes(fields)
    val header = endPad(
      Seq(
        card("XTENSION", "BINTABLE", quoted = true),
        cardInt("BITPIX", 8), cardInt("NAXIS", 2),
        cardInt("NAXIS1", nax1), cardInt("NAXIS2", nRows),
        cardInt("PCOUNT", 0), cardInt("GCOUNT", 1),
        cardInt("TFIELDS", fields.length)) ++
      fields.zipWithIndex.flatMap { case (f, i) =>
        Seq(card(s"TTYPE${i + 1}", f.name, quoted = true),
          card(s"TFORM${i + 1}", f.tform, quoted = true))
      } ++ extra)
    val data = ByteBuffer.allocate(nax1 * nRows + dataPad(nax1.toLong * nRows))
    rows.foreach { r =>
      fields.zip(r).foreach { case (f, v) =>
        (tformType(f.tform), v) match {
          case ('J', x: Int) => data.putInt(x)
          case ('D', x: Double) => data.putDouble(x)
          case ('L', x: Boolean) => data.put(if (x) 'T'.toByte else 'F'.toByte)
          case ('A', x: String) =>
            data.put(pad(x, tformCount(f.tform)).getBytes(StandardCharsets.US_ASCII))
          case (t, x) => throw new IllegalArgumentException(
            s"Field ${f.name}: cannot encode $x as TFORM $t")
        }
      }
    }
    header ++ data.array()
  }

  def primary(extra: Seq[String]): Array[Byte] = endPad(
    Seq(cardBool("SIMPLE", true), cardInt("BITPIX", 8),
      cardInt("NAXIS", 0), cardBool("EXTEND", true)) ++ extra)

  // ------------------------------------------------------------------ parsing

  final case class Header(cards: Map[String, String], dataOffset: Long, dataLen: Long) {
    def int(k: String): Int = cards(k).trim.toInt
    def long(k: String): Long = cards(k).trim.toLong
    def double(k: String): Double = cards(k).trim.toDouble
    def str(k: String): String = {
      val v = cards(k).trim
      if (v.startsWith("'")) v.stripPrefix("'").takeWhile(_ != '\'').trim else v
    }
    def has(k: String): Boolean = cards.contains(k)
    /** End of this HDU = data offset + data length padded to the record. */
    def nextHduOffset: Long = dataOffset + dataLen + dataPad(dataLen)
  }

  /** Parse one header starting at `offset`; None at EOF. Reads 2880-byte
    * records until the END card, then sizes the data unit from
    * BITPIX/NAXISn (or NAXIS1*NAXIS2 + PCOUNT for tables). */
  def readHeader(raf: RandomAccessFile, offset: Long): Option[Header] = {
    if (offset >= raf.length()) return None
    raf.seek(offset)
    val cards = scala.collection.mutable.LinkedHashMap[String, String]()
    var done = false
    var read = 0L
    val rec = new Array[Byte](RecordLen)
    while (!done) {
      raf.readFully(rec)
      read += RecordLen
      val text = new String(rec, StandardCharsets.US_ASCII)
      for (i <- 0 until RecordLen / CardLen; if !done) {
        val c = text.substring(i * CardLen, (i + 1) * CardLen)
        val key = c.take(8).trim
        if (key == "END") done = true
        else if (key.nonEmpty && c.length > 10 && c(8) == '=')
          cards(key) = c.substring(10).takeWhile(_ != '/').trim match {
            case s if s.startsWith("'") => c.substring(10).trim // keep quotes
            case s => s
          }
      }
    }
    val naxis = cards.get("NAXIS").map(_.trim.toInt).getOrElse(0)
    val bitpix = math.abs(cards.get("BITPIX").map(_.trim.toInt).getOrElse(8))
    val axes = (1 to naxis).map(i => cards(s"NAXIS$i").trim.toLong)
    val pcount = cards.get("PCOUNT").map(_.trim.toLong).getOrElse(0L)
    val gcount = cards.get("GCOUNT").map(_.trim.toLong).getOrElse(1L)
    // FITS 4.0 §7: random-groups records (GROUPS=T, NAXIS1=0) size as
    // BITPIX/8 * GCOUNT * (PCOUNT + NAXIS2*...*NAXISn); everything else as
    // prod(NAXISn) * BITPIX/8 + PCOUNT (heap bytes for BINTABLE).
    val isGroups = cards.get("GROUPS").exists(_.trim == "T")
    val dataLen =
      if (naxis == 0) 0L
      else if (isGroups && axes.headOption.contains(0L))
        (bitpix / 8).toLong * gcount * (pcount + axes.drop(1).product)
      else axes.product * (bitpix / 8) + pcount
    Some(Header(cards.toMap, offset + read, dataLen))
  }

  /** All HDU headers of a file, in order. */
  def readHeaders(path: String): Seq[Header] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val out = Seq.newBuilder[Header]
      var off = 0L
      var h = readHeader(raf, off)
      while (h.isDefined) {
        out += h.get
        off = h.get.nextHduOffset
        h = readHeader(raf, off)
      }
      out.result()
    } finally raf.close()
  }

  /** Generic BINTABLE row decoder: yields one Array[Any] per row, aligned
    * with the TTYPEn order; J->Int, D->Double, L->Boolean, A->String. */
  def readRows(raf: RandomAccessFile, h: Header): Iterator[Array[Any]] = {
    val n = h.int("TFIELDS")
    val forms = (1 to n).map(i => h.str(s"TFORM$i"))
    val nax1 = h.int("NAXIS1")
    val nRows = h.int("NAXIS2")
    require(rowBytes(forms.map(Field("", _))) == nax1,
      s"NAXIS1=$nax1 does not match TFORMs $forms")
    val buf = new Array[Byte](nax1 * nRows)
    raf.seek(h.dataOffset)
    raf.readFully(buf)
    val bb = ByteBuffer.wrap(buf)
    (0 until nRows).iterator.map { _ =>
      forms.map { tf =>
        val cnt = tformCount(tf)
        tformType(tf) match {
          case 'J' => bb.getInt: Any
          case 'D' => bb.getDouble
          case 'L' => bb.get() == 'T'.toByte
          case 'A' =>
            val a = new Array[Byte](cnt)
            bb.get(a)
            new String(a, StandardCharsets.US_ASCII).trim
          case other => throw new IllegalArgumentException(s"TFORM $other")
        }
      }.toArray
    }
  }

  // -------------------------------------------------- gpubox-shaped vis files

  val VisFields: Seq[Field] = Seq(
    Field("ANT1", "1J"), Field("ANT2", "1J"), Field("FINECH", "1J"),
    Field("POL", "2A"), Field("VISRE", "1D"), Field("VISIM", "1D"),
    Field("FLAG", "1L"), Field("NSAMP", "1D"))

  /** Write one observation as per-coarse-channel gpubox FITS files whose
    * values are the portable fixture's dyadic arithmetic
    * (VisGenerator.portable, bit-for-bit): re = sky + narrow + streak +
    * noise with sky/noise pure integer residues over 64ths. Returns the
    * written file paths. */
  def writeVis(dir: Path, spec: VisGenerator.Spec): Seq[Path] = {
    Files.createDirectories(dir)
    val baselines =
      for (a1 <- 0 until spec.nAnts; a2 <- a1 until spec.nAnts) yield (a1, a2)
    (0 until spec.nCoarse).map { chan =>
      val path = dir.resolve(f"${spec.obsid}%d_gpubox${chan + 1}%02d_00.fits")
      val out = new DataOutputStream(new BufferedOutputStream(
        new FileOutputStream(path.toFile)))
      try {
        out.write(primary(Seq(
          cardInt("OBSID", spec.obsid), cardInt("COARSE", chan),
          cardInt("NTIMES", spec.nTimes), cardInt("NFINE", spec.nFine),
          cardInt("NANTS", spec.nAnts),
          cardDouble("FREQ0", spec.freq0Hz), cardDouble("DFHZ", spec.dfHz),
          cardDouble("JD0", spec.jd0), cardDouble("DTDAYS", spec.dtDays))))
        for (t <- 0 until spec.nTimes) {
          val rows = for {
            (a1, a2) <- baselines.iterator
            fine <- (0 until spec.nFine).iterator
            (polName, pi) <- spec.pols.zipWithIndex.iterator
          } yield {
            val f = chan * spec.nFine + fine
            val sky = Math.floorMod(a1 * 7 + a2 * 11 + f * 3 + pi * 17, 64).toDouble
            val noise =
              (Math.floorMod(t * 37 + a1 * 13 + a2 * 29 + f * 53 + pi * 71, 128) - 64)
                .toDouble / 64.0
            val narrow = if (f == spec.rfiFreqIdx &&
              t >= spec.rfiTimes._1 && t <= spec.rfiTimes._2) spec.rfiAmp else 0.0
            val streak = if (t == spec.streakTime) spec.streakAmp else 0.0
            Seq(a1, a2, fine, polName, sky + narrow + streak + noise, 0.0, false, 1.0)
          }
          out.write(binTable(VisFields, rows,
            baselines.length * spec.nFine * spec.pols.length,
            extra = Seq(cardInt("TIMEIDX", t),
              cardDouble("TIMEJD", spec.jd0 + t * spec.dtDays))))
        }
      } finally out.close()
      path
    }
  }

  // ------------------------------------------------- uvfits (random groups)

  /** uvfits is FITS "random groups" (FITS 4.0 §7): the primary HDU carries
    * the visibility data itself as GCOUNT groups, each PCOUNT float
    * parameters (UU, VV, WW, BASELINE, DATE) followed by a (re, im, weight)
    * × pol × freq float32 array. This is the second on-disk input family the
    * reference accepts (`configurators.py:43-48` routes `*.uvfits` into
    * pyuvdata's `UVData.from_file`). The writer emits one group per
    * (time, baseline) in time-major order with the AIPS baseline convention
    * 256*(ant1+1) + (ant2+1) and DATE as offset-from-JD0 (PZERO5 carries
    * JD0), values bit-equal to the gpubox fixture's dyadic arithmetic —
    * all representable exactly in float32, so the decode certifies
    * round-trip bit-exactly against the same oracle as mwa10. */
  object Uvfits {
    val PCount = 5 // UU VV WW BASELINE DATE

    def nBaselines(nAnts: Int): Int = nAnts * (nAnts + 1) / 2

    def groupFloats(spec: VisGenerator.Spec): Int =
      PCount + 3 * spec.pols.length * spec.nCoarse * spec.nFine

    def write(dir: Path, spec: VisGenerator.Spec): Path = {
      Files.createDirectories(dir)
      val path = dir.resolve(s"${spec.obsid}.uvfits")
      val baselines =
        for (a1 <- 0 until spec.nAnts; a2 <- a1 until spec.nAnts) yield (a1, a2)
      val nFreq = spec.nCoarse * spec.nFine
      val nPol = spec.pols.length
      val gcount = spec.nTimes * baselines.length
      val header = endPad(Seq(
        cardBool("SIMPLE", true), cardInt("BITPIX", -32),
        cardInt("NAXIS", 4), cardInt("NAXIS1", 0),
        cardInt("NAXIS2", 3), cardInt("NAXIS3", nPol), cardInt("NAXIS4", nFreq),
        cardBool("GROUPS", true), cardInt("PCOUNT", PCount), cardInt("GCOUNT", gcount),
        card("PTYPE1", "UU", quoted = true), card("PTYPE2", "VV", quoted = true),
        card("PTYPE3", "WW", quoted = true),
        card("PTYPE4", "BASELINE", quoted = true),
        card("PTYPE5", "DATE", quoted = true), cardDouble("PZERO5", spec.jd0),
        cardInt("OBSID", spec.obsid), cardInt("NTIMES", spec.nTimes),
        cardInt("NANTS", spec.nAnts), cardInt("NFINE", spec.nFine),
        cardInt("NCOARSE", spec.nCoarse),
        card("POLS", spec.pols.mkString(","), quoted = true),
        cardDouble("FREQ0", spec.freq0Hz), cardDouble("DFHZ", spec.dfHz),
        cardDouble("JD0", spec.jd0), cardDouble("DTDAYS", spec.dtDays)))
      val groupBytes = 4 * groupFloats(spec)
      val dataLen = groupBytes.toLong * gcount
      val data = ByteBuffer.allocate((dataLen + dataPad(dataLen)).toInt)
      for (t <- 0 until spec.nTimes; (a1, a2) <- baselines) {
        data.putFloat(0.0f).putFloat(0.0f).putFloat(0.0f) // UU VV WW
        data.putFloat((256 * (a1 + 1) + (a2 + 1)).toFloat)
        data.putFloat((t * spec.dtDays).toFloat)
        // array order: NAXIS2 (re,im,wt) fastest, then pol, then freq
        for (f <- 0 until nFreq; pi <- 0 until nPol) {
          val sky = Math.floorMod(a1 * 7 + a2 * 11 + f * 3 + pi * 17, 64).toDouble
          val noise =
            (Math.floorMod(t * 37 + a1 * 13 + a2 * 29 + f * 53 + pi * 71, 128) - 64)
              .toDouble / 64.0
          val narrow = if (f == spec.rfiFreqIdx &&
            t >= spec.rfiTimes._1 && t <= spec.rfiTimes._2) spec.rfiAmp else 0.0
          val streak = if (t == spec.streakTime) spec.streakAmp else 0.0
          data.putFloat((sky + narrow + streak + noise).toFloat)
          data.putFloat(0.0f) // im
          data.putFloat(1.0f) // weight > 0 => unflagged, nsample = weight
        }
      }
      val out = new DataOutputStream(new BufferedOutputStream(
        new FileOutputStream(path.toFile)))
      try { out.write(header); out.write(data.array()) } finally out.close()
      path
    }

    /** Decode groups [groupStart, groupEnd) of a random-groups primary HDU:
      * yields (params, data) float arrays per group. Seeks directly to the
      * first requested group — fixed group size makes time pruning a seek,
      * no bytes read for pruned groups. */
    def readGroups(raf: RandomAccessFile, h: Header,
                   groupStart: Int, groupEnd: Int): Iterator[(Array[Float], Array[Float])] = {
      val naxis = h.int("NAXIS")
      val arrLen = (2 to naxis).map(i => h.int(s"NAXIS$i")).product
      val pcount = h.int("PCOUNT")
      val groupBytes = 4 * (pcount + arrLen)
      val n = groupEnd - groupStart
      val buf = new Array[Byte](groupBytes * n)
      raf.seek(h.dataOffset + groupBytes.toLong * groupStart)
      raf.readFully(buf)
      val bb = ByteBuffer.wrap(buf)
      (0 until n).iterator.map { _ =>
        val params = Array.fill(pcount)(bb.getFloat)
        val data = Array.fill(arrLen)(bb.getFloat)
        (params, data)
      }
    }

    /** The shared uvfits fixture (same geometry/values as the mwa10 gpubox
      * fixture, single random-groups file). */
    @volatile private var dir: String = _
    def ensureFixture(): String = synchronized {
      if (dir == null) {
        val d = Paths.get(sys.props("java.io.tmpdir"), "graft_uvfits_fixture_v1")
        if (!Files.exists(d.resolve("_SUCCESS"))) {
          write(d, fixtureSpec)
          Files.write(d.resolve("_SUCCESS"), Array.emptyByteArray)
        }
        dir = d.toString
      }
      dir
    }
  }

  /** The shared FITS fixture for mwa10 (written once per JVM under the
    * system temp dir — same nTimes/nAnts geometry as the mwa04 portable
    * fixture, 2 coarse channels, 5440 rows total). */
  lazy val fixtureSpec: VisGenerator.Spec = VisGenerator.Spec(nTimes = 17, nAnts = 4)

  @volatile private var fixtureDir: String = _
  def ensureFixture(): String = synchronized {
    if (fixtureDir == null) {
      val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_fits_fixture_v1")
      if (!Files.exists(dir.resolve("_SUCCESS"))) {
        writeVis(dir, fixtureSpec)
        Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
      }
      fixtureDir = dir.toString
    }
    fixtureDir
  }
}

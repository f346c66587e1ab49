package graft.mwa

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest derivations (C1-C4, G1-G4) and the multi-error validation
  * matrix (FIXTURES.md B.5) — every reference error path. */
class ManifestValidationSpec extends SparkSpec {

  private val goodPaths = Seq(
    "/data/1234567890_20230101000000_gpubox01_00.fits",
    "/data/1234567890_20230101000000_gpubox02_00.fits",
    "/data/1234567890.metafits",
    "/data/1234567891_20230101000100_ch133_00.fits",
    "/data/1234567891.metafits")

  private def codes(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("code").collect().map(_.getString(0)).toSet

  test("manifest derivations: ext, stem, obsid, channel token (C1-C4)") {
    val m = Manifest.fromPaths(spark, goodPaths)
    val rows = m.select("name", "ext", "stem", "obsid", "chan_kind", "chan_token")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), if (r.isNullAt(5)) -1 else r.getInt(5)))
      .toSet
    assert(rows.contains(("1234567890_20230101000000_gpubox01_00.fits", "fits",
      "1234567890_20230101000000_gpubox01_00", "1234567890", "gpubox", 1)))
    assert(rows.contains(("1234567891_20230101000100_ch133_00.fits", "fits",
      "1234567891_20230101000100_ch133_00", "1234567891", "ch", 133)))
    assert(rows.contains(("1234567890.metafits", "metafits", "1234567890",
      "1234567890", "", -1)))
  }

  test("gpubox -> channel via metafits lookup (J1)") {
    val m = Manifest.fromPaths(spark, goodPaths)
    val chans = VisGenerator.channels(spark, VisGenerator.Spec(nCoarse = 2))
    val resolved = Manifest.withChannel(m.filter(col("ext") === "fits"), chans)
    val byName = resolved.select("name", "channel").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(byName("1234567890_20230101000000_gpubox01_00.fits") == 0) // gpubox 1 -> rec_chan 0
    assert(byName("1234567891_20230101000100_ch133_00.fits") == 133)  // direct
    assert(byName("1234567890_20230101000000_gpubox02_00.fits") == 1)
  }

  test("grouping G1/G2 sorted lists") {
    val m = Manifest.fromPaths(spark, goodPaths)
    val byExt = Manifest.groupByExtension(m).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(byExt("fits").size == 3)
    assert(byExt("fits") == byExt("fits").sorted)
    val obs = Manifest.observations(m).collect()
    assert(obs.length == 2)
    val o1 = obs.find(_.getString(0) == "1234567890").get
    assert(o1.getAs[String]("metafits_stem") == "1234567890")
    assert(o1.getSeq[String](1).size == 2)
  }

  test("valid file set produces no violations") {
    val m = Manifest.fromPaths(spark, goodPaths)
    assert(Validation.validateFileSet(spark, m).isEmpty)
  }

  test("fits without metafits") {
    val m = Manifest.fromPaths(spark, Seq("/d/123_gpubox01.fits"))
    assert(codes(Validation.validateFileSet(spark, m))
      .contains("fits_requires_metafits"))
  }

  test("obsid group missing metafits") {
    val m = Manifest.fromPaths(spark, Seq(
      "/d/111_gpubox01.fits", "/d/111.metafits", "/d/222_gpubox01.fits"))
    assert(codes(Validation.validateFileSet(spark, m))
      .contains("metafits_missing_for_obsid"))
  }

  test("unsupported extension") {
    val m = Manifest.fromPaths(spark, Seq("/d/x.csvjunk", "/d/111.metafits"))
    assert(codes(Validation.validateFileSet(spark, m)).contains("unsupported_types"))
  }

  test("no supported types at all") {
    val m = Manifest.fromPaths(spark, Seq("/d/x.csvjunk"))
    val c = codes(Validation.validateFileSet(spark, m))
    assert(c.contains("no_supported_type") && c.contains("unsupported_types"))
  }

  test("uvfits/uvh5 and ms mutual exclusion") {
    val m1 = Manifest.fromPaths(spark, Seq("/d/a.uvfits", "/d/b.uvh5"))
    assert(codes(Validation.validateFileSet(spark, m1)).contains("uvfits_uvh5_conflict"))
    val m2 = Manifest.fromPaths(spark, Seq("/d/a.ms", "/d/b.uvfits"))
    assert(codes(Validation.validateFileSet(spark, m2)).contains("ms_conflict"))
  }

  test("sel/skip conflict reported alongside file errors (multi-error G8)") {
    val m = Manifest.fromPaths(spark, Seq("/d/123_gpubox01.fits"))
    val v = Validation.validateFileSet(spark, m,
      GraftConfig(selAnts = Seq(1), skipAnts = Seq(2)))
    val c = codes(v)
    assert(c.contains("sel_skip_conflict") && c.contains("fits_requires_metafits"))
    assert(v.count() >= 2) // all errors reported at once
  }

  test("processor validation: channel resolution errors (utils.py:57-78)") {
    val chans = VisGenerator.channels(spark, VisGenerator.Spec(nCoarse = 2))
      .withColumn("source", lit("m1"))
    // gpubox 9 not in metafits; file without channel token at all
    val m = Manifest.fromPaths(spark, Seq(
      "/d/111_gpubox09.fits", "/d/111_nochannel.fits", "/d/111.metafits"))
    val v = Validation.validateProcessor(spark, m, chans)
    val msgs = v.filter(col("code") === "channel_unresolved")
      .select("message").collect().map(_.getString(0))
    assert(msgs.exists(_.contains("GPUBOX not found")))
    assert(msgs.exists(_.contains("does not contain channel information")))
  }

  test("processor validation: differing channel tables (J4)") {
    val c1 = VisGenerator.channels(spark, VisGenerator.Spec(nCoarse = 2))
      .withColumn("source", lit("m1"))
    val c2 = VisGenerator.channels(spark, VisGenerator.Spec(nCoarse = 2, freq0Hz = 1.4e8))
      .withColumn("source", lit("m2"))
    val m = Manifest.fromPaths(spark, Seq("/d/111.metafits"))
    val v = Validation.validateProcessor(spark, m, c1.unionByName(c2))
    assert(codes(v).contains("channel_tables_differ"))
  }

  test("FileSet: construction, accessors, eager validation (UVDataFileSet parity)") {
    val fs = FileSet.validated(spark, goodPaths)
    assert(fs.hasType("fits") && fs.hasType("metafits") && !fs.hasType("uvh5"))
    assert(fs.filesOf("fits").size == 3)
    assert(fs.filesOf("fits") == fs.filesOf("fits").sorted)
    assert(fs.suffix == ".diff.cross")
    assert(fs.obsidGroups.get.keySet == Set("1234567890", "1234567891"))
    assert(fs.obsidGroups.get("1234567890")("fits").size == 2)
    val obs = fs.observations()
    assert(obs.map(_._1).toSet == Set("1234567890", "1234567891"))
    // empty input rejected at construction (configurators.py:101-102)
    intercept[IllegalArgumentException](new FileSet(spark, Nil))
    // invalid set raises with ALL errors joined
    val e = intercept[IllegalArgumentException](
      FileSet.validated(spark, Seq("/d/x.fits", "/d/y.unknownext"),
        GraftConfig(selAnts = Seq(1), skipAnts = Seq(2))))
    assert(e.getMessage.contains("metafits"))
    assert(e.getMessage.contains("Unsupported"))
    assert(e.getMessage.contains("sel_ants"))
  }

  test("enforce on_error policy (processors.py:142-148)") {
    val m = Manifest.fromPaths(spark, Seq("/d/123_gpubox01.fits"))
    val v = Validation.validateFileSet(spark, m)
    intercept[IllegalArgumentException](Validation.enforce(v, OnError.Raise))
    assert(!Validation.enforce(v, OnError.Ignore))
    val ok = Validation.validateFileSet(spark, Manifest.fromPaths(spark, goodPaths))
    assert(Validation.enforce(ok, OnError.Raise))
  }
}

package graft.sources

import graft.SparkSpec
import graft.mwa.Fits

/** uvfits (FITS random-groups) source: decode parity with the gpubox
  * decoder, header sizing, and time-axis pushdown via group seek. */
class UvfitsSpec extends SparkSpec {

  private def loadUvfits(slice: Int = 4) = spark.read.format("graft-vis")
    .option("path", Fits.Uvfits.ensureFixture())
    .option("timeslice", slice.toString).load()

  private def loadGpubox = spark.read.format("graft-vis")
    .option("path", Fits.ensureFixture()).load()

  test("uvfits decode is bit-identical to the gpubox decode of the same values") {
    // both fixtures carry the same dyadic arithmetic; every value is exactly
    // representable in float32, so the two decode paths must agree on every
    // column of every row — full-row EXCEPT in both directions is empty
    val uv = loadUvfits()
    val gp = loadGpubox
    assert(uv.count() == 5440 && gp.count() == 5440)
    assert(uv.schema == gp.schema)
    assert(uv.exceptAll(gp).count() == 0)
    assert(gp.exceptAll(uv).count() == 0)
  }

  test("random-groups header sizes the data unit correctly") {
    val file = UvfitsVisScan.listUvfits(Fits.Uvfits.ensureFixture()).head
    val hs = Fits.readHeaders(file)
    assert(hs.length == 1) // everything lives in the primary HDU
    val h = hs.head
    // 170 groups x (5 params + 3*2*16 array) floats
    assert(h.dataLen == 170L * (5 + 96) * 4)
    // header walk must land exactly on the padded end-of-file
    val len = new java.io.File(file).length()
    assert(h.nextHduOffset == len)
  }

  test("time filters prune group-slices at the source (seek, no decode)") {
    // 17 times, slice 4 -> 5 slices; one file covers all channels
    assert(loadUvfits(4).rdd.getNumPartitions == 5)
    val pruned = loadUvfits(4).filter("time_idx < 4")
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 4 * 10 * 16 * 2)
    // coarse_chan filters stay residual (groups span the freq axis) but
    // still evaluate correctly row-level
    val chan = loadUvfits(4).filter("coarse_chan = 1")
    assert(chan.count() == 17 * 10 * 8 * 2)
  }
}

package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("feature extraction is deterministic and correctly shaped") {
    val media = generate(spark, 30)
    val f1 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
    // distinct payloads -> distinct features (hash fake is injective enough)
    assert(f1.map(_.feature.toSeq).distinct.length == 30)
  }

  test("frame sampling explodes only video rows with the stride") {
    val media = generate(spark, 30)
    val frames = sampleFrames(media, stride = 2).collect()
    val videoIds = media.filter(_.modality == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet == videoIds)
    // 8 frames, stride 2 -> indices 0,2,4,6
    assert(frames.groupBy(_.media_id).values.forall(_.map(_.frame_idx).sorted.sameElements(Seq(0, 2, 4, 6))))
  }

  test("perceptual dup pairs find a distance-5 pair the 4x16 chunking missed") {
    import spark.implicits._
    // aHash bit j is set iff byte j (unsigned) * 64 > sum of all 64 bytes.
    // Base: all bytes 100 -> sum 6400, 100*64 = 6400 is NOT > 6400 -> hash 0.
    // Variant: bytes {0,16,32,48,49} = 120 -> sum 6500; 120*64 = 7680 > 6500
    // (those bits set), 100*64 = 6400 < 6500 (rest clear) -> hamming = 5,
    // with the differing bits touching ALL FOUR 16-bit chunks [0,16), [16,32),
    // [32,48), [48,64) — the round-7 4x16 pigeonhole had no shared chunk and
    // provably dropped this pair. The maxHamming+1 = 9-chunk multi-index
    // must find it.
    val meta = MediaMeta("raw", 8, 8, 0, 1)
    val base = Array.fill[Byte](64)(100)
    val variant = base.clone()
    Seq(0, 16, 32, 48, 49).foreach(j => variant(j) = 120)
    val media = Seq(
      MediaRow(1L, "image", base, meta),
      MediaRow(2L, "image", variant, meta)).toDS()
    val pairs = perceptualDupPairs(media, maxHamming = 8).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L &&
      pairs.head.getInt(2) == 5)
    // tighter budget excludes it: distance 5 > maxHamming 4
    assert(perceptualDupPairs(media, maxHamming = 4).isEmpty)
    // the pigeonhole needs maxHamming+1 non-empty chunks of 64 bits
    intercept[IllegalArgumentException](perceptualDupPairs(media, 64))
  }

  test("metadata analytics prune the payload column from the scan") {
    val media = generate(spark, 30)
    val stats = modalityStats(media)
    assert(stats.count() == 3)
    val byMod = stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMod.values.sum == 30)
  }
}

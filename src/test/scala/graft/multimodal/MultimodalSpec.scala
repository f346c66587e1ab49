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

  test("metadata analytics prune the payload column from the scan") {
    val media = generate(spark, 30)
    val stats = modalityStats(media)
    assert(stats.count() == 3)
    val byMod = stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMod.values.sum == 30)
  }
}

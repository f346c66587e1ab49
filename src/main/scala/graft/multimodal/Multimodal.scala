package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions for a training-data pipeline: image /
  * audio / video payloads ride as opaque `binary` columns with a typed
  * metadata struct, so Spark's columnar machinery (pruning, predicate
  * pushdown on metadata, partitioning) applies unchanged while the bytes
  * stay untouched until an explicit decode stage.
  *
  * Schema convention:
  *   media(media_id LONG, modality STRING, bytes BINARY,
  *         meta STRUCT<format STRING, width INT, height INT,
  *                     sample_rate INT, n_frames INT>)
  *
  * The decode / feature-extract kernels run per-partition (mapPartitions —
  * the Scala analog of mapInPandas batches: one iterator per partition, so
  * codec state is initialized once per partition, not per row). The actual
  * codec calls are STUBBED with a deterministic byte-hash fake — image and
  * audio libraries are not available in this container — but every piece
  * of Spark plumbing (schema, batching, partition distribution, output
  * shape) is real and tested; swapping `StubCodec` for a real codec is a
  * one-function change.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
                             sample_rate: Int, n_frames: Int)
  final case class MediaRow(media_id: Long, modality: String,
                            bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(media_id: Long, modality: String,
                                feature: Array[Float])
  final case class FrameSample(media_id: Long, frame_idx: Int,
                               frame_bytes: Array[Byte])

  /** The pluggable decode kernel. Replace with a real JNI/codec
    * implementation in production; signature and batching stay fixed. */
  trait Codec extends Serializable {
    def decodeToFeature(row: MediaRow, dim: Int): Array[Float]
    def sampleFrame(row: MediaRow, frameIdx: Int): Array[Byte]
  }

  /** Deterministic stand-in: features derived from the payload byte sum —
    * stable across executors, so tests can golden-check the full pipeline
    * without a codec library. Deliberately PORTABLE arithmetic (small-int
    * sums and mods, double-then-float division, no wrapping multiplies):
    * the m02 oracle re-derives these features in plain SQL, which a
    * wrapping-Long rolling hash would prevent. */
  object StubCodec extends Codec {
    def decodeToFeature(row: MediaRow, dim: Int): Array[Float] = {
      val s = row.bytes.foldLeft(0L)((acc, b) => acc + (b & 0xFF))
      val k = s + row.media_id * 997L
      // two base-1000 digit groups of k feed every component, so the
      // feature vector is injective in k below 10^6 (k <= ~230k here)
      Array.tabulate(dim) { i =>
        ((k * (2 * i + 3) + (k / 1000L) * (7 * i + 1)) % 1000L).toDouble / 1000.0
      }.map(_.toFloat)
    }
    def sampleFrame(row: MediaRow, frameIdx: Int): Array[Byte] = {
      // stub: a frame is a fixed-size slice keyed by index
      val start = (frameIdx * 16) % math.max(row.bytes.length, 1)
      row.bytes.slice(start, math.min(start + 16, row.bytes.length))
    }
  }

  /** Deterministic synthetic media table. Payload bytes are arithmetic in
    * (id, position) — portable across engines, so oracles can re-derive
    * byte-dependent results without replicating a PRNG. */
  def generate(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val modality = Seq("image", "audio", "video")((id % 3).toInt)
      val bytes = Array.tabulate((64 + id % 64).toInt)(j =>
        ((id * 131 + j * 31) % 256 - 128).toByte)
      MediaRow(id, modality, bytes,
        MediaMeta(if (modality == "image") "png" else "raw",
          width = 32 + (id % 4).toInt * 16, height = 32,
          sample_rate = if (modality == "audio") 16000 else 0,
          n_frames = if (modality == "video") 8 else 1))
    }
  }

  /** Feature extraction: one codec instance per partition, batched
    * iteration (the mapInPandas-shaped kernel boundary). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
                      codec: Codec = StubCodec): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would happen here (once, not per row)
      it.map(r => MediaFeature(r.media_id, r.modality,
        codec.decodeToFeature(r, dim)))
    }
  }

  /** Frame sampling for video rows: explode n_frames into one row per
    * sampled frame (stride-able), payload sliced by the codec. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2,
                   codec: Codec = StubCodec): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      (0 until r.meta.n_frames by stride).map(i =>
        FrameSample(r.media_id, i, codec.sampleFrame(r, i)))
    }
  }

  /** High-entropy deterministic media table for the perceptual-dup path:
    * payload byte j of id is the first byte of md5("id:j") — portable
    * (the oracle re-derives every byte with the same md5) yet free of
    * [[generate]]'s arithmetic periodicity, which would make EVERY pair
    * a perceptual near-match and turn dup detection degenerate. Fixed
    * 64-byte payloads (one aHash tile). */
  def generateHashed(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
      // the raw digest byte IS the payload byte: its unsigned value (&0xFF
      // in the hash kernel) equals the oracle's hex-pair integer directly
      val bytes = Array.tabulate(64) { j =>
        md.digest(s"$id:$j".getBytes("UTF-8"))(0)
      }
      MediaRow(id, Seq("image", "audio", "video")((id % 3).toInt), bytes,
        MediaMeta("raw", 8, 8, 0, 1))
    }
  }

  /** Perceptual average-hash (aHash) of the DECODED payload — the
    * image-dedup primitive: 64 "pixels" (stub decode = the unsigned
    * payload bytes; a real codec would downsample the decoded image to
    * an 8x8 grayscale tile here), bit j set iff pixel j is strictly
    * above the tile mean (compared as p*64 > sum — integer-exact, no
    * division). Per-partition kernel like [[extractFeatures]]. */
  def perceptualHashes(media: Dataset[MediaRow],
                       codec: Codec = StubCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val px = r.bytes.take(64).map(_ & 0xFF)
        val s = px.sum
        var h = 0L
        var j = 0
        while (j < px.length) {
          if (px(j).toLong * 64 > s) h |= (1L << j)
          j += 1
        }
        (r.media_id, h)
      }
    }.toDF("media_id", "ahash")
  }

  /** Perceptual near-duplicate pairs: multi-index pigeonhole on
    * `maxHamming + 1` near-equal bit chunks of the aHash — with k+1
    * chunks, a pair within Hamming distance k MUST agree on at least one
    * chunk (k differing bits cannot touch all k+1 chunks), so candidates
    * are an equi self-join on (chunk, value), never all-pairs, and the
    * returned set is COMPLETE for `hamming <= maxHamming` (the round-7
    * 4x16-bit chunking only guaranteed distance <= 3 while filtering at
    * 8). Exact `bit_count(xor)` verification bounds the output. The
    * d04/d08 composition applied to media columns.
    *
    * @return every (id_a, id_b, hamming) with id_a < id_b and
    *         hamming <= maxHamming
    */
  def perceptualDupPairs(media: Dataset[MediaRow],
                         maxHamming: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      "perceptualDupPairs: maxHamming must be in [0, 32) — the pigeonhole " +
        "needs maxHamming+1 non-empty chunks of a 64-bit hash")
    val nChunks = maxHamming + 1
    val base = 64 / nChunks
    val rem = 64 % nChunks // first `rem` chunks are one bit wider
    def off(c: Int): Int = c * base + math.min(c, rem)
    def width(c: Int): Int = base + (if (c < rem) 1 else 0)
    val h = perceptualHashes(media)
    val chunks = h.select(col("media_id"), col("ahash"),
      explode(array((0 until nChunks).map(c => struct(lit(c).as("c"),
        shiftrightunsigned(col("ahash"), off(c))
          .bitwiseAND(lit((1L << width(c)) - 1)).as("v"))): _*))
        .as("ch"))
      .select(col("media_id"), col("ahash"),
        col("ch.c").as("c"), col("ch.v").as("v"))
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("__ha"), col("b.ahash").as("__hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Metadata-only analytics never touch the payload: column pruning keeps
    * `bytes` out of the scan entirely. */
  def modalityStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .select(col("media_id"), col("modality"), col("meta.width"),
        col("meta.n_frames"), length(col("bytes")).as("payload_bytes"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(col("payload_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        sum(col("n_frames")).as("total_frames"))
}

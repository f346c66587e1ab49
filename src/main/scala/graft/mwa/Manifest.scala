package graft.mwa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-manifest construction: the reference's dict-of-lists file grouping
  * (`configurators.py:228-248`) re-expressed as a manifest DataFrame with
  * derived columns, so grouping/validation are relational operations that
  * scale to millions of files.
  *
  * Scalar derivations (SURVEY §2.7):
  *  - C1 channel token:  regex `(gpubox|ch)(\d+)` over the file NAME
  *    (`utils.py:61-78`); `ch` -> direct int, `gpubox` -> metafits lookup.
  *  - C2 obsid: stem before first `_` (`utils.py:82-87`).
  *  - C3 extension: suffix after last dot (`configurators.py:232`).
  *  - C4 stem: name minus extension (`configurators.py:245`).
  */
object Manifest {

  /** Build the manifest DataFrame from a list of paths. Pure column
    * derivations — no I/O. size_mb defaults to 0 when unknown. */
  def fromPaths(spark: SparkSession, paths: Seq[String],
                sizesMb: Map[String, Long] = Map.empty): DataFrame = {
    import spark.implicits._
    val sized = paths.map(p => (p, sizesMb.getOrElse(p, 0L)))
    withDerived(sized.toDF("file_path", "size_mb"))
  }

  /** Manifest from a real directory listing via the binaryFile source
    * (path + length only — Parquet-style pruned listing, no payload). */
  def fromDirectory(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    withDerived(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      // recursive walk, matching disk_usage_in_blocks' rglob (utils.py:188)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path").as("file_path"),
        (col("length") / lit(1024 * 1024)).cast("long").as("size_mb")))

  /** Add the derived columns (name, ext, stem, obsid, channel token). */
  def withDerived(files: DataFrame): DataFrame =
    files
      .withColumn("name", element_at(split(col("file_path"), "/"), -1))
      .withColumn("ext", regexp_extract(col("name"), "\\.([^./]+)$", 1))
      .withColumn("stem", regexp_replace(col("name"), "\\.[^.]*$", ""))
      .withColumn("obsid", substring_index(col("stem"), "_", 1))
      .withColumn("chan_kind", regexp_extract(col("name"), "(gpubox|ch)(\\d+)", 1))
      .withColumn("chan_token",
        when(col("chan_kind") =!= "",
          regexp_extract(col("name"), "(gpubox|ch)(\\d+)", 2).cast("int")))

  /** C1 completed: resolve channel numbers, joining gpubox tokens against
    * the (broadcast) coarse-channel dimension (J1, `utils.py:49-59`).
    * Unresolvable rows keep channel = null; the validation layer turns
    * them into errors. */
  def withChannel(manifest: DataFrame, channels: DataFrame): DataFrame = {
    val chanDim = broadcast(channels.select(
      col("gpubox_number"), col("rec_chan_number")).distinct())
    manifest
      .join(chanDim, manifest("chan_token") === chanDim("gpubox_number"), "left")
      .withColumn("channel",
        when(col("chan_kind") === "ch", col("chan_token"))
          .when(col("chan_kind") === "gpubox", col("rec_chan_number")))
      .drop("gpubox_number", "rec_chan_number")
  }

  /** G1: ext -> sorted file list (`configurators.py:228-235`). */
  def groupByExtension(manifest: DataFrame): DataFrame =
    manifest.groupBy("ext")
      .agg(sort_array(collect_list(col("file_path"))).as("files"))

  /** G2: (obsid, ext) -> sorted file list (`configurators.py:238-248`). */
  def groupByObsidAndExtension(manifest: DataFrame): DataFrame =
    manifest.groupBy("obsid", "ext")
      .agg(sort_array(collect_list(col("file_path"))).as("files"))

  /** G4: per-observation (obsid, first metafits stem, fits files) rows
    * (`configurators.py:270-276` observations() generator). */
  def observations(manifest: DataFrame): DataFrame = {
    // stem of the path-sorted-FIRST metafits (reference takes
    // file_group["metafits"][0] of the sorted list, configurators.py:274)
    val metafits = manifest.filter(col("ext") === "metafits")
      .groupBy("obsid")
      .agg(min_by(col("stem"), col("file_path")).as("metafits_stem"))
    val fits = manifest.filter(col("ext") === "fits")
      .groupBy("obsid").agg(sort_array(collect_list(col("file_path"))).as("fits_files"))
    fits.join(metafits, Seq("obsid"), "left")
  }

  /** G7: total size (`configurators.py:263-265`). */
  def totalSizeMb(manifest: DataFrame): Long =
    manifest.agg(coalesce(sum(col("size_mb")), lit(0L))).head().getLong(0)
}

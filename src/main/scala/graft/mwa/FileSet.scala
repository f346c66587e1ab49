package graft.mwa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's user-facing entry point rebuilt: `UVDataFileSet`
  * (`configurators.py:39-276`). Construction mirrors `__post_init__`:
  * empty input rejected immediately, files grouped by extension (and by
  * obsid when fits are present), ALL validation errors collected and
  * raised together, derived suffix computed.
  *
  * The reference's metaclass-generated accessors (`has_fits`, `.fits`,
  * `configurators.py:11-37`) become `hasType(ext)` / `filesOf(ext)` — the
  * dynamic-API surface without stringly-typed reflection.
  */
final class FileSet(spark: SparkSession, val files: Seq[String],
                    val config: GraftConfig = GraftConfig()) {
  require(files.nonEmpty, "No input files specified")

  /** The manifest DataFrame — the scalable representation every grouping
    * and validation rule runs against. */
  val manifest: DataFrame = Manifest.fromPaths(spark, files)

  /** ext -> sorted paths (`group_files_by_extension`). */
  lazy val fileGroups: Map[String, Seq[String]] =
    Manifest.groupByExtension(manifest).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  /** obsid -> ext -> sorted paths (`group_files_by_obsid_and_extension`);
    * populated when fits files are present, like the reference. */
  lazy val obsidGroups: Option[Map[String, Map[String, Seq[String]]]] =
    if (!hasType("fits")) None
    else Some(Manifest.groupByObsidAndExtension(manifest).collect()
      .groupBy(_.getString(0))
      .map { case (obsid, rows) =>
        obsid -> rows.map(r => r.getString(1) -> r.getSeq[String](2)).toMap
      })

  def hasType(ext: String): Boolean = fileGroups.contains(ext)
  def filesOf(ext: String): Seq[String] = fileGroups.getOrElse(ext, Nil)

  /** All violations (G8 multi-error). */
  def validate(): Seq[String] =
    Validation.validateFileSet(spark, manifest, config)
      .collect().map(_.getString(1)).toSeq

  /** Derived suffix (`configurators.py:125-134`). */
  def suffix: String = config.derivedSuffix

  def sizeMb: Long = Manifest.totalSizeMb(manifest)

  /** (obsid, metafits stem, fits files) per observation. */
  def observations(): Seq[(String, String, Seq[String])] =
    Manifest.observations(manifest).collect().toIndexedSeq
      .map(r => (r.getString(0), r.getAs[String]("metafits_stem"),
        r.getSeq[String](1)))
}

object FileSet {
  /** Eagerly-validated construction, mirroring `__post_init__`: raises one
    * error listing ALL violations. */
  def validated(spark: SparkSession, files: Seq[String],
                config: GraftConfig = GraftConfig()): FileSet = {
    val fs = new FileSet(spark, files, config)
    val errors = fs.validate()
    if (errors.nonEmpty)
      throw new IllegalArgumentException("Validation errors:\n" + errors.mkString("\n"))
    fs
  }
}

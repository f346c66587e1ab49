package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one local SparkSession per suite (lazy), plus
  * suite-tracked scratch dirs — [[tmpDir]] registers each dir for
  * deletion in afterAll (runs even when tests fail), so repeated test
  * runs leave /tmp flat (the same contract HygieneSpec pins for the
  * query builders). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val trackedTmp =
    collection.mutable.ArrayBuffer.empty[java.io.File]

  /** A scratch dir deleted when the suite finishes. */
  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    trackedTmp.synchronized { trackedTmp += d }
    d.toString
  }

  override def afterAll(): Unit = {
    trackedTmp.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    super.afterAll()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 and graft.queries.Catalog for the
  * full inventory. */
object SparkEntry {

  /** Flagship query on sf=0.001: the 5-table revenue rollup (SURVEY Q5
    * shape). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    Engine.configure(spark)
    queries("q05_multijoin")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** DuckDB-runnable oracle SQL per query (omitted => rows-only check). */
  def oracleSql: Map[String, String] =
    graft.queries.Catalog.oracleSql
}

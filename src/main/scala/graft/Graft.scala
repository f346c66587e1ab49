package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade: one call to get the harness tables registered as
  * temp views (SQL-first usage) with graft's confs applied, plus typed
  * accessors to the operator modules.
  *
  * {{{
  * val spark = graft.Engine.session()
  * graft.Graft.registerTables(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT count(*) FROM lineitem").show()
  * }}}
  */
object Graft {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every harness table as a temp view (events with the
    * nanosecond-timestamp rebuild applied). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Engine.configure(spark)
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** The full query inventory (name -> builder). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = SparkEntry.queries
}

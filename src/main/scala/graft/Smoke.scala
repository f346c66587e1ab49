package graft

/** Smoke main: read every testdata table, print schema + row count. A
  * fast end-to-end check that the session configs (nanosAsLong, UTC) and
  * Tables readers hold against the current testdata. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session()
    val tables: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> (d => Tables.region(spark, d)),
      "nation" -> (d => Tables.nation(spark, d)),
      "customer" -> (d => Tables.customer(spark, d)),
      "supplier" -> (d => Tables.supplier(spark, d)),
      "part" -> (d => Tables.part(spark, d)),
      "orders" -> (d => Tables.orders(spark, d)),
      "lineitem" -> (d => Tables.lineitem(spark, d)),
      "events" -> (d => Tables.events(spark, d)),
      "documents" -> (d => Tables.documents(spark, d)),
      "embeddings" -> (d => Tables.embeddings(spark, d)))
    tables.foreach { case (name, reader) =>
      val df = reader(dir)
      println(s"[smoke] $name rows=${df.count()} schema=${df.schema.simpleString}")
    }
    spark.stop()
  }
}

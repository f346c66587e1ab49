package graft.queries

import graft.SparkSpec

/** Pins the session-hygiene contract for the query builders that touch
  * shared state: s18 must leave /tmp flat (its staging + stream
  * checkpoint dirs are transient), and q68 must not leave temp views —
  * and must never hijack a user-visible table name like "customer". */
class HygieneSpec extends SparkSpec {

  private def s18TmpDirs: Set[String] =
    Option(new java.io.File(System.getProperty("java.io.tmpdir")).list())
      .map(_.filter(_.startsWith("graft_s18_")).toSet).getOrElse(Set.empty)

  test("s18 build + run leaves no staging or checkpoint dirs behind") {
    val before = s18TmpDirs
    val n = Catalog.queries("s18_stream_funnel")(spark,
      "/root/testdata/sf0.001").count()
    assert(n > 0)
    assert(s18TmpDirs == before,
      s"s18 leaked temp dirs: ${s18TmpDirs -- before}")
  }

  test("q68 drops its query-scoped views and never shadows user names") {
    // a user's own view named "customer" must survive a q68 build
    spark.range(1).createOrReplaceTempView("customer")
    val n = Catalog.queries("q68_lateral")(spark,
      "/root/testdata/sf0.001").count()
    assert(n > 0)
    val views = spark.catalog.listTables().collect().map(_.name).toSet
    assert(!views.exists(_.startsWith("graft_q68_")),
      s"q68 left query-scoped views: $views")
    assert(spark.table("customer").columns.sameElements(Array("id")),
      "q68 clobbered the user's own 'customer' view")
    spark.catalog.dropTempView("customer")
  }
}

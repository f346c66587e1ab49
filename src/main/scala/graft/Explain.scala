package graft

/** Dev tool: print the formatted physical plan (and optionally run) a
  * catalog query. Usage: runMain graft.Explain <queryName> [sfDir] [run] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Engine.session(32)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("run")) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.count()
        println(f"[explain] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}

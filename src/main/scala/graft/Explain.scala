package graft

/** Plan-inspection main: executes a named SparkEntry query and prints
  * its FINAL adaptive physical plan (post-AQE, ReusedExchange and join
  * strategies resolved). The per-operator scale review ("is this the
  * plan I'd want on a 1000-executor cluster?") runs through here.
  *
  * Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.get()
    val df = SparkEntry.queries(name)(spark, sfDir)
    // collect() (not count()) — count() builds a separate QueryExecution,
    // leaving THIS plan unexecuted and its AQE stages unresolved
    val n = df.collect().length
    println(s"=== $name ($n rows at $sfDir) — final plan ===")
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}

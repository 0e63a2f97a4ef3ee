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
    // Execute THIS QueryExecution's RDD directly: df.count() (and a
    // noop-format write) each build a SEPARATE QueryExecution, leaving
    // this plan unexecuted and its AQE stages unresolved, while
    // df.collect() would materialize the full result on the driver —
    // fatal for a diagnostic run against a big query. RDD count moves
    // only per-partition longs.
    val n = df.queryExecution.toRdd.count()
    println(s"=== $name ($n rows at $sfDir) — final plan ===")
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}

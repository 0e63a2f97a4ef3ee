package graft

import org.apache.spark.sql.functions._

/** Scaling smoke for the dedup pipeline: replicate the documents table
  * N times (each replica near-duplicated by a trailing marker token, so
  * duplication rate stays high like a web crawl) and run the full
  * detect -> cluster -> survivors chain, timing each stage. The point
  * is the GROWTH CURVE, not the absolute numbers: candidate generation
  * must scale ~linearly in corpus size (bounded bucket sizes), and
  * clustering in O(log diameter) rounds — if either degrades
  * super-linearly here, it would fall over at 100 TB.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [replicas]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Sessions.get()
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val nBase = base.count()
    val corpus = (0 until replicas).map { r =>
      if (r == 0) base
      else base.select(
        (col("doc_id") + lit(r.toLong * 10_000_000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"))
    }.reduce(_ union _)
    val path = s"/tmp/graft_scale_${replicas}x"
    corpus.write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)
    println(s"[scale] corpus: ${nBase * replicas} docs ($replicas x $nBase)")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val candidates = time("lsh candidates") {
      val c = graft.operators.Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scale]   -> ${c.count()} candidate pairs")
      c
    }
    val verified = time("jaccard verify") {
      val v = graft.operators.Dedup
        .jaccardOnPairs(candidates, docs, "doc_id", "text", 40)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scale]   -> ${v.count()} verified pairs")
      v
    }
    val clusters = time("connected components") {
      val cl = graft.operators.Dedup.duplicateClusters(verified)
      println(s"[scale]   -> ${cl.count()} clustered docs, " +
        s"${cl.select("cluster_id").distinct().count()} clusters")
      cl
    }
    time("survivors") {
      val kept = docs.join(
        clusters.where(col("id") =!= col("cluster_id")).select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti").count()
      println(s"[scale]   -> $kept surviving docs")
    }
    spark.stop()
  }
}

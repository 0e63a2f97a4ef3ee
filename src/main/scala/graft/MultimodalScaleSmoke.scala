package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Scaling smoke for the fingerprint-dedup tier — the content-hash
  * sibling of [[GraphScaleSmoke]]: replicate the image-payload fixture
  * N times with disjoint ids (every copy renders the IDENTICAL pixel
  * content for its base id) and run the collapse-then-band pipeline at
  * 1x and Nx. Replication turns scale-up into LAW checks (wall-clock
  * printed for the record):
  *
  *  - collapse absorption: the DISTINCT-hash representative count is
  *    IDENTICAL at 1x and Nx — N more renders of the same images add
  *    zero representatives, which is precisely the property that keeps
  *    the quadratic pairing off the corpus-size axis.
  *  - pair invariance: the representative pair set (by base id and
  *    hamming) is IDENTICAL at every scale — banding over the same
  *    hash multiset cannot gain or lose a pair.
  *  - member linearity: star edges (member -> representative) number
  *    exactly nDocs - nReps at every scale — the only corpus-sized
  *    relation, and it is linear.
  *
  * Usage: runMain graft.MultimodalScaleSmoke [sfDir] [replicas]
  */
object MultimodalScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = Sessions.get()
    import spark.implicits._

    val baseIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    val stride = baseIds.agg(max("doc_id")).head().getLong(0) + 1L
    val nBase = baseIds.count()

    // the multimodal_image_neardup fixture, keyed on the BASE id so a
    // replica renders pixel-identical content under a fresh id
    def bmpsOf(n: Int): DataFrame =
      (0 until n).map { r =>
        baseIds.map { base =>
          val id = base + r.toLong * stride
          val g = base % 32
          val v = (base / 32) % 2
          val w = (16 + g % 5).toInt
          val h = (12 + g % 4).toInt
          (id, Multimodal.bmpBytes(w, h, (x, y) => {
            val bump = if (v == 1 && 2 * x < w) 40L else 0L
            ((((g + x * 7 + y * 13 + bump) % 256).toInt << 16) |
              (((g + x * 3 + y * 5) % 256).toInt << 8) |
              ((g + x + y) % 256).toInt)
          }))
        }.toDF("id", "payload")
      }.reduce(_ unionByName _)

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var basePairs: Set[(Long, Long, Int)] = Set.empty
    var baseReps = -1L

    for (n <- Seq(1, replicas)) {
      val ((nReps, nMembers, pairs), sec) = time {
        val hashes = Multimodal.decodeBmpDhash(bmpsOf(n), "id", "payload")
          .where(col("ok") === 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val reps = hashes.groupBy(col("dhash")).agg(min(col("id")).as("id"))
          val nR = reps.count()
          val nM = hashes.count() - nR
          val p = Dedup.fingerprintNearDuplicates(reps, "id", "dhash",
              bits = 64, maxHamming = 8)
            .collect()
            // pairs normalize to BASE ids: every replica of a base image
            // hashes identically, so the min-id representative is always
            // a copy-0 id and the base mapping is exact
            .map(r => (r.getLong(0) % stride, r.getLong(1) % stride, r.getInt(2)))
            .toSet
          (nR, nM, p)
        } finally hashes.unpersist()
      }

      if (nMembers != n * nBase - nReps)
        failures += s"x$n: ${nMembers} member edges != ${n * nBase} docs - $nReps reps"
      if (n == 1) { basePairs = pairs; baseReps = nReps }
      else {
        if (nReps != baseReps)
          failures += s"x$n: $nReps representatives != 1x count $baseReps — collapse leaked"
        if (pairs != basePairs)
          failures += s"x$n: representative pair set diverged from 1x " +
            s"(${(pairs -- basePairs).take(3)} extra, ${(basePairs -- pairs).take(3)} missing)"
      }
      println(f"[mm-scale] x$n%-4d (${n * nBase}%8d payloads): $nReps%5d reps, " +
        f"$nMembers%8d member edges, ${pairs.size}%6d rep pairs, $sec%6.2f s")
    }

    failures.foreach(f => System.err.println(s"[mm-scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Scaling smoke for the lexical-retrieval tier — the text-side sibling
  * of [[AnnScaleSmoke]]: replicate the documents table N times (fresh
  * ids, text unchanged, so every BM25 quantity — df, dl, N, total_len —
  * scales proportionally; scores shift only through the +1 smoothing
  * terms, which do not scale, so equality is asserted between the two
  * ACCESS PATHS at each scale, never across scales) and compare the
  * direct corpus-scan search against the build-once / serve-many
  * indexed split at 1x and Nx. Wall-clock is
  * printed for the record; the ASSERTED properties are structural:
  *
  *  - equivalence: the indexed serve returns the IDENTICAL (rank, id,
  *    score) list as the direct scan at every scale — the index is an
  *    access path, never a semantics change.
  *  - candidate law: the rows entering the scoring join are exactly
  *    sum(df(term)) over the query terms — the index admits postings
  *    for queried terms only, and their share of the postings relation
  *    stays a term-frequency property, NOT a corpus-size property
  *    (the fraction is asserted scale-invariant between 1x and Nx).
  *  - completeness: contiguous ranks 1..k at every scale.
  *
  * Usage: runMain graft.RetrievalScaleSmoke [sfDir] [replicas]
  */
object RetrievalScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(50)
    val terms = Seq("spark", "fast", "join")
    val k = 10
    val spark = Sessions.get()

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val stride = base.agg(max("doc_id")).head().getLong(0) + 1L
    val nBase = base.count()

    def corpusOf(n: Int): DataFrame = {
      val corpus = (0 until n).map { r =>
        if (r == 0) base
        else base.select((col("doc_id") + lit(r.toLong * stride)).as("doc_id"), col("text"))
      }.reduce(_ unionByName _)
      val path = s"/tmp/graft_retrieval_scale_${n}x"
      corpus.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    println(s"[retrieval-scale] base: $nBase docs; direct scan vs indexed serve at x1 and x$replicas (terms=${terms.mkString(",")}, k=$k)")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var fracAt1x = -1.0

    for (n <- Seq(1, replicas)) {
      val corpus = corpusOf(n)
      val nDocs = corpus.count()

      val (direct, directSec) = time {
        Retrieval.searchTopK(corpus, "doc_id", "text", terms, k)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      }
      val indexPath = s"/tmp/graft_retrieval_index_${n}x"
      val (_, buildSec) = time {
        Retrieval.buildIndex(corpus, "doc_id", "text", indexPath)
      }
      val (indexed, serveSec) = time {
        Retrieval.searchTopKIndexed(spark, indexPath, "doc_id", terms, k)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      }

      // equivalence: the access path must not change the answer
      if (indexed != direct)
        failures += s"x$n: indexed serve diverged from the direct scan:\n  direct  $direct\n  indexed $indexed"
      if (indexed.map(_._1) != (1 to indexed.length) || indexed.isEmpty)
        failures += s"x$n: ranks not contiguous from 1: ${indexed.map(_._1)}"

      // candidate law: scoring-join input rows == sum(df) over the
      // query terms; the admitted share of the postings relation is a
      // term property and must not grow with the corpus
      // a fresh buildIndex publishes exactly one segment; the law is
      // checked against its tables directly
      val postings = spark.read.parquet(s"$indexPath/segments/seg-00000/postings")
      val totalPostings = postings.count()
      val matched = postings.where(col("term").isin(terms: _*)).count()
      val sumDf = spark.read.parquet(s"$indexPath/segments/seg-00000/termdf")
        .where(col("term").isin(terms: _*))
        .agg(coalesce(sum("df"), lit(0L))).head().getLong(0)
      if (matched != sumDf)
        failures += s"x$n: candidate rows $matched != sum(df) $sumDf — index admits the wrong postings"
      val frac = matched.toDouble / totalPostings
      if (fracAt1x < 0) fracAt1x = frac
      else if (math.abs(frac - fracAt1x) > 0.01 * fracAt1x + 1e-9)
        failures += f"x$n: admitted-postings fraction $frac%.4f drifted from the 1x fraction $fracAt1x%.4f — serve-side share must be scale-invariant"

      println(f"[retrieval-scale] x$n%-4d ($nDocs%8d docs): direct $directSec%6.2f s, indexed SERVE $serveSec%6.2f s (one-off index build $buildSec%.2f s), candidates $matched%8d = ${frac * 100}%5.2f%% of ${totalPostings}%9d postings")
    }

    failures.foreach(f => System.err.println(s"[retrieval-scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}

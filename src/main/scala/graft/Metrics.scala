package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Pipeline metrics (reference: src/metrics.rs `Metric` trait +
  * `MetricsCollector`, wired in src/pipeline.rs:386-441). Spark-first
  * realization: `Dataset.observe` attaches named aggregate metrics to a
  * plan — they are computed DURING execution with zero extra passes —
  * and a `QueryExecutionListener` collects them per action. JSON export
  * mirrors the reference's collector output.
  */
object Metrics {

  /** Attach a row-count observation point named `name`. */
  def observeCount(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  /** Attach arbitrary observed aggregates. */
  def observe(df: DataFrame, name: String, aggs: (String, org.apache.spark.sql.Column)*): DataFrame = {
    require(aggs.nonEmpty, "Metrics.observe needs at least one aggregate")
    df.observe(name, aggs.map { case (n, c) => c.as(n) }.head, aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Collects observed metrics from every completed action on the
    * session it is registered with.
    */
  final class Collector extends QueryExecutionListener {
    private val metrics = new ConcurrentHashMap[String, Map[String, Any]]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        metrics.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
      }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

    def snapshot: Map[String, Map[String, Any]] = metrics.asScala.toMap

    /** Wait until a named observation arrives (listener delivery is
      * ASYNC — `df.collect(); snapshot` races the listener bus, so
      * read through this instead of hand-rolled sleep loops). Returns
      * the metric's fields, or None on timeout.
      */
    def await(name: String, timeoutMs: Long = 10000): Option[Map[String, Any]] = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!metrics.containsKey(name) && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
      Option(metrics.get(name))
    }

    /** JSON export (reference: MetricsCollector::export_json). */
    def toJson: String =
      snapshot.map { case (name, kvs) =>
        val fields = kvs.map { case (k, v) => s"${quote(k)}: ${render(v)}" }.mkString(", ")
        s"${quote(name)}: {$fields}"
      }.mkString("{", ", ", "}")

    private def quote(s: String): String = {
      val b = new StringBuilder("\"")
      s.foreach {
        case '"'          => b.append("\\\"")
        case '\\'         => b.append("\\\\")
        case '\n'         => b.append("\\n")
        case '\r'         => b.append("\\r")
        case '\t'         => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c            => b.append(c)
      }
      b.append('"').toString
    }

    private def render(v: Any): String = v match {
      case null       => "null"
      case n: Long    => n.toString
      case n: Int     => n.toString
      case n: Short   => n.toString
      case n: Byte    => n.toString
      case n: Double  => n.toString
      case n: Float   => n.toString
      case b: Boolean => b.toString
      case other      => quote(other.toString)
    }
  }

  /** Register a collector on the session; returns it for reading. */
  def install(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }
}

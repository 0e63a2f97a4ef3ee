package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing (reference: src/window.rs, src/helpers/tumbling.rs,
  * windowed_combine.rs). The reference's `Window::tumble` computes the
  * enclosing `[offset + k*size, ...)` interval and uses it as a grouping
  * key — exactly Spark's `window()` struct column, so every windowed
  * combine is a plain groupBy over the window struct: partial-aggregated
  * map-side, one shuffle, AQE-coalesced. Session windows (beyond the
  * reference, which has none) use Spark's native `session_window`.
  */
object Windowing {

  /** Tumbling event-time aggregation key (reference: src/window.rs:85-96). */
  def tumble(ts: Column, size: String): Column = window(ts, size)

  /** Sliding windows: each event lands in size/slide windows. */
  def slide(ts: Column, size: String, slideBy: String): Column = window(ts, size, slideBy)

  /** Tumbling aggregate with window start rendered as a stable string
    * key (timezone/precision-proof for cross-engine comparison).
    */
  def tumblingAgg(df: DataFrame, ts: String, size: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val groupCols = window(col(ts), size) +: keys.map(col)
    df.groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")
  }

  // one-call windowed combines (reference: src/helpers/windowed_combine.rs
  // sum/count/min/max/average_per_window and _per_key_and_window)

  def countPerWindow(df: DataFrame, ts: String, size: String, keys: Seq[String] = Nil): DataFrame =
    tumblingAgg(df, ts, size, keys, Seq(count(lit(1)).as("n")))

  def sumPerWindow(df: DataFrame, ts: String, size: String, valueCol: String, keys: Seq[String] = Nil): DataFrame =
    tumblingAgg(df, ts, size, keys, Seq(sum(valueCol).as("sum")))

  def minPerWindow(df: DataFrame, ts: String, size: String, valueCol: String, keys: Seq[String] = Nil): DataFrame =
    tumblingAgg(df, ts, size, keys, Seq(min(valueCol).as("min")))

  def maxPerWindow(df: DataFrame, ts: String, size: String, valueCol: String, keys: Seq[String] = Nil): DataFrame =
    tumblingAgg(df, ts, size, keys, Seq(max(valueCol).as("max")))

  def averagePerWindow(df: DataFrame, ts: String, size: String, valueCol: String, keys: Seq[String] = Nil): DataFrame =
    tumblingAgg(df, ts, size, keys, Seq(avg(valueCol).as("avg")))

  /** Session windows with a max `gap` of inactivity, per key. */
  def sessionAgg(df: DataFrame, ts: String, gap: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val groupCols = session_window(col(ts), gap) +: keys.map(col)
    df.groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss"))
      .drop("session_window")
  }
}

package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** O(k) bounded top-k state: entries kept sorted best-first, where
  * "better" means higher score, with lower id breaking ties (so the
  * result is merge-order invariant — the same determinism stance as the
  * reference's bounded-heap combiner, reference:
  * src/combiners/topk.rs:23-126).
  */
final class TopKState(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(score: Double, id: Long): Unit = {
    // NaN compares false both ways, so an admitted NaN would squat at
    // the tail and reject every later element while itself depending on
    // arrival order — exclude it outright (a NaN score is not a
    // ranking)
    if (score.isNaN) return
    if (n == k && !better(score, id, scores(k - 1), ids(k - 1))) return
    var pos = 0
    while (pos < n && !better(score, id, scores(pos), ids(pos))) pos += 1
    if (pos >= k) return
    val newN = math.min(n + 1, k)
    var j = newN - 1
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = score
    ids(pos) = id
    n = newN
  }

  def mergeIn(o: TopKState): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Per-group top-k as a native `TypedImperativeAggregate`: constant
  * O(k) state per group, map-side partially aggregated, shuffle payload
  * k entries per (group, map task). This replaces a
  * `row_number() OVER (PARTITION BY group ORDER BY score)` window for
  * top-k: the window shuffles and fully sorts EVERY candidate row per
  * group (one straggler partition per group at scale), while this
  * aggregate never holds more than k entries anywhere.
  *
  * Output: `array<struct<neighbor_id:bigint, score:double>>`, best
  * first, ties broken by lower id (deterministic under any
  * partitioning, retry or merge order).
  *
  * Reference analog: the bounded min-heap top-k combiner
  * (reference: src/combiners/topk.rs:23-126).
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKState] {

  require(k > 0, s"graft_top_k requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)
    )),
    containsNull = false
  )

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_top_k expects (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: TopKState): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new TopKState(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val id = bb.getLong
      st.insert(s, id)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_top_k"
}

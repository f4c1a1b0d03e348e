package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k collection: a binary min-heap over (score, id) whose
  * root is the WORST kept element under the ranking
  * (score desc, id asc), capacity-capped at k. Insertion is O(log k)
  * and a group never holds more than k elements, regardless of how
  * many rows feed it. */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** True iff (s1,id1) ranks WORSE than (s2,id2): lower score, or
    * equal score and larger id (ties broken toward smaller id). */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var worst = i
      if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == i) return
      swap(i, worst)
      i = worst
    }
  }

  def insert(s: Double, id: Long): Unit =
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (n > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id; siftDown()
    }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Kept elements ranked best-first: (score desc, id asc). */
  def sorted: Array[(Double, Long)] =
    Array.tabulate(n)(i => (scores(i), ids(i)))
      .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
}

/** Map-side-bounded top-k per group: keeps the k highest-scoring
  * (score, id) pairs, ranked (score desc, id asc), returned as a
  * sorted `array<struct<id, score>>`.
  *
  * This is the scale-safe replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id)` + a
  * `rank <= k` filter: the window form shuffles EVERY scored row and
  * sorts each group's entire candidate set on a single reducer
  * (O(|corpus|) rows per query for the ANN ranking), while this
  * aggregate is partial-aggregation-friendly — each map task keeps at
  * most k pairs per group (O(log k) insert into a bounded heap), the
  * shuffle carries ≤ k rows per (task, group), and the final merge is
  * a k-way heap merge. Plan shows ObjectHashAggregate partial/final
  * instead of Exchange + full-width Sort + Window
  * (PlanShapeSpec pins this).
  *
  * Null AND NaN scores are ignored. Nulls match the window form
  * (DESC ordering puts NULLs last; real candidates always outrank
  * them). NaN is an explicit DIVERGENCE from the window form: Spark's
  * DESC double ordering ranks NaN above every real score, but a NaN
  * cosine only arises from a zero-norm vector — a degenerate
  * candidate that must never displace a real neighbor — and the
  * heap's comparator cannot order NaN consistently anyway (all NaN
  * comparisons are false), so admitting it would corrupt the heap
  * invariant. Ties on score break toward the smaller id — identical
  * to `ORDER BY score DESC, id ASC`.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(8 + 16 * buffer.n)
    val out = new DataOutputStream(bytes)
    out.writeInt(buffer.k)
    out.writeInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      out.writeDouble(buffer.scores(i))
      out.writeLong(buffer.ids(i))
      i += 1
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(storageFormat))
    val heap = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val id = in.readLong()
      heap.insert(s, id)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** Column-API form: `topk(scoreCol, idCol, k)` aggregate. */
  def topk(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}

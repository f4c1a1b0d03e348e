package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with capacity k: at most k
  * counters; inserting a new key at capacity triggers the classic
  * reduction (subtract the (k+1)-th largest count from every counter,
  * drop non-positives). Merging is the Agarwal et al. "mergeable
  * summaries" rule — add counterpart counters, then reduce back to k —
  * under which the deterministic guarantees compose:
  *
  *   true_count - total/(k+1)  <=  estimate  <=  true_count
  *
  * and when the TRUE number of distinct keys is <= k no reduction
  * ever fires, so every count is EXACT (what the registered query
  * exploits to stay hash-checkable against a plain GROUP BY oracle).
  */
final class FreqSketch(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)

  /** Subtract the (k+1)-th largest count from all counters and drop
    * the non-positive ones; no-op while size <= k. */
  private def reduce(): Unit = {
    if (counts.size <= k) return
    val vals = new Array[Long](counts.size)
    var i = 0
    val it0 = counts.values.iterator()
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val cut = vals(vals.length - k - 1) // (k+1)-th largest
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - cut
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  def add(key: String, w: Long): Unit = {
    val cur = counts.get(key)
    counts.put(key, if (counts.containsKey(key)) cur + w else w)
    reduce()
  }

  def mergeFrom(other: FreqSketch): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey,
        if (counts.containsKey(e.getKey)) cur + e.getValue else e.getValue)
    }
    reduce()
  }

  /** (key, count) pairs, count desc then key asc. */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    arr.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
  }
}

/** Heavy-hitters aggregate: `topk_freq(key, k)` returns the capacity-k
  * Misra–Gries summary as a sorted `array<struct<key, cnt>>`.
  *
  * The scale contract mirrors [[TopKByScore]]: a bounded O(k) buffer
  * per (task, group) regardless of input size, partial-aggregation
  * friendly (ObjectHashAggregate partial/final), shuffle carries <= k
  * counters per task×group — where an exact GROUP-BY-count of a
  * high-cardinality key would shuffle every distinct key. Null keys
  * are ignored. */
case class TopKFreq(
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] {

  require(k > 0, s"topk_freq needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_freq"

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(k)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = key.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: FreqSketch): Any =
    new GenericArrayData(buffer.sorted.map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
    })

  override def serialize(buffer: FreqSketch): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buffer.k)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // Length-prefixed raw UTF-8 (not writeUTF, whose 64 KiB modified-UTF-8
      // ceiling would crash the shuffle on long keys).
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): FreqSketch = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(storageFormat))
    val sk = new FreqSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      val key = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong()
      sk.counts.put(key, c)
      i += 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0))
}

object TopKFreq {
  /** Column-API form: `topFreq(keyCol, k)` aggregate. */
  def topFreq(key: Column, k: Int): Column =
    Bridge.column(TopKFreq(Bridge.expression(key), k).toAggregateExpression())

  /** Register `topk_freq(key, k)` for SQL use; `k` must be an
    * integer literal (it sizes the sketch at plan time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_freq",
      exprs => {
        def fail(msg: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
        if (exprs.length != 2)
          fail(s"topk_freq(key, k) takes exactly 2 arguments, got ${exprs.length}")
        val kExpr = exprs(1)
        val integral = kExpr.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        if (!kExpr.foldable || !integral)
          fail("topk_freq's second argument must be an integer literal " +
            s"(it sizes the sketch at plan time), got ${kExpr.sql}")
        if (exprs.head.resolved && exprs.head.dataType != StringType)
          fail(s"topk_freq's key must be a string column, got ${exprs.head.dataType.sql}")
        TopKFreq(exprs.head, kExpr.eval(null).asInstanceOf[Number].intValue())
      },
      "built-in")
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash of a string's
  * code points, `h = fold(h * base + codePoint) mod P`, P = the
  * largest prime below 2³⁰ (so `h*base + cp` never overflows a long
  * for any base < 2³³).
  *
  * This exists for CROSS-ENGINE REPLAYABILITY, not raw speed: unlike
  * `xxhash64`, the fold is expressible in ANY engine with integer
  * arithmetic — the DuckDB oracle replays it as
  * `list_reduce(list_prepend(0, list_transform(string_split(s, ''),
  * c -> unicode(c))), (a, b) -> (a * base + b) % 1073741789)` — which
  * is what lets the MinHash and SimHash LSH pipelines be
  * hash-verified end-to-end against an independent engine instead of
  * rows-only checked. Two coprime bases (e.g. 31 and 37) give two
  * near-independent families for salted-hash constructions.
  *
  * Codegen emits one static call (no boxing, no digest allocation);
  * still ~2-3× cheaper than md5-then-parse and in the same ballpark
  * as xxhash64 for short tokens. Null propagates; empty string hashes
  * to 0 in both engines.
  */
case class PolyHash(child: Expression, base: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"polyhash expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"polyhash$base"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PolyHash.hash($a, $base);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Largest prime below 2³⁰. */
  val P = 1073741789L

  /** The fold, shared by interpreted eval and codegen (static
    * forwarder — callable from generated Java). Iterates CODE POINTS —
    * matching DuckDB's per-character `unicode()` — decoded straight
    * from the UTF-8 bytes, no String allocation. */
  def hash(s: UTF8String, base: Int): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var k = 1
        while (k < len) { cp = (cp << 6) | (s.getByte(i + k) & 0x3F); k += 1 }
      }
      h = (h * base + cp) % P
      i += len
    }
    h
  }

  /** Both base-31 and base-37 folds in ONE pass over the bytes,
    * packed as `h31 · 2³⁰ + h37` (both < P < 2³⁰, so
    * `packed >> 30 = h31` and `packed & (2³⁰−1) = h37` exactly).
    * This is the hot-path form: the salted-family construction needs
    * two hashes per string, and one decode pass beats two. */
  def hashPacked(s: UTF8String): Long = {
    val n = s.numBytes()
    var h31 = 0L
    var h37 = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var k = 1
        while (k < len) { cp = (cp << 6) | (s.getByte(i + k) & 0x3F); k += 1 }
      }
      h31 = (h31 * 31 + cp) % P
      h37 = (h37 * 37 + cp) % P
      i += len
    }
    (h31 << 30) + h37
  }

  /** Column-API form. */
  def polyhash(c: Column, base: Int): Column =
    Bridge.column(PolyHash(Bridge.expression(c), base))

  /** Column-API form of [[hashPacked]]. */
  def polyhashPacked(c: Column): Column =
    Bridge.column(PolyHashPacked(Bridge.expression(c)))

  /** The DuckDB replay of [[hash]] for oracle-SQL construction. */
  def duckdbSql(expr: String, base: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), c -> unicode(c))), " +
      s"(a, b) -> (a * $base + b) % $P)"
}

/** One-pass packed (base-31, base-37) variant — see
  * [[PolyHash.hashPacked]]. */
case class PolyHashPacked(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"polyhash_packed expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "polyhash_packed"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hashPacked(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PolyHash.hashPacked($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering: interleave the bits
  * of two bucketed dimensions so that sorting by ONE key co-locates
  * rows that are close in BOTH dimensions. Laid out at rest (range
  * partition + sort by the z-value), every file's min/max column
  * stats are tight for each dimension, so a predicate on EITHER
  * dimension prunes files — the property a single-column sort only
  * gives its leading column.
  *
  * The z-value is pure bit arithmetic on codegen'd longs (no UDF, no
  * shuffle); the layout write is one range exchange + in-partition
  * sort, the same cost as any sorted write.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (even positions) and `b`
    * (odd positions) into a single z-value. Inputs must be
    * pre-bucketed to `[0, 2^bits)` — mask or scale first. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The identical interleave as an ANSI SQL expression (for oracle
    * replay) — generated from the same loop, term for term. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${2 * i})",
      s"((($b >> $i) & 1) << ${2 * i + 1})")).mkString("(", " | ", ")")

  /** Cluster a frame for an at-rest z-layout: range-partition on the
    * z-value (so files tile the z-curve) and sort inside each
    * partition (so row groups tile it too). */
  def cluster(df: DataFrame, zCol: String, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, col(zCol)).sortWithinPartitions(col(zCol))
}

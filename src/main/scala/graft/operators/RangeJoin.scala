package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key — the case Spark plans
  * as a BroadcastNestedLoopJoin (or, worse, a cartesian product): for
  * every interval row, find the point rows with
  * `start <= point_ts <= end`.
  *
  * Scale path: discretize time into fixed-width buckets and turn the
  * inequality into an equi-join. Each point belongs to exactly ONE
  * bucket; each interval is exploded into every bucket it overlaps
  * (⌈len/width⌉+1 rows). Joining on the bucket id then applying the
  * residual `BETWEEN` filter yields each qualifying (interval, point)
  * pair exactly once — no dedup needed, because the point's single
  * bucket can meet a given interval copy only once.
  *
  * Cost model: one hash-partitioned shuffle on the bucket id on each
  * side (both time-local, so co-partitioning survives for repeated
  * joins at rest), interval duplication bounded by the bucket-count
  * span. Pick `bucketWidthSec` on the order of the typical interval
  * length: too small inflates the interval side, too large inflates
  * the per-bucket candidate pairs. Hot buckets (load spikes) are
  * plain join skew — AQE skew-join splits them, since this is an
  * ordinary equi-join after the rewrite.
  */
object RangeJoin {

  /** @param points   point side; `pointTs` timestamp column
    * @param intervals interval side; `[startCol, endCol]` bounds —
    *                  closed by default, open (strict) per end via
    *                  `closedStart`/`closedEnd`. The bucket span is
    *                  the same either way (a strictly-interior point
    *                  still lands in a spanned bucket); only the
    *                  residual comparison changes.
    * @param bucketWidthSec time-bucket width in seconds
    * @return inner-joined rows: all interval columns + all point
    *         columns (names must not collide). */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long,
      closedStart: Boolean = true,
      closedEnd: Boolean = true): DataFrame = {
    val w = lit(bucketWidthSec * 1000000L)
    val pb = points.withColumn("__bucket", floor(unix_micros(col(pointTs)) / w))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / w),
        floor(unix_micros(col(endCol)) / w))))
    val lo = if (closedStart) col(pointTs) >= col(startCol) else col(pointTs) > col(startCol)
    val hi = if (closedEnd) col(pointTs) <= col(endCol) else col(pointTs) < col(endCol)
    ib.join(pb, Seq("__bucket"))
      .filter(lo && hi)
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (interval × interval, closed bounds):
    * pairs where `[ls, le]` and `[rs, re]` intersect. Both sides
    * explode into their spanned buckets and equi-join on the bucket —
    * but unlike the point case a pair can now share SEVERAL buckets,
    * so each pair is emitted only in the FIRST bucket both occupy:
    * `bucket == max(bucket(ls), bucket(rs))` (the later start lies
    * inside both intervals whenever they overlap, so that bucket is
    * shared and unique) — dedup-free, no distinct stage. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidthSec: Long): DataFrame = {
    val w = lit(bucketWidthSec * 1000000L)
    def bucket(c: String): Column = floor(unix_micros(col(c)) / w)
    val lb = left.withColumn("__bucket",
      explode(sequence(bucket(lStart), bucket(lEnd))))
    val rb = right.withColumn("__bucket",
      explode(sequence(bucket(rStart), bucket(rEnd))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === greatest(bucket(lStart), bucket(rStart)))
      .drop("__bucket")
  }
}

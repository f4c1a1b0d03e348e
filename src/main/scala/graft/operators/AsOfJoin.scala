package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * with `right.ts <= left.ts` within the same key group (the
  * time-series point-in-time lookup Spark lacks as a built-in;
  * DuckDB's native `ASOF JOIN` is the oracle twin).
  *
  * Implementation is the union-sort trick rather than a custom
  * physical operator: tag both sides, union, and carry the latest
  * right payload forward with `last(ignoreNulls) OVER (PARTITION BY
  * key ORDER BY ts, side)`. The right payload travels as ONE struct
  * column (null marks left rows), so right rows whose payload fields
  * are themselves null are still carried faithfully. Right rows sort
  * before left rows at equal timestamps, so an exact-tie right row is
  * visible to its left row (<= semantics).
  *
  * Cost: one shuffle + one per-key sort — the profile of a sort-merge
  * join; no driver involvement; skew bounded by key cardinality.
  * Composing built-ins keeps everything inside Tungsten; a custom
  * SparkPlan would only be warranted if the window sort became the
  * bottleneck.
  */
object AsOfJoin {

  /** @param keyCol  equi-key column name present on both sides
    * @param leftTs  event-time column on the left (probe) side
    * @param rightTs event-time column on the right (reference) side
    * @param payload right-side columns to attach
    * @param tolerance optional max staleness (an interval column,
    *        e.g. `expr("INTERVAL 30 MINUTES")`): a match older than
    *        `leftTs - tolerance` is nulled out — pandas
    *        `merge_asof(tolerance=...)` semantics, the usual
    *        freshness guard in feature-lookup pipelines. Applied
    *        AFTER the carry-forward, so it costs one projection, not
    *        a second window. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    // the right event time rides inside the payload struct so the
    // tolerance check can see it after the carry-forward
    val payloadStruct = struct(payload.map(col) :+ col(rightTs).as("__rts"): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType

    val taggedRight = right.select(
      (col(keyCol).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(keyCol).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(payloadType).as("__p") +:
        leftCols.map(col(_))): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val gated = tolerance match {
      case Some(tol) => carried.withColumn("__p",
        when(col("__p.__rts") >= col("__ts") - tol, col("__p")))
      case None => carried
    }
    gated.select(leftCols.map(col(_)) ++ payload.map(c => col(s"__p.$c").as(c)): _*)
  }
}

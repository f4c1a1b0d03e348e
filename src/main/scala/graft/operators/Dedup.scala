package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact dedup by key (reference op R-2, `src/helper/helper.py:148`).
  *
  * Two forms:
  *  - [[apply]]: order-agnostic `dropDuplicates` — one hash-aggregate,
  *    map-side partial combine, the cheapest distributed dedup.
  *  - [[firstOccurrence]]: reference-faithful "keep first in file
  *    order" via `row_number()` over an explicit ordering. Costs a
  *    shuffle + per-key sort; only use when arrival order matters.
  *
  * At 100 TB both shuffle by key once; `dropDuplicates` additionally
  * benefits from partial aggregation before the exchange.
  */
object Dedup {

  def apply(df: DataFrame, keyCols: String*): DataFrame =
    df.dropDuplicates(keyCols)

  def firstOccurrence(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

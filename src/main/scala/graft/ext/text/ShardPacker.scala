package graft.ext.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard assignment — the sequence-packing precursor: lay
  * documents out in id order and cut shards every `budget` tokens, so
  * each output shard holds a contiguous, ≈budget-token slice of the
  * corpus (what a training-data pipeline does before writing packed
  * example files).
  *
  * The core is a GLOBAL prefix sum of token counts. A naive
  * `Window.orderBy(id)` with no partition key is a single-task sort —
  * the canonical Spark scale trap — so this uses the two-level
  * distributed form instead:
  *
  *  1. bucket rows by id range (`id div bucketWidth` — a map-only
  *     projection, ids are the natural range key);
  *  2. windowed prefix sum WITHIN each bucket (shuffle keyed by
  *     bucket; parallelism = number of buckets);
  *  3. per-bucket totals (hash-agg, map-side combine) → running
  *     offsets via a window over the BUCKET TOTALS frame — metadata
  *     rows (one per bucket), so the unpartitioned window there sorts
  *     thousands of rows, not the corpus;
  *  4. broadcast the offsets back and add.
  *
  * Token counting runs twice (steps 2 and 3 both consume the base
  * projection) — a deliberate trade: both passes are map-only codegen
  * over the scan, cheaper at scale than caching the corpus.
  */
object ShardPacker {

  /** (id, n_tokens, cum_tokens, shard_id) for every document; a
    * document's shard is determined by its START offset, so documents
    * straddling a boundary belong to the shard they start in. */
  def packShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      bucketWidth: Long = 100): DataFrame = {
    val base = docs.select(
      col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      floor(col(idCol) / bucketWidth).as("__b"))
    val within = base.withColumn("__cum",
      sum(col("n_tokens")).over(
        Window.partitionBy(col("__b")).orderBy(col(idCol))))
    val offsets = base
      .groupBy(col("__b")).agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__off",
        coalesce(
          sum(col("__tot")).over(
            Window.orderBy(col("__b"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__b"), col("__off"))
    within.join(broadcast(offsets), Seq("__b"))
      .withColumn("cum_tokens", col("__off") + col("__cum"))
      .withColumn("shard_id",
        floor((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
      .select(col(idCol), col("n_tokens"), col("cum_tokens"), col("shard_id"))
  }
}

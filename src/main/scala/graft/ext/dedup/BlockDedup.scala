package graft.ext.dedup

import graft.ext.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document (paragraph/block-level) deduplication: split every
  * document into fixed-size token blocks, keep each distinct block
  * only at its FIRST occurrence corpus-wide (lowest doc id, then
  * block position), and reconstruct documents from their surviving
  * blocks — the line/paragraph-level dedup pass web-scale corpus
  * pipelines run (RefinedWeb/CCNet remove repeated boilerplate lines
  * across pages; fixed token blocks stand in for lines here because
  * the synthetic corpus has no line structure).
  *
  * Scale posture: one explode (corpus × blocks-per-doc rows, ids +
  * short block strings only), one shuffle keyed by block content for
  * the first-occurrence window, one shuffle back by doc id for
  * reconstruction. The block window sorts only within identical
  * blocks (group size = duplication factor, bounded by construction);
  * nothing is all-pairs.
  */
object BlockDedup {

  /** (id, n_blocks, n_kept, text_kept) per document; `text_kept`
    * rejoins the surviving blocks in position order. Documents whose
    * every block was seen earlier keep an empty string. */
  def dedupBlocks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockTokens: Int = 20): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // ceil(n/blockTokens) block slices; the final partial block keeps
    // its stragglers
    // empty docs produce zero blocks (sequence(0,-1) would throw, so
    // gate on token count); they are absent from the output like any
    // doc whose block list is empty
    val blocks = docs.select(
      col(idCol).as("doc"),
      posexplode(
        when(size(toks) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              (ceil(size(toks) / lit(blockTokens.toDouble)) - 1).cast("int")),
            i => concat_ws(" ", slice(toks, i * blockTokens + 1, lit(blockTokens)))))))
      .select(col("doc"), col("pos"), col("col").as("block"))
    val firstSeen = blocks.withColumn("rk",
      row_number().over(
        Window.partitionBy(col("block"))
          .orderBy(col("doc"), col("pos"))))
    val kept = firstSeen.filter(col("rk") === 1)
    blocks.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_blocks"))
      .join(
        kept.groupBy(col("doc"))
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(" ", array_sort(
              collect_list(struct(col("pos"), col("block"))))
              .getField("block")).as("text_kept")),
        Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }
}

package graft.ext.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window preparation
  * step of an LLM training/retrieval pipeline: each document becomes
  * overlapping token-window chunks (`window` tokens every `stride`,
  * so consecutive chunks overlap by `window − stride`).
  *
  * Pure map + bounded explode (each row fans out to
  * ⌈n_tokens/stride⌉ chunks), zero shuffle — the shape survives any
  * corpus size, and chunk identity (`doc_id`, `chunk_id`) is
  * deterministic so reruns and engines agree row for row. Chunk ids
  * are `start div stride` (starts are exact stride multiples), which
  * replays as plain arithmetic in SQL.
  */
object Chunker {

  def chunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val ts = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), ts.as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col(idCol),
        explode(sequence(lit(0), size(col("ts")) - 1, lit(stride))).as("start"),
        col("ts"))
      .select(col(idCol),
        (col("start") / stride).cast("int").as("chunk_id"),
        col("start"),
        slice(col("ts"), col("start") + 1, lit(window)).as("ctoks"))
      .select(col(idCol), col("chunk_id"), col("start"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }
}

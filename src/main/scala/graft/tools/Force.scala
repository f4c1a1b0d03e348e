package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark forcing that computes EVERY output value of a query.
  *
  * `df.count()` — the forcing both benches used through round 7 —
  * lets Catalyst prune the query's computed columns: a count over a
  * pure projection collapses to parquet footer metadata, and a count
  * over a left join whose right side is an aggregate on the join key
  * drops the join entirely. The measured cell then times plan
  * pruning, not the operator — docs_lm_score "scored" 5 M docs in
  * 0.14 s that way (found mid-round-7; the flat token_stats/keygen
  * ladder rows had the same cause).
  *
  * [[rows]] instead aggregates `count(*)` together with a 64-bit hash
  * over ALL output columns: every computed value must be produced
  * (nothing upstream can be pruned or eliminated), while the query's
  * final presentation ORDER BY is still optimized away — ordering is
  * output formatting, not operator work, and count() never paid it
  * either, so cross-round comparability of the non-degenerate cells
  * is preserved. The added per-row hash is noise next to any real
  * operator work.
  */
object Force {

  /** Execute `df` end to end (all output values computed) and return
    * its row count. The hash aggregate is `bit_xor` — order-free and
    * overflow-free under ANSI mode (a `sum` of hashes overflows
    * BIGINT immediately). */
  def rows(df: DataFrame): Long = {
    // Column-API aggregate (no string-interpolated expr): survives
    // backticks/special characters in output column names (round-7
    // ADVICE). Duplicate names still throw (ambiguous reference) —
    // no registry query emits duplicates, and a duplicate would be a
    // bug worth failing on.
    val hash = xxhash64(df.columns.toIndexedSeq.map(c => df.col(s"`$c`")): _*)
    df.agg(count(lit(1)).as("n"), bit_xor(hash).as("h"))
      .head().getLong(0)
  }
}

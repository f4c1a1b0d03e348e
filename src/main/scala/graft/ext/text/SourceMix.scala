package graft.ext.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-based source mixing: per-domain sampling rates ∝
  * n_domain^α — the standard flatten-the-distribution mix
  * (multilingual/multi-corpus training recipes since GPT-3 / mT5) —
  * then a DETERMINISTIC hash sample at that rate: keep a doc iff
  * `polyhash31(text) < floor(rate · P)`.
  *
  * Scale shape: ONE corpus aggregate whose result is mix METADATA
  * (|domains| rows, collected and folded driver-side — embedding the
  * aggregate's lineage in both the weight-sum subplan and the rates
  * side would execute the full-corpus pass twice, and a one-row
  * cross-joined aggregate frame plans as a gate-tripping
  * BroadcastNestedLoopJoin), a broadcast rate table, and a map-only
  * filter — the corpus itself never shuffles.
  *
  * Cross-engine FP discipline (what keeps the registry row
  * hash-exact): α-weights round to 6 dp and sum as exact DECIMAL
  * (double summation order differs between engines); every remaining
  * step is an identical left-associated double chain rounded to 9 dp;
  * the keep decision compares INTEGERS (hash < floor(rate·P)), so no
  * boundary can flip on the last ulp. α = 0.5 goes through `sqrt`
  * (correctly rounded, both engines) rather than `pow`.
  */
object SourceMix {

  /** Sampled mix: one row per KEPT doc — (idCol, domainCol, rate).
    * `domainCol` must be a string column; `targetFrac` scales the
    * overall keep fraction (rates clamp at 1). */
  def sample(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, alpha: Double = 0.5,
      targetFrac: Double = 0.5): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(docs.schema(domainCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"source-mix domain column '$domainCol' must be string")
    val stLocal = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def wOf(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val wsum = stLocal.map { case (_, n) =>
      java.math.BigDecimal.valueOf(wOf(n))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue
    val nTotal = stLocal.map(_._2).sum
    val wCol =
      if (alpha == 0.5) sqrt(col("n_docs")) else pow(col("n_docs"), lit(alpha))
    val rates = stLocal.toDF(domainCol, "n_docs")
      .withColumn("w", round(wCol, 6))
      .withColumn("rate",
        round(least(lit(1.0),
          col("w") / lit(wsum) * lit(targetFrac) * lit(nTotal) / col("n_docs")),
          9))
      .select(col(domainCol), col("rate"),
        floor(col("rate") * lit(graft.functions.PolyHash.P)).cast("long")
          .as("__cut"))
    docs.join(broadcast(rates), domainCol)
      .filter(graft.functions.PolyHash.polyhash(col(textCol), 31) < col("__cut"))
      .select(col(idCol), col(domainCol), col("rate"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the left
  * (fact) side, a plain shuffle join sends that key's rows to a
  * single reducer. Salting splits each key into `salts` sub-keys:
  * the skewed side gets a deterministic per-row salt and the small
  * side is replicated `salts` times, so the hot key spreads across
  * `salts` reducers. Results are row-identical to the unsalted join
  * (tests assert this).
  *
  * Spark's AQE skew-join handles sort-merge cases adaptively at
  * runtime; this explicit operator covers the cases AQE cannot —
  * pre-aggregation fan-out, deterministic plans for cost review, and
  * engines/configs where AQE is off. The salt is `pmod(hash(entire
  * left row id cols), salts)` — deterministic, no rand(), so retries
  * and speculative tasks stay consistent.
  */
object SaltedJoin {

  def apply(
      skewed: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltSource: Seq[String]): DataFrame = {
    require(salts > 0)
    val saltedLeft = skewed.withColumn("__salt",
      pmod(hash(saltSource.map(col): _*), lit(salts)))
    val replicatedRight = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLeft
      .join(replicatedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}

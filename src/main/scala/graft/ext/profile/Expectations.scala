package graft.ext.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ /
  * Great-Expectations pattern): a suite of named row-level
  * constraints evaluated in ONE aggregation pass — each check is a
  * conditional count over the same scan, so adding checks costs
  * columns, not jobs — plus the one set-level check (key uniqueness)
  * that inherently needs a distinct count. Emits one row per check:
  * violations, row count, pass flag. A pipeline gates promotion on
  * `pass` exactly like the reference gates on its target-table
  * precheck.
  */
object Expectations {

  /** A named expectation: `violated` is the per-row VIOLATION
    * predicate (null-safe — write it so null evaluates true when null
    * itself is the violation). */
  case class Check(name: String, violated: Column)

  def notNull(name: String, c: Column): Check =
    Check(name, c.isNull)

  def inRange(name: String, c: Column, lo: Column, hi: Column): Check =
    Check(name, c.isNull || c < lo || c > hi)

  def inSet(name: String, c: Column, values: Seq[String]): Check =
    Check(name, c.isNull || !c.isInCollection(values))

  /** Evaluate row-level checks (one pass) and, optionally, a
    * uniqueness expectation on `uniqueKey` (count vs distinct count —
    * the only check that cannot be a conditional count). Output:
    * (check_name, n_violations, n_rows, pass), one row per check, ordered
    * by check name. */
  def validate(
      df: DataFrame,
      checks: Seq[Check],
      uniqueKey: Option[(String, Column)] = None): DataFrame = {
    // The report row is read back by column name, so names must be
    // unique and must not collide with the reserved row-count slot —
    // `getAs` silently resolves to the first match otherwise.
    val allNames = checks.map(_.name) ++ uniqueKey.map(_._1).toSeq
    require(!allNames.contains("__n"),
      "Expectations: check name '__n' is reserved for the row count")
    val dup = allNames.diff(allNames.distinct).distinct
    require(dup.isEmpty,
      s"Expectations: duplicate check name(s): ${dup.mkString(", ")}")
    val aggs =
      // coalesce: sum over ZERO rows is null, which would NPE when
      // unboxed into a primitive Long below — an empty frame must
      // report zero violations, not crash
      checks.map(ch =>
        coalesce(sum(when(ch.violated, 1L).otherwise(0L)), lit(0L)).as(ch.name)) ++
        uniqueKey.map { case (n, c) =>
          (count(lit(1)) - count_distinct(c)).as(n)
        }.toSeq :+
        count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val names = checks.map(_.name) ++ uniqueKey.map(_._1).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val r = row.collect()(0) // one row of longs: the report itself
    val n = r.getAs[Long]("__n")
    names.map(nm => (nm, r.getAs[Long](nm), n, r.getAs[Long](nm) == 0L))
      .toDF("check_name", "n_violations", "n_rows", "pass")
      .orderBy(col("check_name"))
  }
}

package graft.ext.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-domain frequency caps — the C4/RefinedWeb-style curation rule
  * "keep at most N documents per domain", which stops a handful of
  * boilerplate-heavy hosts (mirrors, SEO farms, auto-generated docs)
  * from dominating a crawl-scale training mix. Deterministic form:
  * the N LOWEST-id documents of each domain survive (first-N in
  * arrival order under the repo's monotone-id convention — the
  * Dedup/BlockDedup first-occurrence rule applied per domain).
  *
  * Scale shape — ONE exchange, no window, no join:
  *  - the naive spelling is `row_number() OVER (PARTITION BY domain
  *    ORDER BY id) <= N`, which shuffles EVERY row full-width and
  *    sorts each domain's entire slice on one reducer — a hot domain
  *    (the exact pathology the cap exists for) becomes the straggler;
  *  - this form aggregates with the bounded-heap
  *    [[graft.functions.TopKByScore]] (score = −id, so top-k = k
  *    smallest — the docs_fingerprint idiom): each map task keeps ≤ N
  *    (id, score) pairs per domain, the shuffle carries ≤ N rows per
  *    (task, domain), the merge is a k-way heap merge, and the plan
  *    is ObjectHashAggregate partial/final with NO Sort or Window;
  *  - survivors are just the exploded heap contents (the output
  *    columns are id/domain/domain-total, so nothing joins back to
  *    the corpus — a caller needing full rows semi-joins on the
  *    id column, a build side of ≤ N·|domains| rows).
  * −id is exact in double for ids < 2^53 (the TopKByScore score
  * channel; corpus ids at any realistic scale).
  */
object DomainCap {

  /** Capped survivors: one row per KEPT document —
    * (idCol, domainCol, n_domain) where n_domain is the domain's
    * pre-cap total (the observability column curation reports want:
    * how hard was each domain cut). Domains under the cap keep all
    * their rows.
    *
    * Non-null-id contract, enforced loudly: the TopKByScore heap
    * skips null scores, so a null-id row would silently shrink its
    * domain's kept set below N while still counting in n_domain. The
    * per-domain null count rides the SAME aggregate (no extra scan)
    * and an `assert_true` filter over the ≤ N·|domains| survivor rows
    * throws at execution — the [[graft.sinks.ParquetUpsertSink]]
    * null-key posture. */
  def cap(docs: DataFrame, idCol: String, domainCol: String,
      maxPerDomain: Int): DataFrame =
    docs
      .groupBy(col(domainCol))
      .agg(
        graft.functions.TopKByScore.topk(
          -col(idCol).cast("double"), col(idCol), maxPerDomain).as("top"),
        count(lit(1)).as("n_domain"),
        count(when(col(idCol).isNull, lit(1))).as("__null_ids"))
      // explode_outer, not explode: an all-null-id domain has an
      // EMPTY heap, and plain explode would drop its group row before
      // the assert could see the null count
      .select(col(domainCol), col("n_domain"), col("__null_ids"),
        explode_outer(col("top")).as("t"))
      .filter(assert_true(col("__null_ids") === 0,
        lit(s"null values in domain-cap id column '$idCol' are " +
          "unsupported (the bounded heap would silently under-fill " +
          "the domain's kept set)")).isNull)
      .select(col("t.id").as(idCol), col(domainCol), col("n_domain"))
}

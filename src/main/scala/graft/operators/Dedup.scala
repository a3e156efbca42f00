package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus deduplication operators for training-data pipelines.
  *
  * Scale notes (the 100 TB shapes):
  *  - exact dedup is one hash-shuffle on a 64-bit digest (never on the
  *    full text) — map-side partial aggregation collapses most
  *    duplicates before the exchange;
  *  - MinHash/LSH shuffles (doc_id, band_hash) pairs — b small rows per
  *    document, NOT the text — and only candidate pairs (a vanishing
  *    fraction) are re-joined against the shingle sets for exact
  *    Jaccard verification;
  *  - SimHash shuffles one 64-bit fingerprint per document per rotation.
  *
  * Hot-bucket guard: an LSH bucket holding c near-identical documents
  * (boilerplate pages at web scale) emits c²/2 candidate pairs — a
  * quadratic blowup no cluster survives. Two mitigations, both on by
  * default in the near-dup operators:
  *  1. identical content is collapsed to one representative (min id)
  *     BEFORE signatures — exact copies are `exactGroups`' business and
  *     would otherwise fill every band's bucket with the same text.
  *     This is an OUTPUT CONTRACT, not just an optimization: the pair
  *     operators emit pairs over content-DISTINCT documents (min-id
  *     representatives); pairs among or through exact copies are
  *     deliberately absent (a g-copy group would owe g²/2 trivial
  *     pairs — quadratic output for information `exactGroups` states
  *     in one row). Full closure = compose the pair set with
  *     `exactGroups`' membership. The DuckDB oracles encode the same
  *     collapse;
  *  2. buckets wider than `maxBucket` are skipped (over-cap keys are
  *     aggregated map-side and anti-joined back as a tiny broadcast —
  *     the bucketed rows never shuffle for the cap). Skipping a bucket
  *     drops candidates only
  *     from that band/rotation — MinHash pairs can still surface via
  *     the other `bands−1` bands; the audit view of what was dropped
  *     is [[hotBuckets]].
  */
object Dedup extends Logging {

  /** Drop bucket keys wider than maxBucket; logs that the guard is
    * active. Shape: aggregate-count the OVER-cap keys (map-side partial
    * aggregation, then a shuffle of distinct keys only) and anti-join
    * them back. Over-cap keys are few by construction — pathological
    * buckets — so the anti-join broadcasts even at 100 TB and the
    * bucketed rows themselves never shuffle for the cap. (A
    * Window-count formulation was measured to plan a full extra
    * shuffle+sort of the band keys on EACH side of the downstream
    * self-join — exchange reuse does not fire across a self-join's
    * sides under AQE; PlanSpec pins the new shape.)
    */
  private[graft] def capBuckets(bucketed: DataFrame, maxBucket: Int, keys: Seq[String]): DataFrame = {
    if (maxBucket == Int.MaxValue) return bucketed // cap disabled: skip the width pass
    logInfo(s"LSH hot-bucket cap active: dropping buckets wider than $maxBucket " +
      s"on (${keys.mkString(", ")}); audit dropped buckets via Dedup.hotBuckets")
    val overCap = hotBuckets(bucketed, maxBucket, keys)
      .select(keys.map(col): _*)
    bucketed.join(broadcast(overCap), keys, "left_anti")
  }

  /** Audit view: the over-cap bucket keys and widths a near-dup run
    * would skip (lazy — count/inspect it without paying for it in the
    * main pipeline).
    */
  def hotBuckets(bucketed: DataFrame, maxBucket: Int, keys: Seq[String]): DataFrame =
    bucketed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_width"))
      .filter(col("bucket_width") > maxBucket)

  /** One representative (min id) per distinct content — identical texts
    * collapse before LSH so exact copies can't form hot buckets.
    *
    * Shape: aggregate (digest, len) → min id (16-byte shuffle rows
    * with map-side partials, same as [[exactGroups]]), then semi-join
    * the keep-ids back. The text payload never shuffles: AQE
    * broadcasts the id set when it fits, and even the SMJ fallback
    * moves 8-byte ids against the docs' existing layout — vs the
    * previous Window-over-content-key formulation, which repartitioned
    * AND sorted every text by digest just to tag the min id.
    */
  private[graft] def contentRepresentatives(
      docs: DataFrame, idCol: String, contentKey: Column): DataFrame = {
    val keep = docs.groupBy(contentKey.as("__ck"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__ck")
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact duplicate groups by content digest. Groups on xxhash64(text)
    * + length (collision belt-and-braces) rather than the raw text so
    * the shuffle carries 16 bytes per doc, keeps the minimum id as the
    * canonical representative.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(xxhash64(col(textCol)).as("content_hash"),
        length(col(textCol)).as("content_len"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Rows of `docs` surviving exact dedup (minimum id per content). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Representative→member edges of the exact-duplicate groups:
    * (id_a = min id of the content group, id_b = every other member).
    * This is the composition half of the near-dup pair contract — the
    * pair operators emit pairs over content-DISTINCT representatives,
    * and full duplicate-cluster closure is those pairs PLUS these
    * membership edges (see the class note above). Same 16-byte
    * (digest, len) shuffle shape as [[exactGroups]]; the text never
    * moves.
    */
  def exactMemberEdges(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = docs.select(col(idCol),
      xxhash64(col(textCol)).as("__h"), length(col(textCol)).as("__l"))
    val reps = keyed.groupBy(col("__h"), col("__l")).agg(min(col(idCol)).as("id_a"))
    keyed.join(reps, Seq("__h", "__l"))
      .filter(col(idCol) =!= col("id_a"))
      .select(col("id_a"), col(idCol).as("id_b"))
  }

  /** MinHash + LSH near-duplicate candidate pairs, verified by exact
    * Jaccard over word `shingleN`-gram sets.
    *
    * Pipeline: shingle → 64-hash MinHash signature → `bands` band keys
    * → explode → self-join on band key (the only shuffle, on 8-byte
    * keys) → distinct candidate pairs → join back to shingle sets →
    * exact Jaccard filter at `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 256): DataFrame = {
    // signatures + shingle-hash sets via the native expressions (one
    // hash pass per document, 8-byte shingle elements instead of
    // strings); pinned for the scope because the pipeline reads them
    // four times (two band-join sides + two verify sides), and
    // released when the (small) verified pair list materializes — the
    // operator is self-cleaning, no session-lifetime persist. At
    // cluster scale this would be a checkpoint to storage instead.
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, bands * rowsPerBand)
    CacheScope.pinned(sigs)(
      minhashPairsFrom(sigs, bands, rowsPerBand, threshold, maxBucket))
  }

  /** The signature/shingle-set projection feeding [[minhashPairsFrom]]. */
  private[graft] def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, nHashes: Int): DataFrame = {
    import graft.functions.expressions.TextHashFunctions._
    val reps = contentRepresentatives(docs, idCol,
      struct(xxhash64(col(textCol)), length(col(textCol))))
    reps
      .select(col(idCol).as("id"),
        shingle_hashes(col(textCol), shingleN).as("shingles"),
        minhash_sig(col(textCol), shingleN, nHashes).as("sig"))
      .filter(size(col("shingles")) > 0)
  }

  /** The LAZY band-join + verify pipeline over pre-built signatures —
    * exposed for plan-shape specs (the public operator returns an
    * eagerly checkpointed result whose plan is a leaf).
    */
  private[graft] def minhashPairsFrom(
      sigs: DataFrame, bands: Int, rowsPerBand: Int,
      threshold: Double, maxBucket: Int): DataFrame = {
    import graft.functions.expressions.TextHashFunctions._
    val bandKeys = capBuckets(
      sigs
        .select(col("id"), explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash")),
      maxBucket, Seq("band", "band_hash"))

    // bucket-grouped candidate generation: collect each bucket's ids
    // (bounded by the cap, so a group buffer is ≤ maxBucket longs) and
    // expand the i<j pairs locally — ONE exchange of the capped band
    // keys instead of a self-join shuffling and sorting BOTH sides
    // (exchange reuse does not fire across a self-join's sides under
    // AQE). sort_array + ordered expansion yields exactly the
    // l.id < r.id pairs of the join formulation — same multiset, same
    // distinct() — and the DuckDB replay oracles already use this
    // grouped-list form.
    val candidates = bandKeys
      .groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(
          slice(col("ids"), i + lit(2),
            greatest(size(col("ids")) - i - lit(1), lit(0))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()

    val shA = sigs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = sigs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates
      .join(shA, "id_a")
      .join(shB, "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-duplicate pairs at Hamming distance <= maxDistance.
    *
    * Block on rotations of the 64-bit fingerprint (4 blocks of 16
    * bits): any pair within Hamming distance 3 shares at least one
    * untouched 16-bit block (pigeonhole), so candidate generation is a
    * self-join on (block_idx, block_value) — an 8-byte-key shuffle —
    * followed by exact popcount verification.
    */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3,
      maxBucket: Int = 256): DataFrame = {
    val reps = contentRepresentatives(docs, idCol,
      struct(xxhash64(col(textCol)), length(col(textCol))))
    // fingerprints feed both self-join sides; pinned for the scope,
    // released when the pair list materializes (see CacheScope)
    val prints = reps.select(col(idCol).as("id"),
      graft.functions.expressions.TextHashFunctions.simhash64_fast(col(textCol)).as("sh"))
    CacheScope.pinned(prints)(simhashPairsFrom(prints, maxDistance, maxBucket))
  }

  private def simhashPairsFrom(
      prints: DataFrame, maxDistance: Int, maxBucket: Int): DataFrame = {
    val blocks = capBuckets(
      prints.select(
        col("id"), col("sh"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("block"),
            shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("block_val"))): _*)).as("bk"))
        .select(col("id"), col("sh"), col("bk.block").as("block"), col("bk.block_val").as("block_val")),
      maxBucket, Seq("block", "block_val"))
    blocks.as("l")
      .join(blocks.as("r"),
        col("l.block") === col("r.block") &&
          col("l.block_val") === col("r.block_val") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming64(col("l.sh"), col("r.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    * bucketing generates candidates (vectors sharing a `planes`-bit
    * sign bucket), exact cosine verifies at `threshold`. The bucket
    * self-join shuffles an 8-byte key per vector; only same-bucket
    * pairs carry vectors.
    *
    * `probeBits=1` turns on multi-probe: one side of the self-join also
    * probes the `planes` buckets one sign-flip away, recovering pairs
    * that disagree on exactly one near-orthogonal hyperplane. Each
    * qualifying pair is still generated exactly once (a pair at bucket
    * Hamming distance d ≤ 1 matches via exactly one probe of the left
    * side), at `planes+1`× the left side's shuffle rows — keys only,
    * never vectors.
    */
  def embeddingNearDupPairs(
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      planes: Int = 8,
      threshold: Double = 0.95,
      maxBucket: Int = 256,
      probeBits: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions
    require(probeBits >= 0 && probeBits <= 1, "probeBits supports 0 or 1")
    val reps = contentRepresentatives(vectors, idCol, xxhash64(col(vecCol).cast("string")))
    // the bucketed assignment feeds candidate generation plus both
    // verify sides; pinned for the scope, released when the pair list
    // materializes (see CacheScope)
    val assigned = reps
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", VectorFunctions.hyperplaneBits(col("v"), planes))
    CacheScope.pinned(assigned)(
      embeddingPairsFrom(assigned, planes, threshold, maxBucket, probeBits))
  }

  private def embeddingPairsFrom(
      assigned: DataFrame, planes: Int, threshold: Double,
      maxBucket: Int, probeBits: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val bucketed = capBuckets(assigned, maxBucket, Seq("bucket"))
    // candidate generation on (id, bucket) keys ONLY — the probe
    // explosion multiplies 16-byte rows, not vectors; vectors join back
    // for exact verification on just the matched pairs
    val keyed = bucketed.select(col("id"), col("bucket"))
    val probing =
      if (probeBits == 0) keyed
      else keyed.withColumn("bucket",
        explode(array(col("bucket") +:
          (0 until planes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)))
    val candidates = probing.select(col("id").as("id_a"), col("bucket"))
      .join(keyed.select(col("id").as("id_b"), col("bucket")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    candidates
      .join(bucketed.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(bucketed.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** EXACT all-pairs n-gram-Jaccard similarity join at `threshold`,
    * via a shingle inverted index: explode distinct shingle hashes,
    * equi-join on the 8-byte shingle value, count shared shingles per
    * pair with MAP-SIDE PARTIAL aggregation, derive Jaccard from the
    * shared count and the two set sizes. No LSH, no recall loss —
    * every above-threshold pair shares at least one shingle.
    *
    * Scale shape: the join touches Σ over shingles of df² 16-byte id
    * pairs (df = docs containing that shingle), NOT |docs|², and the
    * intersection count aggregates in the same shuffle — no array
    * payload ever moves per candidate. (A prefix-filter variant —
    * index only each sorted set's first n-⌈t·n⌉+1 shingles, verify
    * candidates against the full arrays — was measured 4× SLOWER here:
    * on dense-overlap corpora the per-candidate array verification
    * dwarfs the counting aggregate it avoids. Count-based verification
    * wins whenever candidates × |set| exceeds Σdf².)
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded
    * to 4 (matching [[ngramJaccard]]).
    */
  def allPairsJaccard(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold outside (0, 1]")
    sharedShinglePairs(docs, idCol, textCol, shingleN)
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** The inverted-index core shared by the exact text-similarity
    * operators: every ordered pair (id_a < id_b) sharing >= 1 distinct
    * `shingleN`-gram, with both set sizes and the exact intersection
    * count. Set size rides each exploded row (8 extra bytes), so
    * downstream metrics need no join back to the documents — one scan,
    * one shuffle, no persist left pinned in the session.
    *
    * `maxDf` caps the candidate-generating vocabulary: shingles held
    * by more than `maxDf` documents (stop-shingles — boilerplate
    * n-grams at web scale) are removed from the shingle UNIVERSE
    * before sizing and pairing, so sets, intersections, and every
    * downstream metric are computed consistently over the
    * discriminative (df <= maxDf) vocabulary — the shingle-space
    * analogue of stop-word removal, and the bound that makes the join
    * linear: Σ_{df<=c} df² <= c·Σdf = c × (corpus shingle count).
    * The exclusion is a broadcast ANTI-JOIN on the exploded
    * (doc, shingle) rows — the stop set's hash table is built once
    * per task. (The previous `array_except` formulation against a
    * one-row broadcast stop ARRAY rebuilt that hash set for every
    * document: measured 190 s at sf1.0, where 92 % of a saturated
    * 31-word-vocabulary shingle space is over-cap, vs ~8 s for this
    * shape.) The corpus pays one extra df aggregation of 8-byte keys,
    * never a second text pass. `maxDf = Int.MaxValue` (the default)
    * skips the df pass entirely; the audit view of what a cap would
    * drop is [[stopShingles]].
    */
  private def sharedShinglePairs(
      docs: DataFrame, idCol: String, textCol: String, shingleN: Int,
      maxDf: Int = Int.MaxValue): DataFrame =
    sharedShinglePairsFrom(shingleSets(docs, idCol, textCol, shingleN), maxDf)

  private def shingleSets(
      docs: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame = {
    import graft.functions.expressions.TextHashFunctions._
    docs.select(col(idCol).as("id"), shingle_hashes(col(textCol), shingleN).as("sh"))
  }

  private def sharedShinglePairsFrom(sets: DataFrame, maxDf: Int): DataFrame = {
    val ex =
      if (maxDf == Int.MaxValue)
        sets.filter(size(col("sh")) > 0)
          .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
      else {
        logInfo(s"shingle df cap active: shingles with df > $maxDf excluded " +
          "from the similarity universe; audit via Dedup.stopShingles")
        // the df pass and the exploded corpus both consume `sets`; the
        // CAPPED public entry (containmentPairs) pins it in a
        // CacheScope so the text is scanned and shingle-hashed ONCE —
        // and released when the pair output materializes.
        // Stop-shingle exclusion is a broadcast anti-join on the
        // exploded 8-byte keys (see the scaladoc above for why NOT
        // array_except); set sizes are re-counted over the SURVIVING
        // rows so sizes, intersections, and metrics stay consistent,
        // and zero-survivor docs drop out of the aggregation itself.
        val stop = stopShingles(sets, maxDf, "sh").select(col("g"))
        val surviving = sets
          .select(col("id"), explode(col("sh")).as("g"))
          .join(broadcast(stop), Seq("g"), "left_anti")
        surviving.join(
          surviving.groupBy(col("id")).agg(count(lit(1)).as("n")), "id")
      }
    ex.as("a")
      .join(ex.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
  }

  /** Audit view: the over-cap (stop) shingle hashes and their document
    * frequencies — what a `maxDf` cap removes from the similarity
    * universe. `sets` must carry an array column `shCol` of shingle
    * hashes (one row per doc). Lazy and tiny: df aggregates map-side
    * over 8-byte keys.
    */
  def stopShingles(sets: DataFrame, maxDf: Int, shCol: String = "sh"): DataFrame =
    sets.select(explode(col(shCol)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)

  /** EXACT containment join — excerpt/quote detection. Containment
    * C(A in B) = |S(A) ∩ S(B)| / |S(A)| is the asymmetric cousin of
    * Jaccard: a short document lifted verbatim from a long one scores
    * C ≈ 1 while its Jaccard is tiny (the long side's size dominates
    * the union), so threshold-Jaccard dedup never sees it. Emits pairs
    * where EITHER direction reaches `threshold`, with both directions'
    * scores. Same inverted-index shape (and cost) as
    * [[allPairsJaccard]].
    *
    * Scale note: MinHash-LSH candidates CANNOT feed this operator —
    * the high-containment pairs it exists to find have low Jaccard by
    * construction (measured ~0.18 on the excerpt fixtures), so any
    * Jaccard-LSH recall-tuned for them degenerates to emitting every
    * shingle-sharing pair. The scale lever is `maxDf`: capping the
    * candidate vocabulary at df <= maxDf bounds the index join at
    * maxDf × (corpus shingle count) — linear — and a pair that shares
    * ONLY over-cap boilerplate shingles is boilerplate containment,
    * the non-signal the cap is meant to drop (audit via
    * [[stopShingles]]).
    */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.9,
      maxDf: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold outside (0, 1]")
    def result(pairs: DataFrame) = pairs
      .withColumn("cont_a_in_b", col("inter") / col("n_a"))
      .withColumn("cont_b_in_a", col("inter") / col("n_b"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("cont_a_in_b"), 4).as("cont_a_in_b"),
        round(col("cont_b_in_a"), 4).as("cont_b_in_a"))
    if (maxDf == Int.MaxValue)
      result(sharedShinglePairs(docs, idCol, textCol, shingleN))
    else {
      // capped path reads the shingle sets twice (df pass + pairing):
      // pin them for the scope, release when the pair list materializes
      val sets = shingleSets(docs, idCol, textCol, shingleN)
      CacheScope.pinned(sets)(result(sharedShinglePairsFrom(sets, maxDf)))
    }
  }

  /** EXACT text k-nearest-neighbors by n-gram Jaccard: for every
    * document, its `k` most similar documents among those sharing at
    * least one shingle, ties broken by neighbor id (total order, both
    * sides exact — no RNG, no LSH recall loss). Built from the
    * inverted index + the bounded-heap top-k aggregator: k rows per
    * doc per partition shuffle, never a per-doc sort of all its
    * candidates.
    *
    * Scale path: on dense corpora the candidate set is the cost (the
    * Σ df² of [[allPairsJaccard]]); at 100 TB, generate candidates
    * with MinHash LSH and exact-rerank only those — this operator IS
    * that reranker when fed a candidate pair list via `minJaccard`
    * pruning.
    */
  def textKnn(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, shingleN: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pairs = sharedShinglePairs(docs, idCol, textCol, shingleN)
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard")) // unrounded: exact-order ranking
    knnFromPairs(pairs, k, idCol)
      .select(col(idCol), col("neighbor_id"),
        round(col("jaccard"), 4).as("jaccard"), col("rank"))
  }

  /** Top-`k` neighbors per document from an explicit VERIFIED pair
    * list (id_a, id_b, `scoreCol`) — the production k-NN shape: LSH
    * candidate generation ([[minhashNearDupPairs]], whose output
    * plugs in directly) bounds the pair work, this ranks the
    * survivors. Symmetrizes the pairs, then the bounded-heap top-k
    * aggregator keeps k rows per (doc, partition) in the shuffle —
    * never a per-doc sort of all candidates. Ties break by neighbor
    * id on the score AS GIVEN (pre-round upstream scores before
    * calling if rounded-order ranking is the contract).
    */
  def knnFromPairs(
      pairs: DataFrame, k: Int, idCol: String = "doc_id",
      scoreCol: String = "jaccard"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("nbr"), col(scoreCol))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("nbr"), col(scoreCol)))
    CorpusStats.topKPerGroup(sym, "src", "nbr", scoreCol, k)
      .select(col("src").as(idCol), col("nbr").as("neighbor_id"),
        col("score").as(scoreCol), col("rank"))
  }

  /** EXACT all-pairs cosine similarity at `threshold` — the brute-force
    * ground truth for [[embeddingNearDupPairs]]. Quadratic by
    * construction (the verification oracle, not the scale path: at
    * scale, LSH bucketing + this on candidates only).
    * Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6.
    */
  def allPairsCosine(
      vectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.95): DataFrame = {
    import graft.functions.VectorFunctions
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", VectorFunctions.cosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** N-gram Jaccard similarity for an explicit pair list (exact, no
    * LSH) — the verification primitive exposed standalone.
    */
  def ngramJaccard(
      docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      graft.functions.expressions.TextHashFunctions
        .shingle_hashes(col(textCol), n).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .select("id_a", "id_b", "jaccard")
  }

  /** Span-level (sub-document) dedup, the C4-style pass: documents are
    * cut into fixed `spanWords`-token spans, every span that appears
    * anywhere else in the corpus keeps only its GLOBAL first occurrence
    * (minimum (doc id, span position)), and documents are rebuilt from
    * their surviving spans. Removes boilerplate shared across pages
    * (headers, license blocks, navigation) that document-level dedup
    * cannot touch because the surrounding text differs.
    *
    * Scale shape: one explode to (doc, span) rows, hashed immediately —
    * the first-occurrence aggregation keys on `(xxhash64(span),
    * length(span))`, so the exchange carries ~24 bytes per span, never
    * the span text (shuffling the corpus as 3-word strings was the
    * largest shuffle in the suite and collapsed under memory
    * pressure). Map-side partials still collapse identical spans
    * per-partition — exactly the boilerplate case. The winner set IS
    * the aggregation output ((doc_id, span_idx) pairs, 16 bytes), a
    * second integer-only aggregation groups surviving indexes per doc,
    * and reassembly joins those index lists back to the docs — the
    * winning doc slices its OWN token array, so text moves through
    * exactly one exchange (the reassembly join), not the span agg.
    * Hash collisions: a 64-bit-hash + length collision between
    * distinct spans would merge them (2^-64-scale; the same
    * belt-and-braces contract as [[exactGroups]]).
    * Deterministic: first occurrence is a total order, no RNG.
    *
    * Returns (doc_id, clean_text, kept_spans, total_spans); fully
    * deduplicated documents survive with empty clean_text so the caller
    * decides the drop policy.
    */
  def spanDedup(
      docs: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 3): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    // empty/blank docs tokenize to zero tokens (split would yield [""])
    val toks = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("w"))
      .withColumn("total_spans",
        ceil(size(col("w")) / lit(spanWords.toDouble)).cast("long"))
    // span strings exist only transiently inside this projection: the
    // very next select reduces each to (hash, len) before any exchange
    val spans = base
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, int(total_spans) - 1), " +
          s"i -> array_join(slice(w, i * $spanWords + 1, $spanWords), ' '))")))
      .withColumnRenamed("pos", "span_idx")
      .withColumnRenamed("col", "span_text")
      .select(col("doc_id"), col("span_idx"),
        xxhash64(col("span_text")).as("span_hash"),
        length(col("span_text")).as("span_len"))
    // global first occurrence per distinct span KEY — the aggregation
    // output is already the kept set (one 16-byte row per survivor)
    val kept = spans
      .groupBy(col("span_hash"), col("span_len"))
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("first"))
      .select(col("first.doc_id").as("doc_id"), col("first.span_idx").as("span_idx"))
    // surviving span indexes per doc — integer-only aggregation
    val keptIdx = kept
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("span_idx"))).as("keep_idx"),
        count(lit(1)).as("kept_spans"))
    // reassembly: the winning doc holds its own token array locally —
    // slice its surviving spans back out of `w` by index
    base
      .join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(array_join(expr(
          s"transform(keep_idx, i -> array_join(slice(w, i * $spanWords + 1, $spanWords), ' '))"),
          " "), lit("")).as("clean_text"),
        coalesce(col("kept_spans"), lit(0L)).as("kept_spans"),
        col("total_spans"))
  }

  /** Keep-latest dedup: one row per key, the maximum by `orderCols`
    * (lexicographic) — the standard CDC/recrawl policy where the
    * newest snapshot of a URL/document wins.
    *
    * `max_by(struct(all), struct(order))` aggregates with map-side
    * partials: one candidate row per key per partition shuffles,
    * never the full history — vs. the textbook `row_number` window,
    * which shuffles AND sorts every version of every key. Make
    * `orderCols` total (e.g. include a unique id as tiebreak) for a
    * deterministic result.
    */
  def keepLatest(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("graft_latest"))
      .select(col("graft_latest.*"))
  }

  /** Corpus-frequency boilerplate removal — the RefinedWeb/CCNet
    * "line dedup" pass (Penedo et al. 2023, arXiv:2306.01116 §3;
    * Wenzek et al. 2019 §4.1), over fixed non-overlapping
    * `chunkWords`-token chunks since this engine treats text as token
    * streams: a chunk that occurs in at least `maxDocs` DISTINCT
    * documents is boilerplate (headers, footers, navigation, license
    * blurbs repeat across pages; content does not) and is dropped from
    * EVERY document — including its first occurrence, which is what
    * distinguishes this pass from [[spanDedup]]'s first-occurrence-wins
    * rule. Complements it the way CCNet's paragraph dedup complements
    * C4's span dedup.
    *
    * Scale shape (the [[spanDedup]] contract): chunk strings exist only
    * transiently inside one projection and reduce to (hash, len) before
    * any exchange; the document-frequency aggregation shuffles 16-byte
    * keys twice (distinct (chunk, doc), then the count — both with
    * map-side partials); the hot set re-joins the chunk keys as a
    * LEFT ANTI join on those 16-byte keys; and reassembly slices each
    * doc's OWN token array by surviving index, so text crosses exactly
    * one exchange (the reassembly join). Hash collisions: a 64-bit-hash
    * + length collision between distinct chunks would conflate them
    * (2^-64-scale; the same belt-and-braces contract as [[exactGroups]]).
    *
    * Returns (doc_id, clean_text, kept_chunks, total_chunks); documents
    * that were pure boilerplate survive with empty clean_text so the
    * caller decides the drop policy.
    */
  def boilerplateChunkDedup(
      docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 8, maxDocs: Int = 2): DataFrame = {
    require(chunkWords > 0, "chunkWords must be positive")
    require(maxDocs >= 2, "maxDocs < 2 would drop every chunk")
    val toks = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("w"))
      .withColumn("total_chunks",
        ceil(size(col("w")) / lit(chunkWords.toDouble)).cast("long"))
    val chunks = base
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, int(total_chunks) - 1), " +
          s"i -> array_join(slice(w, i * $chunkWords + 1, $chunkWords), ' '))")))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
      .select(col("doc_id"), col("chunk_idx"),
        xxhash64(col("chunk_text")).as("chunk_hash"),
        length(col("chunk_text")).as("chunk_len"))
    // document frequency per distinct chunk key: distinct first so a
    // chunk repeated WITHIN one doc counts that doc once
    val hot = chunks
      .select(col("chunk_hash"), col("chunk_len"), col("doc_id"))
      .distinct()
      .groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= maxDocs)
      .select(col("chunk_hash"), col("chunk_len"))
    val keptIdx = chunks
      .join(hot, Seq("chunk_hash", "chunk_len"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("chunk_idx"))).as("keep_idx"),
        count(lit(1)).as("kept_chunks"))
    base
      .join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(array_join(expr(
          s"transform(keep_idx, i -> array_join(slice(w, i * $chunkWords + 1, $chunkWords), ' '))"),
          " "), lit("")).as("clean_text"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        col("total_chunks"))
  }

  /** Exact duplicated-substring scrub — the ExactSubstr pass of Lee et
    * al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499 §4.1), reformulated for a distributed
    * engine: their suffix array finds every substring of ≥ L tokens
    * that occurs twice anywhere in the corpus and removes all its
    * occurrences; a substring repeats iff every one of its SLIDING
    * L-token windows repeats, so this pass drops exactly the tokens
    * covered by some L-window whose (hash, len) key occurs ≥ 2 times
    * corpus-wide — within-document repeats included, matching the
    * reference pass. [[spanDedup]] (first occurrence survives) and
    * [[boilerplateChunkDedup]] (≥2 DISTINCT docs, fixed chunks) are its
    * coarser fixed-grid cousins; the sliding grid is what catches a
    * duplicated passage at ANY token offset instead of only on chunk
    * boundaries.
    *
    * Scale shape: window strings exist only transiently inside one
    * projection (each row materializes its n−L+1 windows row-locally —
    * the O(L·n) transient cost that buys shuffle-freedom over a global
    * suffix sort) and reduce to (hash, len) before any exchange; the
    * occurrence count shuffles 16-byte keys with map-side partials; the
    * duplicated keys re-join as a LEFT SEMI on those keys; and token
    * removal slices each doc's OWN token array against its (few)
    * duplicated window starts, so text crosses exactly one exchange
    * (the reassembly join). Hash collisions: 2^-64-scale conflation,
    * the [[exactGroups]] contract.
    *
    * Returns (doc_id, clean_text, removed_tokens, total_tokens);
    * fully-duplicated documents survive with empty clean_text so the
    * caller decides the drop policy.
    */
  def duplicateWindowScrub(
      docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val L = windowTokens
    val toks = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("w"))
      .withColumn("total_tokens", size(col("w")).cast("long"))
    // sliding windows, stride 1: starts 0 .. n-L (docs shorter than L
    // have none and pass through untouched)
    val wins = base
      .filter(size(col("w")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $L), " +
          s"i -> array_join(slice(w, i + 1, $L), ' '))")))
      .withColumnRenamed("pos", "win_idx")
      .withColumnRenamed("col", "win_text")
      .select(col("doc_id"), col("win_idx"),
        xxhash64(col("win_text")).as("win_hash"),
        length(col("win_text")).as("win_len"))
    // keys occurring >= 2 times ANYWHERE (same doc counts)
    val dup = wins
      .groupBy(col("win_hash"), col("win_len"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("win_hash"), col("win_len"))
    // duplicated window STARTS per doc — integer-only aggregation
    val dupStarts = wins
      .join(dup, Seq("win_hash", "win_len"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("win_idx"))).as("dup_idx"))
    // token i survives iff no duplicated window [s, s+L) covers it.
    // dup_idx is sorted and every interval has the SAME length L, so
    // the coverage union merges ADJACENTLY: a new merged interval
    // starts at s_j iff s_j > s_{j-1} + L, and one ends at s_j + L iff
    // s_{j+1} > s_j + L — two O(k) index-lambda filters. The survivors
    // are the slices BETWEEN merged intervals (m intervals → m+1 gaps),
    // one flatten over the doc's own token array: O(n + k) row-local
    // even for the pathological all-duplicate doc, where the previous
    // per-token exists() scan was O(n · k). No text shuffles.
    base
      .join(dupStarts, Seq("doc_id"), "left")
      .withColumn("__ms", expr(
        s"filter(dup_idx, (s, j) -> j = 0 OR s > element_at(dup_idx, j) + $L)"))
      .withColumn("__me", expr(
        s"filter(dup_idx, (s, j) -> j = size(dup_idx) - 1 " +
          s"OR element_at(dup_idx, j + 2) > s + $L)"))
      // gap j: [ (j = 0 ? 0 : me_j + L), (j < m ? ms_{j+1} : n) )
      .withColumn("__gs", expr(s"concat(array(0), transform(__me, x -> x + $L))"))
      .withColumn("__ge", expr("concat(__ms, array(size(w)))"))
      .withColumn("__kept", expr(
        "flatten(transform(sequence(0, size(__gs) - 1), " +
          "j -> slice(w, element_at(__gs, j + 1) + 1, " +
          "greatest(element_at(__ge, j + 1) - element_at(__gs, j + 1), 0))))"))
      .select(col("doc_id"),
        when(col("dup_idx").isNull, array_join(col("w"), " "))
          .otherwise(array_join(col("__kept"), " "))
          .as("clean_text"),
        when(col("dup_idx").isNull, lit(0L))
          .otherwise((col("total_tokens") - size(col("__kept"))).cast("long"))
          .as("removed_tokens"),
        col("total_tokens"))
  }
}

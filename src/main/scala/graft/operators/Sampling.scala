package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for corpus curation.
  *
  * Training-data pipelines need REPRODUCIBLE sampling: the same
  * document set must be selected on every rerun and on any cluster
  * layout, and the keep/drop decision must be derivable row-locally
  * (no RNG seed threading through partitions, no global state). Rows
  * are bucketed by md5 of their id — a pure per-row projection of
  * codegen'd built-ins that rides the scan unshuffled and is
  * bit-identical in any engine with md5, so the DuckDB oracles
  * recompute the exact same sample.
  *
  * Thresholds use floor (never round): floor of an exactly-shared
  * double is the same integer in every engine, while ROUND half-way
  * tie-breaking differs across engines.
  *
  * Reference scope note: the reference materialization loads whole
  * periods (no sampling surface, `/root/reference/macros/
  * insert_by_timeperiod_loop.sql`); sampling is a north-star curation
  * extension (BASELINE.json).
  */
object Sampling {

  /** Bucket resolution — rates quantize to 1/10000. */
  val Buckets = 10000

  /** Stable bucket in [0, Buckets): first 32 bits of md5 of the id
    * rendered as a decimal string, mod Buckets. Uniform across ids,
    * independent of partitioning, identical across engines.
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % Buckets

  /** Keep a deterministic ~`fraction` of rows (quantized to 1e-4).
    * Plan shape: Filter directly over the scan — no shuffle, no RNG.
    */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.filter(hashBucket(col(idCol)) < math.floor(fraction * Buckets).toLong)
  }

  /** Per-stratum sampling rates (up-weight curated sources,
    * down-weight crawl); strata absent from `rates` are dropped. The
    * rates frame is one row per stratum — broadcast, so the fact side
    * never shuffles.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.toDF(strataCol, "graft_rate")
    df.join(broadcast(ratesDf), strataCol)
      .filter(hashBucket(col(idCol)) < floor(col("graft_rate") * Buckets))
      .drop("graft_rate")
  }

  /** Importance (weight-proportional) sampling: keep each row with
    * probability ≈ `fraction` · wᵢ/E[w], deterministically — the
    * data-mixing primitive that over-keeps long/high-value documents
    * at a fixed expected total. The per-row threshold is computed in
    * EXACT integer arithmetic (floor(F·wᵢ·n / W) with
    * F = floor(fraction·Buckets), W = Σw, one integral division — no
    * double summation whose last-ulp drift could flip a row across
    * engines), capped at certainty. Weights must be a non-negative
    * integral column (token/char counts); F·w·n must fit int64 —
    * pre-scale weights if Σw·n approaches 2^63/Buckets.
    *
    * One tiny (2-value) aggregate broadcasts onto a scan-side filter;
    * the corpus never shuffles.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    import org.apache.spark.sql.types._
    df.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"weightedSample needs an integral weight column, got $dt")
    }
    val f = math.floor(fraction * Buckets).toLong
    val tot = df.agg(sum(col(weightCol).cast("long")).as("graft_w"),
      count(lit(1)).as("graft_n"))
    // assert_true rides the filter so a negative weight FAILS the job
    // (a corrupt weight would silently skew every other row's
    // threshold through Σw) — it returns NULL on pass, so isNull is
    // the pass-through
    df.crossJoin(broadcast(tot))
      .filter(assert_true(col(weightCol) >= 0,
        lit(s"weightedSample: negative $weightCol")).isNull &&
        hashBucket(col(idCol)) < least(lit(Buckets.toLong),
          expr(s"($f * cast(`$weightCol` as bigint) * graft_n) div graft_w")))
      .drop("graft_w", "graft_n")
  }

  /** Exactly min(k, |stratum|) rows per stratum, deterministically:
    * the k rows with the smallest hash buckets (id tiebreak) — fixed
    * eval-set construction, where `uniformMixture`'s rate-based sample
    * only hits k in expectation. Rides the bounded-heap TopKAggregator
    * (k rows per stratum per partition shuffle, no window sort).
    */
  def exactKPerStratum(df: DataFrame, idCol: String, strataCol: String,
      k: Int): DataFrame =
    CorpusStats.topKPerGroup(
      df.select(col(strataCol), col(idCol))
        .withColumn("__score", -hashBucket(col(idCol)).cast("double")),
      strataCol, idCol, "__score", k)
      .drop("score")

  /** Downsample every stratum to the size of the smallest — a uniform
    * mixture over strata (language balancing, source balancing).
    * rate_s = min_count / count_s. The count aggregate is one row per
    * stratum (map-side partials over the corpus, tiny shuffle); the
    * global min joins back to it broadcast, and the corpus itself is
    * filtered in place — the big side is scanned twice (count +
    * filter) but never shuffled.
    */
  def uniformMixture(df: DataFrame, idCol: String, strataCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("graft_n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("graft_n")).as("graft_min"))))
      .select(col(strataCol),
        (col("graft_min").cast("double") / col("graft_n")).as("graft_rate"))
    df.join(broadcast(rates), strataCol)
      .filter(hashBucket(col(idCol)) < floor(col("graft_rate") * Buckets))
      .drop("graft_rate")
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * pretraining sampler (exponentiated weighting, α ∈ (0, 1]: mBERT,
    * XLM-R (Conneau et al. 2020, arXiv:1911.02116 §3), multilingual T5):
    * stratum i with n_i tokens samples with probability
    * p_i ∝ n_i^α — α = 1 is proportional (head strata dominate), α → 0
    * approaches uniform (tail strata upsampled). Returns one row per
    * stratum: (stratum, n_tokens, weight, expected_epochs) where
    * expected_epochs = budget·p_i / n_i is how many times the stratum
    * would repeat inside a `budgetTokens` training mix (the low-resource
    * over-sampling factor the papers tune α by).
    *
    * Scale shape: the corpus collapses to one count row per stratum
    * (map-side partials); everything after is arithmetic on that tiny
    * table with the normalizer joined back broadcast. Determinism:
    * n_i^α computes in double (IEEE pow, correctly rounded for α = 0.5's
    * sqrt; quantized to DECIMAL(18,9) either way), the normalizer is an
    * exact decimal sum of those quantized terms, and each output sees
    * ONE double division + round — order-free under any partitioning.
    */
  def temperatureMixture(
      df: DataFrame, strataCol: String, sizeCol: Column,
      alpha: Double = 0.5, budgetTokens: Long = 1000000L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    import org.apache.spark.sql.types.DecimalType
    // α = 0.5 routes through sqrt: IEEE-754 REQUIRES sqrt correctly
    // rounded (bit-identical across engines) where pow is only ~1 ulp
    val na = if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
             else pow(col("n_tokens").cast("double"), lit(alpha))
    val counts = df.groupBy(col(strataCol))
      .agg(sum(sizeCol.cast("long")).as("n_tokens"))
      .select(col(strataCol), col("n_tokens"),
        na.cast(DecimalType(28, 9)).as("graft_na"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("graft_na")).as("graft_z"))))
      .select(col(strataCol), col("n_tokens"),
        round(col("graft_na").cast("double") / col("graft_z").cast("double"), 6)
          .as("weight"),
        // same double op order as the oracle: ((na/z) · budget) / n —
        // a decimal product would overflow precision 38 and round
        round(col("graft_na").cast("double") / col("graft_z").cast("double")
            * budgetTokens / col("n_tokens"), 6)
          .as("expected_epochs"))
  }
}

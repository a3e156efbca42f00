package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level statistics for curation decisions: global token
  * frequencies and exact discrete quantiles.
  */
object CorpusStats {

  /** Corpus-wide token frequency, top `k` by (count DESC, token ASC).
    * Plan shape at scale: explode → hash aggregate with map-side
    * partials (one row per distinct token per partition shuffles, not
    * one per token occurrence) → TakeOrderedAndProject, which keeps a
    * k-row heap per partition and merges k-row heaps — no global sort
    * of the frequency table.
    */
  def tokenTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Exact discrete quantile of an integer-valued column, computed
    * via value histogram: `groupBy(value)` collapses the corpus to
    * one row per distinct value (map-side partials), and the
    * cumulative scan + threshold selection run over that small
    * histogram — the scale-right EXACT quantile for discrete domains.
    * (Continuous domains at scale → `percentile_approx`, q34.)
    *
    * Returns a 1-row (threshold) frame: the smallest value v whose
    * cumulative count reaches max(1, ceil(n·q)) — i.e. the element at
    * 0-based index ceil(n·q)−1 of the sorted values, matching DuckDB's
    * QUANTILE_DISC selection (verified empirically against n=4/5/10/25;
    * the earlier floor((n−1)·q)+1 rule agreed only when n·q was
    * non-integral) so the oracle can use the built-in.
    *
    * The single-partition window is over the histogram only; the
    * corpus never sorts.
    */
  def quantileDisc(df: DataFrame, valueCol: String, q: Double): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile out of range: $q")
    // NULL values are ignored (QUANTILE_DISC semantics) — counting
    // them would shift the ceil(n·q) selection index
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cume",
      sum(col("cnt")).over(
        Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
      .filter(col("cume") >= greatest(lit(1L), ceil(col("n") * q)))
      .agg(min(col("v")).as("threshold"))
  }

  /** Rows of `df` whose `valueCol` is at or above the exact q-th
    * discrete percentile — quantile-based quality filtering. The
    * 1-row threshold broadcasts onto an in-place corpus filter; the
    * corpus is scanned twice (histogram + filter) but never shuffled.
    */
  def filterAboveQuantile(df: DataFrame, valueCol: String, q: Double): DataFrame =
    df.crossJoin(broadcast(quantileDisc(df, valueCol, q)))
      .filter(col(valueCol) >= col("threshold"))
      .drop("threshold")

  /** Exact discrete quantiles PER GROUP, several q at once — per-source
    * length percentiles for data cards without ever sorting a group's
    * rows: the corpus collapses to a (group, value) histogram with
    * map-side partials, a per-group window cumulates the histogram
    * (histogram rows only — bounded by distinct values, not rows), and
    * each requested q selects its element with the same
    * max(1, ceil(n·q)) rule as [[quantileDisc]] (DuckDB QUANTILE_DISC
    * semantics). Returns (group, q, value) long-form.
    */
  def groupedQuantileDisc(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"bad quantiles: $qs")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    qs.map { q =>
      quantileDiscOverHist(hist, groupCol, "v", "cnt", q)
        .select(col(groupCol), lit(q).as("q"), col("value"))
    }.reduce(_ unionAll _)
  }

  /** The grouped-quantile selection core over a PRE-AGGREGATED
    * (group, value, count) histogram: per-group cumulative + the
    * max(1, ceil(n·q)) element rule. Shared by [[groupedQuantileDisc]]
    * (which builds the histogram from rows) and [[madOutliers]] (which
    * derives a deviation histogram from a value histogram without
    * re-reading the corpus).
    */
  private def quantileDiscOverHist(
      hist: DataFrame, groupCol: String, vCol: String, cntCol: String,
      q: Double): DataFrame = {
    hist
      .withColumn("__cume", sum(col(cntCol)).over(
        Window.partitionBy(col(groupCol)).orderBy(col(vCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col(cntCol)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__cume") >= greatest(lit(1L), ceil(col("__n") * q)))
      .groupBy(col(groupCol))
      .agg(min(col(vCol)).as("value"))
  }

  /** Robust per-group outlier flagging via Median Absolute Deviation:
    * a row is an outlier iff |value − median| > k·MAD, with both the
    * median and the MAD as EXACT discrete quantiles (QUANTILE_DISC
    * semantics, so a DuckDB oracle replays them with the built-in).
    * MAD-based cutoffs are the standard robust alternative to
    * mean/stddev z-scores for corpus curation — a handful of giant
    * documents cannot drag the cutoff the way they drag a stddev.
    *
    * Scale shape: ONE aggregation pass collapses the corpus to a
    * (group, value) histogram; the median comes from that histogram,
    * and the deviation histogram is DERIVED from the value histogram
    * (re-keying (v, cnt) to (|v−med|, Σcnt) — histogram-side rows
    * only, no second corpus pass). Both per-group bands are tiny and
    * broadcast onto an in-place flag; the corpus itself never
    * shuffles. All arithmetic is integral — no float drift between
    * engine and oracle.
    *
    * Adds `med`, `mad`, `is_outlier` to `df`'s columns, preserving
    * every input row: rows whose group has no non-NULL value (no
    * histogram row) or a NULL group key get NULL med/mad/is_outlier —
    * the flag joins are LEFT joins, so no row silently disappears.
    */
  def madOutliers(
      df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // NULL values are excluded from both medians (QUANTILE_DISC
    // semantics); a NULL-valued row's own flag is NULL, matching the
    // SQL three-valued comparison
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val med = quantileDiscOverHist(hist, groupCol, "__v", "__cnt", 0.5)
      .select(col(groupCol), col("value").as("med"))
    val devHist = hist.join(broadcast(med), groupCol)
      .groupBy(col(groupCol), abs(col("__v") - col("med")).as("__d"))
      .agg(sum(col("__cnt")).as("__cnt"))
    val mad = quantileDiscOverHist(devHist, groupCol, "__d", "__cnt", 0.5)
      .select(col(groupCol), col("value").as("mad"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .join(broadcast(mad), Seq(groupCol), "left")
      .withColumn("is_outlier",
        abs(col(valueCol).cast("long") - col("med")) > lit(k.toLong) * col("mad"))
  }

  /** Per-group winsorization: clip `valueCol` into its group's
    * [qLo, qHi] discrete quantile band — outlier taming before
    * per-source feature normalization. The two quantiles per group
    * come from [[groupedQuantileDisc]] (histogram-side, tiny) and
    * broadcast onto an in-place clip; the corpus never shuffles.
    * Adds `valueCol`_winsorized.
    *
    * Row-preserving like [[madOutliers]]: the band joins are LEFT
    * joins, so rows with a NULL group key or a group with no non-NULL
    * value survive — their clip (and a NULL value's clip) is NULL,
    * never a silently dropped row.
    */
  def winsorize(
      df: DataFrame, groupCol: String, valueCol: String,
      qLo: Double, qHi: Double): DataFrame = {
    require(qLo <= qHi, s"qLo $qLo > qHi $qHi")
    // distinct: qLo == qHi would otherwise produce two identical rows
    // per group and each broadcast join would duplicate the corpus
    val qs = groupedQuantileDisc(df, groupCol, valueCol, Seq(qLo, qHi).distinct)
    val lo = qs.filter(col("q") === qLo).select(col(groupCol), col("value").as("__lo"))
    val hi = qs.filter(col("q") === qHi).select(col(groupCol), col("value").as("__hi"))
    df.join(broadcast(lo), Seq(groupCol), "left")
      .join(broadcast(hi), Seq(groupCol), "left")
      .withColumn(s"${valueCol}_winsorized",
        // explicit NULL-in/NULL-out: Spark's least/greatest IGNORE
        // NULL operands, which would otherwise clamp a NULL value to
        // the band edge (or pass a missing band through unclipped)
        when(col(valueCol).isNull || col("__lo").isNull || col("__hi").isNull,
          lit(null).cast("long"))
          .otherwise(least(greatest(col(valueCol).cast("long"), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Fixed-width histogram of a numeric column, optionally per group:
    * one aggregate with map-side partials — the corpus collapses to
    * (group, bin) rows, the scale-right distribution profile
    * (vs. sorting for exact quantiles, vs. sketches when exact bin
    * counts are wanted). Bin i covers [i·width, (i+1)·width).
    */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = floor(col(valueCol) / binWidth).cast("long").as("bin")
    df.groupBy(groupCols.map(col) :+ bin: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", round(col("bin") * binWidth, 6))
  }

  /** Assign rows to token-budget batches — micro-batch assembly for
    * training: within each `partCol` shard, rows in `orderCols` order
    * are packed greedily into batches of ~`capacity` tokens (batch i
    * = rows whose PRECEDING cumulative token count falls in
    * [i·capacity, (i+1)·capacity) — a batch may overflow by one row,
    * the standard streaming-packing semantics).
    *
    * One shuffle on the shard key; the window runs per shard. Shard
    * by a high-cardinality column (hash bucket, source) so no single
    * partition holds the corpus.
    */
  def packBatches(df: DataFrame, partCol: String, orderCols: Seq[String],
      tokenCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("batch_idx",
      floor((sum(col(tokenCol)).over(w) - col(tokenCol)) / capacity).cast("long"))
  }

  /** Per-document top-k terms by smoothed TF-IDF. The idf factor is
    * the RATIONAL (N+1)/(df+1) — deliberately no logarithm: libm `ln`
    * differs in the last ulp across engines, while integer-valued
    * double division is bit-exact, so the DuckDB oracle reproduces
    * scores and ranking identically. Monotone in 1/df like log-idf,
    * which is all ranking needs.
    *
    * Plan shape: doc-term counts (map-side partials), document
    * frequencies from the same aggregate (token-key shuffle), one
    * join token→df, then a per-doc window over that doc's terms only.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val tf = terms.groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val ndocs = docs.agg(countDistinct(col(idCol)).as("graft_n"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, "token")
      .crossJoin(broadcast(ndocs))
      .withColumn("score",
        col("tf") * (col("graft_n") + 1).cast("double") / (col("df") + 1))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("id"), col("token"), round(col("score"), 6).as("score"), col("rank"))
  }

  /** Best k rows per group by (score DESC, id ASC) — "keep the top-5
    * highest-quality documents per source". Reuses the bounded-heap
    * `TopKAggregator`: map-side partial aggregation caps the shuffle
    * at k rows per (group, map partition), where the textbook
    * Window(row_number) plan shuffles every scored row into one
    * partition per group. Output: (groupCol, idCol, score, rank).
    */
  def topKPerGroup(
      df: DataFrame, groupCol: String, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k") // k=0 would NPE in the heap's reduce
    import org.apache.spark.sql.Encoders
    val topk = udaf(new graft.functions.TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    df.groupBy(col(groupCol))
      .agg(topk(col(idCol), col(scoreCol).cast("double")).as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")))
      .select(col(groupCol), col("col._1").as(idCol),
        col("col._2").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}

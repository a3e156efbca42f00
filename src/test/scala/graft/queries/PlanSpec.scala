package graft.queries

import graft.SparkSpecBase

/** Physical-plan assertions: the properties that make these queries
  * scale (predicate pushdown into parquet, column pruning, broadcast
  * joins for dimensions, whole-stage codegen, partition pruning on the
  * IBTP target) — `.explain` made executable.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("scan+filter: predicate and projection reach the parquet scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_shipdate") || p.contains("l_shipdate"), p)
    // pruned read schema: only the 5 referenced columns, not all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_returnflag"),
      readSchema)
  }

  test("dimension joins broadcast; no shuffle of the fact side for the join") {
    val p = plan("q04_join_broadcast_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("aggregation is partial (map-side combine) before the exchange") {
    val p = plan("q02_agg_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), p) // partial_sum etc. before Exchange
  }

  test("semi/anti joins plan as join, not subquery re-execution") {
    assert(plan("q06_semi_join_big_quantity").contains("LeftSemi"))
    assert(plan("q07_anti_join_customers_no_orders").contains("LeftAnti"))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q13_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("whole-stage codegen covers the extension hot paths (no UDF barriers)") {
    for (q <- Seq("q27_text_quality", "q29_token_counts", "q20_dedup_exact")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect() // AQE finalizes the plan only on execution
      val p = df.queryExecution.executedPlan.toString
      // '*(n)' prefixes mark WholeStageCodegen spans in the plan text.
      // Note: projections containing higher-order-function lambdas
      // (filter/transform/aggregate) evaluate interpreted — a Spark
      // limitation — but scans stay vectorized and sorts/aggs codegen'd.
      assert(p.contains("*("), s"$q: $p")
      assert(!p.contains("BatchEvalPython"), q)
    }
  }

  test("native vector expressions keep ANN projections inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    // the interpreted-HOF formulation put the bucket/cosine projection
    // OUTSIDE the '*(n)' codegen spans; the native expressions keep
    // it inside one
    val df = table("embeddings")
      .select(col("vec_id"),
        VectorFunctions.hyperplaneBits(col("embedding"), 8).as("bucket"),
        VectorFunctions.cosine(col("embedding"), col("embedding")).as("self_cos"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val projLine = p.linesIterator.find(_.contains("hyperplane_bits")).getOrElse("")
    assert(projLine.trim.startsWith("*("), s"projection not codegen'd:\n$p")
  }

  test("ivfAssign is a pure map — no centroid join, no Window, no argmin shuffle") {
    val df = graft.queries.ExtensionQueries.ivfAssignments(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // nearest_centroid evaluates all k distances per row; the only
    // aggregate left is q26's cell-size count
    assert(!p.contains("Join"), s"assignment must not join the centroids:\n$p")
    assert(!p.contains("Window"), s"argmin must not plan as Window:\n$p")
    assert(p.contains("nearest_centroid"), s"expected the native expression:\n$p")
    assert(p.contains("partial"), // the cell-size count still combines map-side
      s"cell-size count must get partial aggregation:\n$p")
  }

  test("deterministic sampling is a scan-side filter — no shuffle, no RNG") {
    val df = graft.operators.Sampling.sample(table("documents"), "doc_id", 0.5)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(!p.contains("rand"), s"sampling must not depend on RNG:\n$p")
  }

  test("stratified sampling broadcasts the rates side") {
    val df = graft.queries.CurationQueries.stratifiedSample(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("decontamination broadcasts the benchmark n-gram set and partially aggregates") {
    val df = graft.queries.CurationQueries.decontaminate(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial"), s"overlap counts need map-side partials:\n$p")
  }

  test("keepLatest aggregates with map-side partials — no Window sort of history") {
    val df = graft.operators.Dedup.keepLatest(
      table("events"), Seq("user_id"), Seq("ts", "event_id"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"keepLatest must not plan as Window:\n$p")
    assert(p.contains("partial"), s"keepLatest needs partial aggregation:\n$p")
  }

  test("token top-k plans as TakeOrdered over the aggregated frequencies") {
    val df = graft.queries.CurationQueries.tokenTopK(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial"), s"counts need map-side partials:\n$p")
  }

  test("asof join shuffles once on the key — no join node, no per-key re-sort") {
    val df = graft.queries.TemporalQueries.asofJoin(spark, sfDir)
    df.collect()
    // AQE's toString repeats the plan under "== Initial Plan ==" —
    // count operators in the final section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the union-window formulation has no Join operator at all
    assert(!p.contains("Join"), s"asof must not plan a join:\n$p")
    // exactly one data exchange for the window (plus the final orderBy's
    // range exchange from the query wrapper)
    val hashExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("eventsRange pushes the period predicate into the parquet scan") {
    import java.time.LocalDate
    val df = graft.sources.Tables.eventsRange(spark, sfDir,
      LocalDate.of(2024, 1, 5), LocalDate.of(2024, 1, 7))
    val p = df.queryExecution.executedPlan.toString
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      p)
  }

  /** Walk the executed plan including adaptive stages, cached-relation
    * plans, and reused exchanges — the flat toString interleaves nested
    * AQE plans and hides self-join sides, so node assertions must
    * traverse the tree.
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive._
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val extra: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => Nil
    }
    p +: (p.children ++ extra).flatMap(allNodes)
  }

  test("LSH band pipeline: no Window, no band-key self-join, aggregated exchanges only") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // pinned shape (round 16): candidate generation is ONE bucket
    // aggregation (partial collect_list under the band-key exchange)
    // with local pair expansion — never a self-join that shuffles and
    // sorts the band keys on each side (exchange reuse does not fire
    // across a self-join's sides under AQE), and never a Window for
    // the hot-bucket cap. Every band-key exchange must therefore sit
    // over an aggregate (the cap's count partials or the bucket's
    // collect_list partials), not over raw exploded rows.
    // the LAZY pipeline variant: the public operator eagerly
    // checkpoints its result (CacheScope), so its returned plan is a
    // leaf — the shape pin must look at the pipeline itself
    val sigs = graft.operators.Dedup.minhashSignatures(
      graft.queries.ExtensionQueries.corpusWithNearDups(spark, sfDir),
      "doc_id", "text", shingleN = 3, nHashes = 64)
    val df = graft.operators.Dedup.minhashPairsFrom(
      sigs, bands = 16, rowsPerBand = 4, threshold = 0.5, maxBucket = 256)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowExec]),
      "cap must not plan a Window over the band keys")
    val bandShuffles = nodes.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("band_hash") => e
    }
    assert(bandShuffles.forall(_.child.toString.contains("HashAggregate")),
      s"band-key shuffle of un-aggregated rows:\n${bandShuffles.mkString("\n")}")
    // no join keyed on the band columns anywhere (the old self-join)
    val bandJoins = nodes.filter { n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]
    }.filter(_.toString.linesIterator.next().contains("band_hash"))
    assert(bandJoins.forall(_.toString.linesIterator.next().contains("LeftAnti")),
      s"band keys must never feed a candidate self-join, only the cap's " +
        s"anti-join:\n${bandJoins.mkString("\n")}")
  }

  test("all-pairs similarity join counts intersections with map-side partials") {
    val df = graft.operators.Dedup.allPairsJaccard(
      graft.queries.ExtensionQueries.corpusWithNearDups(spark, sfDir),
      "doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the intersection count must partially aggregate in the same
    // shuffle as the pair grouping — no array payload per candidate
    assert(p.contains("partial_count"), p)
    assert(!p.contains("array_intersect"),
      "verification must ride the count aggregate, not per-pair array ops")
  }

  test("TopKAggregator paths aggregate as ObjectHashAggregate with partials") {
    for (q <- Seq("q24_similarity_bruteforce", "q53_exact_k_sample")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ObjectHashAggregate"), s"$q must ObjectHashAggregate:\n$p")
      assert(p.contains("partial_"), s"$q needs map-side partial aggregation:\n$p")
      assert(!p.contains("SortAggregate"), s"$q fell back to SortAggregate:\n$p")
    }
  }

  test("IBTP target readRange prunes to the range's day-partitions") {
    import java.time.LocalDate
    import org.apache.spark.sql.functions._
    val t = new graft.ibtp.TargetTable(spark,
      java.nio.file.Files.createTempDirectory("prune").toString, "day")
    t.init(table("events").select(col("ts").cast("date").as("day"),
      col("event_type"), col("value")))
    val ranged = t.readRange(LocalDate.of(2024, 1, 5), LocalDate.of(2024, 1, 7))
    val phys = ranged.queryExecution.executedPlan.toString
    val pf = phys.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("p_date"), phys)
    val oneRange = ranged.count()
    assert(oneRange > 0 && oneRange < t.read().count())
    // resume probe is metadata-only and equals max day
    assert(t.maxPartitionDate.contains(LocalDate.of(2024, 1, 30)))
  }

  // AQE plan text repeats the tree under "== Initial Plan ==" — count
  // physical nodes in the final plan section only
  private def finalPlan(p: String): String =
    p.split("== Initial Plan ==").head

  test("cube plans one Expand + aggregate over a single scan (no per-set re-scan)") {
    val df = graft.SparkEntry.queries("q75_cube_order_stats")(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"cube must scan orders exactly once:\n$p")
  }

  test("explicit-values pivot is a single aggregate over a single scan") {
    val df = graft.SparkEntry.queries("q76_pivot_event_counts")(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"pivot with explicit values must not add a distinct-values scan:\n$p")
    assert(p.contains("partial"), p)
  }

  test("cohort retention counts ride the distinct grid — no COUNT DISTINCT Expand") {
    val df = graft.SparkEntry.queries("q73_cohort_retention")(spark, sfDir)
    df.collect()
    // finalPlan: a node only in the pre-AQE "Initial Plan" section must
    // not fail the negative assertions (same treatment as cube/pivot)
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(!p.contains("Expand"),
      s"retention count must be count(*) over the distinct grid:\n$p")
  }

  test("madOutliers broadcasts the bands onto the corpus — no corpus shuffle join") {
    val df = graft.SparkEntry.queries("q77_mad_outliers")(spark, sfDir)
    df.collect()
    val p = finalPlan(df.queryExecution.executedPlan.toString)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"med/mad bands must broadcast, not shuffle the corpus:\n$p")
  }

  test("lmPerplexity never moves document text through an exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = graft.SparkEntry.queries("q82_lm_perplexity")(spark, sfDir)
    df.collect()
    val exchanges = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected token-count and doc-score exchanges")
    assert(!exchanges.exists(_.output.exists(_.name == "text")),
      "LM fit/scoring must shuffle tokens and decimals, never document text")
  }

  test("spanDedup shuffles span hashes, never span text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val df = graft.SparkEntry.queries("q64_span_dedup")(spark, sfDir)
    df.collect()
    val exchanges = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected at least the span-agg exchange")
    // the first-occurrence aggregation must key on the 64-bit hash...
    assert(!exchanges.exists(_.outputPartitioning.toString.contains("span_text")),
      "span first-occurrence agg keyed on span text")
    // ...and the rows moving through the span-keyed exchange must not
    // carry any string payload (the whole point of the reshape)
    val spanExchanges = exchanges.filter(
      _.outputPartitioning.toString.contains("span_hash"))
    assert(spanExchanges.nonEmpty, "span-hash exchange not found")
    assert(spanExchanges.forall(_.child.output.forall(_.dataType != StringType)),
      "string column rides the span exchange")
  }

  test("semDedup pair stage is an equi-join on the cell key — never all-pairs") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.functions.col
    // the LAZY pipeline variant (the public operator checkpoints its
    // result eagerly, hiding the pair join behind a leaf)
    val centroids = table("embeddings")
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val cells = graft.operators.Similarity
      .ivfAssignWithVec(table("embeddings"), centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"), col("embedding"))
    val df = graft.operators.SemDedup
      .semDedupFrom(cells, threshold = 0.95, "vec_id", "embedding")
    df.collect()
    // negative on the EXECUTED tree (AQE stages + cached plans): no
    // cartesian product may survive to execution
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "pair stage must never plan a cartesian product")
    // positive on the full plan text INCLUDING the pre-AQE section:
    // at this fixture size the corpus has zero semantic dups, so
    // AQE's empty-relation elimination erases the (correctly-shaped)
    // pair join from the final plan — the shape pin lives in the
    // initial plan, where join-strategy churn cannot flake a
    // POSITIVE assertion (only negatives are AQE-sensitive)
    val p = df.queryExecution.executedPlan.toString
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[centroid_id".r
      .findFirstIn(p).isDefined,
      s"within-cell pairs must come from a centroid_id equi-join:\n$p")
  }

  test("boilerplateChunkDedup shuffles chunk keys, never chunk text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val df = graft.SparkEntry.queries("q88_chunk_dedup")(spark, sfDir)
    df.collect()
    val exchanges = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected the doc-frequency exchanges")
    assert(!exchanges.exists(_.outputPartitioning.toString.contains("chunk_text")),
      "frequency agg keyed on chunk text")
    // the (hash, len)-keyed exchanges move no string payload — like
    // spanDedup, reassembly slices each doc's OWN token array
    val chunkExchanges = exchanges.filter(
      _.outputPartitioning.toString.contains("chunk_hash"))
    assert(chunkExchanges.nonEmpty, "chunk-hash exchange not found")
    assert(chunkExchanges.forall(_.child.output.forall(_.dataType != StringType)),
      "string column rides the chunk exchange")
  }

  test("duplicateWindowScrub shuffles window keys, never window text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val df = graft.SparkEntry.queries("q94_substring_scrub")(spark, sfDir)
    df.collect()
    val exchanges = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected the occurrence-count exchanges")
    assert(!exchanges.exists(_.outputPartitioning.toString.contains("win_text")),
      "occurrence agg keyed on window text")
    // the (hash, len)-keyed exchanges move no string payload — removal
    // slices each doc's OWN token array against its duplicated starts
    val winExchanges = exchanges.filter(
      _.outputPartitioning.toString.contains("win_hash"))
    assert(winExchanges.nonEmpty, "window-hash exchange not found")
    assert(winExchanges.forall(_.child.output.forall(_.dataType != StringType)),
      "string column rides the window exchange")
  }

  test("BM25: every retrieval join broadcasts — the postings side never shuffles on a join key") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = graft.SparkEntry.queries("q96_bm25_search")(spark, sfDir)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    // query terms, their IDF rows, and the corpus totals are all
    // broadcast onto the postings; only the index-build and score
    // aggregations exchange — a sort-merge join would mean the
    // corpus-sized postings reshuffled on a join key
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "postings joined via sort-merge instead of broadcast")
  }

  test("PQ search: no float/double vector array ever rides an exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val df = graft.SparkEntry.queries("q95_pq_search")(spark, sfDir)
    df.collect()
    val exchanges = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    // encoding is map-only; scoring is broadcast lookups; only the
    // bounded-heap partials (binary buffers) and the tiny table agg
    // shuffle — raw vectors never do
    exchanges.foreach { e =>
      e.child.output.foreach { a =>
        a.dataType match {
          case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
            fail(s"vector array ${a.name} rides an exchange")
          case _ => ()
        }
      }
    }
  }

  test("BPE encode is one narrow map pass — no shuffle, inside codegen") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val merges = graft.operators.Bpe.collectMerges(
      graft.operators.Bpe.trainMerges(table("documents"), "text", 3))
    val df = graft.operators.Bpe.encode(table("documents"), "doc_id", "text", merges)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "encoding must not shuffle — the merge table rides as a reference object")
    // the `*(n)` stage marker on the bpe_encode projection line IS the
    // whole-stage-codegen pin (executedPlan.toString renders stages
    // that way, not as WholeStageCodegen nodes)
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*bpe_encode""".r.findFirstIn(p).isDefined,
      s"encode projection must stay inside whole-stage codegen:\n$p")
  }

  test("DSIR scoring broadcasts the bucket-ratio table; text never shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = graft.SparkEntry.queries("q90_dsir_weights")(spark, sfDir)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the 256-row log-ratio table must broadcast onto the scoring pass")
    val exchanges = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(!exchanges.exists(_.output.exists(_.name == "text")),
      "document text must never ride an exchange — only bucket ids and decimals")
  }
}

package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.queries.CurationQueries

/** Behavior tests for the curation operators: sampling determinism
  * and statistical shape, mixture balancing, decontamination recall,
  * keep-latest equivalence to the window formulation, exact-quantile
  * selection. (Value-level correctness is driver-checked against
  * DuckDB oracles — q37..q42; these specs pin the properties oracles
  * can't see, like determinism across reruns and plan equivalences.)
  */
class CurationOpsSpec extends SparkSpecBase {

  private def docs = table("documents")
  private def events = table("events")

  test("deterministic sample: same rows on rerun, fraction within tolerance") {
    val a = Sampling.sample(docs, "doc_id", 0.5).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.sample(docs, "doc_id", 0.5).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    val n = docs.count().toDouble
    assert(math.abs(a.length / n - 0.5) < 0.15, s"kept ${a.length} of $n")
    // monotone: a smaller fraction selects a subset of a larger one
    val small = Sampling.sample(docs, "doc_id", 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a.toSet))
  }

  test("stratified sample respects per-stratum rates") {
    val sampled = CurationQueries.stratifiedSample(spark, sfDir)
    val perSrc = sampled.groupBy("source").agg(count(lit(1)).as("kept"))
      .join(docs.groupBy("source").agg(count(lit(1)).as("total")), "source")
      .collect()
    perSrc.foreach { r =>
      val rate = CurationQueries.StratRates.toMap.apply(r.getString(0))
      val got = r.getLong(1).toDouble / r.getLong(2)
      // small strata (~25 docs) → generous tolerance; the oracle pins exact rows
      assert(math.abs(got - rate) < 0.3, s"${r.getString(0)}: got $got want ~$rate")
    }
  }

  test("exactKPerStratum: exactly min(k, n) rows per stratum, stable across runs") {
    val a = Sampling.exactKPerStratum(docs, "doc_id", "source", 10)
    val sizes = a.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.foreach { case (s, n) =>
      assert(sizes(s) == math.min(10L, n), s"$s: ${sizes(s)} of $n")
    }
    val b = Sampling.exactKPerStratum(docs, "doc_id", "source", 10)
    assertSameRows(a, b)
  }

  test("uniform mixture balances every stratum to ~the rarest stratum's count") {
    val minCount = docs.groupBy("lang").count().agg(min("count")).head().getLong(0)
    val mixed = Sampling.uniformMixture(docs.select(col("doc_id"), col("lang")), "doc_id", "lang")
    val sizes = mixed.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash sampling hits the target in expectation, not exactly —
    // every stratum must land in a band around the rarest's count
    sizes.foreach { case (lang, n) =>
      assert(n >= minCount * 0.5 && n <= minCount * 1.5,
        s"$lang kept $n, want ~$minCount")
    }
    // the rarest stratum has rate 1.0 → kept in full
    val rarest = docs.groupBy("lang").count().orderBy(col("count"), col("lang"))
      .head().getString(0)
    assert(sizes(rarest) == minCount, s"rarest '$rarest' kept ${sizes(rarest)} of $minCount")
  }

  test("decontamination flags every planted benchmark copy with full overlap") {
    val bench = docs.filter(col("source") === "src0").select(col("doc_id"), col("text"))
    val planted = bench.select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    val train = docs.filter(col("source") =!= "src0").select(col("doc_id"), col("text"))
      .unionAll(planted)
    val flagged = Decontaminate.overlap(train, bench, "doc_id", "text", n = 8)
    val flaggedIds = flagged.select("id").collect().map(_.getLong(0)).toSet
    val plantedIds = planted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.subsetOf(flaggedIds), "a planted copy escaped decontamination")
    // a planted copy shares ALL its 8-grams with the benchmark
    val full = flagged.filter(col("id") >= 3000000L)
      .join(planted.select(col("doc_id").as("id"),
        size(graft.functions.expressions.TextHashFunctions.shingle_hashes(col("text"), 8)).as("own")), "id")
      .filter(col("n_overlap") =!= col("own"))
    assert(full.count() == 0, "planted copy with partial overlap")
    // and clean() removes exactly the flagged rows
    val cleaned = Decontaminate.clean(train, bench, "doc_id", "text", n = 8)
    assert(cleaned.count() == train.count() - flaggedIds.size)
    assert(cleaned.filter(col("doc_id").isin(flaggedIds.toSeq: _*)).count() == 0)
  }

  test("keepLatest equals the row_number window formulation") {
    val viaAgg = Dedup.keepLatest(events, Seq("user_id"), Seq("ts", "event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assertSameRows(viaAgg, viaWindow)
  }

  test("quantileDisc matches the sorted-element definition") {
    val scored = docs.select(col("doc_id"),
      graft.functions.TextFunctions.bpeishTokenCount(col("text")).as("x"))
    val values = scored.select("x").collect().map(_.getInt(0)).sorted
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      // DuckDB QUANTILE_DISC: 0-based index ceil(n·q)−1, floored at 0
      val want = values(math.max(0, math.ceil(values.length * q).toInt - 1)).toLong
      val got = CorpusStats.quantileDisc(scored, "x", q).head().getLong(0)
      assert(got == want, s"q=$q: got $got want $want")
    }
  }

  test("filterAboveQuantile keeps exactly the at-or-above-threshold rows") {
    val scored = docs.select(col("doc_id"),
      graft.functions.TextFunctions.bpeishTokenCount(col("text")).as("x"))
    val thr = CorpusStats.quantileDisc(scored, "x", 0.25).head().getLong(0)
    val kept = CorpusStats.filterAboveQuantile(scored, "x", 0.25)
    assertSameRows(kept, scored.filter(col("x") >= thr))
  }

  test("chunking covers every token with the configured overlap and reconstructs") {
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", chunkTokens = 64, overlap = 8)
      .collect().groupBy(_.getLong(0))
    val originals = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    originals.foreach { case (id, toks) =>
      val cs = chunks(id).sortBy(_.getInt(1))
      // every chunk except the last is full; stride drops 8 tokens of
      // each previous chunk, so de-overlapped concatenation == original
    val rebuilt = cs.zipWithIndex.flatMap { case (r, i) =>
        val t = r.getString(3).split(" ", -1).toSeq.filter(_.nonEmpty)
        if (i == 0) t else t.drop(8)
      }
      val want = toks.filter(_.nonEmpty)
      assert(rebuilt.toSeq == want.toSeq, s"doc $id: ${rebuilt.length} vs ${want.length} tokens")
      cs.init.foreach(r => assert(r.getInt(2) == 64, s"doc $id: short non-final chunk"))
      // consecutive chunks share exactly the 8-token overlap
      cs.sliding(2).foreach {
        case Array(a, b) =>
          val ta = a.getString(3).split(" ", -1).filter(_.nonEmpty)
          val tb = b.getString(3).split(" ", -1).filter(_.nonEmpty)
          assert(ta.takeRight(8).sameElements(tb.take(8)) || ta.length < 64,
            s"doc $id: overlap mismatch")
        case _ => ()
      }
    }
  }

  test("chunking property sweep: reconstruction holds for varied chunk/overlap") {
    val sample = docs.limit(40)
    for ((chunk, overlap) <- Seq((16, 0), (16, 4), (32, 16), (7, 3), (200, 50))) {
      val stride = chunk - overlap
      val chunks = Chunking.chunkByTokens(sample, "doc_id", "text", chunk, overlap)
        .collect().groupBy(_.getLong(0))
      val originals = sample.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty)).toMap
      originals.foreach { case (id, want) =>
        val cs = chunks(id).sortBy(_.getInt(1))
        val rebuilt = cs.zipWithIndex.flatMap { case (r, i) =>
          val t = r.getString(3).split(" ", -1).toSeq.filter(_.nonEmpty)
          if (i == 0) t else t.drop(overlap)
        }
        assert(rebuilt.toSeq == want.toSeq,
          s"chunk=$chunk overlap=$overlap doc=$id: ${rebuilt.length} vs ${want.length}")
        cs.init.foreach(r => assert(r.getInt(2) == chunk,
          s"chunk=$chunk overlap=$overlap doc=$id: short non-final chunk"))
        // chunk starts advance by exactly stride tokens
        assert(cs.length == (if (want.length <= chunk) 1
          else 1 + math.ceil((want.length - chunk).toDouble / stride).toInt))
      }
    }
  }

  test("spanDedup: first occurrence wins globally, docs rebuild in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),   // both spans unique at first sight
      (2L, "a b c x y z"),   // "a b c" already seen in doc 1
      (3L, "x y z q"),       // "x y z" seen in doc 2; tail span "q" kept
      (4L, "a b c"),         // fully deduplicated
      (5L, "")               // empty doc: 0 spans
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", spanWords = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a b c d e f", 2L, 2L),
      (2L, "x y z", 1L, 2L),
      (3L, "q", 1L, 2L),
      (4L, "", 0L, 1L),
      (5L, "", 0L, 0L)))
  }

  test("spanDedup with a span wider than every doc is the identity on distinct docs") {
    val docs = table("documents").select(col("doc_id"), col("text"))
    val out = Dedup.spanDedup(docs, "doc_id", "text", spanWords = 100000)
    assert(out.filter(col("kept_spans") =!= 1 || col("total_spans") =!= 1).isEmpty)
    assert(out.join(docs, "doc_id")
      .filter(col("clean_text") =!= trim(col("text"))).isEmpty)
  }

  test("weightedSample: deterministic, reduces to uniform sample at equal weights") {
    import spark.implicits._
    val d = docs.select(col("doc_id"), col("n_chars").cast("long").as("w"))
    val a = Sampling.weightedSample(d, "doc_id", "w", 0.3).collect().map(_.getLong(0)).sorted
    val b = Sampling.weightedSample(d, "doc_id", "w", 0.3).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "non-deterministic")
    // equal weights: threshold is exactly F for every row => identical
    // keep set to the plain bucket sample
    val eq = docs.select(col("doc_id"), lit(7L).as("w"))
    val ws = Sampling.weightedSample(eq, "doc_id", "w", 0.3).select("doc_id")
    val us = Sampling.sample(eq, "doc_id", 0.3).select("doc_id")
    assertSameRows(ws, us)
    // zero-weight rows are never kept
    val z = Sampling.weightedSample(
      docs.select(col("doc_id"), lit(0L).as("w"))
        .unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"), lit(5L).as("w"))),
      "doc_id", "w", 0.5)
    assert(z.filter(col("doc_id") < 1000000L).isEmpty)
    // and longer docs are kept at a visibly higher rate
    val kept = Sampling.weightedSample(d, "doc_id", "w", 0.3)
    val medianW = d.stat.approxQuantile("w", Array(0.5), 0.0).head
    val hiRate = kept.filter(col("w") > medianW).count().toDouble /
      math.max(1, d.filter(col("w") > medianW).count())
    val loRate = kept.filter(col("w") <= medianW).count().toDouble /
      math.max(1, d.filter(col("w") <= medianW).count())
    assert(hiRate > loRate, s"hi $hiRate <= lo $loRate")
  }

  test("winsorize clips exactly to the per-group quantile band") {
    val w = CorpusStats.winsorize(
      docs.select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars", 0.1, 0.9)
    val qs = CorpusStats.groupedQuantileDisc(docs, "source", "n_chars", Seq(0.1, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    w.collect().foreach { r =>
      // join moves the group key first: (source, doc_id, n_chars, winsorized)
      val (src, v, c) = (r.getString(0), r.getLong(2), r.getLong(3))
      val (lo, hi) = (qs((src, 0.1)), qs((src, 0.9)))
      assert(c == math.min(math.max(v, lo), hi), s"$src $v -> $c not clip[$lo,$hi]")
    }
  }

  test("winsorize with qLo == qHi clamps to the single quantile without duplicating rows") {
    val w = CorpusStats.winsorize(
      docs.select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars", 0.5, 0.5)
    assert(w.count() == docs.count(), "row multiplication")
    val med = CorpusStats.groupedQuantileDisc(docs, "source", "n_chars", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    w.collect().foreach { r =>
      assert(r.getLong(3) == med(r.getString(0)))
    }
  }

  test("winsorize preserves NULL-group / all-NULL-group / NULL-value rows with NULL clip") {
    import spark.implicits._
    val d = Seq[(Long, Option[String], Option[Long])](
      (1L, Some("a"), Some(5L)), (2L, Some("a"), Some(50L)), (3L, Some("a"), Some(500L)),
      (4L, None, Some(7L)),              // NULL group key
      (5L, Some("ghost"), None),         // group with only NULL values
      (6L, Some("a"), None)              // NULL value in a banded group
    ).toDF("doc_id", "source", "n_chars")
    val w = CorpusStats.winsorize(d, "source", "n_chars", 0.1, 0.9)
    assert(w.count() == 6, "rows were dropped by the band join")
    val byId = w.collect().map(r => r.getAs[Long]("doc_id") ->
      Option(r.getAs[Any]("n_chars_winsorized"))).toMap
    assert(byId(4L).isEmpty, "NULL group key must clip to NULL")
    assert(byId(5L).isEmpty, "all-NULL group must clip to NULL")
    assert(byId(6L).isEmpty, "NULL value must clip to NULL, not clamp to the band edge")
    assert(byId(1L).contains(5L) && byId(2L).contains(50L) && byId(3L).contains(500L))
  }

  test("weightedSample fails loudly on a negative weight") {
    val bad = docs.select(col("doc_id"),
      when(col("doc_id") === 7, lit(-5L)).otherwise(lit(3L)).as("w"))
    val e = intercept[Exception] {
      Sampling.weightedSample(bad, "doc_id", "w", 0.5).count()
    }
    assert(e.getMessage != null)
  }

  test("groupedQuantileDisc equals naive per-group sorted-element selection") {
    val docs = table("documents")
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = CorpusStats.groupedQuantileDisc(docs, "source", "n_chars", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val naive = docs.select(col("source"), col("n_chars"))
      .collect().groupBy(_.getString(0))
      .flatMap { case (src, rows) =>
        val sorted = rows.map(_.getLong(1)).sorted
        // DuckDB QUANTILE_DISC: 0-based index ceil(n·q)−1, floored at 0
        qs.map(q => (src, q) ->
          sorted(math.max(0, math.ceil(sorted.length * q).toInt - 1)))
      }
    assert(got == naive)
  }

  test("topKPerGroup equals the row_number window formulation") {
    val scored = docs.select(col("source"), col("doc_id"),
      graft.functions.TextFunctions.bpeishTokenCount(col("text")).cast("double").as("score"))
    val viaAgg = CorpusStats.topKPerGroup(scored, "source", "doc_id", "score", 5)
    val w = Window.partitionBy(col("source")).orderBy(col("score").desc, col("doc_id").asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("doc_id"), col("score"), col("rank").cast("int"))
    assertSameRows(viaAgg, viaWindow)
  }

  test("packBatches: batches respect capacity with at most one-row overflow") {
    val scored = docs.select(col("source"), col("doc_id"),
      graft.functions.TextFunctions.bpeishTokenCount(col("text")).as("n_tokens"))
    val packed = CorpusStats.packBatches(scored, "source", Seq("doc_id"), "n_tokens", 512)
      .collect().groupBy(r => (r.getString(0), r.getLong(3)))
    packed.foreach { case ((src, batch), rows) =>
      val total = rows.map(_.getInt(2)).sum
      val maxRow = rows.map(_.getInt(2)).max
      // a batch only exceeds capacity by (at most) its final row
      assert(total - maxRow < 512, s"$src batch $batch over-packed: $total")
    }
    // batch ids are contiguous from 0 within each source
    packed.keys.groupBy(_._1).foreach { case (src, keys) =>
      val ids = keys.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.length).toSeq, s"$src batches not contiguous: $ids")
    }
  }

  test("tfidf: rarer terms outscore common terms at equal tf") {
    val scored = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", k = 3).collect()
    assert(scored.nonEmpty)
    // every doc has at most 3 ranked terms, ranks 1..k contiguous
    scored.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length), s"doc $id")
    }
    // score sanity: a term appearing in every doc has idf ~ 1; its score ≈ tf
    val n = docs.count()
    val dfs = docs.select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("t"),
      col("doc_id")).distinct()
      .groupBy("t").count().filter(col("count") === n)
    // such ubiquitous terms should rarely win rank 1 over rarer terms
    val ubiquitous = dfs.collect().map(_.getString(0)).toSet
    val rank1 = scored.filter(_.getInt(3) == 1).map(_.getString(1))
    assert(rank1.count(ubiquitous.contains) < rank1.length / 2)
  }

  test("tokenTopK equals naive global ordering") {
    val got = CorpusStats.tokenTopK(docs, "text", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val naive = docs
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }.take(10)
    assert(got.toSeq == naive.toSeq)
  }

  test("boilerplateChunkDedup drops hot chunks everywhere, including the first occurrence") {
    import spark.implicits._
    val d = Seq(
      (1L, "x1 x2 a b"),   // "x1 x2" shared with doc 2 → drops in BOTH
      (2L, "x1 x2 c d"),
      (3L, "e f")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateChunkDedup(d, "doc_id", "text", chunkWords = 2, maxDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "a b", 1L, 2L),
      (2L, "c d", 1L, 2L),
      (3L, "e f", 1L, 1L)))
  }

  test("boilerplateChunkDedup: within-doc repetition is not boilerplate; empty docs survive") {
    import spark.implicits._
    val d = Seq(
      (1L, "p q p q"),     // chunk "p q" twice in ONE doc — df = 1, kept
      (2L, "z z"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateChunkDedup(d, "doc_id", "text", chunkWords = 2, maxDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "p q p q", 2L, 2L),
      (2L, "z z", 1L, 1L),
      (3L, "", 0L, 0L)))
  }

  test("boilerplateChunkDedup: pure-boilerplate docs survive with empty clean_text") {
    import spark.implicits._
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "k m")).toDF("doc_id", "text")
    val got = Dedup.boilerplateChunkDedup(d, "doc_id", "text", chunkWords = 2, maxDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "", 0L), (2L, "", 0L), (3L, "k m", 1L)))
  }

  test("duplicateWindowScrub removes a shared passage at ANY offset, all occurrences") {
    import spark.implicits._
    // the passage "a b c d e" sits at offset 0 in doc 1 and offset 1 in
    // doc 2 — a fixed chunk grid would miss the misaligned copy
    val d = Seq(
      (1L, "a b c d e X"),
      (2L, "Z a b c d e"),
      (3L, "u v w x y z")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateWindowScrub(d, "doc_id", "text", windowTokens = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "X", 5L, 6L),
      (2L, "Z", 5L, 6L),
      (3L, "u v w x y z", 0L, 6L)))
  }

  test("duplicateWindowScrub: within-doc repeats are duplicates too (Lee et al. semantics)") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b c"), // "a b c" twice in ONE doc → both covered
      (2L, "d e f")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateWindowScrub(d, "doc_id", "text", windowTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "", 6L, 6L),
      (2L, "d e f", 0L, 3L)))
  }

  test("duplicateWindowScrub: coverage unions overlapping windows; partial survivors keep order") {
    import spark.implicits._
    // doc 1 is covered by TWO overlapping duplicated windows ([0,3) and
    // [1,4)) — their union removes tokens 0..3, the tail survives
    val d = Seq(
      (1L, "p q r s t"),
      (2L, "p q r"),
      (3L, "q r s")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateWindowScrub(d, "doc_id", "text", windowTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "t", 4L, 5L),
      (2L, "", 3L, 3L),
      (3L, "", 3L, 3L)))
  }

  test("duplicateWindowScrub: short docs, empty docs, and whitespace normalize untouched text") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b"),          // shorter than the window: no windows, kept
      (2L, "a b"),          //   — even though doc 1 repeats it exactly
      (3L, ""),
      (4L, "  c   d  e ")   // normalization: join by single spaces
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateWindowScrub(d, "doc_id", "text", windowTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "a b", 0L, 2L),
      (2L, "a b", 0L, 2L),
      (3L, "", 0L, 0L),
      (4L, "c d e", 0L, 3L)))
  }

  test("duplicateWindowScrub: the all-duplicate flood doc is linear, not quadratic") {
    import spark.implicits._
    // a 4000-token doc whose EVERY window is duplicated (n−L+1 ≈ n
    // duplicated starts): the interval-merge keeps the row-local pass
    // O(n + k); the old per-token exists() scan was O(n · k) ≈ 16M
    // lambda probes for this one row. Also pins interleaved coverage:
    // gaps between merged intervals survive in order.
    val flood = ("x " * 4000).trim
    val d = Seq(
      (1L, flood), (2L, flood),
      // doc 3: duplicated head and tail (shared with 1/2's windows via
      // 'x' runs), unique middle survives as a gap between intervals
      (3L, ("x " * 10) + "unique middle words here " + ("x " * 10).trim)
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateWindowScrub(d, "doc_id", "text", windowTokens = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got(0) == (1L, "", 4000L, 4000L))
    assert(got(1) == (2L, "", 4000L, 4000L))
    assert(got(2) == (3L, "unique middle words here", 20L, 24L))
  }

  test("temperatureMixture: α=1 is proportional; α=0.5 upsamples the tail stratum") {
    import spark.implicits._
    // stratum a: 100 tokens (10 docs × 10), b: 400 (40 docs × 10)
    val d = (0 until 10).map(i => (s"a$i", "a", ("t " * 10).trim)) ++
      (0 until 40).map(i => (s"b$i", "b", ("t " * 10).trim))
    val df = d.toDF("id", "lang", "text")
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    def byLang(alpha: Double) =
      Sampling.temperatureMixture(df, "lang", toks, alpha, budgetTokens = 1000L)
        .orderBy("lang").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val p1 = byLang(1.0)
    assert(p1 == Seq(("a", 100L, 0.2, 2.0), ("b", 400L, 0.8, 2.0)))
    val p5 = byLang(0.5)
    // sqrt: 10 / (10+20) = 1/3; epochs: (1/3)·1000/100 vs (2/3)·1000/400
    assert(p5.map(_._1) == Seq("a", "b"))
    assert(math.abs(p5(0)._3 - 0.333333) < 1e-9 && math.abs(p5(1)._3 - 0.666667) < 1e-9)
    assert(math.abs(p5(0)._4 - 3.333333) < 1e-9 && math.abs(p5(1)._4 - 1.666667) < 1e-9)
    // the tail stratum's SHARE rises as α falls — the sampler's point
    assert(p5(0)._3 > p1(0)._3)
  }

  test("temperatureMixture weights sum to ~1 on the fixture languages") {
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    val w = Sampling.temperatureMixture(docs, "lang", toks, alpha = 0.5)
      .agg(sum(col("weight"))).head.getDouble(0)
    assert(math.abs(w - 1.0) < 1e-4, s"weights sum to $w")
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Persistent incremental retrieval indexes ([[LexicalIndex]],
  * [[PqIndex]]) and the IVF-PQ composition ([[Pq.ivfAdcTopK]]): the
  * load-bearing contracts are EXACT equivalences — an incrementally
  * built index must answer bit-identically to the one-shot computation
  * over the same rows, and probing every IVF list must reproduce the
  * unprobed ADC ranking bit-for-bit.
  */
class RetrievalIndexSpec extends SparkSpecBase {

  private def docs = table("documents")
  private def emb = table("embeddings")

  private def docQueries = docs.filter(col("doc_id") < 3)
    .select(col("doc_id").as("query_id"),
      array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("qtext"))

  private def vecQueries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("lexical index built in batches answers bit-identically to full-corpus BM25") {
    val idx = new LexicalIndex(spark, tmpDir("lexidx_eq") + "/idx")
    // three batches, arbitrary uneven split — df/stats partials must
    // sum to the global values exactly
    idx.append(docs.filter(col("doc_id") % 3 === 0))
    idx.append(docs.filter(col("doc_id") % 3 === 1))
    idx.append(docs.filter(col("doc_id") % 3 === 2))
    assertSameRows(
      idx.search(docQueries, topK = 10),
      Ranking.bm25TopK(docs, docQueries, topK = 10))
    // a search never touches the document text: only postings/df/stats
    // exist under the index path
    val files = new java.io.File(idx.path).listFiles.map(_.getName).toSet
    assert(files == Set("postings", "df", "stats"), files)
  }

  test("lexical index: indexing a new batch changes exactly the affected scores") {
    val idx = new LexicalIndex(spark, tmpDir("lexidx_inc") + "/idx")
    idx.append(docs.filter(col("doc_id") % 2 === 0))
    val half = idx.search(docQueries, topK = 10)
    assertSameRows(half,
      Ranking.bm25TopK(docs.filter(col("doc_id") % 2 === 0), docQueries, topK = 10))
    idx.append(docs.filter(col("doc_id") % 2 =!= 0))
    assertSameRows(
      idx.search(docQueries, topK = 10),
      Ranking.bm25TopK(docs, docQueries, topK = 10))
  }

  test("pq index: create-then-append answers bit-identically to a one-shot encode") {
    val even = emb.filter(col("vec_id") % 2 === 0)
    val idx = new PqIndex(spark, tmpDir("pqidx_eq") + "/idx", m = 4, k = 16)
    idx.create(even)
    idx.append(emb.filter(col("vec_id") % 2 =!= 0))
    // the one-shot reference: SAME training set (the create batch —
    // codebooks freeze at creation), everything encoded in one pass
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val books = Pq.trainCodebooks(even, dim, m = 4, k = 16)
    val mats = books.map(b =>
      graft.functions.expressions.CentroidMatrix.fromDataFrame(b, "embedding"))
    val codes = Pq.encode(emb, mats, dim)
    assertSameRows(
      idx.search(vecQueries, topK = 10),
      Pq.adcSearch(codes, books, vecQueries, dim, topK = 10))
    // append is incremental: codebooks are untouched by the second batch
    assert(idx.readCodebooks().count() == 4 * 16)
    assert(idx.readCodes().count() == emb.count())
  }

  test("ivf-pq probing every list reproduces the full ADC ranking bit-for-bit") {
    val coarse = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    assertSameRows(
      Pq.ivfAdcTopK(emb, vecQueries, coarse,
        nProbe = 8, m = 4, k = 16, topK = 10),
      Pq.adcTopK(emb, vecQueries, m = 4, k = 16, topK = 10))
  }

  test("ivf-pq scores only the probed lists, and the scored set scales with nProbe") {
    val coarse = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    // external replay of the bounded-candidate contract: every returned
    // neighbor must be assigned to one of its query's nProbe nearest
    // coarse cells
    val assigned = Similarity.ivfAssign(emb, coarse)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nProbe = 2
    val probes = Similarity.ivfAssign( // queries vs coarse, top-nProbe
      vecQueries.select(col("query_id").as("vec_id"), col("embedding")), coarse)
    // ivfAssign gives top-1 only; recompute nProbe nearest driver-side
    val cents = coarse.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qs = vecQueries.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var na = 0.0; var nb = 0.0; var ab = 0.0
      a.indices.foreach { i => na += a(i) * a(i); nb += b(i) * b(i); ab += a(i) * b(i) }
      na + nb - 2.0 * ab
    }
    val probed: Map[Long, Set[Long]] = qs.map { case (q, qv) =>
      q -> cents.toSeq.map { case (cid, cv) => (d2(qv, cv), cid) }
        .sortBy(x => (x._1, x._2)).take(nProbe).map(_._2).toSet
    }
    val got = Pq.ivfAdcTopK(emb, vecQueries, coarse,
      nProbe = nProbe, m = 4, k = 16, topK = 10).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(1))
      assert(probed(q).contains(assigned(v)),
        s"query $q returned vec $v from unprobed list ${assigned(v)}")
    }
    // the scored set is Σ probed-list sizes — strictly under the corpus
    // at nProbe < nlist, and monotone in nProbe
    val listSizes = assigned.values.groupBy(identity).view.mapValues(_.size).toMap
    val scoredAt = (n: Int) => qs.map { case (q, qv) =>
      cents.toSeq.map { case (cid, cv) => (d2(qv, cv), cid) }
        .sortBy(x => (x._1, x._2)).take(n).map(x => listSizes(x._2)).sum
    }.sum
    val total = assigned.size * qs.size
    assert(scoredAt(1) < scoredAt(4) && scoredAt(4) < total,
      s"scored rows must scale with nProbe: ${scoredAt(1)} < ${scoredAt(4)} < $total")
    probes.count() // materialize to keep the linter honest about use
  }

  test("persisted ivf-pq: create+append then probing all lists ≡ full ADC from storage") {
    val coarse = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val even = emb.filter(col("vec_id") % 2 === 0)
    val idx = new PqIndex(spark, tmpDir("ivfpqidx_eq") + "/idx", m = 4, k = 16)
    idx.create(even, coarse = Some(coarse))
    idx.append(emb.filter(col("vec_id") % 2 =!= 0))
    // the IVF layout stores list assignments alongside the codes
    assert(idx.hasCoarse)
    assert(idx.readCodes().columns.toSet == Set("vec_id", "list_id", "codes"))
    assert(idx.readCodes().count() == emb.count())
    // nProbe = nlist must reproduce the UNPROBED flat ADC ranking over
    // the same frozen codebooks bit-for-bit — the probe bounds the
    // scored set, never the arithmetic
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val books = Pq.trainCodebooks(even, dim, m = 4, k = 16)
    val mats = books.map(b =>
      graft.functions.expressions.CentroidMatrix.fromDataFrame(b, "embedding"))
    val codes = Pq.encode(emb, mats, dim)
    assertSameRows(
      idx.searchIvf(vecQueries, topK = 10, nProbe = 8),
      Pq.adcSearch(codes, books, vecQueries, dim, topK = 10))
  }

  test("persisted ivf-pq: searchIvf returns only vectors from probed lists") {
    val coarse = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val idx = new PqIndex(spark, tmpDir("ivfpqidx_probe") + "/idx", m = 4, k = 16)
    idx.create(emb, coarse = Some(coarse))
    val nProbe = 2
    // ground truth from the STORED assignments (not recomputed): every
    // returned neighbor's stored list must be among its query's nProbe
    // nearest coarse cells
    val assigned = idx.readCodes().select(col("vec_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = coarse.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qs = vecQueries.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var na = 0.0; var nb = 0.0; var ab = 0.0
      a.indices.foreach { i => na += a(i) * a(i); nb += b(i) * b(i); ab += a(i) * b(i) }
      na + nb - 2.0 * ab
    }
    val probed: Map[Long, Set[Long]] = qs.map { case (q, qv) =>
      q -> cents.toSeq.map { case (cid, cv) => (d2(qv, cv), cid) }
        .sortBy(x => (x._1, x._2)).take(nProbe).map(_._2).toSet
    }
    val got = idx.searchIvf(vecQueries, topK = 10, nProbe = nProbe).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(1))
      assert(probed(q).contains(assigned(v)),
        s"query $q returned vec $v from unprobed stored list ${assigned(v)}")
    }
    // a flat index refuses the probe path with the remedy in the message
    val flat = new PqIndex(spark, tmpDir("ivfpqidx_flat") + "/idx", m = 4, k = 16)
    flat.create(emb)
    val e = intercept[IllegalArgumentException](
      flat.searchIvf(vecQueries, topK = 10, nProbe = 2))
    assert(e.getMessage.contains("coarse"))
  }

  test("lexical index compact folds partials with bit-identical search results") {
    val idx = new LexicalIndex(spark, tmpDir("lexidx_fold") + "/idx")
    (0 until 5).foreach(i => idx.append(docs.filter(col("doc_id") % 5 === i)))
    val before = idx.search(docQueries, topK = 10).collect().map(_.toString).sorted
    val dfFilesBefore = idx.readDf().inputFiles.length
    assert(idx.readStats().count() == 5, "one stats partial per batch")
    idx.compact(postingsFiles = 2)
    // folded: one stats row, one df row per token, fewer files
    assert(idx.readStats().count() == 1)
    assert(idx.readDf().inputFiles.length < dfFilesBefore,
      s"df files must shrink: ${idx.readDf().inputFiles.length} vs $dfFilesBefore")
    assert(idx.readDf().groupBy(col("token")).count()
      .filter(col("count") > 1).isEmpty, "df must hold one row per token")
    assert(idx.readPostings().inputFiles.length <= 2)
    val after = idx.search(docQueries, topK = 10).collect().map(_.toString).sorted
    assert(before.sameElements(after), "compact must be invisible to search")
    // appending after a fold keeps working (partials resume on top)
    idx.append(docs.limit(0))
    assertSameRows(
      idx.search(docQueries, topK = 10),
      Ranking.bm25TopK(docs, docQueries, topK = 10))
  }

  test("concurrent fold builds: a failing build publishes nothing and leaves no stage") {
    // round-16 internals change: compact() builds its three component
    // folds concurrently (IndexStore.swapDirs) and swaps sequentially.
    // If ANY build fails, no marker may exist, no component may have
    // swapped, and every sibling's completed stage dir must be reaped.
    val idx = new LexicalIndex(spark, tmpDir("lexidx_foldfail") + "/idx")
    idx.append(docs.filter(col("doc_id") % 2 === 0))
    idx.append(docs.filter(col("doc_id") % 2 =!= 0))
    val before = idx.search(docQueries, topK = 10).collect().map(_.toString).sorted
    val store = new IndexStore(spark, idx.path)
    val boom = intercept[RuntimeException] {
      store.withClaim {
        store.swapDirs(Seq(
          "stats" -> (out => idx.readStats()
            .agg(sum(col("n")).as("n"), sum(col("tl")).as("tl"))
            .coalesce(1).write.parquet(out)),
          "df" -> (_ => throw new RuntimeException("simulated build failure"))))
      }
    }
    assert(boom.getMessage.contains("simulated build failure"))
    val fs = new org.apache.hadoop.fs.Path(idx.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx.path, "_fold_intent")),
      "no marker may exist after a failed concurrent fold")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx.path, "stats__fold")),
      "the completed sibling's stage dir must be reaped")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx.path, "df__fold")))
    assert(idx.readStats().count() > 1,
      "stats must still be the unfolded partials — nothing published")
    val after = idx.search(docQueries, topK = 10).collect().map(_.toString).sorted
    assert(before.sameElements(after), "failed fold must be invisible to search")
    // and a later compact() over the same store succeeds cleanly
    idx.compact(postingsFiles = 2)
    assert(idx.readStats().count() == 1)
    val folded = idx.search(docQueries, topK = 10).collect().map(_.toString).sorted
    assert(before.sameElements(folded))
  }

  test("lexical index fold swap heals a crash at every boundary") {
    // enumerate the states the swap can die in by reproducing them
    // directly (stage complete + marker; marker + old only; marker +
    // live only) — repairFold must converge to a searchable index with
    // unchanged results in each
    def freshIdx(name: String): (LexicalIndex, org.apache.hadoop.fs.Path) = {
      val idx = new LexicalIndex(spark, tmpDir(name) + "/idx")
      idx.append(docs.filter(col("doc_id") % 2 === 0))
      idx.append(docs.filter(col("doc_id") % 2 =!= 0))
      (idx, new org.apache.hadoop.fs.Path(idx.path))
    }
    val expect = Ranking.bm25TopK(docs, docQueries, topK = 10)
    val conf = spark.sparkContext.hadoopConfiguration
    def p(root: org.apache.hadoop.fs.Path, s: String) =
      new org.apache.hadoop.fs.Path(root, s)
    def write(f: org.apache.hadoop.fs.Path, s: String): Unit = {
      val fs = f.getFileSystem(conf)
      val o = fs.create(f, true); try o.write(s.getBytes("UTF-8")) finally o.close()
    }
    // crash after marker, before any rename: stage + live present
    locally {
      val (idx, root) = freshIdx("lexidx_crash1")
      val fs = root.getFileSystem(conf)
      idx.readStats().agg(sum(col("n")).as("n"), sum(col("tl")).as("tl"))
        .coalesce(1).write.parquet(p(root, "stats__fold").toString)
      write(p(root, "_fold_intent"), "sub=stats\n")
      assert(idx.repairFold())
      assert(!fs.exists(p(root, "_fold_intent")))
      assert(idx.readStats().count() == 1)
      assertSameRows(idx.search(docQueries, topK = 10), expect)
    }
    // crash between the renames: stage + old present, live missing
    locally {
      val (idx, root) = freshIdx("lexidx_crash2")
      val fs = root.getFileSystem(conf)
      idx.readStats().agg(sum(col("n")).as("n"), sum(col("tl")).as("tl"))
        .coalesce(1).write.parquet(p(root, "stats__fold").toString)
      fs.rename(p(root, "stats"), p(root, "stats__old"))
      write(p(root, "_fold_intent"), "sub=stats\n")
      assert(idx.repairFold())
      assert(idx.readStats().count() == 1)
      assertSameRows(idx.search(docQueries, topK = 10), expect)
    }
    // crash after swap, before cleanup: live + old present, no stage
    locally {
      val (idx, root) = freshIdx("lexidx_crash3")
      val fs = root.getFileSystem(conf)
      write(p(root, "_fold_intent"), "sub=stats\n")
      fs.mkdirs(p(root, "stats__old"))
      assert(idx.repairFold())
      assert(!fs.exists(p(root, "stats__old")))
      assertSameRows(idx.search(docQueries, topK = 10), expect)
    }
    // only the old survived: restore it
    locally {
      val (idx, root) = freshIdx("lexidx_crash4")
      val fs = root.getFileSystem(conf)
      fs.rename(p(root, "stats"), p(root, "stats__old"))
      write(p(root, "_fold_intent"), "sub=stats\n")
      assert(idx.repairFold())
      assertSameRows(idx.search(docQueries, topK = 10), expect)
    }
  }

  test("ibtp loop maintains a lexical index via periodPostStep") {
    import graft.ibtp._
    val idx = new LexicalIndex(spark, tmpDir("lexidx_loop") + "/idx")
    val start = java.time.LocalDate.of(2024, 1, 1)
    val dayCol = date_add(lit(java.sql.Date.valueOf(start)),
      (col("doc_id") % 30).cast("int"))
    val model = new IbtpModel {
      def query(s: org.apache.spark.sql.SparkSession,
          b: PeriodBounds): org.apache.spark.sql.DataFrame =
        docs.withColumn("day", dayCol)
          .filter(col("day") >= lit(java.sql.Date.valueOf(b.from)) &&
            col("day") < lit(java.sql.Date.valueOf(b.to)))
          .select(col("day"), col("doc_id"), col("text"))
    }
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(start), stopDate = Some(start.plusDays(30)),
      period = PeriodUnit.Week)
    val target = new TargetTable(spark, tmpDir("lexidx_loop_tbl") + "/tbl",
      "day", countRows = false)
    var periods = 0
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, periodPostStep = Some((_, df) => {
        periods += 1; idx.append(df.select("doc_id", "text"))
      })))
    // init's period-0 chunk must have fired the step too — one stats
    // partial per materialized period, no period missed
    assert(periods >= 5, s"post-step must fire per period incl init, got $periods")
    assert(idx.readStats().count() == periods)
    assertSameRows(
      idx.search(docQueries, topK = 10),
      Ranking.bm25TopK(docs, docQueries, topK = 10))
  }

  test("lexical index append reads its batch once (one-pass indexing)") {
    // the batch's bytes must cross the filesystem ONCE: the postings
    // write scans it (tf persists; the df partials reuse the cached
    // shuffle; the stats ride the same job as observed metrics).
    // Pre-fix this was 3 scans per period. Pinned via Hadoop
    // FileSystem statistics — suites run sequentially in the forked
    // test JVM, so the local-scheme byte counter is ours alone during
    // the append.
    val dir = tmpDir("lexidx_onepass")
    docs.select(col("doc_id"), col("text")).write.parquet(dir + "/batch")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val s = qe.executedPlan.toString
        if (s.contains(dir + "/batch")) plans.add(s)
        ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val idx = new LexicalIndex(spark, tmpDir("lexidx_onepass_idx") + "/idx")
      idx.append(spark.read.parquet(dir + "/batch"))
      // QueryExecutionListener events are async: wait for quiescence
      val deadline = System.currentTimeMillis() + 15000
      var last = -1
      while (last != plans.size() && System.currentTimeMillis() < deadline) {
        last = plans.size(); Thread.sleep(2000)
      }
      // exactly TWO executions touch the batch (postings, df) — the
      // stats write rides the postings job as observed metrics — and
      // BOTH read it through the persisted tf (the path string appears
      // only inside the InMemoryRelation's cached subtree). A dropped
      // persist shows as a bare file scan; a third tokenize pass shows
      // as a third plan. Pre-fix: 3 plans, none cached.
      import scala.jdk.CollectionConverters._
      val got = plans.asScala.toSeq
      assert(got.size == 2,
        s"append must run exactly 2 batch-reading executions, saw ${got.size}")
      got.foreach(p => assert(p.contains("InMemoryTableScan"),
        s"batch must be read through the persisted tf, got a bare scan:\n$p"))
      // and the one-pass stats are still exact
      val st = idx.readStats().collect().head
      assert(st.getLong(0) == docs.count())
      assertSameRows(
        idx.search(docQueries, topK = 10),
        Ranking.bm25TopK(docs, docQueries, topK = 10))
    } finally spark.listenerManager.unregister(listener)
  }

  test("index append publishes all components atomically at every crash boundary") {
    // a torn append (postings landed, df/stats missing) is a silently
    // WRONG index — idf overstated, avgdl off. Kill the publish at
    // every boundary: afterwards a search must answer as if the batch
    // was never appended (pre-marker) or fully appended (post-marker),
    // never in between.
    val evenRef = Ranking.bm25TopK(
      docs.filter(col("doc_id") % 2 === 0), docQueries, topK = 10)
    val fullRef = Ranking.bm25TopK(docs, docQueries, topK = 10)
    Seq("publish:staged", "publish:marker", "publish:move", "publish:moved")
      .foreach { point =>
        val idx = new LexicalIndex(spark,
          tmpDir(s"lexidx_${point.replace(':', '_')}") + "/idx")
        idx.append(docs.filter(col("doc_id") % 2 === 0))
        var armed = true
        IndexStore.crashHook = n =>
          if (armed && n == point) {
            armed = false // repair re-walks the same boundaries
            throw new RuntimeException(s"simulated crash at $point")
          }
        try intercept[RuntimeException] {
          idx.append(docs.filter(col("doc_id") % 2 =!= 0))
        } finally IndexStore.crashHook = _ => ()
        // search runs the repair (tryWithClaim -> repairAll) and must
        // see exactly one of the two legal states
        val expect = if (point == "publish:staged") evenRef else fullRef
        assertSameRows(idx.search(docQueries, topK = 10), expect)
        // the store converges: a later append works and lands cleanly
        if (point == "publish:staged")
          idx.append(docs.filter(col("doc_id") % 2 =!= 0))
        assertSameRows(idx.search(docQueries, topK = 10), fullRef)
        val files = new java.io.File(idx.path).listFiles.map(_.getName).toSet
        assert(files == Set("postings", "df", "stats"),
          s"litter after $point repair: $files")
      }
  }

  test("pq index compact folds code files with bit-identical search results") {
    val idx = new PqIndex(spark, tmpDir("pqidx_fold") + "/idx", m = 4, k = 16)
    idx.create(emb.filter(col("vec_id") % 2 === 0),
      coarse = Some(emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("centroid_id"), col("embedding"))))
    idx.append(emb.filter(col("vec_id") % 4 === 1))
    idx.append(emb.filter(col("vec_id") % 4 === 3))
    val filesBefore = idx.readCodes().inputFiles.length
    val before = idx.searchIvf(vecQueries, topK = 10, nProbe = 2)
      .collect().map(_.toString).sorted
    idx.compact(codesFiles = 2)
    assert(idx.readCodes().inputFiles.length < filesBefore,
      s"codes files must shrink: ${idx.readCodes().inputFiles.length} vs $filesBefore")
    val after = idx.searchIvf(vecQueries, topK = 10, nProbe = 2)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after), "compact must be invisible to search")
    // the fold swap heals a crash, same machinery as the lexical index
    val root = new org.apache.hadoop.fs.Path(idx.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    idx.readCodes().coalesce(1)
      .write.parquet(idx.path + "/codes__fold")
    val tmp = new org.apache.hadoop.fs.Path(idx.path + "/_fold_intent.tmp")
    val o = fs.create(tmp, true)
    try o.write("sub=codes\n".getBytes("UTF-8")) finally o.close()
    assert(fs.rename(tmp, new org.apache.hadoop.fs.Path(idx.path + "/_fold_intent")))
    assert(idx.repairFold())
    val healed = idx.searchIvf(vecQueries, topK = 10, nProbe = 2)
      .collect().map(_.toString).sorted
    assert(before.sameElements(healed), "fold repair must be invisible to search")
    val files = new java.io.File(idx.path).listFiles.map(_.getName).toSet
    assert(files == Set("codebooks", "coarse", "codes"), files)
  }

  test("two index writers serialize on the claim; a stale claim is swept") {
    // the multi-writer contract: two pipelines loop-maintaining ONE
    // index must interleave appends without clobbering each other's
    // in-flight parquet jobs — writers queue on the owner-token claim
    val path = tmpDir("lexidx_claim") + "/idx"
    val a = new LexicalIndex(spark, path)
    val b = new LexicalIndex(spark, path)
    val store = new IndexStore(spark, path)
    // 1. a live claim blocks a rival until released
    @volatile var released = false
    val holder = new Thread(() => store.withClaim {
      Thread.sleep(1200); released = true
    })
    holder.start()
    Thread.sleep(200) // let the holder acquire
    a.append(docs.filter(col("doc_id") % 2 === 0)) // must wait, then land
    assert(released, "the append must have queued behind the live claim")
    holder.join()
    // 2. concurrent appends from two instances both land, bit-exactly
    val t1 = new Thread(() => b.append(docs.filter(col("doc_id") % 4 === 1)))
    val t2 = new Thread(() => a.append(docs.filter(col("doc_id") % 4 === 3)))
    t1.start(); t2.start(); t1.join(); t2.join()
    assertSameRows(
      a.search(docQueries, topK = 10),
      Ranking.bm25TopK(docs, docQueries, topK = 10))
    // 3. a crashed holder's stale claim is swept, not waited out
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(path, "_writer_claim")
    val o = fs.create(claim, true)
    try o.write("dead-writer".getBytes("UTF-8")) finally o.close()
    fs.setTimes(claim, System.currentTimeMillis() - IndexStore.ClaimStaleMs - 10000, -1)
    a.append(docs.limit(0)) // sweeps the stale claim and proceeds
    assert(!fs.exists(claim) ||
      !new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
        fs.open(claim)), "UTF-8").startsWith("dead-writer"),
      "the stale claim must have been swept")
    assertSameRows(
      a.search(docQueries, topK = 10),
      Ranking.bm25TopK(docs, docQueries, topK = 10))
  }
}

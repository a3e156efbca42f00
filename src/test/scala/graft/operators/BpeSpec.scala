package graft.operators

import graft.SparkSpecBase

/** BPE merge discovery: hand-computed merges, overlapping pair counts
  * vs non-overlapping application, and determinism.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("merges match hand computation on a tiny corpus") {
    // words: the×2, cat, hat → pairs th:2, he:2, ca:1, at:2, ha:1
    // step 1 ties at 2 → lexicographic: (a,t) wins
    // after <a><t> → <at>: pairs th:2, he:2, c-at:1, h-at:1
    // step 2: ties (h,e):2 (t,h):2 → (h,e) wins
    // step 3: (t,he):2 beats (t,h)? t,h still 2 from 'the'... after he
    //   merge, 'the' = <t><he> → pair (t,he):2; remaining: c-at:1, h-at:1
    val docs = Seq((1L, "the cat the hat")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", nMerges = 3)
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1, "a", "t", 2L), (2, "h", "e", 2L), (3, "t", "he", 2L)))
  }

  test("overlapping pairs counted, application merges left-to-right non-overlapping") {
    // 'aaaa': (a,a) counted 3 (overlapping); after merge the word is
    // <aa><aa>, so step 2's top pair is (aa,aa) with count 1
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", nMerges = 2)
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("non-letter tokens are excluded; merge count stops when no pairs remain") {
    val docs = Seq((1L, "ab 123 x!y z")).toDF("doc_id", "text")
    // eligible words: ab, z — only one pair exists, then nothing
    val got = Bpe.trainMerges(docs, "text", nMerges = 5)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("a", "b")))
  }

  test("deterministic across runs on the documents fixture") {
    val a = Bpe.trainMerges(table("documents"), "text", 3).collect().toSeq
    val b = Bpe.trainMerges(table("documents"), "text", 3).collect().toSeq
    assert(a == b && a.size == 3)
  }

  test("batched ≡ sequential: batchSize=1 always; larger batches on disjoint tops") {
    // batchSize = 1 degenerates to sequential BPE exactly
    val docs = table("documents")
    val seqM = Bpe.trainMerges(docs, "text", 8).collect().toSeq
    val b1   = Bpe.trainMergesBatched(docs, "text", 8, batchSize = 1).collect().toSeq
    assert(b1 == seqM, s"batchSize=1 diverged:\n$b1\nvs\n$seqM")
    // a corpus engineered so every round's top pairs are pairwise
    // symbol-disjoint: four frequent words over disjoint alphabets —
    // disjoint-symbol merges leave each other's counts untouched, so
    // the batch applies exactly the merges sequential would
    val dj = Seq((1L, ("ab " * 9) + ("cd " * 7) + ("ef " * 5) + ("gh " * 3)))
      .toDF("doc_id", "text")
    val seqDj = Bpe.trainMerges(dj, "text", 4).collect().toSeq
    val b4Dj  = Bpe.trainMergesBatched(dj, "text", 4, batchSize = 4).collect().toSeq
    assert(b4Dj == seqDj, s"disjoint-top batch diverged:\n$b4Dj\nvs\n$seqDj")
    // overlap safety: when the top pairs SHARE a symbol, the batch
    // must defer the conflicting candidate, never apply it at a stale
    // count — counts recorded per merge must equal sequential's for
    // the merges both discover (here: the full sequential prefix)
    val ov = Seq((1L, ("the " * 10) + ("he " * 5))).toDF("doc_id", "text")
    val seqOv = Bpe.trainMerges(ov, "text", 3).collect().toSeq
    val bOv   = Bpe.trainMergesBatched(ov, "text", 3, batchSize = 3).collect().toSeq
    assert(bOv == seqOv, s"overlapping-top batch diverged:\n$bOv\nvs\n$seqOv")
  }

  test("1k-merge batched training runs in bounded jobs") {
    // sequential discovery is 2 driver round-trips per merge (argmax +
    // rewrite count) — 2000+ jobs for 1k merges. Batched must stay
    // within a few jobs per ROUND, i.e. O(n/batchSize) total.
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    // the sf0.001 fixture vocabulary saturates below 1k merges; build a
    // deterministic 2000-word corpus (base-26-coded ids, 7 letters) with
    // ~12k merges of headroom — Zipf-ish counts so argmaxes are mostly
    // untied and the greedy disjoint selection has real work to do
    import spark.implicits._
    val corpus = (0 until 2000).map { i =>
      val w = java.lang.Integer.toString(i + 26 * 26 * 26, 26)
        .map(c => if (c.isDigit) ('a' + (c - '0')).toChar else ('k' + (c - 'a')).toChar)
      (i.toLong, (w + " ") * (1 + 2000 / (i + 1)))
    }.toDF("doc_id", "text")
    spark.sparkContext.addSparkListener(listener)
    val merges =
      try Bpe.trainMergesBatched(corpus, "text", 1000, batchSize = 64)
        .collect()
      finally spark.sparkContext.removeSparkListener(listener)
    assert(merges.length == 1000, s"expected 1000 merges, got ${merges.length}")
    // steps are dense 1..1000 with positive counts
    assert(merges.map(_.getInt(0)).toSeq == (1 to 1000))
    assert(merges.forall(_.getLong(3) > 0))
    // ceil(1000/64) = 16 rounds; allow generous per-round overhead but
    // stay an order of magnitude under sequential's ~2000
    assert(jobs < 200, s"expected bounded jobs for batched training, saw $jobs")
  }

  test("encode matches hand computation; lowercases; drops non-[a-z]+ tokens") {
    // merges from 'the cat the hat': (a,t), (h,e), (t,he)
    val train = Seq((1L, "the cat the hat")).toDF("doc_id", "text")
    val merges = Bpe.collectMerges(Bpe.trainMerges(train, "text", 3))
    assert(merges == Seq(("a", "t"), ("h", "e"), ("t", "he")))
    val got = Bpe.encode(
      Seq((1L, "the cat that 123 Xy"), (2L, ""), (3L, "!?")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    // the → <the> (h,e then t,he); cat → <c><at>; that → <t><h><at>;
    // 123 dropped; Xy lowercases to xy → <x><y>
    assert(got(0).getString(2) == "<the> <c><at> <t><h><at> <x><y>")
    assert(got(0).getInt(1) == 8)
    assert(got(1).getString(2) == "" && got(1).getInt(1) == 0)
    assert(got(2).getString(2) == "" && got(2).getInt(1) == 0)
  }

  test("greedy rank encode ≡ the rank-order replace chain (fixture corpus, 8 merges)") {
    // the equivalence contract in BpeExpressions' scaladoc, pinned on
    // real data: applying merges in step order as left-to-right
    // non-overlapping replaces (the trainer's and the oracle's
    // semantics) produces exactly the greedy min-rank encoder's output
    val docs = table("documents")
    val merges = Bpe.collectMerges(Bpe.trainMerges(docs, "text", 8))
    assert(merges.size == 8)
    val bracketed =
      "array_join(transform(filter(split(lower(text), '\\\\s+'), " +
        "w -> w rlike '^[a-z]+$'), w -> regexp_replace(w, '(.)', '<$1>')), ' ')"
    val chain = merges.foldLeft(bracketed) { case (acc, (l, r)) =>
      s"replace($acc, '<$l><$r>', '<$l$r>')"
    }
    val viaChain = docs.selectExpr("doc_id", s"$chain AS encoded")
    val viaGreedy = Bpe.encode(docs, "doc_id", "text", merges)
      .select($"doc_id", $"encoded")
    assertSameRows(viaGreedy, viaChain)
  }

  test("encode with an empty merge table brackets every letter") {
    val got = Bpe.encode(Seq((1L, "ab c")).toDF("doc_id", "text"),
      "doc_id", "text", Nil).collect().head
    assert(got.getString(2) == "<a><b> <c>" && got.getInt(1) == 3)
  }
}

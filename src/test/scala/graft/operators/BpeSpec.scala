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
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
      nodes.toDF("id"), "id",
      edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component labeled by its min id") {
    // worst case for plain hash-min (diameter = n); pointer jumping
    // must still converge inside the default round budget
    val n = 40L
    val got = cc(0L until n, (0L until n - 1).map(i => (i, i + 1)))
    assert(got.size == n)
    assert(got.values.toSet == Set(0L))
  }

  test("cycle, disjoint blob, and singletons") {
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 10L), // cycle
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle
    val got = cc(Seq(10L, 11L, 12L, 20L, 21L, 22L, 30L, 31L), edges)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 31L))
  }

  test("edge direction does not matter") {
    val a = cc(Seq(1L, 2L, 3L), Seq((3L, 1L), (2L, 3L)))
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusterAssign reports cluster sizes") {
    val out = Components.clusterAssign(
      Seq(1L, 2L, 3L, 9L).toDF("id"), "id",
      Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (9L, 9L, 1L)))
  }

  test("incremental update equals full recompute, including cluster merges") {
    val oldNodes = Seq(1L, 2L, 3L, 10L, 11L, 20L)
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val prev = Components.connectedComponents(
      oldNodes.toDF("id"), "id", oldEdges.toDF("s", "d"), "s", "d")
    // batch: new node 30 joins cluster {10,11}; edge 3-10 MERGES the
    // two old clusters; 40 arrives as a singleton
    val newNodes = Seq(30L, 40L)
    val newEdges = Seq((30L, 10L), (3L, 10L))
    val inc = Components.incrementalComponents(prev, newNodes.toDF("id"), "id",
      newEdges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    val full = Components.connectedComponents(
      (oldNodes ++ newNodes).toDF("id"), "id",
      (oldEdges ++ newEdges).toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    assert(inc(30L) == 1L && inc(11L) == 1L && inc(40L) == 40L && inc(20L) == 20L)
  }

  test("cluster assignment equals components over the exact all-pairs edge set") {
    // the q62 spec-side gate (the benched query's oracle replays the
    // capped LSH pipeline since round 7 — this is where the quadratic
    // ground truth lives now): the production funnel (LSH candidates →
    // exact verify → membership edges → components) must produce the
    // SAME clusters as components over the exact Σdf² all-pairs edge
    // set at the same threshold. allPairsJaccard ranges over all docs,
    // not just content representatives, but any above-threshold pair
    // between duplicates implies the same-text reps pair at the same
    // Jaccard, so the two edge sets have identical connectivity.
    val corpus = graft.queries.ExtensionQueries.corpusWithNearDups(spark, sfDir)
    val got = graft.queries.ExtensionQueries.clusterAssign(spark, sfDir)
    val exactPairs = Dedup.allPairsJaccard(corpus, "doc_id", "text",
      shingleN = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val expected = Components.clusterAssign(corpus, "doc_id",
      exactPairs.unionAll(Dedup.exactMemberEdges(corpus, "doc_id", "text")),
      "id_a", "id_b")
    assertSameRows(got, expected)
    spark.sharedState.cacheManager.clearCache()
  }

  test("near-dup cluster query: planted copies cluster with originals") {
    val out = graft.queries.ExtensionQueries.clusterAssign(spark, sfDir)
    val byDoc = out.select(col("doc_id"), col("cluster_id"))
      .as[(Long, Long)].collect().toMap
    // every planted near-copy (id + 2,000,000) must land in its
    // original's cluster — the pair is above the 0.5 threshold by
    // construction (only 3 trailing tokens dropped)
    val originals = byDoc.keys.filter(_ < 2000000L)
    originals.foreach { id =>
      assert(byDoc(id + 2000000L) == byDoc(id),
        s"near copy of $id in different cluster")
    }
  }
}

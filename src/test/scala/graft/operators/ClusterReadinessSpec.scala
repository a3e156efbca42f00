package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.expressions.CentroidMatrix

/** Cluster-readiness switches: driver-side state that is fine on
  * local[32] but needs an explicit posture on a 1000-executor cluster.
  *
  *  - Components' per-round lineage truncation is executor-local by
  *    default (lost blocks fail the job); `Components.checkpointDir`
  *    switches it to RELIABLE `checkpoint(dir)` — same answers, blocks
  *    recoverable from storage.
  *  - The documented control-plane collects (centroid matrices, sketch
  *    blobs, BPE merge tables) carry fail-loudly caps: pointing them at
  *    a data-plane-sized input diagnoses the misuse instead of OOMing
  *    the driver — and the guard itself runs as a LIMIT on the
  *    executors, so the failure costs one row over the cap.
  */
class ClusterReadinessSpec extends SparkSpecBase {
  import spark.implicits._

  test("Components with a reliable checkpoint dir matches localCheckpoint answers") {
    val nodes = (1L to 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 8L)).toDF("a", "b")
    val want = Components
      .connectedComponents(nodes, "id", edges, "a", "b")
      .collect().map(_.toString).sorted.toSeq
    val dir = tmpDir("cc_reliable")
    Components.checkpointDir = Some(dir)
    try {
      val got = Components
        .connectedComponents(nodes, "id", edges, "a", "b")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "reliable-checkpoint mode must not change answers")
      // and it really went through storage: the dir holds rdd checkpoints
      def hasRdd(f: java.io.File): Boolean =
        f.isDirectory && (f.getName.startsWith("rdd-") ||
          Option(f.listFiles).exists(_.exists(hasRdd)))
      assert(hasRdd(new java.io.File(dir)),
        s"no rdd-* checkpoint dirs under $dir — localCheckpoint was used")
    } finally Components.checkpointDir = None
  }

  test("co-resident pipelines choose checkpoint strategies PER CALL") {
    // the round-12 global knob could not serve two pipelines in one JVM;
    // per-call strategies can — and both answer identically
    val nodes = (1L to 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val dir = tmpDir("cc_percall")
    val reliable = Components.connectedComponents(nodes, "id", edges, "a", "b",
      ckpt = Components.Checkpointing.Reliable(dir))
    val local = Components.connectedComponents(nodes, "id", edges, "a", "b",
      ckpt = Components.Checkpointing.Local)
    assertSameRows(reliable, local)
    def hasRdd(f: java.io.File): Boolean =
      f.isDirectory && (f.getName.startsWith("rdd-") ||
        Option(f.listFiles).exists(_.exists(hasRdd)))
    assert(hasRdd(new java.io.File(dir)),
      s"the Reliable call must checkpoint through $dir")
    // Local FORCES localCheckpoint even when the global fallback is set
    val dir2 = tmpDir("cc_percall2")
    Components.checkpointDir = Some(dir2)
    try {
      Components.connectedComponents(nodes, "id", edges, "a", "b",
        ckpt = Components.Checkpointing.Local).collect()
      assert(!hasRdd(new java.io.File(dir2)),
        "Checkpointing.Local must not write through the global dir")
    } finally Components.checkpointDir = None
  }

  test("a reliable checkpoint survives block loss that kills a local checkpoint") {
    // the cluster-failure mode, simulated: drop the truncated frame's
    // storage blocks (an executor dying takes its local-checkpoint
    // blocks with it), then evaluate. localCheckpoint has nothing to
    // recompute from — the read fails; checkpoint(dir) recomputes from
    // the checkpoint FILES and answers.
    val sc = spark.sparkContext
    def dropBlocks(df: org.apache.spark.sql.DataFrame): Unit = {
      val rdd = df.rdd // the checkpointed plan's RDD lineage
      rdd.count() // materialize
      // remove every cached/checkpoint BLOCK for all rdds in the lineage
      sc.getPersistentRDDs.values.foreach(r =>
        org.apache.spark.SparkEnv.get.blockManager.master
          .removeRdd(r.id, blocking = true))
    }
    val dirR = tmpDir("cc_survive")
    sc.setCheckpointDir(dirR)
    val local = (1L to 100L).toDF("id").localCheckpoint(true)
    val reliable = (1L to 100L).toDF("id").checkpoint(true)
    dropBlocks(local); dropBlocks(reliable)
    assert(reliable.count() == 100L,
      "reliable checkpoint must recompute from storage after block loss")
    val localSurvives = scala.util.Try(local.count()).isSuccess
    assert(!localSurvives,
      "setup check: block loss must actually kill the local checkpoint " +
        "(if this starts passing, Spark began re-materializing local " +
        "checkpoints and the Reliable switch is moot)")
  }

  test("CentroidMatrix.fromDataFrame trips its cap on a data-plane input") {
    val saved = CentroidMatrix.maxCentroidRows
    CentroidMatrix.maxCentroidRows = 2
    try {
      val centroids = Seq(
        (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 1.0))
      ).toDF("centroid_id", "vec")
      val e = intercept[IllegalStateException] {
        CentroidMatrix.fromDataFrame(centroids, "vec")
      }
      assert(e.getMessage.contains("control-plane cap"), e.getMessage)
      // within the cap it still works
      CentroidMatrix.maxCentroidRows = 3
      assert(CentroidMatrix.fromDataFrame(centroids, "vec").k == 3)
    } finally CentroidMatrix.maxCentroidRows = saved
  }

  test("Sketches.mergedFrequencies trips its cap when fed the raw stream") {
    val saved = Sketches.maxSketchRows
    Sketches.maxSketchRows = 2
    try {
      val sk = org.apache.spark.util.sketch.CountMinSketch.create(0.01, 0.01, 42)
      sk.add(7L)
      val bos = new java.io.ByteArrayOutputStream(); sk.writeTo(bos)
      val blob = bos.toByteArray
      val daily3 = Seq(blob, blob, blob).toDF("cms")
      val e = intercept[IllegalStateException] {
        Sketches.mergedFrequencies(daily3, Seq(7L))
      }
      assert(e.getMessage.contains("control-plane cap"), e.getMessage)
      Sketches.maxSketchRows = 3
      assert(Sketches.mergedFrequencies(daily3, Seq(7L))(7L) == 3L)
    } finally Sketches.maxSketchRows = saved
  }

  test("Bpe trainers reject a runaway nMerges up front") {
    val saved = Bpe.maxMerges
    Bpe.maxMerges = 4
    try {
      val docs = Seq("aa ab aa", "ab aa").toDF("text")
      val e = intercept[IllegalArgumentException] {
        Bpe.trainMerges(docs, "text", 5)
      }
      assert(e.getMessage.contains("control-plane cap"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Bpe.trainMergesBatched(docs, "text", 5)
      }
      assert(e2.getMessage.contains("control-plane cap"), e2.getMessage)
      // within the cap both still train
      assert(Bpe.trainMerges(docs, "text", 2).count() > 0)
    } finally Bpe.maxMerges = saved
  }
}

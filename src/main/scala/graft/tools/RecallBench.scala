package graft.tools


import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, normSq}
import graft.operators.{CorpusStats, KMeans, PqIndex}
import graft.sources.{GraftSession, Tables}

/** Recall-vs-cost curve for the persisted IVF-PQ index
  * ([[graft.operators.PqIndex.searchIvf]]): at each nProbe, measure
  * recall@10 against the EXACT squared-L2 top-10, the scored-row count
  * (Σ probed-list sizes per query — the cost the probe bounds), and
  * wall time. The table this prints is how a user picks nProbe from
  * data instead of folklore; the nProbe = nlist row doubles as the PQ
  * quantization ceiling (probing everything ≡ flat ADC, so any missing
  * recall there is the code's, not the probe's).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.tools.RecallBench [sfDir] [nlist] [m] [k] [nQueries]`. One
  * JSON line per nProbe.
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val nlist = args.lift(1).map(_.toInt).getOrElse(32)
    val m = args.lift(2).map(_.toInt).getOrElse(4)
    val k = args.lift(3).map(_.toInt).getOrElse(16)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(20)
    val topK = 10
    val spark = GraftSession.create("graft-recall-bench")
    val emb = Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // coarse centroids trained with the engine's own bit-reproducible
    // KMeans — the shape a production create() would use
    val coarse = KMeans.fit(emb, nlist, maxIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("recall_bench").toString
    val idx = new PqIndex(spark, dir + "/idx", m = m, k = k)
    idx.create(emb, coarse = Some(coarse))

    // exact L2 ground truth (self-matches excluded, like the engine)
    val q = queries.select(col("query_id"), col("embedding").as("q_vec"))
    val exact = CorpusStats.topKPerGroup(
      emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (-(normSq(col("embedding")) + normSq(col("q_vec"))
            - lit(2.0) * dot(col("embedding"), col("q_vec")))).as("negd2")),
      "query_id", "vec_id", "negd2", topK)
    val truth: Map[Long, Set[Long]] = exact.collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
    val truthTotal = truth.values.map(_.size).sum.toDouble

    // per-list sizes from STORAGE (what the probe actually bounds)
    val listSizes: Map[Long, Long] = idx.readCodes()
      .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = coarse.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qVecs = queries.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var na = 0.0; var nb = 0.0; var ab = 0.0
      a.indices.foreach { i => na += a(i) * a(i); nb += b(i) * b(i); ab += a(i) * b(i) }
      na + nb - 2.0 * ab
    }
    def scoredRows(nProbe: Int): Long = qVecs.map { case (_, qv) =>
      cents.toSeq.map { case (cid, cv) => (d2(qv, cv), cid) }
        .sortBy(x => (x._1, x._2)).take(nProbe)
        .map(x => listSizes.getOrElse(x._2, 0L)).sum
    }.sum

    def measure(nProbe: Int): (Double, Double) = {
      val t0 = System.nanoTime()
      val got = idx.searchIvf(queries, topK, nProbe).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val hit = got.count(r => truth.getOrElse(r.getLong(0), Set.empty)
        .contains(r.getLong(1)))
      (hit / truthTotal, wall)
    }
    measure(1) // warm the probe path once, untimed

    Iterator.iterate(1)(_ * 2).takeWhile(_ <= nlist).foreach { nProbe =>
      val (recall, wall) = measure(nProbe)
      println(
        f"""{"nprobe":$nProbe,"recall_at_10":$recall%.4f,""" +
          f""""scored_rows":${scoredRows(nProbe)},"corpus_rows":${nVec * qVecs.size},""" +
          f""""wall_sec":$wall%.3f,"nlist":$nlist,"m":$m,"k":$k,"n_vec":$nVec}""")
    }
    spark.stop()
  }
}

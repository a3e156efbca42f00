package graft.tools

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions.{jaccard, lshBandKeys}
import graft.functions.expressions.TextHashFunctions._

/** Stage-level timing for the bench's heaviest queries (q62/q67 family).
  *
  * Replays the MinHash-LSH pipeline stage by stage with a count() sink
  * per stage, so the bench total can be attributed to signature
  * computation vs band join vs exact verification vs components. Each
  * stage is timed AFTER its inputs are persisted and materialized, so
  * numbers are marginal costs, not cumulative.
  *
  * Usage: runMain graft.tools.TailProfile [sfDir]
  */
object TailProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.GraftSession.create("graft-tailprofile")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val (bands, rowsPerBand, shingleN, threshold) = (64, 2, 3, 0.5)

    val corpus = graft.queries.ExtensionQueries.corpusWithNearDups(spark, sfDir)
    time("corpus materialize")(corpus.count())

    // mirror minhashNearDupPairs stage for stage: the real pipeline
    // collapses exact copies to min-id representatives BEFORE
    // signatures and caps hot LSH buckets — omitting either would
    // attribute time to the wrong stage on fixtures with duplicate
    // texts (sf0.1's documents table has 8)
    val reps = graft.operators.Dedup.contentRepresentatives(corpus, "doc_id",
      struct(xxhash64(col("text")), length(col("text"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("content-representative collapse")(reps.count())

    val sigs = reps
      .select(col("doc_id").as("id"),
        shingle_hashes(col("text"), shingleN).as("shingles"),
        minhash_sig(col("text"), shingleN, bands * rowsPerBand).as("sig"))
      .filter(size(col("shingles")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("signatures (128 minhash + shingles)")(sigs.count())

    val bandKeys = graft.operators.Dedup.capBuckets(
      sigs
        .select(col("id"), explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash")),
      maxBucket = 256, keys = Seq("band", "band_hash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("band keys explode + hot-bucket cap")(bandKeys.count())

    val candidates = bandKeys.as("l")
      .join(bandKeys.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCand = time("band self-join + distinct")(candidates.count())
    println(s"[profile]   candidates: $nCand")

    val shA = sigs.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = sigs.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    val verified = candidates
      .join(shA, "id_a")
      .join(shB, "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), F.round(col("jaccard"), 4).as("jaccard"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nVer = time("exact-jaccard verify")(verified.count())
    println(s"[profile]   verified pairs: $nVer")

    // q62's remainder: copy edges + components over the verified pairs
    val copyEdges = time("exact member edges") {
      val e = graft.operators.Dedup.exactMemberEdges(corpus, "doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    time("components (label propagation)") {
      graft.operators.Components
        .clusterAssign(corpus, "doc_id",
          verified.select(col("id_a"), col("id_b")).unionByName(copyEdges),
          "id_a", "id_b")
        .count()
    }

    // q67's remainder: k-NN ranking from the pair list
    time("knnFromPairs (q67 tail)") {
      graft.operators.Dedup.knnFromPairs(verified, k = 3).count()
    }

    spark.stop()
  }
}

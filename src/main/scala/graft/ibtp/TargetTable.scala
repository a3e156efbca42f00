package graft.ibtp

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The persistent, append-mostly, time-keyed target table
  * (reference: `insert_by_timeperiod_materialization.sql:16-27`).
  *
  * Physical layout: parquet directory partitioned by `p_date =
  * CAST(timestampField AS DATE)`. Partitioning by **day** — not by the
  * configured period — is the key scale decision (SURVEY §7 risk
  * register): every period (day/week/month/year) and every backfill
  * range is a whole number of day-partitions, so both DELETE paths
  * become partition-granular file operations instead of row rewrites:
  *
  *  - range delete (backfill, `insert_by_timeperiod_loop.sql:95-99`) →
  *    dynamic partition overwrite of exactly the period's partitions;
  *  - key delete (upsert, `loop.sql:100-107`) → anti-join rewrite of
  *    only the partitions that actually contain matching keys.
  *
  * At 100 TB the target has ~years of day-partitions; a period load
  * touches only its own partitions and the per-period jobs are
  * independent — the same bounded-working-set property the reference
  * gets from its chunked INSERTs.
  */
final class TargetTable(
    val spark: SparkSession,
    val path: String,
    val timestampField: String,
    /** When false, writes skip the row-count pass (the reference's
      * `rows_affected` accounting, `loop.sql:117-126`) and report -1 —
      * the fast path for large loads where the extra cache+count of each
      * period chunk isn't worth a log line.
      */
    val countRows: Boolean = true) {

  import TargetTable._

  private val fmt = DateTimeFormatter.ISO_LOCAL_DATE

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = {
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.getPath.getName.startsWith(s"$PartitionCol=") ||
      st.getPath.getName == "_SUCCESS" || st.getPath.getName == SchemaFile
    }
  }

  /** The user-visible relation: target columns without the internal
    * partition column. Filters on `timestampField` still prune
    * partitions because `p_date = cast(ts as date)` is written aligned.
    */
  def read(): DataFrame =
    if (!exists) throw new IllegalStateException(s"target $path does not exist")
    else readRaw().drop(PartitionCol)

  /** Partition-pruned read of [from, to): the range predicate lands on
    * the day-partition column, so the scan touches only the range's
    * partition directories — the read path a loop-body model should use
    * against a previous IBTP target at 100 TB.
    */
  def readRange(from: LocalDate, to: LocalDate): DataFrame =
    readRaw()
      .filter(col(PartitionCol) >= lit(java.sql.Date.valueOf(from)) &&
        col(PartitionCol) < lit(java.sql.Date.valueOf(to)))
      .drop(PartitionCol)

  /** Largest LIVE day-partition value, from metadata only — no data
    * scan. Because `p_date = CAST(timestampField AS DATE)` is written
    * aligned, this equals CAST(MAX(ts) AS DATE), which is exactly what
    * the resume probe needs (reference `helpers.sql:119` runs MAX(ts)
    * on the warehouse; here it is a manifest read — see
    * [[datePartitions]] for the source of truth and the mixed-version
    * caveat).
    */
  def maxPartitionDate: Option[LocalDate] = partitionDates.maxOption

  /** All day-partitions holding LIVE data whose value parses as a
    * date, with their directory paths. Post-manifest-era this comes
    * from the latest committed manifest, not a directory listing: a
    * partition whose files were all replaced away (its directory
    * lingers holding only trash-parked files until [[vacuum]]) must
    * drop out of the resume frontier the instant the replace commits.
    * Pre-manifest tables fall back to directory names. Mixed-version
    * caveat: files added by a writer that does not commit a manifest
    * (an older version of this library, an external tool dropping
    * parquet in by hand) are INVISIBLE to the frontier and to reads
    * until a manifest commit relists their directories — run
    * [[relistManifest]] to absorb them. Rows with a NULL timestamp
    * land in Spark's
    * `__HIVE_DEFAULT_PARTITION__` directory — legitimate data (the
    * reference inserts NULL-ts rows like any other), but not a date:
    * it must not crash the resume probe, and like SQL `MAX(ts)` the
    * frontier ignores NULLs.
    */
  private def datePartitions: Seq[(LocalDate, Path)] = {
    val p = new Path(path)
    def parse(dirName: String): Option[LocalDate] = {
      val v = dirName.stripPrefix(s"$PartitionCol=")
      val parsed = scala.util.Try(LocalDate.parse(v)).toOption
      // Only the NULL-ts directory is EXPECTED to be unparseable. Any
      // other non-date value is a corrupted/renamed partition dir; if it
      // silently vanished from the frontier the resume probe would
      // re-append that day's rows and duplicate data with no signal, so
      // it must fail loud rather than be invisibly excluded.
      if (parsed.isEmpty && v != HiveDefaultPartition)
        throw new IllegalStateException(
          s"unparseable partition directory '$dirName' under " +
            s"$path: not a date and not $HiveDefaultPartition — repair or " +
            "remove it before resuming (a silently-skipped partition would " +
            "corrupt the resume frontier)")
      parsed
    }
    latestManifest() match {
      case Some(files) =>
        files.map(_.takeWhile(_ != '/')).distinct
          .filter(_.startsWith(s"$PartitionCol="))
          .flatMap(n => parse(n).map(_ -> new Path(p, n)))
      case None =>
        if (!fs.exists(p)) Nil
        else fs.listStatus(p).toSeq
          .filter(_.getPath.getName.startsWith(s"$PartitionCol="))
          .flatMap(st => parse(st.getPath.getName).map(_ -> st.getPath))
    }
  }

  /** All LIVE day-partition values (latest manifest when one exists,
    * directory names otherwise — [[datePartitions]]).
    */
  def partitionDates: Set[LocalDate] = datePartitions.map(_._1).toSet

  /** Metadata-only contiguity probe: the maximal runs of ABSENT
    * day-partitions in [from, toExclusive), coalesced to half-open
    * ranges. Behind the resume frontier (`maxPartitionDate`), an
    * absent day is either a legitimately empty source day or a hole a
    * failed concurrent-append batch left (the documented
    * `maxConcurrentPeriods > 1` exposure) — metadata alone cannot
    * distinguish them, which is why the repair REPLAYS the model over
    * each range (`IbtpRunner.repairHoles`): lost periods refill,
    * genuinely empty days write nothing, both idempotently.
    */
  def missingDayRanges(
      from: LocalDate, toExclusive: LocalDate): Seq[(LocalDate, LocalDate)] = {
    val present = partitionDates
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(_.isBefore(toExclusive))
      .filterNot(present.contains)
      .foldLeft(Vector.empty[(LocalDate, LocalDate)]) { case (acc, d) =>
        acc.lastOption match {
          case Some((f, t)) if t == d => acc.init :+ ((f, d.plusDays(1)))
          case _                      => acc :+ ((d, d.plusDays(1)))
        }
      }
  }

  /** Raw read including the partition column (for partition-aware ops).
    * Schema comes from the sidecar written at init — robust for targets
    * holding zero data files (schema-sample init, `init.sql:9-19`) and
    * skips footer-sampling schema inference on wide tables.
    *
    * Plans against the latest committed manifest when one exists: the
    * scan's file set is the last COMMIT's, atomically, regardless of
    * what a concurrent mutation has half-moved into the directory
    * (staged compaction output, trash-parked replaced files, a
    * mid-flight append). `basePath` keeps day-partition values (and
    * pruning) derived from the file paths exactly as a directory read
    * would. Pre-manifest tables fall back to directory listing until
    * their first mutation commits a manifest.
    */
  private def readRaw(): DataFrame = readRawPruned(_ => true)

  /** [[readRaw]] with a driver-side file-pruning predicate over each
    * raw live body line — the data-skipping hook [[readWhere]] plans
    * through ([[compilePruner]]). The predicate must be CONSERVATIVE
    * (keep on unknown): entries without stats always pass.
    */
  private def readRawPruned(keep: String => Boolean): DataFrame = {
    // ONE manifest read for both the file set and the schema: the
    // header travels with the version, so a reader planning mid-refresh
    // gets the old files WITH the old schema or the new with the new,
    // never a mix (headerless pre-header manifests → sidecar schema)
    val raw = latestManifestRaw()
    val manifestFiles = raw.map(_.filterNot(_.startsWith("#"))
      .filter(keep).map(pathOf))
    val schema = raw.flatMap(schemaOfManifestLines).orElse(storedSchema)
    val reader = schema
      .fold(spark.read)(s => spark.read.schema(s))
      .option("basePath", path)
    manifestFiles match {
      case Some(files) if files.nonEmpty =>
        reader.parquet(files.map(rel => new Path(path, rel).toString): _*)
      case Some(_) =>
        // empty manifest: zero live files. The header/sidecar alone
        // carries the schema (schema-sample init); an empty relation,
        // NOT a dir read (stray staged/parked files must stay invisible).
        schema match {
          case Some(s) =>
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
          case None => reader.parquet(path)
        }
      case None => reader.parquet(path)
    }
  }

  private def schemaSidecar = new Path(path, SchemaFile)

  private def storedSchema: Option[StructType] =
    if (!fs.exists(schemaSidecar)) None
    else {
      val in = fs.open(schemaSidecar)
      try {
        val json = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        Some(DataType.fromJson(json).asInstanceOf[StructType])
      } finally in.close()
    }

  private def writeSchemaSidecar(userSchema: StructType): Unit =
    writeFullSidecar(
      // full on-disk schema = user columns + day-partition column
      StructType(userSchema.fields :+ StructField(PartitionCol, DateType)))

  /** Persist the full on-disk schema. The sidecar is the WRITE-side
    * truth ([[storedSchema]]: alignment, evolution decisions); readers
    * take theirs from the manifest header ([[readRaw]]), so any sidecar
    * change must re-commit a manifest (same files, new header) or
    * readers would keep planning the old schema until the next data
    * mutation. Synchronized: the relist-free re-commit is a
    * read-modify-write against concurrent period appends.
    */
  private def writeFullSidecar(full: StructType): Unit = synchronized {
    writeSidecarFileOnly(full)
    // header-only delta: the schema switch rides a one-line commit
    // instead of rewriting the full live listing
    if (manifestVersions().nonEmpty && !latestCommittedSchema().contains(full))
      commitManifestDelta(Nil, Nil, Some(full))
  }

  private def writeSidecarFileOnly(full: StructType): Unit = {
    val out = fs.create(schemaSidecar, true)
    try out.write(full.json.getBytes("UTF-8")) finally out.close()
  }

  private def withPartitionCol(df: DataFrame): DataFrame =
    df.withColumn(PartitionCol, col(timestampField).cast(DateType))

  /** Init/CTAS — reference A10 (`insert_by_timeperiod_init.sql:10,16,30,37`).
    *
    * On a table with a committed manifest, a full refresh is a
    * SNAPSHOT-ISOLATED whole-table replace: the rebuild stages to a
    * sibling, its files move into the live tree under job-unique names,
    * and ONE manifest commit switches the entire file set AND the
    * schema header — a reader planning at any instant sees the complete
    * old table (old schema) or the complete new one (new schema), and
    * scans pinned to the old manifest keep their trash-parked files for
    * the retention window. This strictly strengthens the reference's
    * rename-based refresh (`init.sql:23-27`), whose swap instant
    * invalidates in-flight readers; crash repair rides the replace
    * intent marker instead of the swap marker.
    *
    * Fresh targets and pre-manifest tables take the backup-swap path
    * ([[initSwap]]): a brand-new table has no readers to isolate, and a
    * pre-manifest table's readers plan by directory listing, which no
    * manifest commit can protect anyway.
    */
  def init(df: DataFrame): Long = {
    repairOrphanedSwap() // heal a crashed predecessor before mutating
    if (exists && latestManifestRaw().nonEmpty) withWriterLease() {
      // repairs are destructive to a LIVE sibling's in-flight work
      // (repairOrphanedAppends deletes moved-but-uncommitted files), so
      // they run only under the lease — reentrant (free) when the
      // runner already holds it, a real acquire for direct init() calls.
      // Replace repair runs FIRST: a crashed schema-changing replace's
      // sidecar sync must land before any rollback commit reads the
      // stored schema as its header fallback.
      repairOrphanedReplace()
      repairOrphanedAppends() // single-writer point: clear any crashed append
      val full = StructType(df.schema.fields :+ StructField(PartitionCol, DateType))
      writeSnapshotReplace(
        withPartitionCol(df),
        // the whole live table is the replaced set, whether or not the
        // rebuild repopulates each partition
        () => latestManifest().getOrElse(Nil).map(_.takeWhile(_ != '/')).toSet,
        newSchema = Some(full))._1
    } else initSwap(df)
  }

  /** Backup-swap init for fresh targets and pre-manifest tables,
    * emulating the reference's rename-to-backup (`init.sql:23-27`).
    *
    * The swap's non-atomic instant is bracketed by an intent marker (a
    * SIBLING file — the target directory itself is what gets renamed)
    * written after the staging write commits and before the first
    * destination mutation, carrying the new table's full schema. Every
    * crash point therefore repairs deterministically with no source
    * data ([[repairOrphanedSwap]]): staged data present → finish the
    * swap forward (the intent is only written once staging is
    * complete); swap done but sidecar/cleanup missing → finish those;
    * only the backup left → restore it. The reference has the same
    * window between its rename pair with no breadcrumb at all.
    */
  private def initSwap(df: DataFrame): Long = {
    val tmp = new Path(path + TmpInitSuffix)
    val dst = new Path(path)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val n = writeCounted(withPartitionCol(df), tmp.toString, "overwrite")
    val full = StructType(df.schema.fields :+ StructField(PartitionCol, DateType))
    writeMarker(swapIntentFile, s"schema=${full.json}\n")
    failSwapPoint(1)
    val backup = new Path(path + BackupSuffix)
    if (fs.exists(backup)) fs.delete(backup, true)
    if (fs.exists(dst)) fs.rename(dst, backup)
    failSwapPoint(2)
    fs.rename(tmp, dst)
    failSwapPoint(3)
    writeSidecarFileOnly(full)
    if (fs.exists(backup)) fs.delete(backup, true)
    clearSwapIntent()
    // fresh directory, fresh manifest history
    commitManifestRelist()
    n
  }

  /** Test hook: throw after swap phase `n` (1 = intent written, 2 =
    * old table renamed out, 3 = new table renamed in).
    */
  private[ibtp] var failSwapAt: Int = 0
  private def failSwapPoint(n: Int): Unit =
    if (failSwapAt == n)
      throw new IllegalStateException(s"simulated crash at swap phase $n")

  private def swapIntentFile = new Path(path + SwapIntentSuffix)

  private def readSwapIntent(): Option[StructType] =
    if (!fs.exists(swapIntentFile)) None
    else {
      val in = fs.open(swapIntentFile)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.linesIterator.find(_.startsWith("schema=")) match {
        case Some(l) => Some(DataType.fromJson(l.stripPrefix("schema="))
          .asInstanceOf[StructType])
        case None => throw new IllegalStateException(
          s"corrupt swap intent $swapIntentFile: inspect $path, restore from " +
            s"the ${BackupSuffix} directory if present, then delete the marker")
      }
    }

  private def clearSwapIntent(): Unit =
    if (fs.exists(swapIntentFile)) fs.delete(swapIntentFile, false)

  /** Heal an init backup-swap orphaned by a crash (see [[init]]).
    * Deterministic from which directories survived — the intent exists
    * only while staged data is complete, so rolling FORWARD is always
    * safe; the recorded schema finishes the sidecar write. Returns
    * true when a repair ran. Invoked by [[init]] and at the start of
    * every runner materialization.
    */
  def repairOrphanedSwap(): Boolean = readSwapIntent() match {
    case None => false
    case Some(full) =>
      val dst    = new Path(path)
      val tmp    = new Path(path + TmpInitSuffix)
      val backup = new Path(path + BackupSuffix)
      TargetTable.log.warn(s"repairing orphaned init swap at $path")
      if (fs.exists(tmp)) {
        // staged data complete (the intent is written only after the
        // staging write commits): finish the swap forward
        if (fs.exists(dst)) {
          if (fs.exists(backup)) fs.delete(backup, true)
          fs.rename(dst, backup)
        }
        fs.rename(tmp, dst)
        // file-only: the relist commit below refreshes the header too
        writeSidecarFileOnly(full)
        if (fs.exists(backup)) fs.delete(backup, true)
      } else if (fs.exists(dst)) {
        // swap completed through rename-in; sidecar write and backup
        // cleanup may not have happened — both are idempotent
        writeSidecarFileOnly(full)
        if (fs.exists(backup)) fs.delete(backup, true)
      } else if (fs.exists(backup)) {
        // neither staged nor new data: restore the old table (cannot
        // arise from this protocol's crash points alone, but an
        // operator deleting the half-swapped state lands here)
        fs.rename(backup, dst)
      } else {
        clearSwapIntent()
        throw new IllegalStateException(
          s"orphaned swap intent at $path but no data directory survived " +
            "(target, staging, and backup all absent) — re-run the full refresh")
      }
      clearSwapIntent()
      commitManifestRelist() // repaired directory is the new truth
      true
  }

  /** Plain append — reference B14 (`loop.sql:109-114`). Rows land in
    * their own day-partitions; no shuffle beyond the model's own plan.
    */
  def append(df: DataFrame): Long =
    stagedAppend(withPartitionCol(alignToTarget(df)))

  /** Append safe under CONCURRENT callers: two Spark jobs appending to
    * one directory share the committer's `_temporary` staging and can
    * clobber each other; [[stagedAppend]]'s per-call scratch dir (and
    * per-call intent marker) isolates them. Callers must write disjoint
    * partitions — true for distinct periods on the append path.
    */
  def appendIsolated(df: DataFrame): Long = append(df)

  /** OPTIMISTIC concurrent append — the multi-pipeline write path. The
    * single-writer lease serializes every mutator because the crash
    * repairs assume exclusivity; but two pipelines blind-appending to
    * one table (the reference's own per-period commits are independent,
    * `insert_by_timeperiod_loop.sql:134`) need no such exclusivity:
    * staged file names are job-unique, the manifest commit is an atomic
    * rename that FAILS if the version already exists, and an append
    * removes nothing. So this path takes NO lease at all and commits
    * Delta-style (Delta Lake's OCC protocol): it captures a basis
    * (the live set + schema it considers current), stages and moves its
    * files, and validates inside every commit attempt that no
    * intervening commit conflicts — commitVersion's
    * rename-fails-if-exists makes check→rename effectively
    * compare-and-swap, and every lost race re-validates against the
    * newer chain.
    *
    * Conflict rules (Serializable, the strict level):
    *  - another APPEND — never a conflict (disjoint job-unique adds;
    *    both commit, whatever partitions they touch);
    *  - a REPLACE / compaction / upsert that REMOVED files in a
    *    partition this append writes — [[ConcurrentWriteConflictException]];
    *    the staged files are rolled back (they were published to no
    *    manifest) and the caller retries against the new state. The
    *    reverse interleaving — this append commits first, the replace
    *    lands after — is absorbed by the replace's per-attempt removal
    *    recompute: the history serializes as "append, then replace";
    *  - a SCHEMA change — conflict (this append's files were written
    *    under the old schema);
    *  - a full-refresh SWAP (whole-directory rename) must not race this
    *    path at all — same documented exclusion as Delta's
    *    overwriteSchema; the schema/manifest checks catch most
    *    interleavings, but the swap's directory rename is outside the
    *    log's protection.
    *
    * Crash safety without the lease: the intent marker carries
    * `opt=1` and a timestamp; [[repairOrphanedAppends]] skips markers
    * younger than [[TargetTable.OptAppendStaleMs]] (a LIVE sibling's
    * in-flight append — rolling it back would destroy committed-any-
    * second work) and repairs stale ones exactly like lease-held
    * appends. Requires a manifest-era table: pre-manifest visibility is
    * directory listing, which no commit protocol can protect.
    */
  def appendConcurrent(df: DataFrame): Long = {
    if (latestManifest().isEmpty)
      throw new IllegalStateException(
        s"appendConcurrent on $path requires a manifest-era table: any " +
          "lease-holding write commits one (or call relistManifest() once)")
    stagedAppendConcurrent(withPartitionCol(alignToTarget(df)))
  }

  private def stagedAppendConcurrent(aligned: DataFrame): Long = {
    // the basis: what this writer considers the current table. Captured
    // BEFORE staging; the conflict check compares the then-current
    // state against it at every commit attempt.
    val basisHeader = latestHeaderLines()
    val basisSchemaJson = schemaOfManifestLines(basisHeader).map(_.json)
    val basisTip = manifestVersions().map(_.key).maxOption.getOrElse((0L, 0L, false))
    val basisLive = latestManifest().getOrElse(Nil).toSet
    val id = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(path + s"__stage_$id")
    try {
      val n = writeCounted(aligned, stage.toString, "overwrite")
      val dst = new Path(path)
      if (!fs.exists(dst)) fs.mkdirs(dst)
      val stagedRel = listStagedRel(stage)
      if (stagedRel.nonEmpty) {
        val stagedLines =
          enrichWithStats(stagedRel, stage, latestStatsCol(), latestSetCol())
        val myParts = stagedRel.map(_.takeWhile(_ != '/')).toSet
        val marker = new Path(path, AppendIntentPrefix + id)
        writeMarker(marker, s"files=${stagedRel.mkString(",")}\n" +
          s"opt=1\nhb=${System.currentTimeMillis()}\n")
        crashPoint("append:marker")
        stagedRel.foreach { rel =>
          val dir = new Path(dst, rel.takeWhile(_ != '/'))
          if (!fs.exists(dir)) fs.mkdirs(dir)
          if (!fs.rename(new Path(stage, rel), new Path(path, rel)))
            throw new IllegalStateException(
              s"could not move staged append file $rel into $path: " +
                "aborting before the manifest commit " +
                "(repairOrphanedAppends rolls the partial move back)")
          crashPoint("append:move")
        }
        failAppendPoint(1)
        onOptimisticCommit()
        try
          commitConcurrentAppend(stagedLines, myParts, basisLive,
            basisSchemaJson, basisTip)
        catch {
          case e: ConcurrentWriteConflictException =>
            // the staged files were published to NO manifest (the check
            // throws before the attempt's rename): delete them outright
            // and clear the marker — exactly-pre-append state
            stagedRel.foreach { rel =>
              val p = new Path(path, rel)
              if (fs.exists(p)) fs.delete(p, false)
            }
            fs.delete(marker, false)
            throw e
        }
        failAppendPoint(2)
        crashPoint("append:commit")
        fs.delete(marker, false)
        crashPoint("append:cleared")
      }
      n
    } finally if (fs.exists(stage)) fs.delete(stage, true)
  }

  /** The optimistic append's conflict-checked commit: the validation
    * runs INSIDE the commit thunk, per attempt — between any check and
    * its version rename nothing can land unseen (a racer taking the
    * sequence makes the rename fail → re-check), so check→rename is
    * effectively compare-and-swap. `private[ibtp]` so [[ManifestBench]]
    * can measure the full protocol's concurrent throughput.
    */
  private[ibtp] def commitConcurrentAppend(
      stagedLines: Seq[String], myParts: Set[String],
      basisLive: Set[String], basisSchemaJson: Option[String],
      basisTip: (Long, Long, Boolean)): Unit = {
    import scala.math.Ordering.Implicits._
    def conflict(msg: String): Nothing =
      throw new ConcurrentWriteConflictException(
        s"appendConcurrent on $path: $msg; re-run against the new state")
    def conflictCheck(): Unit = {
      // the check is a VERSION diff, not a state diff: a commit's cost
      // must stay O(what changed since the basis), never O(live files)
      // — at 1M live files a full-state diff per attempt would make
      // the commit protocol itself the bottleneck it exists to remove
      val newer = manifestVersions().filter(_.key > basisTip).sortBy(_.key)
      if (newer.isEmpty) return
      val curSchemaJson = schemaOfManifestLines(latestHeaderLines()).map(_.json)
      if (curSchemaJson != basisSchemaJson)
        conflict("the table schema changed while this append was in " +
          "flight — its files were written under the old schema")
      if (newer.forall(_.isDelta)) {
        // O(changes): only the new deltas' removal lines can conflict
        val removedInMine = newer.iterator
          .flatMap(v => readLines(v.p))
          .filter(_.startsWith("-"))
          .map(_.substring(1))
          .filter(f => myParts.contains(f.takeWhile(_ != '/')))
          .toSeq
        if (removedInMine.nonEmpty)
          conflict(s"a concurrent writer replaced ${removedInMine.size} " +
            s"files in partitions this append touches " +
            s"(${myParts.mkString(", ")}) — serializing this append " +
            "before it would resurrect replaced rows")
      } else {
        // a CHECKPOINT landed since the basis (a fold — content-neutral
        // — or a replace/seal): removals cannot be attributed from the
        // version alone, so fall back to the state diff (rare)
        val curLive = latestManifest().getOrElse(Nil).toSet
        val removedInMine = basisLive.diff(curLive)
          .filter(f => myParts.contains(f.takeWhile(_ != '/')))
        if (removedInMine.nonEmpty)
          conflict(s"a concurrent writer replaced ${removedInMine.size} " +
            s"files in partitions this append touches " +
            s"(${myParts.mkString(", ")}) — serializing this append " +
            "before it would resurrect replaced rows")
      }
    }
    commitManifestDelta(add = stagedLines, remove = Nil,
      preCheck = () => conflictCheck())
  }

  /** The one append primitive: stage to a per-call scratch dir, record
    * the staged file names in a per-call intent marker, move them into
    * the live partition directories (pure namenode renames —
    * job-unique names, so no collisions), commit the manifest for the
    * touched directories, clear the marker.
    *
    * The marker closes the crash window between the moves and the
    * manifest commit: without it, files already on disk but absent
    * from the manifest are invisible to the resume frontier, the next
    * run re-materializes the period, and any later full relist (e.g.
    * [[relistManifest]], a pre-manifest upgrade) would absorb the
    * orphans alongside the fresh files — silent duplicate rows.
    * [[repairOrphanedAppends]] (start-of-run, under the lease) rolls
    * such orphans back instead; the commit itself publishes exactly
    * the staged names ([[commitManifestAppended]]), never a listing.
    */
  private def stagedAppend(aligned: DataFrame): Long = {
    val id = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(path + s"__stage_$id")
    try {
      val n = writeCounted(aligned, stage.toString, "overwrite")
      val dst = new Path(path)
      if (!fs.exists(dst)) fs.mkdirs(dst)
      val stagedRel = listStagedRel(stage)
      if (stagedRel.nonEmpty) {
        // skip stats ride the commit when the table declares a stats
        // column — footers read in the stage dir, before the moves
        // (markers and repair always use the PLAIN paths)
        val stagedLines = enrichWithStats(stagedRel, stage, latestStatsCol(), latestSetCol())
        val marker = new Path(path, AppendIntentPrefix + id)
        writeMarker(marker, s"files=${stagedRel.mkString(",")}\n")
        crashPoint("append:marker")
        // per-FILE moves only, never a whole-directory rename: two
        // concurrent appends can legally share ONE partition (NULL-ts
        // rows both land in __HIVE_DEFAULT_PARTITION__, outside the
        // disjoint-periods contract), and a dir rename racing the
        // sibling's mkdirs would NEST the staged dir inside the live
        // one on rename-into-existing-dir stores — publishing paths
        // with no files behind them. File renames with job-unique
        // names cannot collide or nest.
        stagedRel.foreach { rel =>
          val dir = new Path(dst, rel.takeWhile(_ != '/'))
          if (!fs.exists(dir)) fs.mkdirs(dir)
          if (!fs.rename(new Path(stage, rel), new Path(path, rel)))
            throw new IllegalStateException(
              s"could not move staged append file $rel into $path: " +
                "aborting before the manifest commit " +
                "(repairOrphanedAppends rolls the partial move back)")
          crashPoint("append:move")
        }
        failAppendPoint(1) // files moved in; manifest still pre-append
        commitManifestAppended(stagedLines)
        failAppendPoint(2) // committed; marker not yet cleared
        crashPoint("append:commit")
        fs.delete(marker, false)
        crashPoint("append:cleared")
      }
      n
    } finally if (fs.exists(stage)) fs.delete(stage, true)
  }

  /** Relative `p_date=<v>/<file>` paths of a staging dir's data files —
    * the one staged-file discovery both [[stagedAppend]] and
    * [[writeSnapshotReplace]] publish from.
    */
  private def listStagedRel(stage: Path): Seq[String] =
    fs.listStatus(stage).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$PartitionCol="))
      .flatMap { st =>
        fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && isDataFileName(f.getPath.getName))
          .map(f => s"${st.getPath.getName}/${f.getPath.getName}")
      }

  /** Heal appends orphaned by a crash between the staged-file moves and
    * the manifest commit (see [[stagedAppend]]). Direction per marker,
    * decided by the manifest like [[repairOrphanedReplace]]: ALL files
    * committed → only the marker delete was lost, clear it; otherwise →
    * roll BACK by deleting the listed files AND committing a manifest
    * without them. The manifest filter covers the torn case: a sibling
    * append's pre-manifest-upgrade relist can absorb a live append's
    * already-moved files, so a crashed append may be PARTIALLY in the
    * manifest — membership alone would either keep the torn period or
    * orphan the still-listed names; delete-and-filter restores
    * exactly-pre-append either way, and the frontier re-materializes
    * the period cleanly. Pre-manifest tables keep their old contract
    * (disk presence == visibility — the dir-listing frontier already
    * saw the files), so only the marker is cleared. A crashed
    * [[writeMarker]]'s `.tmp` leftover is swept (by construction never
    * a committed marker). MUST run single-writer (start-of-run under
    * the lease): it would roll back a LIVE sibling append's
    * not-yet-committed files if run concurrently. Returns the number
    * of appends ROLLED BACK (cleared completed markers don't count).
    */
  def repairOrphanedAppends(): Int = {
    val root = new Path(path)
    val all =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(AppendIntentPrefix))
    val (tmps, rest)       = all.partition(_.getName.endsWith(".tmp"))
    val (sidecars, markers) = rest.partition(_.getName.endsWith(TornSidecarSuffix))
    tmps.foreach(fs.delete(_, false)) // crashed writeMarker litter
    val markerNames = markers.map(_.getName).toSet
    // a torn-classification sidecar whose parent marker is gone is the
    // tail of a repair that crashed between its two final deletes
    sidecars.filterNot(s =>
      markerNames.contains(s.getName.stripSuffix(TornSidecarSuffix)))
      .foreach(fs.delete(_, false))
    var rolledBack = 0
    markers.foreach { m =>
      val kv = readKv(m, required = Seq("files"))
      val files = kv
        .map(_("files")).getOrElse("").split(",").filter(_.nonEmpty).toSeq
      // an OPTIMISTIC append's marker (opt=1, timestamped) may belong to
      // a LIVE lease-less sibling mid-flight — rolling it back would
      // destroy work that commits any second. Skip it while fresh; a
      // marker older than [[TargetTable.OptAppendStaleMs]] is a crashed
      // append (the move+commit window is sub-second) and repairs like
      // any other.
      val optFresh = kv.exists(_.get("opt").contains("1")) &&
        kv.flatMap(_.get("hb")).flatMap(_.toLongOption)
          .exists(System.currentTimeMillis() - _ < OptAppendStaleMs)
      if (optFresh) {
        TargetTable.log.info(s"skipping fresh optimistic-append marker " +
          s"${m.getName} on $path (live sibling in flight)")
      } else {
      val tornSidecar = new Path(path, m.getName + TornSidecarSuffix)
      latestManifest() match {
        case None => // pre-manifest: disk == visible already, nothing to undo
        case Some(manifest)
            if files.forall(manifest.toSet.contains) && !fs.exists(tornSidecar) =>
          TargetTable.log.info(s"clearing completed append marker on $path " +
            "(commit succeeded; only the marker delete was lost)")
        case Some(manifest) =>
          rolledBack += 1
          TargetTable.log.warn(s"repairing orphaned append on $path: " +
            s"rolling BACK (un-publishing ${files.size} uncommitted files)")
          // The torn files (absorbed into the manifest by a sibling's
          // relist) were PUBLISHED: a reader pinned to the absorbing
          // manifest may still be scanning them, so they are
          // trash-parked under the retention contract, never deleted in
          // a reader's face; the never-published ones were invisible to
          // every manifest and are deleted outright. The classification
          // must survive a re-crash of THIS repair — once the filtered
          // commit lands, manifest membership can no longer distinguish
          // the two classes — so it is persisted in an atomic sidecar
          // before any mutation.
          val torn = readKv(tornSidecar, required = Seq("torn")) match {
            case Some(kv) => kv("torn").split(",").filter(_.nonEmpty).toSeq
            case None =>
              val t = files.filter(manifest.toSet.contains)
              if (t.nonEmpty)
                writeMarker(tornSidecar, s"torn=${t.mkString(",")}\n")
              t
          }
          crashPoint("repairA:sidecar")
          // un-publish FIRST, park after: a file must never be
          // simultaneously trash-parked AND live in the latest manifest
          // — a standalone vacuum(0) between the two would physically
          // delete manifest-live files (vacuum's invariant is that
          // parked entries are absent from every manifest committed
          // after parking). The window the other order avoided —
          // unpublished-but-not-yet-parked across a crash — is covered
          // by the sidecar: the re-run re-parks the recorded torn set,
          // and nothing deletes unparked files meanwhile. The rollback
          // commit carries the prior header forward — the sidecar may
          // legitimately trail a crashed schema-changing replace whose
          // own repair runs separately.
          val stillListed = torn.filter(manifest.toSet.contains)
          if (stillListed.nonEmpty)
            commitManifestDelta(add = Nil, remove = stillListed)
          crashPoint("repairA:unpublish")
          writeTrash(torn.filter(rel => fs.exists(new Path(path, rel))))
          crashPoint("repairA:park")
          files.filterNot(torn.toSet).foreach { rel =>
            val p = new Path(path, rel)
            if (fs.exists(p)) fs.delete(p, false)
            crashPoint("repairA:delete")
          }
      }
      fs.delete(m, false)
      crashPoint("repairA:marker")
      if (fs.exists(tornSidecar)) fs.delete(tornSidecar, false)
      crashPoint("repairA:sidecar-clear")
      }
    }
    rolledBack
  }

  /** Backfill period replace — reference B12+B14 fused
    * (`loop.sql:92-99,108-114`): DELETE rows in [from, to) then insert
    * the period's fresh rows. Snapshot-isolated via
    * [[writeSnapshotReplace]]: the fresh rows stage to a sibling
    * directory, move into the live partition directories under
    * job-unique names (invisible — in no manifest yet), and ONE
    * manifest commit then atomically drops every in-range live file —
    * including partitions the fresh data no longer populates, so the
    * DELETE, the INSERT, and the stale-partition cleanup are a single
    * atomic switch for readers. Replaced files are trash-parked for
    * readers pinned to an older manifest ([[vacuum]]).
    *
    * Crash repair ([[repairOrphanedReplace]]): every crash point heals
    * with no source data — the live table is untouched until the
    * manifest commit, so a mid-write crash simply rolls back. The
    * reference's DELETE+INSERT pair has the same window between its
    * statements and closes it with warehouse transactions
    * (`loop.sql:92-114,134`); the manifest commit is the parquet-native
    * equivalent.
    */
  def replaceRange(df: DataFrame, from: LocalDate, to: LocalDate): Long =
    writeSnapshotReplace(
      withPartitionCol(alignToTarget(df)),
      // the DELETE side: every live in-range day-partition, whether or
      // not the fresh write repopulates it (stale ones drop in the
      // same atomic commit — no separate cleanup phase to crash out of)
      () => datePartitions
        .filter { case (d, _) => !d.isBefore(from) && d.isBefore(to) }
        .map { case (d, _) => s"$PartitionCol=${fmt.format(d)}" }.toSet)._1

  /** Heal a replace orphaned by a crash (see [[writeSnapshotReplace]]).
    * The latest manifest decides the direction, exactly like
    * [[repairOrphanedCompact]] — it is the one atomic commit in the
    * sequence: staged set committed → roll FORWARD (trash-park the
    * originals, idempotently); not committed → roll BACK (delete the
    * staged copies; the originals and the manifest were never touched,
    * so readers never noticed). A pure-delete replace that staged
    * nothing decides by the originals' own manifest liveness instead.
    * Returns the direction taken, if a repair ran.
    */
  def repairOrphanedReplace(): Option[String] = {
    // legacy leftover from the pre-snapshot two-marker state machine:
    // a sidecar alone was a completed-replace leftover then and is one now
    if (fs.exists(writtenSidecarFile) && !fs.exists(intentFile))
      fs.delete(writtenSidecarFile, false)
    readKv(intentFile, required = Nil).map { kv =>
      if (!(kv.contains("orig") && kv.contains("staged")))
        // a marker in the legacy range-only format records a mid-write
        // crash this version cannot replay deterministically
        throw new IllegalStateException(
          s"replace intent $intentFile is not in orig/staged form " +
            s"(keys: ${kv.keys.mkString(",")}): a pre-snapshot-replace " +
            "version crashed mid-replace — re-backfill the recorded range, " +
            "then delete the marker")
      val orig   = kv("orig").split(",").filter(_.nonEmpty).toSeq
      val staged = kv("staged").split(",").filter(_.nonEmpty).toSeq
      val manifest = latestManifest().getOrElse(Nil).toSet
      val committed =
        if (staged.nonEmpty) staged.forall(manifest.contains)
        else orig.nonEmpty && !orig.exists(manifest.contains)
      if (committed) {
        TargetTable.log.warn(s"repairing orphaned replace on $path: " +
          s"rolling FORWARD (parking ${orig.size} replaced originals)")
        writeTrash(orig.filter(rel => fs.exists(new Path(path, rel))))
        crashPoint("repairR:park")
      } else {
        TargetTable.log.warn(s"repairing orphaned replace on $path: " +
          s"rolling BACK (removing ${staged.size} staged files)")
        staged.foreach { rel =>
          val p = new Path(path, rel)
          if (fs.exists(p)) fs.delete(p, false)
          crashPoint("repairR:delete")
        }
      }
      clearIntent()
      crashPoint("repairR:cleared")
      if (fs.exists(writtenSidecarFile)) fs.delete(writtenSidecarFile, false)
      // a SCHEMA-CHANGING replace (snapshot full refresh / widening
      // rewrite) records its intended schema in the marker and syncs
      // the write-side sidecar after its commit; a crash in between
      // leaves the sidecar one schema behind — finish the sync on the
      // forward path ONLY (an unconditional header sync here would
      // instead REGRESS a sidecar legitimately ahead of the header,
      // e.g. a metadata widening whose header re-commit was lost)
      if (committed)
        kv.get("schema").foreach(j =>
          writeSidecarFileOnly(DataType.fromJson(j).asInstanceOf[StructType]))
      crashPoint("repairR:sidecar")
      if (committed) "forward" else "back"
    }
  }

  /** OPTIMISTIC concurrent range replace — the lease-less backfill.
    * Two pipelines idempotently re-delivering DISJOINT period ranges
    * (the reference's own replace workflow,
    * `insert_by_timeperiod_loop.sql:92-99`, run from independent
    * schedulers) have no reason to serialize behind the writer lease:
    * like [[appendConcurrent]] this stages job-unique files, then
    * commits Delta-style with the conflict validation INSIDE every
    * commit attempt and the removal set RECOMPUTED per attempt.
    *
    * Conflict rules (Serializable):
    *  - a concurrent APPEND — never a conflict: whether it lands in or
    *    out of this range, the per-attempt removal recompute absorbs
    *    its in-range files, serializing the history as "append, then
    *    replace" (exactly the lease-held [[replaceRange]] semantics);
    *  - a concurrent REPLACE/compact/upsert that REMOVED files in THIS
    *    range — [[ConcurrentWriteConflictException]], full rollback:
    *    overlapping replaces cannot serialize without one destroying
    *    the other's fresh rows. Disjoint ranges never see each other's
    *    removals and both commit;
    *  - a SCHEMA change — conflict (these files carry the old schema);
    *  - a checkpoint since the basis (rare) falls back to a state diff
    *    restricted to this range, conservative the same way.
    *
    * Fresh rows must land inside [from, to) — including no NULL-ts
    * rows (the NULL partition is date-less, so no range can claim it;
    * use the lease-held [[replaceRange]] for those). Crash safety is
    * the per-call `opt=1` marker + [[repairOrphanedConcurrentReplaces]]
    * (manifest decides forward/back, exactly like
    * [[repairOrphanedReplace]]); requires a manifest-era table.
    */
  def replaceRangeConcurrent(df: DataFrame, from: LocalDate, to: LocalDate): Long = {
    if (latestManifest().isEmpty)
      throw new IllegalStateException(
        s"replaceRangeConcurrent on $path requires a manifest-era table: any " +
          "lease-holding write commits one (or call relistManifest() once)")
    val inRange = (part: String) => {
      val v = part.stripPrefix(s"$PartitionCol=")
      scala.util.Try(LocalDate.parse(v)).toOption
        .exists(d => !d.isBefore(from) && d.isBefore(to))
    }
    // the basis: what this writer considers current, captured before
    // staging; every commit attempt diffs the then-current chain
    // against it
    val basisSchemaJson = schemaOfManifestLines(latestHeaderLines()).map(_.json)
    val basisTip = latestManifestTip()
    val basisLive = latestManifest().getOrElse(Nil).toSet
    val aligned = withPartitionCol(alignToTarget(df))
    val id = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(path + s"__stage_$id")
    try {
      val n = writeCounted(aligned, stage.toString, "overwrite")
      val stagedRel = listStagedRel(stage)
      val badPart = stagedRel.map(_.takeWhile(_ != '/')).distinct.filterNot(inRange)
      if (badPart.nonEmpty)
        throw new IllegalArgumentException(
          s"replaceRangeConcurrent on $path: fresh rows land outside " +
            s"[$from, $to): ${badPart.take(3).mkString(", ")} — an optimistic " +
            "replace owns exactly its range (NULL-ts rows included); widen " +
            "the range or use the lease-held replaceRange")
      val stagedLines = enrichWithStats(stagedRel, stage, latestStatsCol(), latestSetCol())
      val origAtBasis = basisLive.filter(f => inRange(f.takeWhile(_ != '/'))).toSeq.sorted
      // no-op fast path: nothing staged and nothing live in range
      if (stagedRel.isEmpty && origAtBasis.isEmpty) return n
      val dst = new Path(path)
      if (!fs.exists(dst)) fs.mkdirs(dst)
      val marker = new Path(path, ReplaceIntentPrefix + id)
      writeMarker(marker, s"orig=${origAtBasis.mkString(",")}\n" +
        s"staged=${stagedRel.mkString(",")}\n" +
        s"opt=1\nhb=${System.currentTimeMillis()}\n")
      stagedRel.foreach { rel =>
        val dir = new Path(dst, rel.takeWhile(_ != '/'))
        if (!fs.exists(dir)) fs.mkdirs(dir)
        if (!fs.rename(new Path(stage, rel), new Path(path, rel)))
          throw new IllegalStateException(
            s"could not move staged replace file $rel into $path: aborting " +
              "before the manifest commit (repairOrphanedConcurrentReplaces " +
              "rolls the partial move back)")
      }
      def conflict(msg: String): Nothing =
        throw new ConcurrentWriteConflictException(
          s"replaceRangeConcurrent on $path: $msg; re-run against the new state")
      def conflictCheck(): Unit = {
        import scala.math.Ordering.Implicits._
        val newer = manifestVersions().filter(_.key > basisTip).sortBy(_.key)
        if (newer.isEmpty) return
        val curSchemaJson = schemaOfManifestLines(latestHeaderLines()).map(_.json)
        if (curSchemaJson != basisSchemaJson)
          conflict("the table schema changed while this replace was in " +
            "flight — its files were written under the old schema")
        val removedInRange =
          if (newer.forall(_.isDelta))
            // O(changes): only the new deltas' removal lines can conflict
            newer.iterator.flatMap(v => readLines(v.p))
              .filter(_.startsWith("-")).map(_.substring(1))
              .filter(f => inRange(f.takeWhile(_ != '/'))).toSeq
          else {
            // a checkpoint landed since the basis: state diff (rare)
            val curLive = latestManifest().getOrElse(Nil).toSet
            basisLive.diff(curLive)
              .filter(f => inRange(f.takeWhile(_ != '/'))).toSeq
          }
        if (removedInRange.nonEmpty)
          conflict(s"a concurrent writer replaced ${removedInRange.size} " +
            s"files inside [$from, $to) — overlapping replaces cannot " +
            "serialize without one destroying the other's rows")
      }
      // per-attempt removal recompute: a raced in-range APPEND commit
      // is absorbed into the replaced set ("append, then replace"); the
      // successful attempt's set is what gets trash-parked
      var committedOrig: Seq[String] = origAtBasis
      def freshOrig(): Seq[String] = {
        val o = latestManifestBody().map(pathOf)
          .filter(f => inRange(f.takeWhile(_ != '/')))
          .filterNot(stagedRel.toSet) // never self-remove the staged adds
        committedOrig = o
        o
      }
      onOptimisticCommit()
      try
        commitManifestDelta(add = stagedLines, remove = origAtBasis,
          preCheck = () => conflictCheck(),
          recomputeRemove = Some(() => freshOrig()))
      catch {
        case e: ConcurrentWriteConflictException =>
          // published to NO manifest (the check throws before the
          // rename): delete the moved files outright, clear the marker
          stagedRel.foreach { rel =>
            val p = new Path(path, rel)
            if (fs.exists(p)) fs.delete(p, false)
          }
          fs.delete(marker, false)
          throw e
      }
      // record the landed commit as a FACT in a sidecar before the
      // trash-park: a crash from here on repairs FORWARD without the
      // membership heuristic (a later compaction legitimately removing
      // staged files must never read as a torn move). A sidecar, not a
      // marker rewrite — rename-over-existing is not atomic on every
      // store — and it carries the RECOMPUTED removal set so the park
      // covers exactly what the committed attempt removed.
      writeMarker(committedSidecarOf(marker),
        s"orig=${committedOrig.mkString(",")}\n")
      writeTrash(committedOrig.filter(rel => fs.exists(new Path(path, rel))))
      fs.delete(marker, false)
      fs.delete(committedSidecarOf(marker), false)
      n
    } finally if (fs.exists(stage)) fs.delete(stage, true)
  }

  /** Heal optimistic replaces orphaned by a crash — per-call markers,
    * manifest decides the direction exactly like
    * [[repairOrphanedReplace]]: staged set committed → roll FORWARD
    * (park the recorded originals still on disk); not committed → roll
    * BACK (delete the staged copies — readers never saw them). Markers
    * younger than [[TargetTable.OptAppendStaleMs]] belong to a LIVE
    * lease-less sibling and are skipped, like optimistic appends'.
    * MUST otherwise run single-writer (start-of-run under the lease).
    * Returns the number of replaces rolled back or forward.
    */
  def repairOrphanedConcurrentReplaces(): Int = {
    val root = new Path(path)
    val listed =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(ReplaceIntentPrefix))
    val markers = listed.filter(p => !p.getName.endsWith(".tmp") &&
      !p.getName.endsWith(CommittedSidecarSuffix))
    // an orphaned `.committed` sidecar whose base marker is gone is the
    // final crash window (marker deleted, sidecar not): everything was
    // repaired/parked already — sweep it
    val markerNames = markers.map(_.getName).toSet
    listed.filter(p => p.getName.endsWith(CommittedSidecarSuffix) &&
        !markerNames.contains(
          p.getName.stripSuffix(CommittedSidecarSuffix)))
      .foreach(p => fs.delete(p, false))
    var repaired = 0
    markers.foreach { m =>
      val kv = readKv(m, required = Seq("staged")).get
      val fresh = kv.get("opt").contains("1") &&
        kv.get("hb").flatMap(_.toLongOption)
          .exists(System.currentTimeMillis() - _ < OptAppendStaleMs)
      if (fresh) {
        TargetTable.log.info(s"skipping fresh optimistic-replace marker " +
          s"${m.getName} on $path (live sibling in flight)")
      } else {
        val staged = kv("staged").split(",").filter(_.nonEmpty).toSeq
        val manifest = latestManifest().getOrElse(Nil).toSet
        val committedCount = staged.count(manifest.contains)
        // the `.committed` sidecar is written right after the commit
        // returns: it is PROOF the version landed, so repair rolls
        // forward even when a subsequent writer (compaction, a second
        // same-range replace) has since legitimately removed some
        // staged names — which the membership heuristic below would
        // misread as a torn move. The heuristic remains only for
        // markers without the sidecar (crash inside the two-metadata-op
        // window between the commit and the sidecar write). It also
        // carries the RECOMPUTED removal set (raced in-range appends
        // absorbed), superseding the marker's basis-time one.
        val sidecarKv = readKv(committedSidecarOf(m), required = Nil)
        val committedFact = sidecarKv.isDefined
        val orig = sidecarKv.flatMap(_.get("orig"))
          .orElse(kv.get("orig")).getOrElse("")
          .split(",").filter(_.nonEmpty).toSeq
        // the commit is ONE atomic rename: staged names are all-or-none
        // in the manifest (relists are refused while the marker is
        // fresh). Direction exactly like repairOrphanedReplace — a
        // pure-delete replace (nothing staged) decides by the
        // originals' own liveness.
        val committed = committedFact || {
          if (staged.nonEmpty) committedCount == staged.size
          else orig.nonEmpty && !orig.exists(manifest.contains)
        }
        if (!committedFact &&
            staged.nonEmpty && committedCount != 0 && committedCount != staged.size)
          throw new IllegalStateException(
            s"optimistic replace marker ${m.getName} on $path is TORN " +
              s"($committedCount of ${staged.size} staged files in the " +
              "manifest) — a relist absorbed a partial move; inspect the " +
              "range, re-backfill it, then delete the marker")
        if (committed) {
          TargetTable.log.warn(s"repairing orphaned optimistic replace on " +
            s"$path: rolling FORWARD (parking ${orig.size} replaced originals)")
          writeTrash(orig.filter(rel => !manifest.contains(rel) &&
            fs.exists(new Path(path, rel))))
        } else {
          TargetTable.log.warn(s"repairing orphaned optimistic replace on " +
            s"$path: rolling BACK (removing ${staged.size} staged files)")
          staged.foreach { rel =>
            val p = new Path(path, rel)
            if (fs.exists(p)) fs.delete(p, false)
          }
        }
        repaired += 1
        fs.delete(m, false)
        if (committedFact) fs.delete(committedSidecarOf(m), false)
      }
    }
    repaired
  }

  /** The `.committed` sidecar recording that a concurrent replace's
    * manifest commit LANDED (plus its recomputed removal set) — see
    * [[replaceRangeConcurrent]] / [[repairOrphanedConcurrentReplaces]].
    */
  private def committedSidecarOf(marker: Path): Path =
    new Path(marker.getParent, marker.getName + CommittedSidecarSuffix)

  /** Exhaustive crash-point injection: called at EVERY
    * marker/move/commit/park/clear boundary of the mutation state
    * machines (append, snapshot replace, compaction) and their crash
    * repairs, tagged with a stable name. Production is a no-op; the
    * crash-sweep spec installs a counter that throws at the Nth
    * invocation and enumerates N until the operation completes — so
    * every boundary, including the data-dependent per-file ones, is a
    * tested crash point rather than a hand-picked one.
    */
  private[ibtp] var crashHook: String => Unit = _ => ()
  private def crashPoint(name: String): Unit = crashHook(name)

  /** Test hook: throw after replace phase `n` (1 = staged files moved
    * in, manifest not yet committed; 2 = manifest committed, originals
    * not yet trash-parked; 3 = originals parked, marker not cleared).
    */
  private[ibtp] var failReplaceAt: Int = 0
  private def failReplacePoint(n: Int): Unit =
    if (failReplaceAt == n)
      throw new IllegalStateException(s"simulated crash at replace phase $n")

  /** Test hook: throw after append phase `n` (1 = staged files moved
    * into the live dirs, manifest not yet committed; 2 = manifest
    * committed, marker not yet cleared).
    */
  private[ibtp] var failAppendAt: Int = 0
  private def failAppendPoint(n: Int): Unit =
    if (failAppendAt == n)
      throw new IllegalStateException(s"simulated crash at append phase $n")

  private def intentFile = new Path(path, IntentFile)
  private def writtenSidecarFile = new Path(path, WrittenSidecarFile)

  /** Parse a key=value marker; a malformed file (impossible under
    * temp+rename, defensive against manual edits) fails loudly with
    * the remedy rather than a bare NoSuchElementException.
    */
  private def readKv(
      file: Path, required: Seq[String] = Seq("from", "to")): Option[Map[String, String]] =
    if (!fs.exists(file)) None
    else {
      val in = fs.open(file)
      val kv =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.contains("=")).map { l =>
            val Array(k, v) = l.split("=", 2); k -> v
          }.toMap
        finally in.close()
      if (!required.forall(kv.contains))
        throw new IllegalStateException(
          s"corrupt marker $file (keys: ${kv.keys.mkString(",")}, " +
            s"expected ${required.mkString(",")}): inspect the target, repair " +
            "the affected range/partition if in doubt, then delete the marker")
      Some(kv)
    }

  /** Temp+rename: the destination is either absent or complete. The
    * caller guarantees the destination does not exist (the replace
    * intent is repaired-and-cleared before every snapshot replace
    * stages), so the rename never needs overwrite semantics.
    */
  private def writeMarker(file: Path, content: String): Unit = {
    val tmp = new Path(file.getParent, file.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, file))
      throw new IllegalStateException(s"could not commit marker $file")
  }

  private def clearIntent(): Unit =
    if (fs.exists(intentFile)) fs.delete(intentFile, false)

  // ---- single-writer lease ---------------------------------------------
  // Every crash-repair state machine here (swap, replace, compact intent
  // markers, the orphan-staging sweep) assumes it is the ONLY process
  // mutating this target — two concurrent runners would "repair" each
  // other's in-flight work destructively. The reference gets this
  // serialization free from warehouse transactions
  // (`insert_by_timeperiod_loop.sql:134`); here a lease file provides
  // it: `IbtpRunner.run` and standalone `compact()` acquire it for the
  // duration, heartbeat it per period / per partition, and a second
  // writer FAILS FAST while the heartbeat is fresh. A holder that dies
  // without releasing goes stale after [[TargetTable.LeaseStaleMs]] and
  // is taken over with a logged warning. Creation uses
  // create(overwrite=false), which is atomic on HDFS-like stores; on a
  // plain local FS the existence check has a tiny TOCTOU window —
  // acceptable for a guard whose job is stopping OPERATIONAL double
  // runs, not adversarial races.
  //
  // The lease serializes the REPAIR-BEARING mutators (replace, upsert,
  // compact, swap, vacuum) — not appends. [[appendConcurrent]] is the
  // optimistic escape hatch: blind appends commit lease-LESS with
  // Delta-style conflict validation on the manifest log (per-attempt
  // check inside the commit thunk + rename-fails-if-exists = CAS), so
  // independent pipelines appending to one table never queue behind
  // each other or behind a lease-holding runner.

  private def leaseFile = new Path(path + LeaseSuffix)

  /** Lease id held by THIS instance, making [[withWriterLease]]
    * reentrant: the runner holds the lease across the loop, and its
    * own auto-compaction call must not self-deadlock.
    */
  @volatile private var heldLeaseId: Option[String] = None

  /** Background heartbeat daemon for the held lease's lifetime. The
    * explicit per-period / per-partition [[heartbeatLease]] calls are
    * kept (they also surface a lost lease at each commit boundary),
    * but they alone cannot cover long SINGLE steps — the init CTAS, a
    * [[rewriteTo]] full-table pass, or one period materialization
    * longer than [[TargetTable.LeaseStaleMs]] would otherwise look
    * stale mid-flight and invite a takeover exactly when it is most
    * destructive. The daemon beats every [[TargetTable.LeaseHeartbeatMs]]
    * (clamped far inside the staleness window) regardless of what the
    * main thread is doing.
    */
  @volatile private var heartbeatDaemon: Option[Thread] = None

  /** Set when a heartbeat discovers the lease now belongs to someone
    * else (a takeover while we looked stale). The daemon cannot abort
    * the main thread directly; instead every explicit
    * [[heartbeatLease]] call rethrows this, so the run fails at its
    * next commit boundary instead of writing alongside the new holder.
    */
  @volatile private var leaseLost: Option[Throwable] = None

  def withWriterLease[T](staleAfterMillis: Long = LeaseStaleMs)(body: => T): T =
    if (heldLeaseId.isDefined) body
    else {
      val id = acquireWriterLease(staleAfterMillis)
      try {
        // opportunistic pre-manifest upgrade: the first WRITE-LOCKED
        // open of a table that predates the manifest era commits one
        // (repair-first relist — idempotent, and we already hold the
        // lease, so it cannot absorb a live sibling's staged files).
        // From this instant its readers plan off commits instead of
        // directory listings, closing the documented dir-listing
        // blackout windows without requiring `--upgrade-manifest`.
        if (manifestVersions().isEmpty && exists) relistManifest()
        body
      } finally releaseWriterLease(id)
    }

  private def leaseContent(id: String, epoch: Long): String = {
    val holder = s"${ProcessHandle.current().pid()}@" +
      scala.util.Try(java.net.InetAddress.getLocalHost.getHostName).getOrElse("unknown")
    s"holder=$holder\nlease_id=$id\nepoch=$epoch\n" +
      s"heartbeat=${System.currentTimeMillis()}\n"
  }

  /** Largest writer epoch ever committed to the manifest log — the
    * floor every new acquire's epoch must exceed.
    */
  private def maxCommittedEpoch(): Long =
    manifestVersions().map(_.epoch).maxOption.getOrElse(0L)

  private[ibtp] def acquireWriterLease(
      staleAfterMillis: Long = LeaseStaleMs): String = {
    val id = java.util.UUID.randomUUID().toString
    var epoch = maxCommittedEpoch() + 1
    var tookOver = false
    def tryCreate(): Boolean =
      try {
        val out = fs.create(leaseFile, false) // no overwrite: atomic claim
        try out.write(leaseContent(id, epoch).getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      // lenient read: a holder heartbeating concurrently may expose a
      // mid-rewrite file for an instant — treat unreadable as "held,
      // age unknown" (fail fast), never as corrupt-marker fatal
      val kv = scala.util.Try(
        readKv(leaseFile, required = Seq("holder", "lease_id", "heartbeat")))
        .toOption.flatten.getOrElse(Map.empty)
      val age = kv.get("heartbeat").flatMap(h => h.toLongOption)
        .map(System.currentTimeMillis() - _)
        .orElse {
          // unreadable lease: usually a torn read of a live holder's
          // in-place heartbeat rewrite (→ mtime is fresh → fail fast
          // below), but a holder that DIED mid-rewrite leaves a corrupt
          // file forever — without this mtime fallback it would block
          // takeover permanently instead of going stale
          scala.util.Try(fs.getFileStatus(leaseFile).getModificationTime)
            .toOption.filter(_ > 0)
            .map(System.currentTimeMillis() - _)
        }
      // takeover ONLY on a provably stale heartbeat; unknown age (race
      // or transient unreadability) fails fast like a fresh lease
      if (!age.exists(_ > staleAfterMillis))
        throw new IllegalStateException(
          s"target $path is locked by writer ${kv.getOrElse("holder", "?")} " +
            s"(heartbeat ${age.fold("unknown")(a => s"${a / 1000}s")} ago): " +
            "concurrent materializations of one target are unsafe (crash " +
            "repairs assume a single writer). " +
            s"If that process is dead, the lease goes stale after " +
            s"${staleAfterMillis / 1000}s and the next run takes over.")
      TargetTable.log.warn(
        s"taking over stale writer lease on $path " +
          s"(holder ${kv.getOrElse("holder", "?")}, heartbeat ${
            age.fold("unknown")(a => s"${a / 1000}s")} ago)")
      tookOver = true
      // the fencing epoch must exceed BOTH every committed epoch and the
      // dead holder's own (it may have acquired but never committed).
      // An unreadable stale lease cannot reveal its epoch — but a file
      // that is unreadable AND mtime-stale means the holder died mid-
      // rewrite, so no zombie at that epoch survives to commit.
      epoch = math.max(maxCommittedEpoch(),
        kv.get("epoch").flatMap(_.toLongOption).getOrElse(0L)) + 1
      // the staleness decision above may be arbitrarily old by the time
      // this contender acts on it (a pause between the read and here):
      // re-read and verify the file STILL holds the same lease whose
      // staleness was proven — a rename based on stale knowledge would
      // otherwise move a rival's FRESH lease aside and steal a live
      // takeover. (Narrows the no-CAS window to re-read→rename; the
      // settle+confirm below and the commit-layer epoch fence cover the
      // remainder.)
      val recheckId = scala.util.Try(readKv(leaseFile, required = Seq("lease_id")))
        .toOption.flatten.flatMap(_.get("lease_id"))
      // None == None keeps the corrupt-lease (mtime-stale) takeover
      // working: unreadable then is unreadable now
      if (recheckId != kv.get("lease_id"))
        throw new IllegalStateException(
          s"target $path: lost the lease takeover race (pre-claim recheck) — another writer " +
            "claimed it first; retry once it completes")
      // atomic takeover claim: rename the stale file aside instead of
      // deleting it. Two contenders that both observed the stale
      // heartbeat race here — rename-of-a-missing-source fails, so
      // exactly one wins; with delete-then-create the slower delete
      // would remove the WINNER's fresh lease and both would acquire.
      val aside = new Path(path + LeaseSuffix + s".stale-${id.take(8)}")
      val claimed =
        try fs.rename(leaseFile, aside)
        catch { case _: java.io.IOException => false }
      if (!claimed)
        throw new IllegalStateException(
          s"target $path: lost the lease takeover race (claim rename) — another writer " +
            "claimed it first; retry once it completes")
      // CLAIM VERIFICATION: the rename is content-blind, so a contender
      // acting on knowledge that went stale between its re-read and its
      // rename can have moved a RIVAL's fresh lease (or a rival's
      // in-flight create, torn) aside instead of the dead holder's.
      // Read the claimed file itself: if it is not the lease whose
      // staleness was proven, RESTORE it where it was and abort —
      // never delete a live rival's claim, and never proceed on one.
      // (The un-stolen rival's own confirm reads may catch the blink
      // between the theft and the restore — they retry through it.)
      val claimedId = scala.util.Try(readKv(aside, required = Seq("lease_id")))
        .toOption.flatten.flatMap(_.get("lease_id"))
      if (claimedId != kv.get("lease_id")) {
        if (!scala.util.Try(fs.rename(aside, leaseFile)).getOrElse(false))
          fs.delete(aside, false) // rival re-claimed meanwhile: drop the copy
        throw new IllegalStateException(
          s"target $path: lost the lease takeover race (claim verification) — " +
            "another writer claimed it first; retry once it completes")
      }
      fs.delete(aside, false)
      if (!tryCreate())
        throw new IllegalStateException(
          s"target $path: lost the lease takeover race (post-claim create) — another writer " +
            "claimed it first; retry once it completes")
      // belt-and-braces for stores where create(overwrite=false) is not
      // a true atomic claim (plain local FS): confirm the file we now
      // read back is OURS before acting as the single writer. A read
      // can be transiently INCONCLUSIVE (missing or torn for an
      // instant) while a rival detects and undoes a stale-knowledge
      // claim (see claim verification above) — retry briefly through
      // that blink; abort immediately on a conclusive foreign id.
      def ownerSeen(): Option[String] =
        scala.util.Try(readKv(leaseFile, required = Seq("lease_id")))
          .toOption.flatten.flatMap(_.get("lease_id"))
      def confirmMine(site: String): Unit = {
        var tries = 0
        while (true) {
          val seen = ownerSeen()
          if (seen.contains(id)) return
          if (seen.isDefined || tries >= 8)
            throw new IllegalStateException(
              s"target $path: lost the lease takeover race ($site) — another " +
                "writer claimed it first; retry once it completes")
          tries += 1
          Thread.sleep(25)
        }
      }
      confirmMine("first confirm")
      // the stale-looking holder may still be ALIVE (long GC pause) with
      // an in-flight heartbeat rewrite that would clobber this fresh
      // claim with ITS id right after the confirm above — and its own
      // post-rewrite check would then vacuously pass. A randomized
      // settle + second confirm gives such an in-flight rewrite time to
      // land where this check can still see it (takeover is rare, so
      // the pause costs nothing on the hot path). The interleaving
      // where the clobber lands after this second confirm remains —
      // file primitives have no compare-and-swap — and is bounded: the
      // explicit pre-commit heartbeat detects the foreign id before
      // this claimant's next commit ([[heartbeatLease]]), and the
      // manifest epoch fence shadows whatever such a zombie would
      // commit anyway ([[commitVersion]]).
      Thread.sleep(settleMillis())
      confirmMine("settle confirm")
    }
    heldLeaseId = Some(id)
    heldEpoch = Some(epoch)
    leaseLost = None
    heldStaleAfterMs = staleAfterMillis
    lastBeatMs = System.currentTimeMillis()
    startHeartbeatDaemon(staleAfterMillis)
    if (tookOver)
      try sealEpoch()
      catch { case e: Throwable => releaseWriterLease(id); throw e }
    id
  }

  /** Test hook: runs after the seal reads its manifest basis and before
    * the seal commit renames — the window a lease-less commit can race
    * ([[sealEpoch]]'s raced-fold covers it; the spec lands a commit here
    * to drive that path deterministically).
    */
  private[ibtp] var onSealBasis: () => Unit = () => ()

  /** Test hook: runs after a snapshot replace's files are staged in and
    * before its manifest commit — the window a lease-less optimistic
    * append can race (the per-attempt removal recompute absorbs it; the
    * spec lands an [[appendConcurrent]] here to drive that path
    * deterministically).
    */
  private[ibtp] var onReplaceCommit: () => Unit = () => ()

  /** Test hook: runs after an optimistic append's files are moved into
    * the live directories and before its conflict-checked commit — the
    * window a conflicting replace can land (the spec drives the abort
    * path deterministically here).
    */
  private[ibtp] var onOptimisticCommit: () => Unit = () => ()

  /** Seal a takeover: re-land the CURRENT manifest state as a
    * checkpoint under the just-acquired (strictly newer) epoch, before
    * this holder mutates anything. From this instant any commit the
    * stale holder still lands carries a lower epoch and is born
    * shadowed — epoch-major replay starts at this seal and never reads
    * it ([[latestManifestRaw]]), and the zombie's own post-rename check
    * detects the newer epoch and rolls its version back
    * ([[commitVersion]]). Pre-manifest tables have nothing to seal
    * (their readers plan by directory listing, which no commit can
    * protect — the same documented exposure as their refresh path).
    *
    * RACED LEASE-LESS COMMITS: a held-lease zombie self-detects via the
    * post-rename lease read (the lease file is replaced strictly before
    * this seal reads its basis), but a LEASE-LESS writer whose delta
    * renames AND post-rename-relists inside the basis-read→seal-rename
    * window passes every check (epochAfter == its epoch, leaseOk vacuous),
    * reports success and clears its append marker — while this seal's
    * checkpoint would shadow it in epoch-major replay: files on disk, in
    * no replayed manifest, with no marker left for repair. So after each
    * seal rename we re-list; any lower-epoch version with seq beyond the
    * folded basis raced it and its writer may have declared success — its
    * content is folded in and the state re-sealed. Converges: once the
    * seal is visible, a lease-less commit's own pre-rename listing sees
    * the newer epoch and lands under it (not raced); only commits already
    * in flight at the first seal can loop here. Folding a version whose
    * writer in fact self-aborted (deleted its marker? no — kept it) is
    * safe in the other direction too: the kept marker lets
    * [[repairOrphanedAppends]] un-publish the files later, and replay's
    * set semantics make a fold + the writer's own re-land idempotent.
    */
  private[ibtp] def sealEpoch(): Unit = {
    val myEpoch = heldEpoch.getOrElse(Long.MaxValue)
    val basis0 = manifestVersions()
    if (basis0.isEmpty) return
    var covered = basis0.map(_.seq).max
    val raw = latestManifestRaw().get
    val schema = schemaOfManifestLines(raw).orElse(storedSchema)
    val state = scala.collection.mutable.LinkedHashMap.from(
      raw.filterNot(_.startsWith("#")).map(l => pathOf(l) -> l))
    onSealBasis()
    var attempts = 0
    while (true) {
      attempts += 1
      commitManifest(state.values.toSeq, schema)
      val raced = manifestVersions()
        .filter(v => v.epoch < myEpoch && v.seq > covered).sortBy(_.key)
      if (raced.isEmpty) return
      if (attempts >= 8)
        throw new IllegalStateException(
          s"target $path: epoch seal keeps racing lease-less commits " +
            s"after $attempts attempts — stop the undisciplined writer")
      raced.foreach { v =>
        // the version may self-delete concurrently (its writer's own
        // post-rename check caught the new epoch): then its writer
        // re-lands under the new epoch itself — nothing to fold
        // (readVersionLines: a raced sharded checkpoint folds its
        // SHARD CONTENTS, not its index lines)
        val lines = scala.util.Try(readVersionLines(v)).toOption.getOrElse(Nil)
        // a raced CHECKPOINT holds the full live set as its writer
        // computed it (same-epoch seq order implies it subsumes every
        // earlier raced delta) — it replaces the state, carrying its
        // removes; a delta merges
        if (!v.isDelta && lines.nonEmpty) state.clear()
        lines.foreach { l =>
          if (l.startsWith("#")) ()
          else if (v.isDelta && l.startsWith("+")) {
            val b = l.substring(1); state += pathOf(b) -> b
          }
          else if (v.isDelta && l.startsWith("-")) state -= l.substring(1)
          else state += pathOf(l) -> l
        }
        covered = math.max(covered, v.seq)
      }
    }
  }

  /** Path part of a manifest body line (the line may carry a
    * tab-separated per-file stats blob — see the data-skipping section).
    */
  private def pathOf(line: String): String = line.takeWhile(_ != '\t')

  /** When THIS holder last successfully wrote its heartbeat, and the
    * staleness window it acquired under — used to detect that we were
    * takeover-eligible (beat gap > window) and must treat our own
    * heartbeat rewrite as a possible clobber of a legitimate new
    * holder's lease.
    */
  @volatile private var lastBeatMs: Long = 0L
  @volatile private var heldStaleAfterMs: Long = LeaseStaleMs

  /** Randomized settle delay (ms) before the SECOND ownership confirm
    * on the two takeover-prone paths (acquire-after-takeover,
    * takeover-eligible heartbeat): gives an in-flight rival claim time
    * to land where the re-check can see it. Injectable so race specs
    * can drive the settle paths in tight deterministic loops instead of
    * relying on wall-clock luck; production keeps the randomized jitter
    * (two rivals settling identically would re-race).
    */
  private[ibtp] var settleMillis: () => Long = () =>
    100L + java.util.concurrent.ThreadLocalRandom.current().nextLong(150L)

  private def startHeartbeatDaemon(staleAfterMillis: Long): Unit = {
    val interval = math.max(200L, math.min(LeaseHeartbeatMs, staleAfterMillis / 4))
    val t = new Thread(() => {
      try {
        while (heldLeaseId.isDefined && leaseLost.isEmpty) {
          Thread.sleep(interval)
          if (heldLeaseId.isDefined)
            try heartbeatLease()
            catch {
              case _: InterruptedException => throw new InterruptedException
              case e: IllegalStateException if leaseLost.isDefined => throw e
              case e: Exception =>
                // transient FS hiccup: the next beat retries; staleness
                // only bites after many consecutive failures
                TargetTable.log.warn(
                  s"lease heartbeat on $path failed transiently: $e")
            }
        }
      } catch { case _: InterruptedException | _: IllegalStateException => () }
    }, s"graft-lease-heartbeat-${new Path(path).getName}")
    t.setDaemon(true)
    heartbeatDaemon = Some(t)
    t.start()
  }

  private def stopHeartbeatDaemon(): Unit = {
    heartbeatDaemon.foreach { t =>
      t.interrupt()
      t.join(5000)
    }
    heartbeatDaemon = None
  }

  /** Refresh the held lease's heartbeat (no-op when not held). Cheap —
    * one small in-place rewrite — fired continuously by the background
    * daemon and explicitly at each period load / compacted partition
    * (the explicit calls are the points where a lost lease aborts the
    * run). Throws if the lease turned out to belong to someone else.
    *
    * The rewrite is create(overwrite=true) IN PLACE, never
    * delete-then-write: the lease file must not blink out of existence
    * even for an instant, or a contender's create(overwrite=false)
    * claim would succeed while this holder is alive. A reader that
    * catches the truncate-write mid-flight lands on acquire's lenient
    * path (unreadable → "held, age unknown" → fail fast). Ownership is
    * verified both before and after the rewrite: a takeover that
    * replaced the file (because WE looked stale) is normally detected
    * and the run fails rather than silently stomping the new holder's
    * lease and running alongside it.
    *
    * Residual race, stated honestly: a takeover landing BETWEEN the
    * pre-check and our overwrite is clobbered by our own id, so the
    * plain post-check is vacuous against it — file primitives have no
    * compare-and-swap. Three bounds contain it: (1) takeover is only
    * legal against a stale heartbeat, so when our own beat gap exceeded
    * the staleness window we add a randomized settle + re-check, giving
    * an in-flight claim time to land where we can see it (and the
    * claimant's acquire does the symmetric settle + confirm); (2) the
    * clobbered claimant's next explicit heartbeat — which precedes
    * every commit — reads our foreign id and aborts, so no commit
    * happens under a silently lost lease; (3) terminally, the MANIFEST
    * layer no longer trusts the lease at all: every takeover bumps a
    * fencing epoch and seals it ([[commitVersion]]), so even the
    * interleaving neither side detects cannot make a stale holder's
    * commit the latest manifest.
    */
  def heartbeatLease(): Unit = synchronized {
    // synchronized: the daemon and concurrent period threads share this
    // instance; the verify/rewrite/verify sequence must not interleave
    leaseLost.foreach(e => throw e)
    heldLeaseId.foreach { id =>
      // readable-and-someone-else's → lost; unreadable/absent is
      // INCONCLUSIVE (a torn read of our own rewrite) → proceed: only
      // we rewrite this file while we own it
      def stillOurs(): Boolean =
        scala.util.Try(readKv(leaseFile, required = Seq("lease_id")))
          .toOption.flatten
          .forall(_.get("lease_id").contains(id))
      def lost(): Nothing = {
        val e = new IllegalStateException(
          s"target $path: writer lease lost — another writer took over " +
            "(this holder's heartbeat went stale); aborting rather than " +
            "running two writers' crash-repairs concurrently")
        leaseLost = Some(e)
        heldLeaseId = None
        heldEpoch = None
        throw e
      }
      // were we takeover-ELIGIBLE (our own beat gap blew the staleness
      // window, e.g. a long GC pause)? Then a contender may legally
      // claim between the pre-check and our rewrite, and our overwrite
      // would bury its lease under our own id.
      val wasTakeoverEligible =
        System.currentTimeMillis() - lastBeatMs > heldStaleAfterMs
      if (!stillOurs()) lost()
      val out = fs.create(leaseFile, true) // in place: file never vanishes
      try out.write(leaseContent(id, heldEpoch.getOrElse(0L)).getBytes("UTF-8"))
      finally out.close()
      if (!stillOurs()) lost()
      if (wasTakeoverEligible) {
        // randomized settle + re-check: a claim racing our rewrite gets
        // time to (re)land where the check can see it. Costs nothing on
        // the hot path — only reached after an anomalous beat gap.
        Thread.sleep(settleMillis())
        if (!stillOurs()) lost()
      }
      lastBeatMs = System.currentTimeMillis()
    }
  }

  private[ibtp] def releaseWriterLease(id: String): Unit =
    if (heldLeaseId.contains(id) || leaseLost.isDefined) {
      stopHeartbeatDaemon()
      // lenient read, like acquire: release runs in withWriterLease's
      // finally, and a strict corrupt-marker throw here would mask the
      // run's real result/exception. Unreadable → treat as not-owned
      // (skip the delete — a takeover's half-written heartbeat must not
      // be deleted by the OLD holder).
      val owned = scala.util.Try(readKv(leaseFile, required = Seq("lease_id")))
        .toOption.flatten.exists(_.get("lease_id").contains(id))
      if (owned) fs.delete(leaseFile, false)
      heldLeaseId = None
      heldEpoch = None
      leaseLost = None
    }

  // ---- reader-snapshot manifest ----------------------------------------
  // A versioned file listing inside the target (`_graft_manifest/
  // v<N>.list`, one relative data-file path per line, committed by
  // atomic tmp→rename of a FRESH name) makes the live file set a
  // single atomic pointer — the parquet-native analogue of a table
  // format's commit log. [[read]] plans against the latest committed
  // manifest instead of a directory listing, so a reader planning
  // while a mutation is in flight sees the file set of the last commit
  // — never a partial one. Replaced files are not deleted in place but
  // parked on a trash list ([[vacuum]] reaps them after
  // [[TargetTable.TrashRetentionMs]]), giving already-planned scans a
  // grace window before their files disappear — the same
  // retained-then-vacuumed discipline table formats use.
  //
  // EVERY mutation is snapshot-isolated under it: appends publish
  // their new files with a commit; partition replaces (backfill
  // [[replaceRange]], [[upsert]], streaming [[overwritePartitions]])
  // and [[compact]] stage files in under unpublished names and switch
  // the whole replaced set in ONE commit ([[writeSnapshotReplace]]);
  // and a full refresh / widening rewrite is the same replace applied
  // to the ENTIRE live set with the new schema riding the commit's
  // `#schema=` header — nothing is ever deleted in a reader's face,
  // and a reader never sees new files through an old schema. Only
  // PRE-manifest tables (readers plan by directory listing) still
  // take the reference-style backup swap for a rebuild (see README
  // "Reader visibility").
  //
  // Scale note: the manifest is a DELTA LOG with periodic checkpoints.
  // The hot per-period commit writes only its own staged names (an
  // O(staged) `.delta` entry — [[commitManifestDelta]]) and LISTS no
  // directories at all; partition replaces and compactions write
  // O(touched-partition) deltas; every
  // [[TargetTable.ManifestCheckpointEvery]] commits the chain folds
  // into a fresh full checkpoint, bounding the replay tail readers pay
  // ([[latestManifestRaw]]). At 100 TB with years of daily partitions,
  // per-commit cost is therefore independent of table size — the
  // single-file-rewrite ceiling the pre-delta design had is gone.

  private def manifestDir = new Path(path, ManifestDirName)
  private def trashDir    = new Path(path, TrashDirName)

  /** One committed manifest version. Ordering is EPOCH-MAJOR, then
    * sequence: a version committed under a newer writer epoch outranks
    * every version of an older epoch regardless of sequence — the
    * ordering half of the zombie-writer fence (see [[commitVersion]]).
    * The kind rides the extension (`.list` = checkpoint holding the
    * full live set; `.delta` = incremental `+file`/`-file` entry), so
    * replay classifies versions from the LISTING alone, zero reads.
    * Legacy single-number `v<n>.list` names parse as epoch 0.
    */
  private def manifestVersions(): Seq[ManifestVersion] =
    if (!fs.exists(manifestDir)) Nil
    else fs.listStatus(manifestDir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      def parse(body: String, isDelta: Boolean): Option[ManifestVersion] =
        body.split("_", 2) match {
          case Array(e, s) => for {
            ep <- e.toLongOption; sq <- s.toLongOption
          } yield ManifestVersion(ep, sq, isDelta, st.getPath,
            st.getModificationTime, st.getLen)
          case Array(s) =>
            s.toLongOption.map(ManifestVersion(0L, _, isDelta, st.getPath,
              st.getModificationTime, st.getLen))
          case _ => None
        }
      if (n.startsWith("v") && n.endsWith(".list"))
        parse(n.stripPrefix("v").stripSuffix(".list"), isDelta = false)
      else if (n.startsWith("v") && n.endsWith(".delta"))
        parse(n.stripPrefix("v").stripSuffix(".delta"), isDelta = true)
      else None
    }

  private def readLines(p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Stream `p`'s non-empty lines without materializing the file — the
    * fold's way of reading a multi-GB checkpoint body on a bounded
    * driver. The reader closes itself at exhaustion; [[abort]] closes
    * it early (consumers that bail mid-stream must call it, or one
    * file handle lingers until GC).
    */
  private final class LineStream(p: Path) extends Iterator[String] {
    private val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p),
        java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
    private var closed = false
    private var nextLine: String = advance()
    private def advance(): String = {
      var l = br.readLine()
      while (l != null && l.isEmpty) l = br.readLine()
      if (l == null) { abort(); null } else l
    }
    def abort(): Unit = if (!closed) { closed = true; br.close() }
    def hasNext: Boolean = nextLine != null
    def next(): String = {
      val r = nextLine
      nextLine = if (closed) null else advance()
      r
    }
  }

  /** Leading `#`-prefixed lines of a version file only — the cheap
    * header probe (stops at the first body line, so a multi-thousand-
    * file checkpoint costs one small read).
    */
  private def readHeaderLines(p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .takeWhile(_.startsWith("#")).toList
    finally in.close()
  }

  /** Replay the manifest log into the current state: the latest
    * CHECKPOINT (full live-file listing) plus every delta committed
    * after it, in epoch-major order. Returns what a single full
    * manifest file used to hold — the newest version's header lines
    * followed by the live relative paths — so callers are agnostic to
    * the log structure. Cost: one checkpoint read + the delta tail
    * (bounded by [[TargetTable.ManifestCheckpointEvery]]), independent
    * of how many commits the table has ever taken.
    *
    * Epoch-major order is the read half of the zombie fence: a stale
    * writer's version (lower epoch, possibly higher sequence) sorts
    * BEFORE the takeover's seal checkpoint and is therefore discarded
    * by the replay even if the zombie's crash left the file behind.
    */
  /** Replayed state keyed by the WHOLE LISTED CHAIN — every version
    * file's (epoch, seq, kind, mtime, length): versions are immutable
    * once landed, so an unchanged chain fingerprint proves the replayed
    * lines are current — a repeated read plan (point queries against a
    * large table) pays one directory listing instead of re-reading and
    * re-parsing the O(live) checkpoint every call. Always validated
    * against a FRESH listing, so concurrent writers (lease-held or
    * optimistic), pruning, rebuilt manifest dirs, and even in-place
    * tampering with a MID-CHAIN file (mtime/length shift) all
    * invalidate it the instant they happen.
    */
  @volatile private var replayCache:
    Option[(Vector[(Long, Long, Boolean, Long, Long)], Seq[String])] = None

  /** The newest checkpoint's RAW lines plus its header — held by
    * reference (zero cost on the cold path). When the tip advanced but
    * the checkpoint underneath is unchanged (the common case: a delta
    * landed), the replay re-parses these lines and applies only the
    * delta tail: O(live) in-memory parse instead of O(live) disk
    * read + parse.
    */
  @volatile private var ckptCache:
    Option[((Long, Long, Boolean, Long, Long), Seq[String], Seq[String])] = None

  private def latestManifestRaw(): Option[Seq[String]] = {
    val vs = manifestVersions().sortBy(_.key)
    if (vs.isEmpty) None
    else {
      val chainId = vs.map(_.cacheKey).toVector
      val cachedTip = replayCache
      cachedTip match {
        case Some((t, lines)) if t == chainId => return Some(lines)
        case _ => ()
      }
      val ckptIdx = vs.lastIndexWhere(!_.isDelta)
      // keyed by the PATH part: a body line may carry a tab-separated
      // per-file stats blob, and a delta's `-path` removal must match
      // the enriched line it shadows
      var files = scala.collection.mutable.LinkedHashMap.empty[String, String]
      // the effective header is the NEWEST version's, captured while
      // that file is read anyway (no second open — one GET per file)
      var header: Seq[String] = Nil
      if (ckptIdx >= 0) {
        val ckptKey = vs(ckptIdx).cacheKey
        val (lines, h) = ckptCache match {
          case Some((k, body, hdr)) if k == ckptKey => (body, hdr)
          case _ =>
            val fresh = readVersionLines(vs(ckptIdx))
            val hdr = fresh.takeWhile(_.startsWith("#"))
            val body = fresh.dropWhile(_.startsWith("#"))
            if (body.size <= TargetTable.MaxCachedManifestLines)
              ckptCache = Some((ckptKey, body, hdr))
            else ckptCache = None
            (body, hdr)
        }
        if (ckptIdx == vs.size - 1) header = h
        lines.foreach(l => files += pathOf(l) -> l)
      }
      vs.drop(ckptIdx + 1).foreach { v =>
        val lines = readLines(v.p)
        if (v eq vs.last) header = lines.takeWhile(_.startsWith("#"))
        lines.foreach { l =>
          if (l.startsWith("#")) ()
          else if (l.startsWith("+")) {
            val b = l.substring(1); files += pathOf(b) -> b
          }
          else if (l.startsWith("-")) files -= l.substring(1)
          else files += pathOf(l) -> l
        }
      }
      val result = header.filterNot(_ == DeltaMarker) ++ files.values.toSeq
      if (result.size <= TargetTable.MaxCachedManifestLines)
        replayCache = Some((chainId, result))
      else replayCache = None
      Some(result)
    }
  }

  /** Header schema of the NEWEST committed version alone — the cheap
    * schema carry for delta commits (no replay): every commit embeds
    * the then-current schema, so the newest header is authoritative.
    */
  /** Header lines of the NEWEST committed version alone — one cheap
    * read; every commit re-embeds the full header, so the newest one is
    * authoritative for both the schema and the stats column.
    */
  private def latestHeaderLines(): Seq[String] =
    manifestVersions().maxByOption(_.key)
      .map(v => readHeaderLines(v.p)).getOrElse(Nil)

  private def latestCommittedSchema(): Option[StructType] =
    schemaOfManifestLines(latestHeaderLines())

  /** Relative live-file paths of the latest committed manifest, if this
    * target has one (tables written before the manifest era read via
    * directory listing until their next mutation commits one). Paths
    * only — the stats blob a body line may carry is stripped.
    */
  private[ibtp] def latestManifest(): Option[Seq[String]] =
    latestManifestRaw().map(_.filterNot(_.startsWith("#")).map(pathOf))

  /** Full body LINES of the latest committed manifest (path plus any
    * per-file stats blob) — what stats-preserving rewrites must carry.
    */
  private def latestManifestBody(): Seq[String] =
    latestManifestRaw().map(_.filterNot(_.startsWith("#"))).getOrElse(Nil)

  /** The replayed live BODY LINES as a sorted, path-deduped STREAM —
    * what the checkpoint fold writes, produced in O(delta tail) driver
    * memory instead of the O(live) Seq + mkString the materialized
    * path pays (a ~6 GB transient at 10M files, and a hard
    * Integer.MAX_VALUE-char overflow at ~14M).
    *
    * Correct because checkpoints are an invariant of this class: every
    * checkpoint writer emits `.distinct.sorted` body lines (shards are
    * consecutive slices, so index-order concatenation preserves the
    * order), paths are unique after the replay's map semantics, and a
    * body line orders exactly like its path (the stats blob begins
    * with `\t`, which sorts below every path character). So the fold
    * is a sorted MERGE: stream the old checkpoint's lines, drop every
    * path the delta tail touched, and interleave the tail's own
    * (sorted) live lines — bit-identical output to
    * `latestManifestBody().distinct.sorted`.
    *
    * The merge VERIFIES the order invariant line by line and throws
    * [[TargetTable.UnsortedCheckpointException]] on violation (closing
    * its reader first) — the fold falls back to the materialized path,
    * so a corrupt-but-readable store degrades in memory, never in
    * correctness. None when no checkpoint exists to stream from.
    */
  private def streamedFoldBody(): Option[Iterator[String]] = {
    val vs = manifestVersions().sortBy(_.key)
    val ckptIdx = vs.lastIndexWhere(!_.isDelta)
    if (ckptIdx < 0) return None
    // header probe only — never the O(live) body
    val mainHeader = readHeaderLines(vs(ckptIdx).p)
    val shardNames = mainHeader.filter(_.startsWith("#shard=")).map(shardNameOf)
    // delta-tail overlay, mirroring latestManifestRaw's map semantics:
    // `added` holds the tail's live lines; `touched` every path the
    // tail wrote at all — its checkpoint line (if any) is superseded
    val added = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val touched = scala.collection.mutable.HashSet.empty[String]
    vs.drop(ckptIdx + 1).foreach { v =>
      readLines(v.p).foreach { l =>
        if (l.startsWith("#")) ()
        else if (l.startsWith("+")) {
          val b = l.substring(1); val p = pathOf(b)
          added += p -> b; touched += p
        } else if (l.startsWith("-")) {
          val p = l.substring(1); added -= p; touched += p
        } else {
          val p = pathOf(l); added += p -> l; touched += p
        }
      }
    }
    val overlay = added.values.toArray.sorted
    var live: LineStream = null
    val ckptLines: Iterator[String] =
      if (shardNames.isEmpty) {
        live = new LineStream(vs(ckptIdx).p)
        live.dropWhile(_.startsWith("#"))
      } else shardNames.iterator.flatMap { nm =>
        live = new LineStream(new Path(manifestDir, nm))
        live
      }
    val filtered = ckptLines.filterNot(l => touched.contains(pathOf(l)))
    Some(new Iterator[String] {
      private var ck: String = pull()
      private var oi = 0
      private var prev: String = null
      private def pull(): String =
        if (filtered.hasNext) filtered.next() else null
      def hasNext: Boolean = ck != null || oi < overlay.length
      def next(): String = {
        val takeCkpt = ck != null &&
          (oi >= overlay.length || pathOf(ck) <= pathOf(overlay(oi)))
        val out =
          if (takeCkpt) { val r = ck; ck = pull(); r }
          else { val r = overlay(oi); oi += 1; r }
        val p = pathOf(out)
        if (prev != null && p.compareTo(prev) <= 0) {
          if (live != null) live.abort()
          throw new TargetTable.UnsortedCheckpointException(
            s"checkpoint under $manifestDir is not sorted/deduped at " +
              s"'$p' (after '$prev') — the streamed fold cannot merge; " +
              "falling back to the materialized fold")
        }
        prev = p
        out
      }
    })
  }

  /** Live files with their parsed data-skipping stats (possibly one
    * per declared stats column), if any.
    */
  private[ibtp] def latestManifestEntries(): Seq[(String, Seq[FileSkipStat])] =
    latestManifestBody().map(l => pathOf(l) -> statsOf(l))

  private def schemaOfManifestLines(lines: Seq[String]): Option[StructType] =
    lines.find(_.startsWith("#schema="))
      .map(l => DataType.fromJson(l.stripPrefix("#schema=")).asInstanceOf[StructType])

  /** Schema recorded in the latest manifest's header — the READER-facing
    * schema, switched atomically with the file set by every commit
    * (headerless pre-header manifests fall back to the sidecar).
    */
  private[ibtp] def latestManifestSchema(): Option[StructType] =
    latestManifestRaw().flatMap(schemaOfManifestLines)

  // ---- per-file data-skipping stats -------------------------------------
  // The delta log closed the WRITE-side scale ceiling; without file-level
  // stats the READ side still plans every live file, so a cluster-key
  // point query on a compacted table opens a million footers to prune a
  // million row groups. Manifest body lines therefore carry OPTIONAL
  // tab-separated stats blobs — min/max of each declared column plus the
  // row count, read from the parquet FOOTERS of just-staged files at
  // write time (O(staged) small reads) — and [[readWhere]] prunes the
  // planned file list driver-side from the manifest alone, Delta-style:
  // zero footer opens for skipped files. The stats columns are declared
  // in the header (`#statscol=`, a comma-separated list set by
  // `compact(clusterBy)` and carried forward by every commit; one blob
  // per declared column per line, in declared order); entries without
  // stats are always planned (conservative), so relists/upgrades degrade
  // to scan-all, never to wrong answers. Content correctness never
  // depends on the stats: the pruning predicate is also applied as a
  // residual filter.

  private def statsColOfLines(lines: Seq[String]): Option[String] =
    lines.find(_.startsWith("#statscol="))
      .map(_.stripPrefix("#statscol=")).filter(_.nonEmpty)

  private def setColOfLines(lines: Seq[String]): Option[String] =
    lines.find(_.startsWith("#setcol="))
      .map(_.stripPrefix("#setcol=")).filter(_.nonEmpty)

  /** The declared VALUE-SET skipping column list, raw header form (a
    * comma-separated string, like `#statscol=`). Min/max stats answer
    * range predicates on CLUSTERED columns; they are useless for a
    * categorical point lookup on a column every file spans (`lang =
    * 'de'` when each file holds all five languages mixed — min..max is
    * always 'de'..'zh'). For the declared set columns, write paths
    * additionally record each staged file's EXACT distinct-value set,
    * read from the parquet DICTIONARY pages of the just-staged files
    * (a fully dictionary-encoded chunk's dictionary IS its value set —
    * one page per file, no data scan), capped at
    * [[TargetTable.MaxSetValues]] values; [[readWhereIn]] then prunes
    * the planned file list driver-side to the files whose recorded set
    * intersects the queried values.
    */
  private[ibtp] def latestSetCol(): Option[String] =
    setColOfLines(latestHeaderLines())

  /** The declared value-set columns, split. */
  private[ibtp] def latestSetCols(): Seq[String] =
    latestSetCol().toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** The declared data-skipping column list, raw header form (a
    * comma-separated string — the plumbing passes it through opaquely;
    * legacy single-name headers are the one-element case).
    */
  private[ibtp] def latestStatsCol(): Option[String] =
    statsColOfLines(latestHeaderLines())

  /** The declared data-skipping columns, split. */
  private[ibtp] def latestStatsCols(): Seq[String] =
    latestStatsCol().toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** String bounds ride Base64 (no column name or value can collide
    * with the line format — tabs, commas, newlines); numeric bounds
    * ride plain, so the hot pruning path parses them with zero decode.
    */
  private def encVal(v: String, typ: String): String =
    if (typ == "string") b64(v) else v
  private def decVal(v: String, typ: String): String =
    if (typ == "string") unb64(v) else v

  /** Serialize a stat as the tab-suffix of a manifest body line, fixed
    * field order (the fast pruner parses positionally).
    */
  private def encodeStat(s: FileSkipStat): String =
    s"col=${b64(s.col)},t=${s.typ},min=${encVal(s.min, s.typ)}," +
      s"max=${encVal(s.max, s.typ)},rows=${s.rows}"

  /** Serialize a value set as a tab-suffix blob. Values separate with
    * ';' — absent from the Base64 alphabet and from the canonical
    * numeric forms, so no value can smuggle a separator.
    */
  private def encodeSetBlob(s: FileValueSet): String =
    s"set=${b64(s.col)},t=${s.typ},v=${s.vals.map(encVal(_, s.typ)).mkString(";")}"

  /** Parse ONE value-set blob; malformed → None (planned, not pruned). */
  private def parseSetBlob(blob: String): Option[FileValueSet] =
    scala.util.Try {
      if (!blob.startsWith("set=")) None
      else {
        val tAt = blob.indexOf(",t=")
        val vAt = blob.indexOf(",v=", tAt + 3)
        val t = blob.substring(tAt + 3, vAt)
        Some(FileValueSet(
          unb64(blob.substring(4, tAt)), t,
          blob.substring(vAt + 3).split(';').toSeq
            .filter(_.nonEmpty).map(decVal(_, t))))
      }
    }.toOption.flatten

  /** All value-set blobs on a body line, declared order. */
  private def setsOf(line: String): Seq[FileValueSet] = {
    val i = line.indexOf('\t')
    if (i < 0) Nil
    else line.substring(i + 1).split('\t').toSeq.flatMap(parseSetBlob)
  }

  /** Live files with their parsed value sets, if any (test/probe view). */
  private[ibtp] def latestManifestSets(): Seq[(String, Seq[FileValueSet])] =
    latestManifestBody().map(l => pathOf(l) -> setsOf(l))

  /** Columns a [[restatManifest]] pass PROBED on this line and found
    * can never yield a skip blob (PLAIN-encoded chunks, oversized
    * sets, unsupported types) — the negative-result sentinel that
    * keeps repeated restat calls from re-opening the same footers
    * forever. Every pruner ignores the blob (it only ever WIDENS the
    * covered-column set), so a stale sentinel is merely unpruned,
    * never wrong.
    */
  private def noskipTokens(line: String): Seq[String] = {
    val at = line.indexOf("\tnoskip=")
    if (at < 0) Nil
    else {
      val start = at + 8
      val end0 = line.indexOf('\t', start)
      val end = if (end0 < 0) line.length else end0
      line.substring(start, end).split(';').toSeq.filter(_.nonEmpty)
    }
  }

  /** The sentinel is BLOB-KIND-QUALIFIED (`s:` = min/max stats probe,
    * `v:` = value-set probe; ':' is outside the Base64 alphabet):
    * "this footer can never yield a SET for c" says nothing about a
    * later min/max declaration of c, so an unqualified sentinel would
    * silently pin the other kind's coverage degraded forever. Legacy
    * unqualified tokens count for NEITHER kind — the next restat
    * re-probes the line once and rewrites it qualified.
    */
  private def noskipOf(line: String, kind: Char): Set[String] =
    noskipTokens(line).iterator
      .filter(t => t.length > 2 && t.charAt(0) == kind && t.charAt(1) == ':')
      .map(t => unb64(t.substring(2))).toSet

  /** Serialize the negative-result sentinel, kind-qualified. */
  private def encodeNoskip(statCols: Seq[String], setCols: Seq[String]): String =
    "noskip=" + (statCols.map("s:" + b64(_)) ++ setCols.map("v:" + b64(_)))
      .mkString(";")

  /** Live files with their negative-sentinel columns, both kinds
    * unioned (test/probe view).
    */
  private[ibtp] def latestManifestNoskip(): Seq[(String, Set[String])] =
    latestManifestBody().map(l =>
      pathOf(l) -> (noskipOf(l, 's') ++ noskipOf(l, 'v')))

  /** The chain tip key — the basis an optimistic commit diffs against. */
  private[ibtp] def latestManifestTip(): (Long, Long, Boolean) =
    manifestVersions().map(_.key).maxOption.getOrElse((0L, 0L, false))

  /** Backfill per-file skip blobs (min/max stats AND value sets) for
    * live files missing any declared column's blob — the remedy for
    * files committed BEFORE a declaration (`compact(clusterBy)` /
    * [[declareSetColumns]]) without paying a compaction rewrite:
    * O(missing files) footer + dictionary-page reads, then ONE delta
    * commit swaps the enriched body lines in (same paths — readers see
    * the old or new lines atomically, contents untouched). Files whose
    * footers still yield nothing (PLAIN-encoded chunks, oversized
    * sets) keep their original lines and simply stay unpruned.
    * Returns the number of lines enriched.
    */
  def restatManifest(): Int = withWriterLease() {
    if (latestManifest().isEmpty) commitManifestRelist()
    val statCols = latestStatsCols()
    val setCols = latestSetCols()
    if (statCols.isEmpty && setCols.isEmpty) 0
    else {
      val body = latestManifestBody()
      // a column is covered when it has a blob OR a prior restat's
      // negative sentinel says its footer can never yield one — so
      // repeated restat calls are O(newly-unqualified), not
      // O(unqualifying) footer re-opens per invocation
      val missing = body.filterNot { l =>
        val stats = statsOf(l).map(_.col).toSet
        val sets = setsOf(l).map(_.col).toSet
        // coverage is per blob kind: a set-probe sentinel must not
        // satisfy a stats declaration of the same column (or vice
        // versa) — that is exactly the later-declaration re-probe the
        // sentinel exists to preserve
        val probedS = noskipOf(l, 's')
        val probedV = noskipOf(l, 'v')
        statCols.forall(c => stats.contains(c) || probedS.contains(c)) &&
          setCols.forall(c => sets.contains(c) || probedV.contains(c))
      }
      if (missing.isEmpty) 0
      else {
        val pairs = missing.map(l => { val p = pathOf(l); p -> new Path(path, p) })
        val enriched = enrichPairsWithStats(pairs,
          Some(statCols.mkString(",")).filter(_.nonEmpty),
          Some(setCols.mkString(",")).filter(_.nonEmpty))
        // every probed line commits: blobs gained ride as-is, and any
        // declared column the fresh read could NOT serve is recorded in
        // the negative sentinel so the next restat skips this footer
        val updates = missing.zip(enriched).flatMap { case (old, nw) =>
          val gainedStats = statsOf(nw).map(_.col).toSet
          val gainedSets = setsOf(nw).map(_.col).toSet
          // per-kind sentinels: prior qualified tokens carry forward;
          // legacy unqualified ones are dropped (this pass just
          // re-probed the line, so they are superseded either way)
          val probedS = (noskipOf(old, 's').filterNot(gainedStats) ++
            statCols.filterNot(gainedStats)).toSeq.distinct.sorted
          val probedV = (noskipOf(old, 'v').filterNot(gainedSets) ++
            setCols.filterNot(gainedSets)).toSeq.distinct.sorted
          // carry forward blobs the OLD line already had that the fresh
          // read did not reproduce (it shouldn't happen — contents are
          // immutable — but never drop information on a re-stat)
          val keepOld = statsOf(old).filter(s => !gainedStats(s.col))
            .map(encodeStat) ++
            setsOf(old).filter(s => !gainedSets(s.col)).map(encodeSetBlob)
          val line = nw + keepOld.map("\t" + _).mkString +
            (if (probedS.nonEmpty || probedV.nonEmpty)
              "\t" + encodeNoskip(probedS, probedV) else "")
          if (line == old) None else Some((old, line))
        }
        if (updates.nonEmpty)
          commitManifestDelta(
            add = updates.map(_._2), remove = updates.map(u => pathOf(u._1)))
        updates.size
      }
    }
  }

  /** Parse ONE tab-delimited stats blob; anything malformed degrades
    * to None (planned, never pruned) rather than failing a read.
    */
  private def parseStatBlob(blob: String): Option[FileSkipStat] =
    scala.util.Try {
      val kv = blob.split(",").flatMap { p =>
        p.split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _           => None
        }
      }.toMap
      for {
        c  <- kv.get("col"); t <- kv.get("t")
        mn <- kv.get("min"); mx <- kv.get("max")
        r  <- kv.get("rows").flatMap(_.toLongOption)
      } yield FileSkipStat(unb64(c), t, decVal(mn, t), decVal(mx, t), r)
    }.toOption.flatten

  /** All stats blobs on a body line, declared order. */
  private def statsOf(line: String): Seq[FileSkipStat] = {
    val i = line.indexOf('\t')
    if (i < 0) Nil
    else line.substring(i + 1).split('\t').toSeq.flatMap(parseStatBlob)
  }

  /** Compile a pruning predicate over RAW body lines for one query —
    * the column match compares the ENCODED name (no per-entry decode),
    * bounds canonicalize once, and the per-entry work is two indexOf
    * walks plus a numeric parse. This is the driver-side cost a 1M-file
    * plan pays per entry, so it must stay allocation-light.
    * Conservative: any malformed/foreign blob keeps the file.
    */
  private def compilePruner(
      column: String, lo: Any, hi: Any): String => Boolean = {
    val prefix = "col=" + b64(column) + ",t="
    // canonical bounds per possible stat type, computed once
    val loL = canonBound(lo, "long");   val hiL = canonBound(hi, "long")
    val loD = canonBound(lo, "double"); val hiD = canonBound(hi, "double")
    val loS = canonBound(lo, "string"); val hiS = canonBound(hi, "string")
    val seek = "\t" + prefix
    (line: String) => {
      // locate THIS column's blob anywhere in the tab-separated stats
      // suffix (multi-column lines carry one blob per declared column);
      // a line with no blob for the column is kept — prune on proof only
      val at = line.indexOf(seek)
      if (at < 0) true
      else {
        val end0 = line.indexOf('\t', at + 1)
        val end = if (end0 < 0) line.length else end0
        val blob = line.substring(at + 1, end)
        scala.util.Try {
          val tEnd  = blob.indexOf(",min=", prefix.length)
          val typ   = blob.substring(prefix.length, tEnd)
          val mEnd  = blob.indexOf(",max=", tEnd + 5)
          val minS  = blob.substring(tEnd + 5, mEnd)
          val rEnd  = blob.indexOf(",rows=", mEnd + 5)
          val maxS  = blob.substring(mEnd + 5, rEnd)
          typ match {
            case "long" => (loL, hiL) match {
              case (Some(l), Some(h)) =>
                maxS.toLong >= l.asInstanceOf[Long] &&
                  minS.toLong <= h.asInstanceOf[Long]
              case _ => true
            }
            case "double" => (loD, hiD) match {
              case (Some(l), Some(h)) =>
                maxS.toDouble >= l.asInstanceOf[Double] &&
                  minS.toDouble <= h.asInstanceOf[Double]
              case _ => true
            }
            case "string" => (loS, hiS) match {
              case (Some(l), Some(h)) =>
                unb64(maxS).compareTo(l.asInstanceOf[String]) >= 0 &&
                  unb64(minS).compareTo(h.asInstanceOf[String]) <= 0
              case _ => true
            }
            case _ => true
          }
        }.getOrElse(true)
      }
    }
  }

  /** Canonicalize a caller-supplied bound into a stat's value space:
    * `long` covers integrals, DATE (epoch days) and TIMESTAMP (epoch
    * micros); `double` the floating types; `string` UTF-8 strings.
    * None = incomparable (wrong-typed bound) — the caller must then
    * keep the file (prune only on proof).
    */
  private def canonBound(v: Any, typ: String): Option[Any] = (typ, v) match {
    case ("long", d: java.sql.Date)        => Some(d.toLocalDate.toEpochDay)
    case ("long", d: java.time.LocalDate)  => Some(d.toEpochDay)
    case ("long", t: java.sql.Timestamp)   =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case ("long", t: java.time.Instant)    =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    // decimals canonicalize into 'long' only when they are EXACT whole
    // numbers — truncating 1.50 to 1 would wrongly prune a long-stat
    // file; a fractional decimal is incomparable in this space (keep)
    case ("long", b: java.math.BigDecimal) =>
      scala.util.Try(b.stripTrailingZeros.longValueExact()).toOption
    case ("long", b: scala.math.BigDecimal) =>
      scala.util.Try(b.underlying.stripTrailingZeros.longValueExact()).toOption
    case ("long", n: Number)               => Some(n.longValue())
    // -0.0 == 0.0 in SQL; normalize so the set pruner's string
    // comparison agrees with the recorded (normalized) dictionary
    case ("double", n: Number)             =>
      val d = n.doubleValue(); Some(if (d == 0.0) 0.0 else d)
    case ("string", s: String)             => Some(s)
    case _                                 => None
  }

  /** Read min/max/rowcount of `columns` from the parquet FOOTERS of
    * just-staged files — ONE footer open per file regardless of column
    * count; write-side cost O(staged files), which is what lets
    * [[readWhere]] prune at plan time with zero footer opens. A file
    * whose footer lacks usable stats for a column (unsupported physical
    * type, NaN-polluted double range, stats dropped as oversized)
    * yields no blob for THAT column and is simply never pruned on it.
    */
  /** Encoded skip blobs (min/max stats, then value sets) per staged
    * file — ONE reader open per file regardless of column count; the
    * value sets additionally read the dictionary PAGES (one small page
    * per column chunk), still O(staged files) small I/O, never a data
    * scan. A file that yields nothing for a column simply carries no
    * blob for it and is never pruned on it.
    */
  private def footerBlobs(
      files: Seq[(String, Path)], statCols: Seq[String],
      setCols: Seq[String]): Map[String, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    files.flatMap { case (rel, p) =>
      scala.util.Try {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
        try {
          val blocks = r.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          // dictionary stores come via the cursor API (the indexed
          // accessor's return type is not public); one pass, in order
          val stores =
            if (setCols.isEmpty) Nil
            else blocks.map { _ =>
              val s = r.getNextDictionaryReader()
              r.skipNextRowGroup()
              s
            }
          val blobs =
            statCols.flatMap(c => columnFooterStat(blocks, c, rows))
              .map(encodeStat) ++
            setCols.flatMap(c => columnValueSet(r, blocks.zip(stores), c))
              .map(encodeSetBlob)
          if (blobs.isEmpty) None else Some(rel -> blobs)
        } finally r.close()
      }.toOption.flatten
    }.toMap
  }

  /** One file's exact value set for `column`, from its parquet
    * dictionary pages. Usable only when EVERY column chunk is fully
    * dictionary-encoded (per EncodingStats — a PLAIN fallback page
    * means values exist outside the dictionary) and the union of
    * entries stays within [[TargetTable.MaxSetValues]]. A dictionary
    * can only OVER-state the chunk's values (entries are added on
    * occurrence; a page rewrite could orphan some), which keeps the
    * pruning conservative: membership is proof of possible presence,
    * absence is proof of absence.
    */
  private def columnValueSet(
      reader: org.apache.parquet.hadoop.ParquetFileReader,
      blocks: Seq[(org.apache.parquet.hadoop.metadata.BlockMetaData,
        org.apache.parquet.column.page.DictionaryPageReadStore)],
      column: String): Option[FileValueSet] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val schemaP = reader.getFooter.getFileMetaData.getSchema
    val per: Seq[Option[(String, Seq[String])]] = blocks.map { case (b, store) =>
      b.getColumns.asScala.find(_.getPath.toDotString == column).flatMap { c =>
        val es = c.getEncodingStats
        if (es == null || !es.hasDictionaryPages || es.hasNonDictionaryEncodedPages) None
        else scala.util.Try {
          val cd = schemaP.getColumnDescription(c.getPath.toArray)
          val dp = store.readDictionaryPage(cd)
          if (dp == null) None
          else {
            val dict = dp.getEncoding.initDictionary(cd, dp)
            val ids = 0 to dict.getMaxId
            val ann = c.getPrimitiveType.getLogicalTypeAnnotation
            // the same canonical value spaces as [[columnFooterStat]],
            // so [[canonBound]] serves both pruners
            // decimal-annotated ints store UNSCALED values; recording
            // them in the 'long' space would compare against truncated
            // query decimals (1.50 vs unscaled 150) and wrongly prune —
            // opt out, like the NANOS timestamp case
            val isDecimal =
              ann.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
            // -0.0 == 0.0 in SQL but their strings differ; normalize so
            // set membership (string equality) cannot wrongly prune
            def zNorm(d: Double): Double = if (d == 0.0) 0.0 else d
            c.getPrimitiveType.getPrimitiveTypeName match {
              case INT32 if isDecimal => None
              case INT32 =>
                Some(("long", ids.map(i => dict.decodeToInt(i).toLong.toString)))
              case INT64 if isDecimal => None
              case INT64 =>
                val scale = ann match {
                  case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    ts.getUnit match {
                      case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
                      case LogicalTypeAnnotation.TimeUnit.MICROS => 1L
                      case _ => 0L // NANOS: lossy divide, not worth it
                    }
                  case _ => 1L
                }
                if (scale == 0L) None
                else Some(("long", ids.map(i => (dict.decodeToLong(i) * scale).toString)))
              case FLOAT =>
                Some(("double", ids.map(i => zNorm(dict.decodeToFloat(i).toDouble).toString)))
              case DOUBLE =>
                Some(("double", ids.map(i => zNorm(dict.decodeToDouble(i)).toString)))
              case BINARY
                  if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                Some(("string", ids.map(i => dict.decodeToBinary(i).toStringUsingUTF8)))
              case _ => None
            }
          }
        }.toOption.flatten
      }
    }
    if (per.isEmpty || per.exists(_.isEmpty)) None
    else {
      val typ = per.flatten.head._1
      val vals = per.flatten.flatMap(_._2).distinct.sorted
      if (vals.isEmpty || vals.size > TargetTable.MaxSetValues) None
      else Some(FileValueSet(column, typ, vals))
    }
  }

  /** One column's canonical (typ, min, max) over a footer's blocks;
    * ANY block without usable stats disqualifies the whole file for
    * this column.
    */
  private def columnFooterStat(
      blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
      column: String, rows: Long): Option[FileSkipStat] = {
    import scala.jdk.CollectionConverters._
    import scala.language.existentials // parquet's Statistics[T <: Comparable[T]]
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    {
          val per: Seq[Option[(String, Any, Any)]] = blocks.map { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == column)
              .flatMap { c =>
                val st = c.getStatistics
                if (st == null || st.isEmpty || !st.hasNonNullValue) None
                else {
                  val ann = c.getPrimitiveType.getLogicalTypeAnnotation
                  // decimal-annotated ints are UNSCALED; a 'long'-space
                  // range over them would be compared against truncated
                  // query decimals and wrongly prune — opt out (same
                  // rule as [[columnValueSet]])
                  val isDecimal = ann
                    .isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
                  def lmin = st.genericGetMin.asInstanceOf[Number].longValue()
                  def lmax = st.genericGetMax.asInstanceOf[Number].longValue()
                  c.getPrimitiveType.getPrimitiveTypeName match {
                    case INT32 | INT64 if isDecimal => None
                    case INT32 => Some(("long", lmin, lmax))
                    case INT64 =>
                      val scale = ann match {
                        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                          ts.getUnit match {
                            case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
                            case LogicalTypeAnnotation.TimeUnit.MICROS => 1L
                            // NANOS would need a lossy divide whose
                            // rounding direction differs for min vs max
                            // — not worth it for a type Spark never writes
                            case _ => 0L
                          }
                        case _ => 1L
                      }
                      if (scale == 0L) None
                      else Some(("long", lmin * scale, lmax * scale))
                    case FLOAT | DOUBLE =>
                      val mn = st.genericGetMin.asInstanceOf[Number].doubleValue()
                      val mx = st.genericGetMax.asInstanceOf[Number].doubleValue()
                      if (mn.isNaN || mx.isNaN) None else Some(("double", mn, mx))
                    case BINARY
                        if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                      Some(("string",
                        st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                          .toStringUsingUTF8,
                        st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                          .toStringUsingUTF8))
                    case _ => None
                  }
                }
              }
          }
          if (per.isEmpty || per.exists(_.isEmpty)) None
          else {
            val ss = per.flatten
            val typ = ss.head._1
            def less(a: Any, b: Any): Boolean = typ match {
              case "long"   => a.asInstanceOf[Long] < b.asInstanceOf[Long]
              case "double" => a.asInstanceOf[Double] < b.asInstanceOf[Double]
              case _        => a.asInstanceOf[String] < b.asInstanceOf[String]
            }
            val mn = ss.map(_._2).reduce((a, b) => if (less(a, b)) a else b)
            val mx = ss.map(_._3).reduce((a, b) => if (less(a, b)) b else a)
            Some(FileSkipStat(column, typ, mn.toString, mx.toString, rows))
          }
    }
  }

  /** Attach per-file skip blobs (min/max stats + value sets) to staged
    * relative paths (footer reads against `base` — the stage dir,
    * BEFORE the files move). No declared columns → lines pass through
    * unchanged. Both csv args are the raw header forms.
    */
  private def enrichWithStats(
      stagedRel: Seq[String], base: Path,
      columnsCsv: Option[String],
      setColumnsCsv: Option[String]): Seq[String] =
    enrichPairsWithStats(
      stagedRel.map(r => r -> new Path(base, r)), columnsCsv, setColumnsCsv)

  /** [[enrichWithStats]] over explicit (relative path, file) pairs —
    * one blob per declared column that produced usable footer stats or
    * dictionary sets, declared order (stats first).
    */
  private def enrichPairsWithStats(
      pairs: Seq[(String, Path)], columnsCsv: Option[String],
      setColumnsCsv: Option[String]): Seq[String] = {
    def split(csv: Option[String]) =
      csv.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val statCols = split(columnsCsv)
    val setCols = split(setColumnsCsv)
    if (statCols.isEmpty && setCols.isEmpty) pairs.map(_._1)
    else {
      val blobs = footerBlobs(pairs, statCols, setCols)
      pairs.map { case (r, _) =>
        blobs.get(r).fold(r)(bs => r + bs.map("\t" + _).mkString)
      }
    }
  }

  /** Range read with DRIVER-SIDE file skipping: plans only the live
    * files whose recorded [min, max] for `column` intersects [lo, hi]
    * (inclusive), plus every file without stats — then applies the
    * exact predicate as a residual filter, so the answer never depends
    * on the stats. On a `compact(clusterBy = column)`-maintained table
    * this is the read that touches O(matching) files instead of opening
    * every live footer — the manifest analogue of the reference's
    * period-predicate pruning (`insert_by_timeperiod_helpers.sql:94-104`)
    * applied to a non-partition column.
    */
  def readWhere(column: String, lo: Any, hi: Any): DataFrame = {
    val keep = compilePruner(column, lo, hi)
    readCandidatesPruned(keep, keep)
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
      .drop(PartitionCol)
  }

  /** Candidate body lines + total live count + the effective header
    * for one pruned plan. The warm path serves from the replay cache;
    * the COLD path against a SHARDED checkpoint runs `shardKeep` (the
    * same compiled pruner — index lines carry aggregate blobs in the
    * file-line grammar) over the shard index and reads only the
    * matching shards plus the delta tail: O(matching shards), not
    * O(live). Conservative exactly like file pruning — a shard with no
    * aggregate for the column is always read, so results are identical
    * to the full replay (spec-pinned). Falls back to the full replay
    * for unsharded/pre-manifest tables.
    */
  private def planCandidates(
      shardKeep: String => Boolean): (Seq[String], Int, Seq[String]) = {
    val vs = manifestVersions().sortBy(_.key)
    def fullReplay(): (Seq[String], Int, Seq[String]) = {
      val raw = latestManifestRaw().getOrElse(Nil)
      val hdr = raw.filter(_.startsWith("#"))
      val body = raw.filterNot(_.startsWith("#"))
      (body, body.size, hdr)
    }
    if (vs.isEmpty) return (Nil, -1, Nil) // pre-manifest sentinel
    val chainId = vs.map(_.cacheKey).toVector
    replayCache match {
      case Some((t, lines)) if t == chainId =>
        val body = lines.filterNot(_.startsWith("#"))
        return (body, body.size, lines.filter(_.startsWith("#")))
      case _ => ()
    }
    val ckptIdx = vs.lastIndexWhere(!_.isDelta)
    if (ckptIdx < 0) return fullReplay()
    // checkpoint already assembled in memory (a delta landed since the
    // last replay): the full replay from cache beats re-reading shards
    ckptCache match {
      case Some((ck, _, _)) if ck == vs(ckptIdx).cacheKey => return fullReplay()
      case _ => ()
    }
    val main = readLines(vs(ckptIdx).p)
    val shardIdx = main.filter(_.startsWith("#shard="))
    if (shardIdx.isEmpty) return fullReplay()
    // Delta tail replayed into overlay state against the checkpoint,
    // mirroring latestManifestRaw's map semantics:
    //   added    — the live overlay lines (`+` sets, `-` deletes);
    //   suppress — every path that EVER saw a `-`: its checkpoint line
    //              (if any) is dead even when the path was later
    //              re-added (the overlay line supersedes it). Dropping
    //              only currently-overlaid paths is wrong: after a
    //              restat (-p,+p) a later genuine -p would find p in
    //              `added` and the stale shard line would resurface;
    //   fromCkpt — paths PROVEN to originate in the checkpoint (first
    //              touch was a `-` while not in the overlay — writers
    //              only remove live files), the exact correction the
    //              shard-count total needs without reading any shard.
    val added = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val suppress = scala.collection.mutable.HashSet.empty[String]
    val fromCkpt = scala.collection.mutable.HashSet.empty[String]
    var header: Seq[String] = main.filterNot(_.startsWith("#shard="))
    vs.drop(ckptIdx + 1).foreach { v =>
      val lines = readLines(v.p)
      if (v eq vs.last)
        header = lines.filter(l => l.startsWith("#") && l != DeltaMarker)
      lines.foreach { l =>
        if (l.startsWith("#")) ()
        else if (l.startsWith("+")) {
          val b = l.substring(1); val p = pathOf(b)
          added += p -> b
        } else if (l.startsWith("-")) {
          val p = l.substring(1)
          if (added.remove(p).isEmpty) fromCkpt += p
          suppress += p
        }
      }
    }
    // shard counts cover exactly the checkpoint paths, so: minus every
    // checkpoint path that saw a `-` (re-added or not — re-adds come
    // back via `added`), plus every overlay line. A restat nets zero,
    // matching the warm replay's count.
    val total = shardIdx.map(shardCountOf).sum - fromCkpt.size + added.size
    val candidates = shardIdx.filter(shardKeep).flatMap { sl =>
      readLines(new Path(manifestDir, shardNameOf(sl)))
    }.filter { l =>
      val p = pathOf(l); !suppress.contains(p) && !added.contains(p)
    } ++ added.values
    (candidates, total, header)
  }

  /** Pruned reader over [[planCandidates]]'s kept files, with the
    * plan's own header schema (files and schema from one chain walk,
    * like [[readRawPruned]]). Pre-manifest tables fall back to the
    * directory-read path.
    */
  private def readCandidatesPruned(
      keep: String => Boolean, shardKeep: String => Boolean): DataFrame = {
    val (cands, total, header) = planCandidates(shardKeep)
    if (total < 0) return readRawPruned(keep) // pre-manifest fallback
    val files = cands.filter(keep).map(pathOf)
    val schema = schemaOfManifestLines(header).orElse(storedSchema)
    val reader = schema
      .fold(spark.read)(s => spark.read.schema(s))
      .option("basePath", path)
    if (files.nonEmpty)
      reader.parquet(files.map(rel => new Path(path, rel).toString): _*)
    else schema match {
      case Some(s) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case None => reader.parquet(path)
    }
  }

  /** Plan-time pruning probe: (files kept for [lo, hi], total live
    * files) — the EXPLAIN-style companion to [[readWhere]]: what a
    * spec, bench, or operator asserts on without running a scan. Cold
    * against a sharded checkpoint this reads only the matching shards
    * (see [[planCandidates]]).
    */
  def planFilesForRange(
      column: String, lo: Any, hi: Any): (Seq[String], Int) = {
    val keep = compilePruner(column, lo, hi)
    val (cands, total, _) = planCandidates(keep)
    if (total < 0) (Nil, 0)
    else (cands.collect { case l if keep(l) => pathOf(l) }, total)
  }

  /** Conjunctive data-skipping read: plans only the live files whose
    * recorded ranges intersect EVERY (column, lo, hi) predicate —
    * per-file pruners AND together, each conservative on its own — then
    * applies the exact conjunction as a residual filter. On a
    * Z-ORDERED table ([[compact]] `zorder = true`) every predicate
    * prunes multiplicatively: each file covers a z-curve segment, so
    * its min/max are narrow on ALL cluster dimensions at once — the
    * multi-dimensional complement of single-key clustering.
    */
  def readWhereAll(preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "readWhereAll needs at least one predicate")
    val pruners = preds.map { case (c, lo, hi) => compilePruner(c, lo, hi) }
    val keep = (l: String) => pruners.forall(_(l))
    val residual = preds
      .map { case (c, lo, hi) => col(c) >= lit(lo) && col(c) <= lit(hi) }
      .reduce(_ && _)
    readCandidatesPruned(keep, keep)
      .filter(residual)
      .drop(PartitionCol)
  }

  /** Plan-time probe for [[readWhereAll]]: (files kept, total live). */
  def planFilesForAll(preds: Seq[(String, Any, Any)]): (Seq[String], Int) = {
    val pruners = preds.map { case (c, lo, hi) => compilePruner(c, lo, hi) }
    val keep = (l: String) => pruners.forall(_(l))
    val (cands, total, _) = planCandidates(keep)
    if (total < 0) (Nil, 0)
    else (cands.collect { case l if keep(l) => pathOf(l) }, total)
  }

  /** Declare the columns whose per-file EXACT value sets every later
    * write records (from the staged files' parquet dictionary pages —
    * see [[latestSetCol]]). The declaration is a header-only manifest
    * commit under the writer lease, carried forward by every subsequent
    * commit like the schema; files committed BEFORE the declaration
    * carry no sets and are simply never pruned (a
    * `compact(clusterBy=...)` rewrite re-stats them). Declare the
    * CATEGORICAL columns point lookups filter on — language, source,
    * event type — where min/max clustering cannot help because every
    * file spans the whole (tiny) value range.
    */
  def declareSetColumns(cols: Seq[String]): Unit = {
    require(cols.nonEmpty && cols.forall(_.nonEmpty),
      "declareSetColumns needs at least one non-empty column name")
    require(cols.forall(c => !c.contains(",") && !c.contains("\t") &&
      !c.contains("\n")), "set column names cannot contain , \\t or \\n")
    withWriterLease() {
      if (latestManifest().isEmpty) commitManifestRelist()
      commitManifestDelta(Nil, Nil, setCol = Some(cols.mkString(",")))
    }
  }

  /** Compile a membership pruner over RAW body lines: keep a file iff
    * its recorded value set for `column` intersects `values` — or it
    * records no set (prune on proof of absence only). The queried
    * values canonicalize ONCE per possible value space; per-entry work
    * is an indexOf walk plus encoded-string comparisons (no decode:
    * Base64 equality ⟺ string equality, canonical numeric strings are
    * written and queried through the same canonicalization).
    */
  private def compileSetPruner(
      column: String, values: Seq[Any]): String => Boolean = {
    val prefix = "set=" + b64(column) + ",t="
    val seek = "\t" + prefix
    // None when ANY queried value is not representable in the space —
    // then membership against that space proves nothing and the file
    // is kept (same prune-on-proof-only rule as the range pruner)
    def enc(typ: String): Option[Set[String]] = {
      val cs = values.map(v => canonBound(v, typ))
      if (cs.exists(_.isEmpty)) None
      else Some(cs.flatten.map {
        case s: String => b64(s)
        case n         => n.toString
      }.toSet)
    }
    val qLong = enc("long"); val qDouble = enc("double"); val qString = enc("string")
    (line: String) => {
      val at = line.indexOf(seek)
      if (at < 0) true
      else {
        val end0 = line.indexOf('\t', at + 1)
        val end = if (end0 < 0) line.length else end0
        val blob = line.substring(at + 1, end)
        scala.util.Try {
          val vAt = blob.indexOf(",v=", prefix.length)
          val typ = blob.substring(prefix.length, vAt)
          val query = typ match {
            case "long" => qLong
            case "double" => qDouble
            case "string" => qString
            case _ => None // unknown space: keep
          }
          query match {
            case None => true
            case Some(q) =>
              var i = vAt + 3
              var hit = false
              while (!hit && i <= blob.length) {
                val j0 = blob.indexOf(';', i)
                val j = if (j0 < 0) blob.length else j0
                if (q.contains(blob.substring(i, j))) hit = true
                i = j + 1
              }
              hit
          }
        }.getOrElse(true)
      }
    }
  }

  /** Membership read with DRIVER-SIDE file skipping: plans only the
    * live files whose recorded value set for `column` intersects
    * `values` (plus every file without a recorded set), then applies
    * the exact IN predicate as a residual filter, so the answer never
    * depends on the sets. The categorical complement of [[readWhere]]:
    * a `lang = 'de'` lookup on a set-declared table touches only the
    * files that ever stored a 'de' row — at 100 TB, the difference
    * between a language slice scanning its own shard and scanning the
    * whole corpus. NULL never matches an IN list, so dictionary sets
    * (non-null values only) prune it soundly.
    */
  def readWhereIn(column: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "readWhereIn needs at least one value")
    val keep = compileSetPruner(column, values)
    // shard index lines carry no set aggregates (sets don't summarize
    // usefully): the set pruner keeps every shard, degrading to the
    // full-body plan — identical results, no skip at the shard level
    readCandidatesPruned(keep, keep)
      .filter(col(column).isin(values: _*))
      .drop(PartitionCol)
  }

  /** Plan-time probe for [[readWhereIn]]: (files kept, total live). */
  def planFilesForIn(column: String, values: Seq[Any]): (Seq[String], Int) = {
    val keep = compileSetPruner(column, values)
    val (cands, total, _) = planCandidates(keep)
    if (total < 0) (Nil, 0)
    else (cands.collect { case l if keep(l) => pathOf(l) }, total)
  }

  /** Metadata-only COUNT(*): the sum of the per-file row counts the
    * manifest stats record — zero scan, zero footer opens — available
    * exactly when EVERY live file carries stats (None otherwise: a
    * partial sum would be a wrong answer, so the caller falls back to
    * a counted scan). The stats-backed analogue of a warehouse's
    * statistics-served `SELECT COUNT(*)`; at 100 TB the difference
    * between a metadata lookup and a million-file scan job.
    */
  def fastRowCount(): Option[Long] =
    if (latestManifest().isEmpty) None // pre-manifest: no commit to trust
    else {
      // an EMPTY manifest is an exact zero (schema-sample init);
      // any stat-less entry forfeits the whole answer — a partial sum
      // would be silently wrong
      val entries = latestManifestEntries()
      if (entries.exists(_._2.isEmpty)) None
      else Some(entries.map(_._2.head.rows).sum)
    }

  /** Writer epoch this instance's held lease was acquired under (None
    * when no lease is held). Every acquire takes a STRICTLY NEWER epoch
    * than any epoch ever committed or recorded in the lease it replaces
    * ([[acquireWriterLease]]); commits are fenced epoch-major
    * ([[commitVersion]]), so a holder that lost a takeover race can
    * never land the latest manifest.
    */
  @volatile private var heldEpoch: Option[Long] = None

  private def fenced(latestEpoch: Long): Nothing = {
    val e = new IllegalStateException(
      s"target $path: manifest commit fenced — a newer writer epoch " +
        s"($latestEpoch > held ${heldEpoch.getOrElse(-1L)}) has committed, " +
        "meaning this holder's lease was taken over; aborting rather than " +
        "publishing a stale writer's files")
    leaseLost = Some(e)
    heldLeaseId = None
    heldEpoch = None
    throw e
  }

  private def versionName(epoch: Long, seq: Long, isDelta: Boolean): String =
    f"v$epoch%010d_$seq%010d." + (if (isDelta) "delta" else "list")

  /** Land `content` as the next manifest version: write to a tmp name,
    * rename to a fresh versioned name (atomic — readers see the old or
    * the new version, never a torn one), prune versions no longer
    * needed for replay ([[pruneVersions]]). Mutators run under the
    * writer lease; `synchronized` additionally serializes in-process
    * concurrent period appends sharing this instance.
    *
    * THE ZOMBIE-WRITER FENCE lives here. The lease file alone cannot
    * stop a holder that lost a takeover race from committing before its
    * next heartbeat check (file primitives have no compare-and-swap —
    * the residual race [[heartbeatLease]] documents). The commit layer
    * closes it:
    *  - versions are ordered EPOCH-MAJOR, and every takeover bumps the
    *    epoch and immediately SEALS the current state as a checkpoint
    *    under the new epoch ([[acquireWriterLease]]) — so a stale
    *    holder's later commit (lower epoch) is born shadowed: replay
    *    starts at the seal and never reads it;
    *  - pre-rename, a held-lease commit whose epoch trails the latest
    *    committed epoch aborts ([[fenced]] — it also poisons the held
    *    lease so the run dies at this commit, not a later one);
    *  - post-rename, a commit that raced the seal itself (listed before
    *    the seal landed, renamed after) detects the newer epoch, deletes
    *    its own — already shadowed — version, and aborts; a LEASE-LESS
    *    caller (outside the runner discipline) re-lands its content
    *    under the newer epoch instead — `content` is a THUNK re-invoked
    *    per attempt, so a fold/checkpoint re-land recomputes from the
    *    now-current state and can never resurrect a listing the
    *    newer-epoch writer already changed;
    *  - post-rename, a held-lease commit also re-verifies LEASE
    *    ownership. This closes the one interleaving the epoch listing
    *    alone cannot see: a zombie whose rename AND post-rename listing
    *    both land inside the takeover seal's read→rename window would
    *    otherwise report success (and clear its append marker) while
    *    the seal shadows its version. The lease file is replaced at
    *    claim time, strictly BEFORE the seal reads its basis — so
    *    either the zombie's post-rename lease read sees the foreign id
    *    (roll back own version, abort; the kept marker lets repair roll
    *    the files back) or the claim had not happened yet and the
    *    seal's basis legitimately includes the zombie's version. An
    *    unreadable lease here is conservatively treated as lost: only a
    *    claimant mid-claim can make it unreadable (our own heartbeat
    *    rewrite shares this monitor).
    */
  /** Truly-atomic create-if-absent — the claim primitive the concurrent
    * commit protocol rests on. Hadoop's `create(overwrite = false)` is
    * atomic on HDFS-like stores, but on the local filesystem it is an
    * exists-check followed by a create (TOCTOU), and local RENAME is
    * POSIX rename(2), which silently REPLACES an existing destination —
    * so neither primitive alone can arbitrate concurrent committers
    * there. For local paths this drops to `File.createNewFile`
    * (O_CREAT|O_EXCL — atomic by contract).
    */
  private def atomicCreate(p: Path, token: String): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      val f = new java.io.File(p.toUri.getPath)
      try {
        if (!f.createNewFile()) false
        else {
          // write the owner token into the just-created claim: the
          // create is what arbitrates (O_CREAT|O_EXCL); the token write
          // is un-raced because a sweeper only touches claims older
          // than CommitClaimStaleMs and this one is microseconds old
          val out = new java.io.FileOutputStream(f)
          try out.write(token.getBytes("UTF-8")) finally out.close()
          true
        }
      }
      catch { case _: java.io.IOException =>
        // a token-write failure AFTER the create would leave an
        // owner-less claim stalling every committer at this sequence
        // until the staleness sweep — reap our own litter before
        // reporting the loss (best-effort: a failure here degrades to
        // exactly the stale-claim wait the sweep already bounds)
        scala.util.Try(f.delete())
        false
      }
    case _ =>
      var created = false
      try {
        val out = fs.create(p, false)
        created = true
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      }
      catch { case _: java.io.IOException =>
        if (created) scala.util.Try(fs.delete(p, false))
        false
      }
  }

  /** Whether the claim file still exists AND carries `token` — the
    * ownership re-check a committer runs just before its version
    * rename (see [[commitVersion]] step 4a).
    */
  private def ownsClaim(claim: Path, token: String): Boolean =
    scala.util.Try(readLines(claim).headOption).toOption.flatten
      .contains(token)

  /** Land one version under the concurrent-commit protocol. Writers —
    * lease-holding or lease-less ([[appendConcurrent]], background
    * folds) — serialize per SEQUENCE through a claim file, because a
    * bare rename cannot arbitrate them: local-FS rename REPLACES an
    * existing destination (a same-sequence rival would clobber a
    * landed commit — observed as a lost commit + CRC mismatch under a
    * 4-writer storm), and a checkpoint and a delta at one sequence have
    * different file names, so their renames never collide at all (a
    * stale fold could then shadow a raced delta). The protocol:
    *
    *  1. list → next seq = max + 1;
    *  2. CLAIM that seq ([[atomicCreate]] of a dot-file keyed by epoch
    *     and seq — losers re-list and spin; a claim older than
    *     [[TargetTable.CommitClaimStaleMs]] is a crashed writer's and
    *     is swept);
    *  3. under the claim, re-verify the seq is STILL fresh (a rival
    *     may have landed between the list and the claim — or this
    *     writer may hold a stale seq from an earlier listing);
    *  4. evaluate the content thunk (optimistic committers run their
    *     conflict validation here — nothing can land at this seq while
    *     the claim is held, so check→rename is atomic), write the tmp
    *     file;
    *  4a. RE-VERIFY claim ownership by token just before the rename:
    *     the claim carries its owner's token, and a thunk outliving
    *     [[TargetTable.CommitClaimStaleMs]] (a checkpoint fold writes
    *     O(live) lines under its claim — seconds at the 10M-entry
    *     decade on a slow store) can be swept and usurped; a bare
    *     local-FS rename would then REPLACE the usurper's landed
    *     same-name version — a lost commit. A non-owned claim aborts
    *     the attempt (tmp deleted, loop re-lists) instead of renaming;
    *  5. post-rename epoch/lease fences as before; release the claim —
    *     only if still owned, so a swept writer never deletes its
    *     usurper's fresh claim.
    *
    * Residual window, documented: a writer pausing between its
    * ownership re-check and its rename (two adjacent metadata ops, no
    * data work) can still be swept and clobber — the same zombie class
    * the lease's settle window bounds, now vanishingly rare because the
    * O(content) work is fenced by the token check.
    */
  /** Split an oversized checkpoint body into shard files + an indexed
    * main content (see [[TargetTable.CheckpointShardLines]]). Shards
    * are written HERE — before the main file's rename publishes them;
    * the caller deletes them if its attempt aborts. Index lines carry
    * per-declared-column aggregate stat blobs in the SAME grammar as
    * file lines, computed only when EVERY line in the shard has that
    * column's blob (a shard with any stat-less line gets no aggregate
    * and is always read — prune on proof only, like files).
    */
  private def shardCheckpointContent(
      name: String, body: String,
      heartbeat: () => Unit = () => ()): (String, Seq[Path]) = {
    // Offset-based streaming over the (possibly multi-GB) content
    // string: at 10M lines, materializing a split() array plus
    // per-shard mkString copies OOMs an 8g driver — instead the header
    // boundary, the line count, and each shard's bytes are found and
    // written by index walks, with only one transient substring per
    // line for the aggregate extractor.
    val n = body.length
    // header = leading '#' lines
    var headerEnd = 0
    while (headerEnd < n && body.charAt(headerEnd) == '#') {
      val nl = body.indexOf('\n', headerEnd)
      headerEnd = if (nl < 0) n else nl + 1
    }
    // count body lines without allocating
    var bodyLines = 0
    var i = headerEnd
    while (i < n) {
      val nl = body.indexOf('\n', i)
      if (nl > i) bodyLines += 1 // skip empty lines, like split+filter did
      i = if (nl < 0) n else nl + 1
    }
    if (bodyLines <= CheckpointShardLines) (body, Nil)
    else {
      val header = body.substring(0, headerEnd)
      val statCols = statsColOfLines(header.linesIterator.toSeq).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      val id = java.util.UUID.randomUUID().toString.take(8)
      val written = scala.collection.mutable.ArrayBuffer.empty[Path]
      val indexLines = scala.collection.mutable.ArrayBuffer.empty[String]
      try {
        var pos = headerEnd
        var shardIdx = 0
        while (pos < n) {
          val fname = f"$name.shard$shardIdx%05d-$id"
          val p = new Path(manifestDir, fname)
          val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8),
            1 << 16)
          var count = 0
          val aggs = statCols.map(c => new ShardAgg(c))
          try {
            while (pos < n && count < CheckpointShardLines) {
              val nl = body.indexOf('\n', pos)
              val end = if (nl < 0) n else nl
              if (end > pos) {
                out.write(body, pos, end - pos)
                out.write('\n')
                count += 1
                if (aggs.nonEmpty) {
                  // one short-lived substring per line, GC-transient
                  val line = body.substring(pos, end)
                  aggs.foreach(_.add(line))
                }
              }
              pos = if (nl < 0) n else nl + 1
            }
          } finally out.close()
          heartbeat() // keep the commit claim visibly live per shard
          written += p
          indexLines += s"#shard=$fname\t$count" +
            aggs.flatMap(_.blob()).map("\t" + _).mkString
          shardIdx += 1
        }
        ((header.linesIterator.toSeq ++ indexLines).mkString("", "\n", "\n"),
          written.toSeq)
      } catch {
        case e: Throwable =>
          written.foreach(p => scala.util.Try(fs.delete(p, false)))
          throw e
      }
    }
  }

  /** [[shardCheckpointContent]] for a STREAMED body: consume sorted
    * body lines from the iterator, deciding shard-vs-inline from the
    * first [[TargetTable.CheckpointShardLines]]+1 lines (the only
    * buffering — ~1M strings, bounded regardless of table size).
    * Returns the main file's LINES (header + body when small, header +
    * `#shard=` index lines when sharded) plus the shard paths written;
    * aborted attempts delete their own shards, exactly like the
    * materialized twin.
    */
  private def shardCheckpointStream(
      name: String, header: Seq[String], body: Iterator[String],
      heartbeat: () => Unit): (Seq[String], Seq[Path]) = {
    val first = new scala.collection.mutable.ArrayBuffer[String]
    while (body.hasNext && first.size <= CheckpointShardLines)
      first += body.next()
    if (first.size <= CheckpointShardLines) (header ++ first, Nil)
    else {
      val statCols = statsColOfLines(header).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      val id = java.util.UUID.randomUUID().toString.take(8)
      val written = scala.collection.mutable.ArrayBuffer.empty[Path]
      val indexLines = scala.collection.mutable.ArrayBuffer.empty[String]
      val all = first.iterator ++ body
      try {
        var shardIdx = 0
        while (all.hasNext) {
          val fname = f"$name.shard$shardIdx%05d-$id"
          val p = new Path(manifestDir, fname)
          val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8),
            1 << 16)
          var count = 0
          val aggs = statCols.map(c => new ShardAgg(c))
          try {
            while (all.hasNext && count < CheckpointShardLines) {
              val line = all.next()
              out.write(line)
              out.write('\n')
              count += 1
              aggs.foreach(_.add(line))
            }
          } finally out.close()
          heartbeat() // keep the commit claim visibly live per shard
          written += p
          indexLines += s"#shard=$fname\t$count" +
            aggs.flatMap(_.blob()).map("\t" + _).mkString
          shardIdx += 1
        }
        (header ++ indexLines, written.toSeq)
      } catch {
        case e: Throwable =>
          written.foreach(p => scala.util.Try(fs.delete(p, false)))
          throw e
      }
    }
  }

  /** Streaming per-shard aggregate accumulator for one declared stats
    * column — the allocation-light positional walk the hot pruner
    * uses, fed one line at a time (see [[shardCheckpointContent]]).
    * Yields a blob only when EVERY line carried the column's stat.
    */
  private final class ShardAgg(c: String) {
    private val seek = "\tcol=" + b64(c) + ",t="
    private var typ: String = null
    private var ok = true
    private var minL = Long.MaxValue; private var maxL = Long.MinValue
    private var minD = Double.PositiveInfinity
    private var maxD = Double.NegativeInfinity
    private var minS: String = null; private var maxS: String = null
    private var rows = 0L

    def add(line: String): Unit = if (ok) {
      val at = line.indexOf(seek)
      if (at < 0) ok = false
      else {
        val end0 = line.indexOf('\t', at + 1)
        val end = if (end0 < 0) line.length else end0
        val blob = line.substring(at + 1, end)
        ok = scala.util.Try {
          val pLen = seek.length - 1 // blob starts at "col="
          val tEnd = blob.indexOf(",min=", pLen)
          val t = blob.substring(pLen, tEnd)
          if (typ == null) typ = t
          if (typ != t) false
          else {
            val mEnd = blob.indexOf(",max=", tEnd + 5)
            val minV = blob.substring(tEnd + 5, mEnd)
            val rEnd = blob.indexOf(",rows=", mEnd + 5)
            val maxV = blob.substring(mEnd + 5, rEnd)
            rows += blob.substring(rEnd + 6).toLong
            t match {
              case "long" =>
                val lo = minV.toLong; val hi = maxV.toLong
                if (lo < minL) minL = lo
                if (hi > maxL) maxL = hi
              case "double" =>
                val lo = minV.toDouble; val hi = maxV.toDouble
                if (lo < minD) minD = lo
                if (hi > maxD) maxD = hi
              case "string" =>
                val lo = unb64(minV); val hi = unb64(maxV)
                if (minS == null || lo.compareTo(minS) < 0) minS = lo
                if (maxS == null || hi.compareTo(maxS) > 0) maxS = hi
              case _ => typ = "?"
            }
            typ != "?"
          }
        }.getOrElse(false)
      }
    }

    def blob(): Option[String] =
      if (!ok || typ == null) None
      else typ match {
        case "long"   => Some(encodeStat(FileSkipStat(c, "long",
          minL.toString, maxL.toString, rows)))
        case "double" => Some(encodeStat(FileSkipStat(c, "double",
          minD.toString, maxD.toString, rows)))
        case "string" =>
          Some(encodeStat(FileSkipStat(c, "string", minS, maxS, rows)))
        case _        => None
      }
  }

  /** Shard file name of one `#shard=` index line. */
  private def shardNameOf(indexLine: String): String = {
    val start = "#shard=".length
    val end0 = indexLine.indexOf('\t', start)
    if (end0 < 0) indexLine.substring(start) else indexLine.substring(start, end0)
  }

  /** Declared line count of one `#shard=` index line. */
  private def shardCountOf(indexLine: String): Int = {
    val t1 = indexLine.indexOf('\t')
    if (t1 < 0) 0
    else {
      val t2 = indexLine.indexOf('\t', t1 + 1)
      val end = if (t2 < 0) indexLine.length else t2
      indexLine.substring(t1 + 1, end).toInt
    }
  }

  /** A version's full content with shards resolved: the main file's
    * header (index lines dropped) plus every shard's lines in index
    * order — what [[readLines]] returned when checkpoints were single
    * files. Deltas and unsharded checkpoints pass through untouched.
    */
  private def readVersionLines(v: ManifestVersion): Seq[String] = {
    val main = readLines(v.p)
    if (v.isDelta || !main.exists(_.startsWith("#shard="))) main
    else {
      // shards are immutable independent files: read them in parallel
      // (a 10-shard 1.5 GB checkpoint replays several times faster
      // than a sequential walk), results concatenated in index order
      val names = main.filter(_.startsWith("#shard=")).map(shardNameOf)
      val results = new Array[Seq[String]](names.size)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(8, names.size)))
      try {
        val futs = names.zipWithIndex.map { case (nm, i) =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit =
              results(i) = readLines(new Path(manifestDir, nm))
          })
        }
        futs.foreach { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause // surface the IO error, not the wrapper
          }
        }
      } finally pool.shutdown()
      main.filterNot(_.startsWith("#shard=")) ++ results.toSeq.flatten
    }
  }

  private def commitVersion(
      content: () => TargetTable.ManifestContent,
      isDelta: Boolean): Unit = synchronized {
    if (!fs.exists(manifestDir)) fs.mkdirs(manifestDir)
    // lost claim races are NORMAL under concurrent committers, and a
    // rival may legitimately hold its claim for its whole content
    // evaluation (a fold writes O(live) lines) — so the bound is TIME
    // spent waiting, not a race count
    val spinDeadline = System.currentTimeMillis() + LeaseStaleMs
    var epochRaces = 0
    while (true) {
      val vs = manifestVersions()
      val latestEpoch = vs.map(_.epoch).maxOption.getOrElse(0L)
      heldEpoch.foreach(e => if (latestEpoch > e) fenced(latestEpoch))
      val epoch = heldEpoch.getOrElse(latestEpoch)
      val seq = vs.map(_.seq).maxOption.getOrElse(0L) + 1
      val name = versionName(epoch, seq, isDelta)
      val claim = new Path(manifestDir, f".claim_$epoch%019d_$seq%019d")
      def spinCheck(): Unit =
        if (System.currentTimeMillis() > spinDeadline)
          throw new IllegalStateException(
            s"could not commit manifest $name under $manifestDir within " +
              s"${LeaseStaleMs / 1000}s of claim contention — commit storm " +
              "or stuck store?")
      val token = java.util.UUID.randomUUID().toString
      val claimedAt = System.currentTimeMillis()
      // a sweeper only touches claims older than CommitClaimStaleMs,
      // so within half that window the claim is PROVABLY still ours —
      // no verification read needed. Only long thunks (folds) pay the
      // ownership read.
      def surelyOwns(): Boolean =
        System.currentTimeMillis() - claimedAt < CommitClaimStaleMs / 2 ||
          ownsClaim(claim, token)
      var landedShards: Seq[Path] = Nil
      if (!atomicCreate(claim, token)) {
        // seq contended: normal under concurrent lease-less committers.
        // Sweep a crashed owner's stale claim; otherwise yield briefly
        // and re-list (the winner's version advances the seq).
        val stale = scala.util.Try(fs.getFileStatus(claim).getModificationTime)
          .toOption.exists(System.currentTimeMillis() - _ > CommitClaimStaleMs)
        if (stale) fs.delete(claim, false) else Thread.sleep(5)
        spinCheck()
      } else {
        var landed = false
        try {
          // under the claim: re-verify the seq is still the frontier
          // (a rival landed between our listing and our claim, or our
          // own listing was stale)
          val fresh = manifestVersions()
          if (fresh.map(_.seq).maxOption.getOrElse(0L) >= seq ||
              fresh.map(_.epoch).maxOption.getOrElse(0L) > epoch) {
            spinCheck()
          } else {
            // the thunk runs while the claim is held and BEFORE any tmp
            // file exists: optimistic commits carry their conflict check
            // inside it (nothing can land at this seq meanwhile, so
            // check→rename is effectively compare-and-swap), and a
            // thrown conflict leaves zero litter behind
            // oversized checkpoints shard: sibling files written now,
            // published only by the main rename below (readers resolve
            // them through the #shard index; aborted attempts delete
            // their own shards — never another attempt's)
            // per-shard claim heartbeat: a multi-GB fold legitimately
            // outlives CommitClaimStaleMs; touching the claim's mtime
            // as each shard lands keeps sweepers off a LIVE fold (the
            // owner token already prevents the clobber; this prevents
            // the sweep-abort-retry livelock)
            val hb = () => {
              scala.util.Try(
                fs.setTimes(claim, System.currentTimeMillis(), -1))
              ()
            }
            // main-file body: Left = one materialized string (deltas,
            // listing-backed checkpoints), Right = lines (streamed
            // folds — never one O(live) JVM object on this path)
            val (body, myShards) = content() match {
              case TargetTable.InlineContent(raw) =>
                if (isDelta) (Left(raw), Nil)
                else {
                  val (b, s) = shardCheckpointContent(name, raw, hb)
                  (Left(b), s)
                }
              case TargetTable.StreamedContent(header, lines) =>
                val (main, s) = shardCheckpointStream(name, header, lines, hb)
                (Right(main), s)
            }
            def dropShards(): Unit =
              myShards.foreach(p => scala.util.Try(fs.delete(p, false)))
            val tmp = new Path(manifestDir,
              s".$name-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
            val out = fs.create(tmp, true)
            try body match {
              case Left(s) => out.write(s.getBytes("UTF-8"))
              case Right(lines) =>
                val w = new java.io.BufferedWriter(
                  new java.io.OutputStreamWriter(out,
                    java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
                lines.foreach { l => w.write(l); w.write('\n') }
                w.flush()
            } finally out.close()
            // step 4a: the thunk may have outlived the claim staleness
            // (a fold writes O(live) lines) and been swept — renaming
            // anyway would clobber a usurper's landed version on a
            // local FS (rename replaces). Abort the attempt instead.
            if (!surelyOwns()) {
              fs.delete(tmp, false)
              dropShards()
              spinCheck()
            } else if (!fs.rename(tmp, new Path(manifestDir, name))) {
              fs.delete(tmp, false)
              dropShards()
              throw new IllegalStateException(
                s"could not rename manifest version $name into place under " +
                  s"$manifestDir despite holding the sequence claim — stuck store?")
            } else { landedShards = myShards; landed = true }
          }
        } finally if (surelyOwns()) fs.delete(claim, false)
        if (landed) {
        val after = manifestVersions()
        val epochAfter = after.map(_.epoch).maxOption.getOrElse(0L)
        val leaseOk = heldLeaseId.forall(id =>
          scala.util.Try(readKv(leaseFile, required = Seq("lease_id")))
            .toOption.flatten.flatMap(_.get("lease_id")).contains(id))
        if (epochAfter > epoch || !leaseOk) {
          fs.delete(new Path(manifestDir, name), false)
          landedShards.foreach(p => scala.util.Try(fs.delete(p, false)))
          if (heldEpoch.isDefined && !leaseOk && epochAfter <= epoch) {
            // diagnose the lease loss as what it is (a claimant replaced
            // or clobbered the lease mid-commit) — the epoch message
            // would claim a newer epoch that does not exist
            val e = new IllegalStateException(
              s"target $path: manifest commit fenced — lease ownership " +
                "could not be verified after the version rename (a rival " +
                "claim landed mid-commit); this version was rolled back, " +
                "retry once the other writer completes")
            leaseLost = Some(e)
            heldLeaseId = None
            heldEpoch = None
            throw e
          }
          if (heldEpoch.isDefined) fenced(math.max(epochAfter, epoch))
          epochRaces += 1
          if (epochRaces >= 5) throw new IllegalStateException(
            s"could not commit manifest under $manifestDir: repeatedly " +
              s"outpaced by newer writer epochs (now $epochAfter)")
          // lease-less caller: loop and re-land (recomputed) content
          // under the newer epoch
        } else {
          pruneVersions(after)
          return
        }
        }
      }
    }
  }

  /** Drop versions no reader can still need. The unit of protection is
    * a STATE, not a file: a reader replays the newest checkpoint AT OR
    * BEFORE its chosen version plus the deltas up to it, so pruning
    * must retain the full replay CHAIN of each of the newest
    * [[TargetTable.ManifestKeep]] states — the same reader window the
    * single-file design gave (a reader's plan survives ManifestKeep
    * subsequent commits), which a naive keep-newest-K-files rule
    * breaks: the fold commit would delete the very checkpoint a
    * concurrently-planning reader is mid-replay on.
    */
  private def pruneVersions(listed: Seq[ManifestVersion] = Nil): Unit = {
    val vs = (if (listed.nonEmpty) listed else manifestVersions()).sortBy(_.key)
    // the oldest protected state, and the checkpoint its replay starts
    // from; no checkpoint at or before it -> keep everything
    val oldestProtected = vs.size - ManifestKeep
    if (oldestProtected > 0) {
      val base = vs.take(oldestProtected + 1).lastIndexWhere(!_.isDelta)
      if (base > 0) vs.take(base).foreach(v => fs.delete(v.p, false))
    }
    // shard hygiene: a shard whose main `.list` no longer exists is a
    // pruned checkpoint's or a crashed attempt's litter. Reap the OLD
    // ones only — a fresh main-less shard may be a live committer's
    // pre-rename work. Amortized to the fold cadence (orphan shards
    // can only arise from sharded folds), so the hot delta commit pays
    // no extra directory listing.
    if (vs.map(_.seq).maxOption.exists(_ % ManifestCheckpointEvery == 0)) {
      val liveMains = vs.map(_.p.getName).toSet
      fs.listStatus(manifestDir).foreach { st =>
        val n = st.getPath.getName
        val dot = n.indexOf(".shard")
        if (dot > 0 && !liveMains.contains(n.substring(0, dot)) &&
            System.currentTimeMillis() - st.getModificationTime > CommitClaimStaleMs)
          fs.delete(st.getPath, false)
      }
    }
  }

  /** Commit `files` as the next manifest CHECKPOINT (the full live set;
    * resets the replay chain). Every commit embeds the table schema as
    * a `#schema=` header (the current sidecar schema unless the
    * mutation carries a new one), so the reader-facing schema and file
    * set switch in the SAME atomic rename — a full refresh or widening
    * rewrite can change both without a mixed old-schema/new-files
    * instant ([[readRaw]]).
    */
  private def commitManifest(
      files: Seq[String], schema: Option[StructType] = storedSchema,
      statsCol: Option[String] = null): Unit = {
    // null sentinel = "carry the newest header's stats column forward"
    // (one cheap header read), evaluated only when the caller doesn't
    // already hold it; None explicitly clears. The set-column header is
    // ALWAYS carried — only [[declareSetColumns]] ever changes it.
    val sc = if (statsCol == null) latestStatsCol() else statsCol
    val vc = latestSetCol()
    commitVersion(
      () => TargetTable.InlineContent(
        (schema.map("#schema=" + _.json).toSeq ++
          sc.map("#statscol=" + _).toSeq ++
          vc.map("#setcol=" + _).toSeq ++ files.distinct.sorted)
          .mkString("", "\n", "\n")),
      isDelta = false)
  }

  /** Commit an incremental change as a DELTA version — O(add + remove)
    * text I/O regardless of how many files the table holds, which is
    * what keeps the per-period commit flat as a 100 TB target
    * accumulates years of partitions. Every
    * [[TargetTable.ManifestCheckpointEvery]] commits the chain folds
    * into a fresh checkpoint (one O(live) write, amortized away), which
    * also bounds the replay tail readers pay. `schema=None` carries the
    * newest committed header forward (a one-line read, not a replay);
    * an explicit schema rides the delta and switches atomically with
    * the file change exactly like a checkpoint's.
    */
  private def commitManifestDelta(
      add: Seq[String], remove: Seq[String],
      schema: Option[StructType] = None,
      statsCol: Option[String] = None,
      setCol: Option[String] = None,
      preCheck: () => Unit = () => (),
      recomputeRemove: Option[() => Seq[String]] = None): Unit = synchronized {
    val vs = manifestVersions().sortBy(_.key)
    val lastCkpt = vs.lastIndexWhere(!_.isDelta)
    val deltaRun = vs.size - 1 - lastCkpt
    def headerLines(): Seq[String] = {
      // ONE newest-header probe feeds all carried fields
      val latest = latestHeaderLines()
      schema.orElse(schemaOfManifestLines(latest)).orElse(storedSchema)
        .map("#schema=" + _.json).toSeq ++
        statsCol.orElse(statsColOfLines(latest)).map("#statscol=" + _).toSeq ++
        setCol.orElse(setColOfLines(latest)).map("#setcol=" + _).toSeq
    }
    if (lastCkpt < 0) {
      // no checkpoint to chain from (first post-upgrade commit): fold
      // synchronously. The content is a THUNK: a lease-less re-land
      // after losing an epoch race recomputes from the then-current
      // replay instead of resurrecting the pre-race listing
      // (commitVersion re-invokes it). Full BODY lines, so per-file
      // stats survive the fold. preCheck runs first, per attempt —
      // an optimistic committer's conflict validation, made effectively
      // compare-and-swap by commitVersion's rename-fails-if-exists;
      // recomputeRemove likewise re-derives a replace's removal set
      // against the then-current chain.
      commitVersion(
        () => { preCheck()
          val removeSet = recomputeRemove.fold(remove)(f => f()).toSet
          TargetTable.InlineContent((headerLines() ++
          (latestManifestBody().filterNot(l => removeSet(pathOf(l))) ++ add)
            .distinct.sorted).mkString("", "\n", "\n")) },
        isDelta = false)
    } else {
      commitVersion(
        () => { preCheck()
          val rm = recomputeRemove.fold(remove)(f => f())
          val body = rm.distinct.sorted.map("-" + _) ++
            add.distinct.sorted.map("+" + _)
          TargetTable.InlineContent((DeltaMarker +: (headerLines() ++ body))
            .mkString("", "\n", "\n")) },
        isDelta = true)
      // fold OFF the commit path: the hot commit stays O(staged names)
      // even on the every-Nth commit — the O(live) checkpoint write
      // happens on the background thread, overlapping the caller's next
      // Spark job, serialized against commits by the instance monitor
      if (deltaRun + 1 >= ManifestCheckpointEvery) scheduleFold()
    }
  }

  /** One pending background fold at a time (newSingleThreadExecutor
    * also serializes them); a fold that fails or is lost to a crash is
    * simply re-scheduled by a later commit — the delta chain stays
    * replayable at any length, the checkpoint only bounds its cost.
    */
  @volatile private[ibtp] var foldPending = false
  private lazy val foldExecutor = java.util.concurrent.Executors
    .newSingleThreadExecutor(r => {
      val t = new Thread(r, s"graft-manifest-fold-${new Path(path).getName}")
      t.setDaemon(true)
      t
    })

  private def scheduleFold(): Unit = if (!foldPending) {
    foldPending = true
    foldExecutor.submit(new Runnable {
      def run(): Unit =
        try foldToCheckpoint()
        catch {
          case e: Throwable => TargetTable.log.warn(
            s"background manifest fold on $path failed " +
              s"(a later commit re-schedules it): $e")
        } finally foldPending = false
    })
    ()
  }

  /** Fold the current delta chain into a fresh checkpoint if one is
    * (still) due — the async half of [[commitManifestDelta]]. Runs
    * under the instance monitor like every commit; re-checks the chain
    * length inside it, so a fold that raced another fold (or a replace
    * that already checkpointed) degrades to a no-op. Safe without the
    * lease: commitVersion re-lands a lease-less fold under a newer
    * epoch with recomputed content.
    */
  private[ibtp] def foldToCheckpoint(force: Boolean = false): Unit = synchronized {
    val vs = manifestVersions().sortBy(_.key)
    val lastCkpt = vs.lastIndexWhere(!_.isDelta)
    if (vs.nonEmpty && (lastCkpt < 0 || force ||
        vs.size - 1 - lastCkpt >= ManifestCheckpointEvery)) {
      def headerLines(): Seq[String] = {
        val latest = latestHeaderLines()
        schemaOfManifestLines(latest).orElse(storedSchema)
          .map("#schema=" + _.json).toSeq ++
          statsColOfLines(latest).map("#statscol=" + _).toSeq ++
          setColOfLines(latest).map("#setcol=" + _).toSeq
      }
      def materialized() = TargetTable.InlineContent(
        (headerLines() ++ latestManifestBody().distinct.sorted)
          .mkString("", "\n", "\n"))
      // the fold streams: sorted-merge the previous checkpoint's line
      // stream with the delta-tail overlay, feeding the shard writer
      // directly — O(tail) driver memory at ANY live-file count (the
      // materialized twin peaked at ~6 GB transient at 10M files and
      // overflows String at ~14M). The merge self-checks the
      // sorted/dedup invariant; on violation (a corrupt or foreign
      // checkpoint) it falls back to the materialized fold, trading
      // memory for correctness.
      try commitVersion(
        () => streamedFoldBody().fold[TargetTable.ManifestContent](
          materialized())(TargetTable.StreamedContent(headerLines(), _)),
        isDelta = false)
      catch {
        case e: TargetTable.UnsortedCheckpointException =>
          TargetTable.log.warn(s"streamed manifest fold on $path: ${e.getMessage}")
          commitVersion(() => materialized(), isDelta = false)
      }
    }
  }

  private def isDataFileName(n: String): Boolean =
    !n.startsWith("_") && !n.startsWith(".")

  private def allPartitionDirs(): Seq[Path] = {
    val p = new Path(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(s"$PartitionCol="))
  }

  /** List current data files of `dirs` as relative paths, excluding
    * trash-parked replacements (still on disk for pinned readers, no
    * longer live).
    */
  private def listLiveFiles(dirs: Seq[Path], trashed: Set[String]): Seq[String] =
    dirs.flatMap { d =>
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq
        .filter(st => st.isFile && isDataFileName(st.getPath.getName))
        .map(st => s"${d.getName}/${st.getPath.getName}")
        .filterNot(trashed.contains)
    }

  private def trashedFiles(): Set[String] =
    if (!fs.exists(trashDir)) Set.empty
    else fs.listStatus(trashDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".list"))
      .flatMap(st => readLines(st.getPath)).toSet

  /** Commit an append: the prior manifest's entries plus exactly the
    * staged file names — ZERO directory LISTs on the hot per-period
    * path, and no relist means files a crashed non-intent writer left
    * in a touched directory can never be silently absorbed as live
    * rows (the duplicate-row class [[repairOrphanedAppends]] rolls
    * back). Falls back to a full re-list when no manifest exists yet
    * (pre-manifest upgrade — there the staged files are already on
    * disk and the relist covers the whole table).
    */
  private[ibtp] def commitManifestAppended(stagedRel: Seq[String]): Unit = synchronized {
    // synchronized: a crashed compaction's/replace's staged-but-
    // uncommitted files must not be absorbed into a fresh listing as if
    // they were live rows, and two concurrent period appends must land
    // distinct versions (the delta form makes the read-modify-write of
    // the single-file era unnecessary: each append commits ONLY its own
    // staged names — O(staged) text I/O, no relist, no O(live) rewrite)
    if (fs.exists(compactIntentFile)) repairOrphanedCompact()
    if (fs.exists(intentFile)) repairOrphanedReplace()
    if (manifestVersions().isEmpty) commitManifestRelist()
    else
      // appends never change the schema: the delta carries the newest
      // committed header forward (every sidecar change re-commits a
      // header, so it is current)
      commitManifestDelta(add = stagedRel, remove = Nil)
  }

  /** Commit a manifest from a full directory relist, absorbing files a
    * non-manifest writer (an older library version, an external tool)
    * dropped into the partition directories — the documented remedy
    * for the mixed-version caveat on [[datePartitions]]. Lease-guarded
    * and repair-first, so a crashed mutation's staged-but-uncommitted
    * files are rolled back rather than absorbed as live rows.
    */
  def relistManifest(): Unit = withWriterLease() {
    // replace repair first: a crashed schema-changing replace's sidecar
    // sync must land before the append rollback's header-carry fallback
    // (or the relist commit) can read a stale stored schema
    repairOrphanedReplace()
    repairOrphanedAppends()
    repairOrphanedConcurrentReplaces()
    // a FRESH optimistic marker is a live lease-less writer mid-flight
    // (repairOrphanedAppends deliberately skipped it): its moved-but-
    // uncommitted files are on disk, and this relist would absorb them
    // as live rows NOW and the writer's own commit would publish them
    // AGAIN — silent duplicates. Refuse; the window closes within
    // OptAppendStaleMs either by the writer's commit or by repair.
    val fresh = freshOptimisticMarkers()
    if (fresh.nonEmpty)
      throw new IllegalStateException(
        s"relistManifest on $path: ${fresh.size} fresh optimistic-writer " +
          s"intent marker(s) present (${fresh.map(_.getName).take(3).mkString(", ")}) " +
          "— a lease-less append/replace is likely in flight and a relist " +
          "would absorb its un-committed files as duplicate live rows; " +
          s"retry after it commits (markers go stale after " +
          s"${OptAppendStaleMs / 60000} min and then repair cleanly)")
    commitManifestRelist()
  }

  /** Optimistic-writer intent markers young enough to belong to a LIVE
    * lease-less sibling (see [[relistManifest]]'s refusal and
    * [[repairOrphanedAppends]]'s skip).
    */
  private def freshOptimisticMarkers(): Seq[Path] = {
    val root = new Path(path)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => (p.getName.startsWith(AppendIntentPrefix) ||
          p.getName.startsWith(ReplaceIntentPrefix)) &&
        !p.getName.endsWith(".tmp") && !p.getName.endsWith(TornSidecarSuffix) &&
        !p.getName.endsWith(CommittedSidecarSuffix))
      .filter { p =>
        val kv = readKv(p, required = Nil)
        kv.exists(_.get("opt").contains("1")) &&
          kv.flatMap(_.get("hb")).flatMap(_.toLongOption)
            .exists(System.currentTimeMillis() - _ < OptAppendStaleMs)
      }
  }

  /** Full re-list commit — init, repairs, and first-manifest upgrades. */
  private def commitManifestRelist(): Unit = synchronized {
    if (fs.exists(compactIntentFile)) repairOrphanedCompact()
    if (fs.exists(intentFile)) repairOrphanedReplace()
    commitManifest(listLiveFiles(allPartitionDirs(), trashedFiles()))
  }

  /** Park replaced files for deferred deletion: a `.list` of relative
    * paths under `_graft_trash/`, named by park time. The files stay
    * at their original paths (a reader that planned against an older
    * manifest keeps scanning them) until [[vacuum]] reaps entries older
    * than the retention.
    */
  private def writeTrash(files: Seq[String]): Unit = if (files.nonEmpty) {
    if (!fs.exists(trashDir)) fs.mkdirs(trashDir)
    writeMarker(
      new Path(trashDir,
        s"${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}.list"),
      files.mkString("", "\n", "\n"))
  }

  /** Physically delete trash-parked files older than the retention.
    * Runs under the writer lease (reentrant — free when the runner or
    * compact already holds it): reaping must not interleave with
    * another writer's in-flight park/commit, whose trash list it could
    * read half-written or whose just-parked files it could reap early.
    *
    * The retention is the READER protection — the lease does not stop
    * scans. Trash entries are by construction absent from every
    * manifest committed after they were parked, and part-file names
    * are job-unique so a parked name can never be re-created live; but
    * a reader that PLANNED more than `olderThanMillis` ago may still be
    * scanning a parked file. The retention floor is therefore the
    * longest scan you serve (the same contract as a table format's
    * vacuum): `vacuum(0)` is a deliberate escape hatch for when no
    * readers exist — on a live table it will break in-flight scans
    * with FileNotFoundException.
    */
  def vacuum(olderThanMillis: Long = TrashRetentionMs): Int =
    if (!fs.exists(trashDir)) 0
    else withWriterLease() {
      val cutoff = System.currentTimeMillis() - olderThanMillis
      var removed = 0
      val touchedDirs = scala.collection.mutable.Set[Path]()
      // defensive invariant, cheap at one replay per vacuum: a file the
      // LATEST manifest lists as live is NEVER reaped, whatever a trash
      // list says — a crash inside a repair (or an operator replanting
      // state by hand) must not let `--vacuum-only --retention-ms 0`
      // delete data out from under every current reader. Such entries
      // stay parked (the list is retained) for a later vacuum after the
      // un-publish completes.
      val live = latestManifest().getOrElse(Nil).toSet
      fs.listStatus(trashDir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".list"))
        .foreach { st =>
          val parked = st.getPath.getName.takeWhile(_ != '_').toLongOption
          if (parked.exists(_ <= cutoff)) {
            val (liveNow, reapable) = readLines(st.getPath).partition(live.contains)
            reapable.foreach { rel =>
              val p = new Path(path, rel)
              if (fs.exists(p)) { fs.delete(p, false); removed += 1 }
              touchedDirs += p.getParent
            }
            if (liveNow.isEmpty) fs.delete(st.getPath, false)
            else {
              TargetTable.log.warn(
                s"vacuum on $path: ${liveNow.size} parked file(s) are LIVE in " +
                  "the latest manifest (interrupted repair?) — keeping them " +
                  "parked, reaping the rest")
              // temp+rename, never an in-place truncate: a crash mid-
              // rewrite must not tear the list (names lost from it stop
              // being excluded by trashedFiles() and a later relist would
              // absorb the leaked on-disk files as live rows). The fresh
              // list keeps the ORIGINAL park time — its entries already
              // served their retention and stay reap-eligible the moment
              // the un-publish completes; duplicates across lists are
              // harmless (vacuum tolerates absent files).
              writeMarker(
                new Path(trashDir,
                  s"${parked.get}_${java.util.UUID.randomUUID().toString.take(8)}.list"),
                liveNow.mkString("", "\n", "\n"))
              fs.delete(st.getPath, false)
            }
          }
        }
      // a partition replaced entirely away keeps its directory only as
      // a parking lot; drop it once the last parked file is reaped so
      // the directory layout converges back to the live set
      touchedDirs
        .filter(d => d.getName.startsWith(s"$PartitionCol=") &&
          fs.exists(d) && fs.listStatus(d).isEmpty)
        .foreach(fs.delete(_, false))
      removed
    }

  /** Unique-key upsert — reference B13+B14 (`loop.sql:100-107`):
    * `DELETE FROM target WHERE (uk) IN (SELECT (uk) FROM tmp)` then
    * insert. Parquet has no in-place DELETE, so:
    *  1. find partitions containing matching keys (semi-join over the
    *     key columns only — column-pruned scan);
    *  2. rewrite just those partitions with a broadcast LEFT ANTI join
    *     (per-period key sets are small — one period of rows);
    *  3. append the fresh rows.
    * Partitions without matches are never read for rewrite. The README's
    * warning that key-deletes are slow (`README.md:100-103`) holds here
    * too — delete-by-date stays the fast path.
    */
  def upsert(df: DataFrame, uniqueKey: Seq[String]): Long = {
    require(uniqueKey.nonEmpty, "upsert requires unique_key")
    val fresh = withPartitionCol(alignToTarget(df)).cache()
    try {
      // no broadcast hint: one period's keys usually fit a broadcast
      // and AQE will pick that from runtime sizes, but a forced hint
      // would OOM on a pathological period at cluster scale
      val keys = fresh.select(uniqueKey.map(col): _*).distinct()
      if (exists) {
        val target = readRaw()
        val affected = target
          .join(keys, uniqueKey, "left_semi")
          .select(col(PartitionCol)).distinct().collect()
          .map(_.getDate(0).toLocalDate).toSet
        if (affected.nonEmpty) {
          // small sets inline as an IN-list (partition-prunable
          // literals); large sets would blow up the expression tree,
          // so they go through a broadcast semi-join on p_date instead
          val affectedFilter: DataFrame => DataFrame =
            if (affected.size <= 300)
              _.filter(col(PartitionCol)
                .isInCollection(affected.toSeq.map(java.sql.Date.valueOf)))
            else {
              val dates = spark.createDataFrame(
                spark.sparkContext.parallelize(
                  affected.toSeq.map(d => org.apache.spark.sql.Row(java.sql.Date.valueOf(d)))),
                StructType(Seq(StructField(PartitionCol, DateType))))
              _.join(broadcast(dates), Seq(PartitionCol), "left_semi")
            }
          // snapshot replace of EVERY affected partition: the rewrite
          // and the drop of partitions left with no surviving rows
          // land in one atomic manifest commit (and the anti-join
          // reads the affected partitions' old files off the pinned
          // manifest while the rewrite stages — no self-overwrite)
          val kept = affectedFilter(target)
            .join(keys, uniqueKey, "left_anti")
          writeSnapshotReplace(kept,
            () => affected.map(d => s"$PartitionCol=${fmt.format(d)}"))
        }
      }
      stagedAppend(fresh)
    } finally fresh.unpersist()
  }

  /** Evolve the target's stored schema for incoming data per the dbt
    * `on_schema_change` semantics (`materialization.sql:76`,
    * `loop.sql:82-86`):
    *  - Ignore: target schema unchanged; extra incoming columns are
    *    dropped, missing ones null-filled (insert by target column
    *    list, `loop.sql:88`);
    *  - Fail: any column-set difference raises;
    *  - AppendNewColumns: new incoming columns are appended to the
    *    target schema (historic files read them as NULL);
    *  - SyncAllColumns: target schema becomes the incoming schema —
    *    adds new columns, drops removed ones (historic files' dropped
    *    columns are simply no longer projected), and widens types
    *    where the incoming type safely contains the target's.
    *
    * Pure metadata: only the schema sidecar changes; no data rewrite
    * (the reference likewise alters the table, not the rows). Call
    * before the first write of a run.
    */
  def evolveSchema(incoming: StructType, mode: OnSchemaChange,
      rewriteWidening: Boolean = false): Unit = {
    if (!exists) return
    val current = read().schema
    val curNames = current.fields.map(_.name).toSet
    val inNames  = incoming.fields.filterNot(_.name == PartitionCol).map(_.name).toSet
    mode match {
      case OnSchemaChange.Ignore => ()
      case OnSchemaChange.Fail =>
        if (curNames != inNames)
          throw new IllegalStateException(
            s"on_schema_change=fail: target columns $curNames != incoming $inNames")
      case OnSchemaChange.AppendNewColumns =>
        val extra = incoming.fields.filterNot(f =>
          curNames.contains(f.name) || f.name == PartitionCol)
        if (extra.nonEmpty)
          writeSchemaSidecar(StructType(current.fields ++ extra))
      case OnSchemaChange.SyncAllColumns =>
        var needsRewrite = false
        val widened = incoming.fields.filterNot(_.name == PartitionCol).map { inF =>
          current.fields.find(_.name == inF.name) match {
            case Some(curF) =>
              val t = SchemaEvolution.widen(curF.dataType, inF.dataType)
                .orElse {
                  // reader-rejected but value-preserving change
                  // (date→timestamp, x→string, …): with the opt-in, the
                  // historic storage is rewritten through the cast — the
                  // Spark analogue of the warehouse ALTER the reference
                  // relies on, which rewrites storage server-side
                  if (rewriteWidening)
                    SchemaEvolution.widenByRewrite(curF.dataType, inF.dataType)
                      .map { t => needsRewrite = true; t }
                  else None
                }
                .getOrElse(throw new IllegalStateException(
                  s"column ${inF.name}: cannot evolve ${curF.dataType} to " +
                    s"${inF.dataType} in place — historic parquet files cannot " +
                    "be read through the widened type (stricter than the " +
                    "reference's warehouse ALTER, which rewrites storage); " +
                    (if (SchemaEvolution.widenByRewrite(
                        curF.dataType, inF.dataType).isDefined)
                      "opt into RunParams.rewriteWidening to rewrite historic " +
                        "storage through the cast, or rebuild via full-refresh"
                    else
                      "no common type holds both losslessly — rebuild via " +
                        "full-refresh to apply this change")))
              StructField(inF.name, t, nullable = true)
            case None => inF
          }
        }
        if (needsRewrite) {
          // sync_all_columns' contract for DROPPED columns is sidecar-
          // only hiding: the bytes stay on disk, recoverable by re-
          // adding the column. A full-table rewrite through `widened`
          // (incoming fields only) would silently make the drop
          // PHYSICAL — a model that transiently omits a column while
          // rewriteWidening is set would destroy that column's history
          // as a side effect of an unrelated type change. So the
          // rewrite carries current-only columns through unchanged, and
          // the sidecar written afterwards hides them like the
          // metadata-only path does.
          val currentOnly = current.fields.filterNot(f =>
            inNames.contains(f.name) || f.name == PartitionCol)
          rewriteTo(StructType(widened ++ currentOnly))
          if (currentOnly.nonEmpty) writeSchemaSidecar(StructType(widened))
        } else writeSchemaSidecar(StructType(widened))
    }
  }

  /** Storage-rewrite widening — reads every historic row, casts it to
    * the desired user schema (nested restructure by name, same
    * expression layer as [[alignToTarget]]), and re-inits — on a
    * manifest table that is the snapshot-isolated whole-table replace
    * (readers see complete-old-with-old-schema or complete-new-with-new,
    * crash repair via the replace intent); pre-manifest tables take the
    * crash-safe backup swap ([[repairOrphanedSwap]]). Partition values
    * are preserved: `p_date = CAST(timestampField AS DATE)` recomputes
    * to the same day (a widened timestampField is value-preserving by
    * [[SchemaEvolution.canSafelyCast]]), and NULL-ts rows re-land in
    * the default partition. Cost is a FULL-TABLE rewrite — at 100 TB
    * prefer types that stay inside the parquet reader's promotion set
    * (metadata-only [[evolveSchema]]); this is the escape hatch the
    * caller must opt into per run.
    */
  private def rewriteTo(desired: StructType): Unit = {
    val cur      = read()
    val curField = cur.schema.fields.map(f => f.name -> f).toMap
    val cols = desired.fields.map { tf =>
      curField.get(tf.name) match {
        case Some(cf) => alignExpr(col(cf.name), cf.dataType, tf.dataType).as(tf.name)
        case None     => lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    TargetTable.log.warn(
      s"rewriteWidening: rewriting all historic storage of $path to apply a " +
        "reader-incompatible type change (full-table rewrite)")
    init(cur.select(cols.toIndexedSeq: _*))
    ()
  }

  /** Unconditional target type-widening — the reference calls
    * `adapter.expand_target_column_types` on EVERY loop iteration
    * regardless of `on_schema_change`
    * (`insert_by_timeperiod_loop.sql:78-79`): when an incoming column
    * safely contains the target's type (int→long, float→double, …) the
    * TARGET widens instead of the insert failing. Pure metadata here —
    * only the schema sidecar changes; historic narrower parquet files
    * read through the widened schema via the parquet reader's type
    * promotion. Same/narrower/new columns are untouched (narrower
    * incoming is [[alignToTarget]]'s cast-up; new columns are
    * `on_schema_change`'s business).
    */
  def expandTargetColumnTypes(incoming: StructType): Unit = {
    if (!exists) return
    storedSchema.foreach { full =>
      val inTypes = incoming.fields.filterNot(_.name == PartitionCol)
        .map(f => f.name -> f.dataType).toMap
      var changed = false
      val widened = full.fields.map { tf =>
        inTypes.get(tf.name) match {
          case Some(inT) if inT != tf.dataType &&
              // the sidecar is the READ schema for every historic file,
              // so the widening must be a parquet read promotion — the
              // cast predicate would accept e.g. long→double and brick
              // the table's history (SchemaEvolution.canPromoteOnRead)
              SchemaEvolution.canPromoteOnRead(tf.dataType, inT) =>
            changed = true
            tf.copy(dataType = inT)
          case _ => tf
        }
      }
      if (changed) writeFullSidecar(StructType(widened))
    }
  }

  /** Schema alignment on insert — the reference inserts using the
    * TARGET's column list (`loop.sql:88,109-114`) with
    * `expand_target_column_types` widening (`loop.sql:78-79`). Spark
    * won't auto-widen on append, so incoming columns are cast to the
    * target's types where the cast is a safe widening, and column order
    * is aligned to the target.
    */
  def alignToTarget(df: DataFrame): DataFrame =
    if (!exists) df
    else {
      // schema only — from the sidecar, NOT a read() (which would list
      // every partition directory just to infer what we already know)
      val targetSchema = storedSchema
        .map(s => StructType(s.fields.filterNot(_.name == PartitionCol)))
        .getOrElse(read().schema)
      val incoming     = df.schema.fields.map(f => f.name -> f).toMap
      val cols = targetSchema.fields.map { tf =>
        incoming.get(tf.name) match {
          case Some(inF) if inF.dataType == tf.dataType => col(tf.name)
          case Some(inF) =>
            require(SchemaEvolution.canSafelyCast(inF.dataType, tf.dataType),
              s"column ${tf.name}: cannot narrow ${inF.dataType} to ${tf.dataType}")
            alignExpr(col(tf.name), inF.dataType, tf.dataType).as(tf.name)
          case None => lit(null).cast(tf.dataType).as(tf.name)
        }
      }
      df.select(cols.toIndexedSeq: _*)
    }

  /** The nested cast-up expression behind [[alignToTarget]]. Spark's
    * own struct cast is POSITIONAL (same arity, field-by-index), so an
    * evolved struct target — a field added, or a nested leaf widened —
    * needs the restructure built by name: target fields pull the
    * incoming child by name (NULL when absent), arrays/maps rewrap via
    * `transform`/`transform_keys`/`transform_values`, leaves cast.
    * All built-in expressions → stays inside whole-stage codegen.
    */
  private def alignExpr(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (a, b) if a == b => c
      case (a: StructType, b: StructType) =>
        val kids = b.fields.map { bf =>
          a.fields.find(_.name == bf.name) match {
            case Some(af) =>
              alignExpr(c.getField(af.name), af.dataType, bf.dataType).as(bf.name)
            case None => lit(null).cast(bf.dataType).as(bf.name)
          }
        }
        // a NULL struct must stay NULL, not become a struct of NULLs
        when(c.isNull, lit(null).cast(b)).otherwise(struct(kids.toIndexedSeq: _*))
      case (ArrayType(e1, _), ArrayType(e2, _)) =>
        transform(c, x => alignExpr(x, e1, e2))
      case (MapType(k1, v1, _), MapType(k2, v2, _)) =>
        transform_values(
          transform_keys(c, (k, _) => alignExpr(k, k1, k2)),
          (_, v) => alignExpr(v, v1, v2))
      case _ => c.cast(to)
    }

  /** Per-partition small-file compaction — the operational counterpart
    * of the chunked loop: every period job commits at least one file
    * per day-partition it touches, so a long-lived target accumulates
    * files far smaller than a scan-efficient size (and at 100 TB, file
    * count is what kills listing and scan planning).
    *
    * For each day-partition in [from, to] whose file count exceeds what
    * `targetFileBytes` calls for, rewrite that partition's files into
    * ceil(bytes/targetFileBytes) files. Each partition is one small
    * independent job (resumable, bounded working set — the same design
    * as the load loop); partitions already at target are skipped
    * without reading data (size check is a pure metadata listing).
    * Crash safety AND reader safety come from the manifest: staged
    * files move into the partition (invisible to manifest readers —
    * the manifest is the visibility layer, not the directory listing),
    * ONE atomic manifest commit switches the partition from the
    * original file set to the compacted one, and the originals are
    * parked on the trash list (physically deleted by [[vacuum]] after
    * the retention) instead of deleted in place. A reader planning at
    * ANY instant sees the pre-compaction or post-compaction file set,
    * never a partial one; a reader planned BEFORE the commit keeps
    * scanning the originals until the retention expires. An intent
    * marker recording both name sets brackets the sequence: before the
    * manifest commit a crash rolls BACK (delete the staged copies —
    * originals and manifest are untouched by construction), after it
    * the crash rolls FORWARD (park the originals, clear the marker) —
    * [[repairOrphanedCompact]] decides by whether the latest manifest
    * contains the staged set. Data is never lost: originals leave the
    * live set only via the same commit that publishes their
    * replacement, and leave the DISK only via [[vacuum]].
    */
  /** `clusterBy` additionally RANGE-CLUSTERS each rewritten partition
    * on the given columns (`repartitionByRange` + `sortWithinPartitions`
    * — the OPTIMIZE/Z-ORDER-lite for a lexicographic key): output files
    * carry disjoint key ranges and sorted row groups, so parquet
    * min/max statistics prune files AND row groups for selective
    * point/range predicates on those columns — at 100 TB the difference
    * between touching one file and touching a partition. Clustering
    * rides the normal size trigger: partitions already at their target
    * file count are left alone (re-runs converge and skip), so a
    * periodic `compact(clusterBy = ...)` keeps exactly the
    * freshly-fragmented partitions clustered.
    */
  /** `zorder = true` (with ≥ 2 `clusterBy` columns) lays each rewritten
    * partition on a Morton curve instead of the lexicographic range
    * sort: per-column equal-depth buckets (boundaries sampled per
    * partition via `approxQuantile` — one extra pass next to the
    * rewrite itself) interleave into a curve key, and files cut along
    * the curve carry narrow min/max on EVERY cluster dimension — the
    * manifest stats (recorded for all cluster columns either way) then
    * prune [[readWhere]]/[[readWhereAll]] on any of them, where a
    * lexicographic layout only serves its leading column. Delta's
    * OPTIMIZE ZORDER BY, manifest-native.
    */
  def compact(
      from: Option[LocalDate] = None,
      to: Option[LocalDate] = None,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil,
      zorder: Boolean = false): Seq[CompactionStat] =
    // compaction is a writer: its repairs and rewrites must not
    // interleave with a live materialization (reentrant when the runner
    // calls it under its own lease)
    if (!exists) Nil
    else withWriterLease() {
      compactLocked(from, to, targetFileBytes, clusterBy, zorder)
    }

  private def compactLocked(
      from: Option[LocalDate],
      to: Option[LocalDate],
      targetFileBytes: Long,
      clusterBy: Seq[String] = Nil,
      zorder: Boolean = false): Seq[CompactionStat] = {
    require(!zorder || clusterBy.size >= 2,
      "zorder needs at least two clusterBy columns (one column is plain " +
        "range clustering already)")
    repairOrphanedCompact()
    repairOrphanedReplace() // staged-uncommitted replace files must not be relisted as live
    repairOrphanedAppends() // ditto for a crashed predecessor's moved-but-uncommitted appends
    // age-gated: even under the lease, a writer that predates the lease
    // discipline (or a manual API user) could have a live appendIsolated
    // stage dir; only dirs idle past the gate are truly dead (the
    // runner's start-of-run sweep, at the single-writer point, uses no
    // gate)
    sweepOrphanedStaging(olderThanMillis = StagingSweepAgeMs)
    vacuum() // reap prior compactions' retention-expired originals
    // the manifest is compaction's visibility layer: ensure one exists
    // BEFORE staging anything, so readers are pinned through the switch
    if (latestManifest().isEmpty) commitManifestRelist()
    val userSchema = storedSchema
      .map(s => StructType(s.fields.filterNot(_.name == PartitionCol)))
    // the NULL-ts partition holds legitimate data outside the date
    // frontier; exempting it from compaction would let its small files
    // grow unboundedly across runs, so it is always a candidate (date
    // bounds cannot apply to it — it has no date)
    val defaultDir = new Path(path, s"$PartitionCol=$HiveDefaultPartition")
    val parts: Seq[(Option[LocalDate], Path)] = datePartitions
      .filter { case (d, _) =>
        from.forall(f => !d.isBefore(f)) && to.forall(t => !d.isAfter(t)) }
      .sortBy(_._1)
      .map { case (d, p) => (Some(d), p) } ++
      (if (fs.exists(defaultDir)) Seq((None, defaultDir)) else Nil)
    // LIVE files from ONE manifest replay, hoisted out of the loop:
    // each partition's compaction commit changes only that partition's
    // entries, so the snapshot stays exact for every later partition —
    // and a per-partition replay would make a full-table compaction
    // O(partitions x live files) in manifest reads at 100 TB scale
    val liveByDir: Map[String, Set[String]] = latestManifest().getOrElse(Nil)
      .groupBy(_.takeWhile(_ != '/'))
      .map { case (dn, fs) => dn -> fs.map(_.drop(dn.length + 1)).toSet }
    // the data-skipping columns this run records per rewritten file: a
    // clustered compaction DECLARES its cluster keys (ALL of them) as
    // the table's stats columns (all later appends stat them too); a
    // plain compaction keeps statting whatever was declared before.
    // Hoisted: one header read per run, not per partition.
    val statsCol =
      if (clusterBy.nonEmpty) Some(clusterBy.mkString(","))
      else latestStatsCol()
    val setCol = latestSetCol()
    // candidate discovery is pure metadata: LIVE files only, from the
    // manifest — trash-parked originals of a prior compaction are still
    // in the directory within the retention and must be neither re-read
    // (double rows) nor re-counted toward the file-count trigger
    val candidates = parts.flatMap { case (d, dir) =>
      val live = liveByDir.getOrElse(dir.getName, Set.empty)
      val files = fs.listStatus(dir).toSeq
        .filter(f => f.isFile && live.contains(f.getPath.getName))
      val bytes = files.map(_.getLen).sum
      val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      if (files.size <= targetFiles) None else Some((d, dir, files, bytes, targetFiles))
    }
    // The rewrite jobs are independent per partition (each reads only
    // its own live files and writes its own stage dir), so they run
    // CONCURRENTLY in bounded batches — a sequential loop leaves the
    // cluster idle on every small partition's job tail, and a windowed
    // compaction of a year of daily partitions pays that tail 365
    // times. The COMMIT section stays strictly sequential, one
    // partition at a time, under the same single intent marker — every
    // crash-repair state (at most one marker; marker implies its
    // partition's staged files exist) is exactly the sequential loop's.
    // The bound also caps transient stage storage at `cc` partitions.
    val cc = math.min(CompactMaxConcurrentRewrites, math.max(1, candidates.size))
    case class Staged(
        d: Option[LocalDate], dir: Path, files: Seq[org.apache.hadoop.fs.FileStatus],
        bytes: Long, stage: Path, staged: Seq[Path],
        stagedLines: Seq[String])
    def rewriteOne(
        d: Option[LocalDate], dir: Path,
        files: Seq[org.apache.hadoop.fs.FileStatus], bytes: Long,
        targetFiles: Int): Staged = {
      heartbeatLease() // one rewrite per partition keeps the lease fresh
      // per-partition boundary so specs can fail ONE rewrite of a
      // concurrent batch and pin the siblings' cleanup behavior
      crashPoint(s"compact:rewrite:${d.map(fmt.format).getOrElse(HiveDefaultPartition)}")
      val stage = new Path(path + s"__compact_${java.util.UUID.randomUUID().toString.take(8)}")
      val reader = userSchema.fold(spark.read)(s => spark.read.schema(s))
      val merged = reader.parquet(files.map(_.getPath.toString): _*)
      val arranged =
        if (clusterBy.isEmpty) merged.coalesce(targetFiles)
        else if (zorder) {
          // Morton layout: equal-depth bucket boundaries sampled
          // from THIS partition's data (layout-only — approximate
          // boundaries cannot affect contents), then range-cut and
          // sort along the interleaved curve key
          val nb = 256
          val probs = (1 until nb).map(_.toDouble / nb).toArray
          val qcols = clusterBy.indices.map(i => s"__graft_zq$i")
          val bnds = merged
            .select(clusterBy.zip(qcols).map { case (c, q) =>
              col(c).cast("double").as(q) }: _*)
            .stat.approxQuantile(qcols.toArray, probs, 0.01)
            .map(_.filter(d => !d.isNaN))
          val zk = graft.functions.expressions.ZOrderFunctions
            .zorder_key(clusterBy.map(c => col(c).cast("double")), bnds.toSeq)
          merged.withColumn("__graft_zk", zk)
            .repartitionByRange(targetFiles, col("__graft_zk"))
            .sortWithinPartitions(col("__graft_zk"))
            .drop("__graft_zk")
        }
        else merged
          // range-cluster: disjoint key ranges per output file +
          // sorted row groups inside each — maximal min/max pruning
          .repartitionByRange(targetFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      arranged.write.mode("overwrite").parquet(stage.toString)
      // staged part files get fresh job UUIDs — no collision with
      // the originals' names, so moving them in is collision-free
      val staged = fs.listStatus(stage).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .map(_.getPath)
      // footer stats while the staged files still live flat in the
      // stage dir (compact writes one partition, unpartitioned); reads
      // only this partition's immutable staged output, so it is safe
      // outside the commit section — the commit lines carry them
      val stagedLines = enrichPairsWithStats(
        staged.map(s => s"${dir.getName}/${s.getName}" -> s), statsCol, setCol)
      Staged(d, dir, files, bytes, stage, staged, stagedLines)
    }
    // ONE marker + ONE atomic manifest commit per rewrite batch: the
    // per-partition sequential tail was 30 markers/commits/parks for a
    // 30-day window (50-80 ms of metadata each — more wall than the
    // rewrites once those run concurrently). The batch delta stays
    // bounded by cc partitions' file counts (never an O(table)
    // rewrite), and because the manifest switch is all-or-nothing for
    // the whole batch, crash repair keeps its binary decision: every
    // staged file published → park originals; else → delete the moved
    // staged copies ([[repairOrphanedCompact]]'s __batch__ arm).
    def commitBatch(batch: Seq[Staged]): Seq[CompactionStat] = {
      val origRelAll = batch.flatMap(st =>
        st.files.map(f => s"${st.dir.getName}/${f.getPath.getName}"))
      val stagedRelAll = batch.flatMap(st =>
        st.staged.map(s => s"${st.dir.getName}/${s.getName}"))
      writeMarker(compactIntentFile,
        s"date=${TargetTable.BatchCompactSentinel}\n" +
          s"orig=${origRelAll.mkString(",")}\n" +
          s"staged=${stagedRelAll.mkString(",")}\n")
      crashPoint("compact:marker")
      batch.foreach(st => st.staged.foreach { s =>
        fs.rename(s, new Path(st.dir, s.getName))
        crashPoint("compact:move")
      })
      failCompactPoint(1) // staged in place; manifest still pre-compaction
      // THE atomic switch: old set -> new set, one delta for the batch.
      // A clustered run also declares its key as the stats column
      // (idempotent — carried by every later header).
      commitManifestDelta(add = batch.flatMap(_.stagedLines),
        remove = origRelAll,
        statsCol = if (clusterBy.nonEmpty) Some(clusterBy.mkString(","))
                   else None)
      failCompactPoint(2) // manifest switched; originals still on disk
      crashPoint("compact:commit")
      writeTrash(origRelAll)
      failCompactPoint(3) // originals parked; marker not yet cleared
      crashPoint("compact:trash")
      clearCompactIntent()
      crashPoint("compact:cleared")
      // report the ACTUAL staged count: range clustering may emit
      // fewer files than requested when the key space is skewed
      batch.map(st => CompactionStat(st.d, st.files.size, st.staged.size, st.bytes))
    }
    if (candidates.isEmpty) Nil
    else if (cc == 1)
      candidates.flatMap { case (d, dir, files, bytes, tf) =>
        val st = rewriteOne(d, dir, files, bytes, tf)
        try commitBatch(Seq(st))
        finally if (fs.exists(st.stage)) fs.delete(st.stage, true)
      }
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(cc)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      var primary: Throwable = null
      try {
        candidates.grouped(cc).flatMap { batch =>
          // transform to Try so every rewrite in the batch runs to
          // completion before a failure propagates: the failure state
          // is quiescent AND the completed siblings' stage dirs are
          // known — they are reaped here (they can never commit)
          // instead of lingering for the 15-minute-aged sweep
          val tried = Await.result(
            Future.sequence(batch.map { case (d, dir, files, bytes, tf) =>
              Future(rewriteOne(d, dir, files, bytes, tf))
                .transform(scala.util.Success(_)) }),
            Duration.Inf)
          val staged = tried.collect { case scala.util.Success(st) => st }
          try {
            tried.collectFirst { case scala.util.Failure(e) => e }
              .foreach(throw _)
            commitBatch(staged)
          } finally staged.foreach(st =>
            if (fs.exists(st.stage)) fs.delete(st.stage, true))
        }.toList
      } catch {
        case t: Throwable => primary = t; throw t
      } finally {
        pool.shutdown()
        // every submitted rewrite completed inside the Await above, so
        // a drain timeout here means something is genuinely wedged —
        // surface it loudly instead of falling through with rewrites
        // possibly still mutating stage dirs behind the caller's back
        if (!pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS)) {
          val e = new IllegalStateException(
            s"compaction rewrite pool on $path did not quiesce within " +
              "1 hour — rewrites may still be running; their stage dirs " +
              "are left for the aged sweep")
          if (primary != null) primary.addSuppressed(e) else throw e
        }
      }
    }
  }

  /** Test hook: throw after compact phase `n` (1 = staged files moved
    * in, manifest not yet committed; 2 = manifest committed, originals
    * not yet trash-parked; 3 = originals parked, marker not cleared).
    */
  private[ibtp] var failCompactAt: Int = 0
  private def failCompactPoint(n: Int): Unit =
    if (failCompactAt == n)
      throw new IllegalStateException(s"simulated crash at compact phase $n")

  private def compactIntentFile = new Path(path, TargetTable.CompactIntentFile)

  private def clearCompactIntent(): Unit =
    if (fs.exists(compactIntentFile)) fs.delete(compactIntentFile, false)

  /** Heal a partition compaction orphaned by a crash (see [[compact]]).
    * The latest manifest decides the direction — it is the one atomic
    * commit in the sequence: if it contains the staged set, the switch
    * happened and the repair rolls FORWARD (park the originals on the
    * trash list, idempotently); if not, the switch never happened and
    * the repair rolls BACK (delete the staged copies — originals and
    * manifest are untouched by construction, so readers never noticed).
    * Returns the repaired partition, if any.
    */
  def repairOrphanedCompact(): Option[String] =
    // all three keys required: a marker missing `orig`/`staged` (manual
    // edit) must fail loudly with the corrupt-marker remedy — guessing
    // either set could park originals with nothing published to replace
    // them
    readKv(compactIntentFile, required = Seq("date", "orig", "staged")).map { kv =>
      // `date` is the raw partition value: an ISO date, the NULL-ts
      // partition's sentinel, or the BATCH sentinel (orig/staged then
      // carry dir-qualified relative paths for a whole rewrite batch;
      // the batch's manifest switch was one atomic commit, so the
      // repair decision below stays binary). Validated here so a
      // corrupt marker still fails loudly instead of repairing a
      // nonsense directory.
      // if/else expression, NOT a non-local return out of the .map
      // closure — that compiled to NonLocalReturnControl, which an
      // intervening catch-all (or a Scala 3 migration) silently breaks
      val d = kv("date")
      val orig   = kv.getOrElse("orig", "").split(",").filter(_.nonEmpty).toSeq
      val staged = kv.getOrElse("staged", "").split(",").filter(_.nonEmpty).toSeq
      if (d == TargetTable.BatchCompactSentinel) {
        TargetTable.log.warn(s"repairing orphaned batch compaction on $path")
        val manifest = latestManifest().getOrElse(Nil).toSet
        val committed = staged.nonEmpty && staged.forall(manifest.contains)
        if (committed) {
          writeTrash(orig.filter(rel => fs.exists(new Path(path, rel))))
          crashPoint("repairC:park")
        } else {
          staged.foreach { rel =>
            val p = new Path(path, rel)
            if (fs.exists(p)) fs.delete(p, false)
            crashPoint("repairC:delete")
          }
        }
      } else {
        if (d != HiveDefaultPartition) LocalDate.parse(d)
        val dirName = s"$PartitionCol=$d"
        val dir = new Path(path, dirName)
        if (fs.exists(dir)) {
          TargetTable.log.warn(s"repairing orphaned compaction of $dir")
          val manifest = latestManifest().getOrElse(Nil).toSet
          // nonEmpty guard: an empty staged set can never have been
          // committed — the vacuous forall would park the originals with
          // nothing published in their place
          val committed = staged.nonEmpty &&
            staged.forall(s => manifest.contains(s"$dirName/$s"))
          if (committed) {
            // forward: the commit published the staged set; parking the
            // originals (and clearing) is all that remained. writeTrash
            // may double-park on re-crash — vacuum tolerates absent files.
            writeTrash(orig.map(o => s"$dirName/$o")
              .filter(rel => fs.exists(new Path(path, rel))))
            crashPoint("repairC:park")
          } else {
            // back: the staged copies were never published — remove them
            staged.foreach { s =>
              val p = new Path(dir, s)
              if (fs.exists(p)) fs.delete(p, false)
              crashPoint("repairC:delete")
            }
          }
        }
      }
      clearCompactIntent()
      crashPoint("repairC:cleared")
      d
    }

  /** Delete sibling staging directories (`<target>__compact_<uuid>`,
    * `<target>__stage_<uuid>`) a process death orphaned — their
    * in-process `finally` cleanup never ran, and nothing else knows
    * the UUID names. Safe at any repair point: files still inside a
    * stage dir were never visible to readers (compact integrates via
    * renames INTO the partition; appendIsolated renames OUT of the
    * stage), so removing the leftovers is exactly the cleanup the
    * crashed process would have done. Call with no age gate only when
    * no concurrent write on this target is in flight (the runner sweeps
    * before its loop starts, at the single-writer point, alongside the
    * swap/replace/compact repairs); other callers — `compact()` run
    * standalone — pass `olderThanMillis` so a live writer's
    * recently-modified stage dir is never mistaken for an orphan.
    */
  def sweepOrphanedStaging(olderThanMillis: Long = 0L): Unit = {
    val self = new Path(path)
    val parent = self.getParent
    if (parent != null && fs.exists(parent)) {
      val name = self.getName
      val cutoff = System.currentTimeMillis() - olderThanMillis
      fs.listStatus(parent).toSeq
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith(name + "__compact_") || n.startsWith(name + "__stage_")
        }
        .foreach { st =>
          // modification time of the dir AND its files: a writer
          // streaming into the stage touches file mtimes, not
          // necessarily the dir's
          val newest = (st.getModificationTime +:
            fs.listStatus(st.getPath).toSeq.map(_.getModificationTime)).max
          if (newest <= cutoff) {
            TargetTable.log.warn(s"sweeping orphaned staging dir ${st.getPath}")
            fs.delete(st.getPath, true)
          } else if (olderThanMillis > 0L)
            TargetTable.log.warn(
              s"skipping recently-active staging dir ${st.getPath} " +
                "(possible live writer); it will be swept once idle")
        }
    }
  }

  /** Overwrite exactly the day-partitions present in `df`, leaving all
    * other partitions untouched — a snapshot-isolated replace of the
    * write's own touched set ([[writeSnapshotReplace]]). This is the
    * IDEMPOTENT micro-batch write: replaying the same batch rewrites
    * the same partitions to the same state, which is what turns an
    * at-least-once streaming `foreachBatch` into exactly-once table
    * contents (see `streaming.StreamingIngest`).
    */
  def overwritePartitions(df: DataFrame): Long =
    writeSnapshotReplace(withPartitionCol(alignToTarget(df)), () => Set.empty)._1

  // -------------------------------------------------------------------

  /** Append/overwrite write that also returns the row count. The
    * reference extracts `rows_affected` from the DML result
    * (`init.sql:58-62`, `loop.sql:117-126`); parquet commit gives no
    * row count, so the count rides the write itself as an observed
    * metric (`Dataset.observe` → CollectMetrics): per-partition
    * accumulators merged on the driver — one job, zero extra passes,
    * no cache. `countRows=false` skips even that (reports -1).
    */
  private def writeCounted(df: DataFrame, dst: String, mode: String): Long =
    if (!countRows) {
      df.write.mode(mode).partitionBy(PartitionCol).parquet(dst)
      -1L
    } else {
      val obs = org.apache.spark.sql.Observation(
        s"graft_rows_${java.util.UUID.randomUUID().toString.take(8)}")
      df.observe(obs, count(lit(1)).as("n"))
        .write.mode(mode).partitionBy(PartitionCol).parquet(dst)
      obs.get("n").asInstanceOf[Long]
    }

  /** Snapshot-isolated partition replace — the write primitive behind
    * [[replaceRange]], [[upsert]]'s partition rewrite, and
    * [[overwritePartitions]]. `df` stages to a sibling directory; its
    * part files move into the live partition directories under their
    * job-unique names (invisible — in no manifest yet); ONE atomic
    * manifest commit drops every live file of the replaced directories
    * (the staged write's own touched set ∪ `alsoReplace()`) and
    * publishes the staged files; the dropped originals are trash-parked
    * for readers pinned to an older manifest ([[vacuum]]). A reader
    * planning at any instant sees the whole pre-replace or the whole
    * post-replace file set, never a mix — the same contract as
    * [[compact]], whose marker/commit/park sequence and crash repair
    * this mirrors ([[repairOrphanedReplace]] rolls forward or back by
    * whether the manifest commit happened).
    *
    * Idempotent on replay: re-running the same input replaces the same
    * partitions with identical content (fresh file names; the previous
    * attempt's files are dropped and parked in the same commit) — what
    * turns an at-least-once streaming `foreachBatch` into exactly-once
    * table contents.
    *
    * Returns (rows written, day-partition values written).
    */
  private def writeSnapshotReplace(
      fresh: DataFrame, alsoReplace: () => Set[String],
      newSchema: Option[StructType] = None): (Long, Set[LocalDate]) = {
    repairOrphanedReplace() // heal a crashed predecessor before staging
    val dst = new Path(path)
    if (!fs.exists(dst)) fs.mkdirs(dst)
    // pin readers BEFORE anything stages (pre-manifest table upgrade)
    if (latestManifest().isEmpty) commitManifestRelist()
    val stage = new Path(path + s"__stage_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val n = writeCounted(fresh, stage.toString, "overwrite")
      val stagedRel = listStagedRel(stage)
      // skip stats for the declared stats column ride the commit lines
      // (footer reads in the stage dir, before the moves); markers,
      // trash lists and repair stay on the PLAIN paths
      val stagedLines = enrichWithStats(stagedRel, stage, latestStatsCol(), latestSetCol())
      val touched = stagedRel.map(_.takeWhile(_ != '/')).toSet
      // no-op fast path: nothing staged, nothing to drop, no schema to
      // switch (an empty streaming micro-batch, a backfill of a
      // genuinely empty window) must not litter the log with empty
      // commits or churn markers. alsoReplace() is re-evaluated inside
      // the monitor below — the authoritative read; this probe only
      // decides whether there is any work at all.
      if (stagedRel.isEmpty && alsoReplace().isEmpty && newSchema.isEmpty)
        return (n, Set.empty)
      // read-modify-write under the instance monitor: a concurrent
      // in-process period append basing its commit on the same prior
      // version must not have its files dropped (cross-process writers
      // are serialized by the lease)
      synchronized {
        val replaced = touched ++ alsoReplace()
        // full BODY lines so untouched files keep their skip stats
        // through the checkpoint fold; origRel stays plain paths
        val prevBody = latestManifestBody()
        val prev = prevBody.map(pathOf)
        val origRel = prev.filter(f => replaced.contains(f.takeWhile(_ != '/')))
        writeMarker(intentFile,
          s"orig=${origRel.mkString(",")}\nstaged=${stagedRel.mkString(",")}\n" +
            newSchema.fold("")(s => s"schema=${s.json}\n"))
        crashPoint("replace:marker")
        stagedRel.foreach { rel =>
          val dir = new Path(path, rel.takeWhile(_ != '/'))
          if (!fs.exists(dir)) fs.mkdirs(dir)
          // a silent move failure would let the manifest commit publish
          // a path with no file behind it — abort pre-commit instead;
          // the intent marker makes the abort a clean phase-1 rollback
          if (!fs.rename(new Path(stage, rel), new Path(path, rel)))
            throw new IllegalStateException(
              s"could not move staged file $rel into $path: aborting " +
                "before the manifest commit (repairOrphanedReplace rolls " +
                "the partial staging back)")
          crashPoint("replace:move")
        }
        failReplacePoint(1) // staged in place; manifest still pre-replace
        // THE atomic switch: old set -> new set, the removal list
        // RECOMPUTED PER COMMIT ATTEMPT. A lease-less optimistic append
        // ([[appendConcurrent]]) landing between this writer's body
        // read and its version rename makes the rename fail; the retry
        // must absorb the raced in-range file into the replaced set —
        // the serializable "append, then replace" history — where fixed
        // content would let it silently survive the replace (delta
        // path) or drop it from the manifest entirely (checkpoint
        // path). The successful attempt's set is what gets trash-parked
        // below; the intent marker keeps the pre-commit set, so a crash
        // between commit and park can leak (never corrupt) a raced
        // file — it stays on disk, unpublished, vacuum-immune.
        // A replace that drops at least half the live set (a full
        // refresh, a widening rewrite) folds straight to a checkpoint —
        // its delta would be O(table) lines anyway, and the checkpoint
        // resets the replay chain; a period-sized replace rides an
        // O(touched) delta.
        var committedOrig = origRel
        def freshOrig(): Seq[String] = {
          val o = latestManifestBody().map(pathOf)
            .filter(f => replaced.contains(f.takeWhile(_ != '/')))
          committedOrig = o
          o
        }
        onReplaceCommit() // test hook: raced-commit injection point
        if (prev.isEmpty || origRel.size * 2 >= prev.size) {
          val sc = latestStatsCol(); val vcHdr = latestSetCol()
          commitVersion(
            () => {
              val oSet = freshOrig().toSet
              TargetTable.InlineContent(
                (newSchema.orElse(storedSchema).map("#schema=" + _.json).toSeq ++
                  sc.map("#statscol=" + _).toSeq ++
                  vcHdr.map("#setcol=" + _).toSeq ++
                  (latestManifestBody().filterNot(l => oSet(pathOf(l))) ++
                    stagedLines).distinct.sorted)
                  .mkString("", "\n", "\n"))
            },
            isDelta = false)
        } else
          commitManifestDelta(add = stagedLines, remove = origRel,
            schema = newSchema, recomputeRemove = Some(() => freshOrig()))
        crashPoint("replace:commit")
        // a schema-changing replace (snapshot full refresh / widening
        // rewrite) syncs the write-side sidecar right after the commit;
        // a crash in between heals in repairOrphanedReplace's sidecar
        // sync — readers were never exposed (they plan off the header)
        newSchema.foreach(writeSidecarFileOnly)
        failReplacePoint(2) // switched; originals still on disk, unparked
        crashPoint("replace:sidecar")
        writeTrash(committedOrig)
        failReplacePoint(3) // originals parked; marker not yet cleared
        crashPoint("replace:trash")
        clearIntent()
        crashPoint("replace:cleared")
      }
      val dates = touched
        .filter(_ != s"$PartitionCol=$HiveDefaultPartition")
        .map(nm => LocalDate.parse(nm.stripPrefix(s"$PartitionCol=")))
      (n, dates)
    } finally if (fs.exists(stage)) fs.delete(stage, true)
  }
}

/** An optimistic commit ([[TargetTable.appendConcurrent]]) lost to a
  * conflicting concurrent writer — the Delta-OCC analogue of
  * ConcurrentAppendException / ConcurrentDeleteException. The losing
  * write was fully rolled back (its files were published to no
  * manifest); re-running it against the new table state is always safe.
  */
final class ConcurrentWriteConflictException(msg: String)
  extends IllegalStateException(msg)

/** One partition's compaction outcome. `date` is None for the NULL-ts
  * (`__HIVE_DEFAULT_PARTITION__`) partition, which is compacted like any
  * other but has no date.
  */
final case class CompactionStat(
    date: Option[LocalDate], filesBefore: Int, filesAfter: Int, bytes: Long) {
  def partitionLabel: String =
    date.fold(TargetTable.HiveDefaultPartition)(_.toString)
}

object TargetTable {
  /** One committed manifest version (see the delta-log section of
    * [[TargetTable]]). Ordering is EPOCH-MAJOR, then sequence.
    */
  private[ibtp] final case class ManifestVersion(
      epoch: Long, seq: Long, isDelta: Boolean, p: org.apache.hadoop.fs.Path,
      mtime: Long = 0L, len: Long = 0L) {
    /** Cache identity: the logical key PLUS the physical file identity
      * (mtime, length) — a manifest dir wiped and rebuilt reuses
      * (epoch, seq) keys, and the replay cache must not serve the old
      * history's lines for the new files.
      */
    def cacheKey: (Long, Long, Boolean, Long, Long) =
      (epoch, seq, isDelta, mtime, len)
    /** Epoch-major, then sequence — and at the SAME (epoch, seq), the
      * CHECKPOINT strictly before the delta. The rename-CAS only
      * collides within one extension, so a background fold's `.list`
      * and a concurrent lease-less `.delta` can legitimately both land
      * at one sequence; replaying the checkpoint first and the delta on
      * top makes that pair correct whichever landed first (the fold's
      * content either already contains the delta's change — replay is
      * idempotent set arithmetic — or predates it and the delta
      * re-applies it), where the opposite order would let a stale fold
      * SHADOW the delta: a silently lost commit.
      */
    def key: (Long, Long, Boolean) = (epoch, seq, isDelta)
  }

  /** Per-file data-skipping stats carried on a manifest body line:
    * min/max of one declared column (`typ` names the canonical value
    * space — long | double | string) plus the file's row count. See the
    * data-skipping section of [[TargetTable]].
    */
  private[ibtp] final case class FileSkipStat(
      col: String, typ: String, min: String, max: String, rows: Long)

  /** Per-file EXACT distinct-value set of one declared set column
    * (canonical values in their `typ` space, sorted; encoding happens
    * at serialization) — the categorical complement of
    * [[FileSkipStat]]'s min/max, recorded from parquet dictionary pages.
    * See [[TargetTable.latestSetCol]].
    */
  private[ibtp] final case class FileValueSet(
      col: String, typ: String, vals: Seq[String])

  /** Value-set blobs above this many distinct values are not recorded
    * (the file is simply never pruned on that column): the set header
    * targets CATEGORICAL columns — languages, sources, event types —
    * where the whole point is that the value space is small; a
    * high-cardinality column's membership pruning belongs to min/max
    * clustering instead, and unbounded sets would bloat every manifest
    * line the way Delta caps its own stats collection.
    */
  val MaxSetValues = 64

  /** Internal day-partition column added next to the user's columns. */
  val PartitionCol = "p_date"

  /** Spark's directory name for NULL partition values — where NULL-ts
    * rows land; legitimate data, but not part of the date frontier.
    */
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Underscore-prefixed so Spark's file listing treats it as metadata. */
  val SchemaFile = "_graft_schema.json"

  /** Crash-repair marker for in-flight snapshot replaces — records the
    * replaced (orig) and staged file sets so
    * [[TargetTable.repairOrphanedReplace]] can roll forward or back by
    * whether the manifest commit happened; underscore-prefixed metadata.
    */
  val IntentFile = "_graft_replace_intent"

  /** Legacy sidecar of the pre-snapshot replace state machine — no
    * longer written; a leftover is deleted by repair.
    */
  val WrittenSidecarFile = "_graft_replace_written"

  /** Init staging/backup/intent live as SIBLINGS of the target path —
    * the target directory itself is what the swap renames.
    */
  val TmpInitSuffix    = "__dbt_tmp_init"
  val BackupSuffix     = "__dbt_backup"
  val SwapIntentSuffix = "__swap_intent"

  /** Crash-repair marker for in-flight partition compactions (see
    * [[TargetTable.compact]]); underscore-prefixed metadata inside the
    * target (compaction never renames the target directory).
    */
  val CompactIntentFile = "_graft_compact_intent"

  /** Per-call crash-repair markers for in-flight staged appends — each
    * records its staged file names so [[TargetTable.repairOrphanedAppends]]
    * can roll an append that crashed before its manifest commit back
    * (else the next run's re-materialization + touched-dir relist would
    * absorb the orphans as duplicates); underscore-prefixed metadata.
    */
  val AppendIntentPrefix = "_graft_append_intent_"

  /** Per-call crash-repair markers for in-flight OPTIMISTIC range
    * replaces ([[TargetTable.replaceRangeConcurrent]]) — per-call
    * (unlike the lease-held replace's single intent file) because
    * concurrent replaces are the point; repaired by
    * [[TargetTable.repairOrphanedConcurrentReplaces]].
    */
  val ReplaceIntentPrefix = "_graft_replace_intent_"

  /** Suffix of the atomic sidecar persisting a torn append rollback's
    * published-vs-never-published classification across a re-crash of
    * the repair itself (see [[TargetTable.repairOrphanedAppends]]):
    * once the filtered manifest commit lands, membership alone can no
    * longer tell which files a pinned reader may still be scanning.
    */
  val TornSidecarSuffix = ".torn"

  /** What a manifest commit writes — either a fully materialized file
    * body (deltas, listing-backed checkpoints: small by construction
    * or already in memory), or a STREAMED checkpoint: header lines
    * plus a sorted, path-deduped body-line iterator consumed directly
    * by the shard writer, so the O(live) body never exists as one JVM
    * object (the materialized fold needed a 24 GB driver at 10M files
    * and overflows String's 2³¹-char ceiling at ~14M).
    */
  private[ibtp] sealed trait ManifestContent
  private[ibtp] final case class InlineContent(body: String)
    extends ManifestContent
  private[ibtp] final case class StreamedContent(
      header: Seq[String], body: Iterator[String]) extends ManifestContent

  /** The streamed fold's order-invariant guard tripped — see
    * [[TargetTable.streamedFoldBody]]; the fold retries materialized.
    */
  private[ibtp] final class UnsortedCheckpointException(msg: String)
    extends IllegalStateException(msg)

  /** Suffix of the sidecar a [[TargetTable.replaceRangeConcurrent]]
    * writes beside its intent marker the moment its manifest commit
    * RETURNS: proof-of-commit for the repair (roll forward without the
    * staged-membership heuristic — a later compaction legitimately
    * removing staged names must never read as a torn move), carrying
    * the recomputed removal set for the trash-park.
    */
  val CommittedSidecarSuffix = ".committed"

  /** Age gate for [[TargetTable.sweepOrphanedStaging]] when invoked from
    * `compact()` (a possibly-concurrent standalone run): stage dirs idle
    * longer than this are orphans; anything younger may be a live
    * writer's in-flight `appendIsolated` stage.
    */
  val StagingSweepAgeMs: Long = 15L * 60 * 1000

  /** Partition rewrite jobs a [[TargetTable.compact]] run keeps in
    * flight (the commit section stays strictly sequential — see
    * compactLocked). Sized like the runner's period concurrency: a few
    * overlapped jobs fill each other's scheduling tails without
    * fighting for executors; also the cap on transient stage storage
    * (`cc` partitions' worth). Env-tunable for cluster deployments
    * (`GRAFT_COMPACT_CONCURRENCY`), deliberately NOT derived from the
    * local core count — the bench must measure the same plan shape at
    * any SPARK_GRAFT_CPUS.
    */
  val CompactMaxConcurrentRewrites: Int =
    sys.env.get("GRAFT_COMPACT_CONCURRENCY").map { v =>
      // validated here, not a bare .toInt: a malformed value would
      // otherwise surface as an opaque class-initialization error far
      // from the setting that caused it
      val n = scala.util.Try(v.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"GRAFT_COMPACT_CONCURRENCY must be a positive integer, got '$v'"))
      if (n <= 0) throw new IllegalArgumentException(
        s"GRAFT_COMPACT_CONCURRENCY must be a positive integer, got '$v'")
      n
    }.getOrElse(8)

  /** Marker `date=` sentinel for a batched compaction intent: the
    * `orig=`/`staged=` lists then carry dir-qualified relative paths
    * for a whole rewrite batch published under ONE manifest commit.
    * Must never collide with a partition value — partition dirs encode
    * dates or [[HiveDefaultPartition]].
    */
  val BatchCompactSentinel = "__batch__"

  /** Versioned live-file manifests (reader snapshots); underscore-
    * prefixed so Spark's listing treats it as metadata.
    */
  val ManifestDirName = "_graft_manifest"

  /** Deferred-deletion parking lot for files replaced by compaction or
    * a snapshot replace — still on disk for readers pinned to an older
    * manifest, reaped by [[TargetTable.vacuum]].
    */
  val TrashDirName = "_graft_trash"

  /** Manifest versions retained for in-flight readers; older versions
    * are pruned at commit (the latest checkpoint and its delta tail are
    * always retained regardless — replay needs them).
    */
  val ManifestKeep = 5

  /** A delta chain folds into a fresh checkpoint every this-many
    * commits: bounds the replay tail a reader pays (one checkpoint +
    * fewer than this many delta reads) while keeping the per-commit
    * write O(staged names) on the hot append path.
    */
  val ManifestCheckpointEvery = 8

  /** Replay-cache size gate: states larger than this many lines are
    * never cached (two copies of the state live per instance — the
    * parsed checkpoint map and the tip lines — ~100 bytes/line each).
    * 20M lines ≈ 4 GB of driver heap, the sane ceiling for a planner
    * that is already holding 20M file names.
    */
  @volatile var MaxCachedManifestLines: Int = 20000000

  /** Checkpoints whose body exceeds this many lines are SHARDED: the
    * body splits into ⌈n/this⌉ sibling `.shard` files (written before,
    * published by, the main file's atomic rename) and the main `.list`
    * holds only the header plus one `#shard=` index line per shard —
    * shard file name, line count, and, when every line in the shard
    * carries a given declared column's stat blob, an AGGREGATE min/max
    * blob in the same grammar as a file line's. A cold range plan
    * ([[TargetTable.planFilesForRange]] / `readWhere*`) then runs the
    * same compiled pruner over the INDEX lines first and reads only
    * the matching shards plus the delta tail — O(matching shards)
    * instead of replaying the full O(live) checkpoint, which at 10M
    * live files is the difference between ~1 shard and ~1.5 GB. Var:
    * specs shrink it to force sharding on small fixtures.
    */
  @volatile var CheckpointShardLines: Int = 1000000

  /** A commit-sequence claim older than this belongs to a writer that
    * crashed between its claim and its rename (the claim spans two
    * metadata ops, never data work — normal hold is milliseconds) and
    * is swept by the next contender. Generous so that only a genuinely
    * dead writer is ever swept.
    */
  val CommitClaimStaleMs: Long = 60L * 1000

  /** First line of a delta version's content (belt-and-braces next to
    * the `.delta` extension, and what keeps replayed header extraction
    * from mistaking it for a schema line).
    */
  val DeltaMarker = "#delta"

  /** How long replaced files stay on disk after a compaction or a
    * snapshot replace before [[TargetTable.vacuum]] deletes them — the
    * grace window for scans planned against an older manifest.
    */
  val TrashRetentionMs: Long = 15L * 60 * 1000

  /** Single-writer lease file — a SIBLING of the target path (the swap
    * path renames the target directory itself, and the lease must
    * survive that).
    */
  val LeaseSuffix = "__writer_lease"

  /** A lease whose heartbeat is older than this is held by a dead
    * process and may be taken over. A live holder's background daemon
    * beats every [[LeaseHeartbeatMs]] regardless of what the main
    * thread is doing, so staleness genuinely means a dead process —
    * not a long CTAS, full-table rewrite, or slow period.
    */
  val LeaseStaleMs: Long = 10L * 60 * 1000

  /** Age gate for an OPTIMISTIC writer's intent marker
    * ([[TargetTable.appendConcurrent]] /
    * [[TargetTable.replaceRangeConcurrent]]): younger markers may
    * belong to a live lease-less sibling whose commit lands any second,
    * so [[TargetTable.repairOrphanedAppends]] must not roll them back;
    * older ones are crashed writers (the move→commit window is
    * sub-second) and repair normally. DERIVED from [[LeaseStaleMs]]
    * with an explicit margin: the lease's commit-contention spin bound
    * is the longest a live optimistic writer can legitimately hold its
    * marker (it spins at most that long inside commitVersion), and the
    * margin absorbs a GC-paused-but-live writer on top of it — the two
    * constants must never be allowed to drift independently.
    */
  val OptAppendStaleMs: Long = LeaseStaleMs + 5L * 60 * 1000

  /** Background heartbeat cadence — an order of magnitude inside
    * [[LeaseStaleMs]], so a holder survives many consecutive transient
    * heartbeat failures before looking stale.
    */
  val LeaseHeartbeatMs: Long = 60L * 1000

  private[ibtp] val log = org.slf4j.LoggerFactory.getLogger(classOf[TargetTable])
}

/** Type-widening matrix for schema evolution — the reference's
  * `adapter.expand_target_column_types` (`loop.sql:78-79`) widens the
  * target so new data fits; appending to parquet instead requires the
  * incoming side to cast to the target where safe.
  */
object SchemaEvolution {
  private val integralOrder: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  /** true when a VALUE of `from` casts to `to` without losing
    * information (the write-side predicate — [[TargetTable.alignToTarget]]
    * casts incoming columns up to the target's types). The integer→
    * float boundaries are where a naive "numeric order" lies:
    * int→float (2³¹ > 2²⁴) and long→float/double (2⁶³ > 2⁵³) silently
    * round large values, so they are NOT safe; byte/short→float and
    * byte/short/int→double are exact.
    */
  def canSafelyCast(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (a, b) if integralOrder.contains(a) && integralOrder.contains(b) =>
      integralOrder(a) <= integralOrder(b)
    case (FloatType, DoubleType)            => true
    case (a, FloatType)
        if integralOrder.get(a).exists(_ <= 1) => true // byte/short < 2^24
    case (a, DoubleType)
        if integralOrder.get(a).exists(_ <= 2) => true // byte/short/int < 2^53
    case (d: DecimalType, DoubleType) if d.precision <= 15 => true
    case (a: DecimalType, b: DecimalType)   =>
      b.scale >= a.scale && b.precision - b.scale >= a.precision - a.scale
    case (a, d: DecimalType)
        if integralOrder.contains(a) && d.precision - d.scale >= 20 => true
    case (DateType, TimestampType)          => true // value-preserving (UTC session)
    case (_, StringType)                    => true
    // Nested types recurse on the leaf rules. Struct fields match by
    // NAME, not position — [[TargetTable.alignToTarget]] builds the
    // nested restructure expression itself (Spark's own struct cast is
    // positional and can't add fields), so name-matched semantics are
    // what actually executes. A `from` field absent from `to` would be
    // silently dropped → not safe; a `to` field absent from `from` must
    // be nullable (it fills with NULL).
    case (a: StructType, b: StructType) =>
      a.fields.forall(af => b.fields.find(_.name == af.name)
        .exists(bf => canSafelyCast(af.dataType, bf.dataType))) &&
      b.fields.forall(bf =>
        a.fields.exists(_.name == bf.name) || bf.nullable)
    case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
      (n2 || !n1) && canSafelyCast(e1, e2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
      (n2 || !n1) && canSafelyCast(k1, k2) && canSafelyCast(v1, v2)
    case _                                  => false
  }

  /** true when historic parquet files WRITTEN as `from` remain
    * readable through a schema sidecar widened to `to` — the parquet
    * vectorized reader's type-promotion set, probed empirically on
    * this Spark build (4.1.2): integral up-chain, byte/short/int →
    * double, float → double, integral → decimal with ≥20 integer
    * digits, decimal growth at same-or-wider scale. The reader
    * REJECTS promotions that a cast would allow — int→float,
    * long→double, decimal→double, date→timestamp, anything→string all
    * throw SchemaColumnConvertNotSupportedException — which is why
    * sidecar-affecting widenings need this predicate, not
    * [[canSafelyCast]] (using the cast predicate here once let an
    * incoming float "widen" a long target and brick every read of the
    * table's history).
    */
  def canPromoteOnRead(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (a, b) if integralOrder.contains(a) && integralOrder.contains(b) =>
      integralOrder(a) <= integralOrder(b)
    case (FloatType, DoubleType)            => true
    case (a, DoubleType)
        if integralOrder.get(a).exists(_ <= 2) => true
    case (a: DecimalType, b: DecimalType)   =>
      b.scale >= a.scale && b.precision - b.scale >= a.precision - a.scale
    case (a, d: DecimalType)
        if integralOrder.contains(a) && d.precision - d.scale >= 20 => true
    // Nested: the parquet reader resolves nested fields by name and
    // promotes leaves by the same scalar rules, so recursion is exact.
    // A struct field ADDED in the read schema reads as NULL from
    // historic files (it must be nullable); a field REMOVED from the
    // read schema would silently hide historic data → not a promotion.
    case (a: StructType, b: StructType) =>
      a.fields.forall(af => b.fields.find(_.name == af.name)
        .exists(bf => canPromoteOnRead(af.dataType, bf.dataType))) &&
      b.fields.forall(bf =>
        a.fields.exists(_.name == bf.name) || bf.nullable)
    case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
      (n2 || !n1) && canPromoteOnRead(e1, e2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
      (n2 || !n1) && canPromoteOnRead(k1, k2) && canPromoteOnRead(v1, v2)
    case _                                  => false
  }

  /** The type a target column should hold when its current type is `a`
    * (with historic files on disk written as `a`) and data now arrives
    * as `b`: a type that historic files can still be READ through and
    * the incoming values can be CAST into. Scalars pick the first of
    * {incoming, current} that satisfies both predicates; structs merge
    * recursively (field union — a field present on only one side stays,
    * nullable, so `{x:int}` current + `{x:long, y:string}` incoming
    * widens to `{x:long, y:string}` and historic rows read y as NULL);
    * arrays/maps widen their element/key/value types. None = genuinely
    * incompatible (e.g. long vs double — double can't hold long
    * losslessly and the reader can't promote long files).
    *
    * Deliberately STRICTER than the reference's warehouse-side
    * `expand_target_column_types`/ALTER: changes that are cast-safe but
    * reader-rejected for historic parquet (date→timestamp,
    * anything→string, long→double) return None here, because accepting
    * them would brick every read of the table's history. The remedy for
    * such a change is a full-refresh rebuild or the opt-in
    * storage-rewrite path ([[widenByRewrite]] under
    * `RunParams.rewriteWidening` — the Spark analogue of the
    * warehouse ALTER, which rewrites storage server-side), and
    * [[TargetTable.evolveSchema]]'s error says so.
    */
  def widen(a: DataType, b: DataType): Option[DataType] =
    merge(a, b)((x, y) =>
      Seq(y, x).find(t => canPromoteOnRead(x, t) && canSafelyCast(y, t)))

  /** The type a target column can reach when historic STORAGE IS
    * REWRITTEN (every on-disk value cast, [[TargetTable]]'s rewrite
    * path) rather than read through a widened sidecar: both the
    * historic type and the incoming type need only CAST safely into
    * the result. Strictly more permissive than [[widen]] — it accepts
    * the reader-rejected-but-value-preserving set (date→timestamp,
    * anything→string, decimal(≤15,s)→double). None = no common type
    * holds both sides losslessly (e.g. long vs double) — only a
    * full-refresh (recompute from source) can change those.
    */
  def widenByRewrite(a: DataType, b: DataType): Option[DataType] =
    merge(a, b)((x, y) =>
      Seq(y, x).find(t => canSafelyCast(x, t) && canSafelyCast(y, t)))

  /** Shared recursion for the widening matrices: structs merge by
    * field-name union (a one-sided field stays, nullable — NULL for
    * the other side's rows), arrays/maps widen element/key/value,
    * scalars resolve through `leaf`.
    */
  private def merge(a: DataType, b: DataType)(
      leaf: (DataType, DataType) => Option[DataType]): Option[DataType] =
    (a, b) match {
      case (as: StructType, bs: StructType) =>
        val names = as.fields.map(_.name) ++
          bs.fields.map(_.name).filterNot(as.fieldNames.contains)
        val merged = names.map { n =>
          (as.fields.find(_.name == n), bs.fields.find(_.name == n)) match {
            case (Some(af), Some(bf)) =>
              merge(af.dataType, bf.dataType)(leaf)
                .map(t => StructField(n, t, nullable = true))
            case (Some(af), None) => Some(af.copy(nullable = true))
            case (None, Some(bf)) => Some(bf.copy(nullable = true))
            case (None, None)     => None // unreachable
          }
        }
        if (merged.forall(_.isDefined)) Some(StructType(merged.flatten.toIndexedSeq))
        else None
      case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
        merge(e1, e2)(leaf).map(t => ArrayType(t, n1 || n2))
      case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
        for {
          k <- merge(k1, k2)(leaf)
          v <- merge(v1, v2)(leaf)
        } yield MapType(k, v, n1 || n2)
      case _ => leaf(a, b)
    }
}

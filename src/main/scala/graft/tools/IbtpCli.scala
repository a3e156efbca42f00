package graft.tools

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.ibtp._
import graft.sources.{GraftSession, Tables}

/** Command-line entry for the materialization — the analogue of the
  * reference's `dbt run` invocations (`/root/reference/README.md:108-143`):
  *
  * {{{
  * runMain graft.tools.IbtpCli --sql model.sql --target /path/tbl \
  *   --timestamp-field day --start-date 2024-01-01 [--stop-date D]
  *   [--period day|week|month|year|auto] [--unique-key k1,k2]
  *   [--min-chunk-rows N] [--max-chunk-rows N]   (auto-period band)
  *   [--full-refresh] [--backfill] [--sf-dir /root/testdata/sf0.001]
  *   [--on-schema-change ignore|fail|append_new_columns|sync_all_columns]
  *   [--rewrite-widening]   (sync_all_columns: allow full-storage rewrite
  *                           for reader-incompatible but cast-safe types)
  *   [--guard-period-filter] [--max-concurrent-periods N]
  *   [--pre-hook SQL]... [--post-hook SQL]...   (repeat the flag per statement)
  *   [--sample-schema-sql file.sql] [--compact-after]
  *   [--auto-compact-bytes N]   (post-loop compaction of the run window)
  *   [--check-unique k1,k2]   (post-load uniqueness gate, README.md:102)
  *   [--lexical-index /path/idx]   (per-period retrieval-index
  *        maintenance: each period's output appends to a persisted BM25
  *        index as it commits — init's chunk included; at-least-once on
  *        re-materialized periods; with --max-concurrent-periods > 1
  *        the appends SERIALIZE on the index writer claim, so period
  *        workers wait on each other at the post-step but never clobber)
  *   [--index-id-col doc_id] [--index-text-col text]
  *   [--pq-index /path/idx]   (per-period vector-index maintenance:
  *        each period's embeddings encode + append to an EXISTING
  *        PqIndex — create it once with its training batch first;
  *        --pq-index-m/--pq-index-k must match the created index)
  *   [--pq-index-m 8] [--pq-index-k 256]
  *   [--index-vec-col embedding]
  *   [--index-compact]   (fold the index's per-period partials after
  *        the run: df -> one row per token, stats -> one row; pq codes
  *        coalesce into defaultParallelism files)
  * }}}
  *
  * Maintenance-only invocations (no forward materialization):
  * {{{
  * runMain graft.tools.IbtpCli --compact-only --target /path/tbl \
  *   --timestamp-field day [--target-file-bytes N] [--cluster-by k1,k2]
  *   [--zorder]   (Morton layout: every cluster column prunes)
  * runMain graft.tools.IbtpCli --vacuum-only --target /path/tbl \
  *   --timestamp-field day [--retention-ms N]   (reap trash-parked files)
  * runMain graft.tools.IbtpCli --declare-set-columns c1,c2 \
  *   --target /path/tbl --timestamp-field day   (categorical value-set
  *                            skipping: later writes record per-file
  *                            exact value sets; readWhereIn prunes)
  * runMain graft.tools.IbtpCli --restat-manifest --target /path/tbl \
  *   --timestamp-field day   (backfill skip blobs for files committed
  *                            before a declaration — no rewrite)
  * runMain graft.tools.IbtpCli --upgrade-manifest --target /path/tbl \
  *   --timestamp-field day   (pre-manifest table -> snapshot reads;
  *                            absorb a non-manifest writer's files)
  * runMain graft.tools.IbtpCli --repair-holes --sql model.sql \
  *   --target /path/tbl --timestamp-field day --start-date D
  * }}}
  *
  * The model SQL may reference any test table by name (registered as
  * temp views) and must contain `__PERIOD_FILTER_FROM__` /
  * `__PERIOD_FILTER_TO__` placeholders.
  */
object IbtpCli {
  def main(args: Array[String]): Unit = {
    val multi = parse(args.toList, Map.empty)
    // scalar view: last occurrence wins for single-valued flags
    val opts = multi.view.mapValues(_.last).toMap
    def req(k: String): String = opts.getOrElse(k,
      sys.error(s"missing required --$k"))

    val spark = GraftSession.create("ibtp")
    try {
      val sfDir = opts.getOrElse("sf-dir", "/root/testdata/sf0.001")
      Tables.registerAll(spark, sfDir)

      // standalone maintenance: compact an existing target and exit —
      // no model SQL, no materialization (the operational cron job for
      // long-lived targets accumulating per-period small files)
      if (opts.contains("compact-only")) {
        val t = new TargetTable(spark, req("target"), req("timestamp-field"))
        val stats = t.compact(
          targetFileBytes = opts.get("target-file-bytes").map(_.toLong)
            .getOrElse(128L * 1024 * 1024),
          // --cluster-by k1,k2: range-cluster rewritten partitions for
          // min/max file and row-group pruning on those columns;
          // --zorder lays them on a Morton curve instead so EVERY
          // cluster column prunes, not just the leading one
          clusterBy = opts.get("cluster-by")
            .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
          zorder = opts.contains("zorder"))
        stats.foreach(st => println(
          s"[ibtp] compacted ${st.partitionLabel}: ${st.filesBefore} -> ${st.filesAfter} files"))
        if (stats.isEmpty) println("[ibtp] compact: nothing to do")
        return
      }

      // standalone manifest upgrade/repair: commit a manifest from a
      // full directory relist — upgrades a pre-manifest table to
      // snapshot-isolated reads WITHOUT waiting for its next mutation,
      // and absorbs files a non-manifest writer (an older library
      // version, an external tool) dropped into the partition dirs
      // (the documented mixed-version remedy). Lease-guarded and
      // repair-first inside relistManifest.
      if (opts.contains("upgrade-manifest")) {
        val t = new TargetTable(spark, req("target"), req("timestamp-field"))
        if (!t.exists) sys.error(s"target ${req("target")} does not exist")
        t.relistManifest()
        println(s"[ibtp] manifest upgraded: reads are now snapshot-isolated " +
          s"(${t.read().inputFiles.length} live files committed)")
        return
      }

      // standalone declaration: every later write records per-file
      // exact value sets for these (categorical) columns from the
      // staged files' parquet dictionaries; point lookups through
      // readWhereIn then prune the planned file list driver-side —
      // the categorical complement of --cluster-by's min/max skipping
      if (opts.contains("declare-set-columns")) {
        val t = new TargetTable(spark, req("target"), req("timestamp-field"))
        if (!t.exists) sys.error(s"target ${req("target")} does not exist")
        val cols = req("declare-set-columns").split(",").toSeq.filter(_.nonEmpty)
        t.declareSetColumns(cols)
        println(s"[ibtp] set columns declared: ${cols.mkString(", ")} " +
          "(later writes record per-file value sets)")
        return
      }

      // standalone restat: backfill per-file skip blobs for live files
      // that predate the stats/set declarations — O(missing) footer +
      // dictionary reads, one delta commit, no data rewrite
      if (opts.contains("restat-manifest")) {
        val t = new TargetTable(spark, req("target"), req("timestamp-field"))
        if (!t.exists) sys.error(s"target ${req("target")} does not exist")
        val n = t.restatManifest()
        println(s"[ibtp] restat: $n manifest entries enriched")
        return
      }

      // standalone vacuum: physically delete compaction leftovers whose
      // retention has expired (size --retention-ms to the longest scan
      // served against this target; 0 forces an immediate reap)
      if (opts.contains("vacuum-only")) {
        val t = new TargetTable(spark, req("target"), req("timestamp-field"))
        val n = t.vacuum(opts.get("retention-ms").map(_.toLong)
          .getOrElse(TargetTable.TrashRetentionMs))
        println(s"[ibtp] vacuum: removed $n trash-parked files")
        return
      }

      val sqlText = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(req("sql"))), "UTF-8")
      // '--period auto' = measure rows/day and size per README.md:104
      val periodArg = opts.getOrElse("period", "day")
      val autoPeriod = periodArg.trim.equalsIgnoreCase("auto")
      val cfg = IbtpConfig(
        timestampField = req("timestamp-field"),
        startDate = opts.get("start-date").map(LocalDate.parse),
        stopDate = opts.get("stop-date").map(LocalDate.parse),
        period = if (autoPeriod) PeriodUnit.Day else PeriodUnit.fromString(periodArg),
        uniqueKey = opts.get("unique-key").map(_.split(",").toSeq).getOrElse(Nil),
        dateSourceModels = opts.get("date-source-models")
          .map(_.split(",").toSeq).getOrElse(Nil),
        onSchemaChange = OnSchemaChange.fromString(
          opts.getOrElse("on-schema-change", "ignore")),
        sampleSelectForSchema = opts.get("sample-schema-sql").map(p =>
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), "UTF-8")))
      val mode = RunMode.resolve(
        fullRefresh = opts.contains("full-refresh"),
        backfill = opts.contains("backfill"),
        cliStart = opts.get("start-date").map(LocalDate.parse),
        cliStop = opts.get("stop-date").map(LocalDate.parse))

      // one statement per flag occurrence — no semicolon splitting, so
      // hook SQL containing ';' inside a string literal stays intact
      def hooks(k: String): Seq[String] =
        multi.getOrElse(k, Vector.empty).map(_.trim).filter(_.nonEmpty)

      val target = new TargetTable(spark, req("target"), cfg.timestampField)
      // maintenance: verify contiguity behind the resume frontier and
      // backfill exactly the missing ranges (the concurrent-append
      // failure hole), then exit — no forward materialization
      if (opts.contains("repair-holes")) {
        val repaired = IbtpRunner.repairHoles(spark,
          IbtpModel.SqlModel(sqlText), target,
          IbtpRunner.RunParams(cfg, RunMode.Normal, log = println))
        if (repaired.isEmpty) println("[ibtp] contiguity: no holes found")
        else repaired.foreach { case (f, t) =>
          println(s"[ibtp] repaired hole [$f, $t)") }
        return
      }
      // per-period retrieval-index maintenance (see q103): the loop
      // keeps a persisted BM25 index current with the materialization
      val lexIndex = opts.get("lexical-index").filter(_.nonEmpty)
        .map(p => new graft.operators.LexicalIndex(spark, p))
      val idxIdCol = opts.getOrElse("index-id-col", "doc_id")
      val idxTextCol = opts.getOrElse("index-text-col", "text")
      val idxVecCol = opts.getOrElse("index-vec-col", "embedding")
      // per-period vector-index maintenance (see q105): appends encode
      // against the frozen codebooks of an index created beforehand
      val pqIndex = opts.get("pq-index").filter(_.nonEmpty).map { p =>
        val idx = new graft.operators.PqIndex(spark, p,
          m = opts.getOrElse("pq-index-m", "8").toInt,
          k = opts.getOrElse("pq-index-k", "256").toInt)
        if (!idx.exists) sys.error(s"--pq-index $p does not exist — create " +
          "it once with its training batch (PqIndex.create) before the loop " +
          "maintains it; codebooks freeze at creation")
        idx
      }
      // both post-steps serialize on their index's writer claim, so
      // concurrent period workers are safe (if slower at the post-step)
      val postSteps: Seq[(PeriodBounds, org.apache.spark.sql.DataFrame) => Unit] =
        lexIndex.toSeq.map(idx =>
          (b: PeriodBounds, df: org.apache.spark.sql.DataFrame) => {
            idx.append(df.select(idxIdCol, idxTextCol), idxIdCol, idxTextCol)
            println(s"[ibtp] lexical-indexed period [${b.from}, ${b.to})")
          }) ++
        pqIndex.toSeq.map(idx =>
          (b: PeriodBounds, df: org.apache.spark.sql.DataFrame) => {
            idx.append(df.select(idxIdCol, idxVecCol), idxIdCol, idxVecCol)
            println(s"[ibtp] pq-indexed period [${b.from}, ${b.to})")
          })
      val res = IbtpRunner.run(spark, IbtpModel.SqlModel(sqlText), target,
        IbtpRunner.RunParams(cfg, mode, log = println,
          preHooks = hooks("pre-hook"), postHooks = hooks("post-hook"),
          periodPostStep = Option(postSteps).filter(_.nonEmpty).map(steps =>
            (b: PeriodBounds, df: org.apache.spark.sql.DataFrame) =>
              steps.foreach(_(b, df))),
          guardPeriodFilter = opts.contains("guard-period-filter"),
          maxConcurrentPeriods = opts.getOrElse("max-concurrent-periods", "1").toInt,
          autoPeriod = autoPeriod,
          minChunkRows = opts.get("min-chunk-rows").map(_.toLong)
            .getOrElse(PeriodSizing.DefaultMinChunkRows),
          maxChunkRows = opts.get("max-chunk-rows").map(_.toLong)
            .getOrElse(PeriodSizing.DefaultMaxChunkRows),
          // in-loop maintenance, scoped to the run window (vs
          // --compact-after's whole-table pass)
          autoCompactTargetFileBytes =
            opts.get("auto-compact-bytes").map(_.toLong),
          rewriteWidening = opts.contains("rewrite-widening")))
      println(s"[ibtp] done: mode=${res.mode} period=${res.period.name} " +
        s"periods=${res.periodsRun.size} rows=${res.rowsInserted}")
      // post-load integrity gate: the reference's "run without
      // unique_key and test for uniqueness only" (README.md:102)
      opts.get("check-unique").filter(_.nonEmpty).foreach { k =>
        TableChecks.requireUnique(target.read(), k.split(",").toSeq)
        println(s"[ibtp] uniqueness check passed on ($k)")
      }
      // fold the index's per-period partials (the manifest-fold
      // analogue: a daily loop otherwise grows df partials forever)
      if (opts.contains("index-compact")) {
        lexIndex.foreach { idx =>
          idx.compact()
          println("[ibtp] lexical index compacted")
        }
        pqIndex.foreach { idx =>
          idx.compact()
          println("[ibtp] pq index compacted")
        }
      }
      // post-load maintenance: rewrite small-file day-partitions
      if (opts.contains("compact-after"))
        target.compact().foreach(st => println(
          s"[ibtp] compacted ${st.partitionLabel}: ${st.filesBefore} -> ${st.filesAfter} files"))
    } finally spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String],
      acc: Map[String, Vector[String]]): Map[String, Vector[String]] =
    args match {
      case Nil => acc
      case flag :: rest if flag.startsWith("--") =>
        val k = flag.drop(2)
        def add(v: String) = acc + (k -> (acc.getOrElse(k, Vector.empty) :+ v))
        rest match {
          case v :: tail if !v.startsWith("--") => parse(tail, add(v))
          case _                                => parse(rest, add(""))
        }
      case other :: _ => sys.error(s"unexpected argument '$other'")
    }
}

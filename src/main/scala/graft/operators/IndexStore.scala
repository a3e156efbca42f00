package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared durability layer for the satellite index stores
  * ([[LexicalIndex]], [[PqIndex]]) — the write-side guarantees the
  * main table gets from `TargetTable`'s manifest protocol, scaled down
  * to a directory-of-components store:
  *
  *  - '''writer claim''': an owner-token claim file with a heartbeat
  *    thread serializes writers (appends, folds, repairs), so two
  *    pipelines loop-maintaining one index interleave safely instead of
  *    clobbering each other's in-flight parquet jobs. A crashed
  *    holder's claim goes stale ([[IndexStore.ClaimStaleMs]] without a
  *    heartbeat) and is swept by the next acquirer — the
  *    `TargetTable` commit-claim design without the per-sequence
  *    keying (an index has no version chain to key on).
  *  - '''crash-atomic staged append''': a batch's component outputs
  *    (postings/df/stats, or codes) are written to a per-batch stage
  *    directory FIRST; only once every component is complete does an
  *    intent marker land, and only then do the files publish into the
  *    live component directories by rename. A crash before the marker
  *    leaves unreferenced litter (swept under the next claim); a crash
  *    after it rolls FORWARD deterministically — so a searcher can
  *    never observe a batch whose postings landed but whose df/stats
  *    partials did not (a silently WRONG index: idf overstated, avgdl
  *    off), the torn state the old three-independent-appends design
  *    allowed.
  *  - '''checked fold swap''': the stage → intent → rename component
  *    swap used by `compact()`, with every rename's return value
  *    checked BEFORE the delete that would destroy the only surviving
  *    copy, and a deterministic forward/back repair.
  *
  * Because stage directories and fold markers only ever exist while
  * their creator holds the claim, a repair pass running UNDER the
  * claim knows everything it finds is dead — no age heuristics.
  * Readers are not serialized: a search may observe a fold's
  * instant-of-swap (transient read failure, retryable) or a prefix of
  * a publishing batch; both converge, and fold contents are identical
  * by construction.
  */
final class IndexStore(val spark: SparkSession, val path: String) {

  private val root = new Path(path)
  private[operators] def fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------------------
  // writer claim
  // ------------------------------------------------------------------

  private def claimFile = new Path(path, "_writer_claim")

  /** Truly-atomic create-if-absent — local FS drops to
    * `File.createNewFile` (O_CREAT|O_EXCL) because Hadoop's
    * `create(overwrite = false)` is a TOCTOU there; a token-write
    * failure after the create deletes the just-created file so the
    * claim is never left owner-less (stalling rivals for the whole
    * staleness window).
    */
  private def atomicCreate(p: Path, token: String): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      val f = new java.io.File(p.toUri.getPath)
      try {
        if (!f.createNewFile()) false
        else {
          val out = new java.io.FileOutputStream(f)
          try out.write(token.getBytes("UTF-8")) finally out.close()
          true
        }
      } catch { case _: java.io.IOException =>
        scala.util.Try(f.delete()); false
      }
    case _ =>
      var created = false
      try {
        val out = fs.create(p, false)
        created = true
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException =>
        if (created) scala.util.Try(fs.delete(p, false))
        false
      }
  }

  private def claimToken(): Option[String] =
    scala.util.Try {
      val in = fs.open(claimFile)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .nextOption()
      finally in.close()
    }.toOption.flatten

  /** Run `body` holding the index writer claim: acquire (sweeping a
    * crashed holder's stale claim), heartbeat while held, release.
    * Writers SERIALIZE here — concurrent appends both land, one after
    * the other; an append racing a fold waits for it. Waiting is
    * bounded by [[IndexStore.ClaimWaitMs]] and fails loudly after.
    */
  def withClaim[T](body: => T): T = {
    val token = acquire(blocking = true).getOrElse(
      throw new IllegalStateException(
        s"could not acquire the writer claim on index $path within " +
          s"${IndexStore.ClaimWaitMs / 1000}s — writer storm or stuck store?"))
    held(token)(body)
  }

  /** Non-blocking variant for read paths: run `body` only if the claim
    * is FREE (acquired on the first try). A live writer holding it
    * will run the same repairs itself, so skipping is always safe.
    */
  def tryWithClaim[T](body: => T): Option[T] =
    acquire(blocking = false).map(t => held(t)(body))

  private def held[T](token: String)(body: => T): T = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hb = new Thread(() => {
      while (!stop.get) {
        try Thread.sleep(IndexStore.ClaimStaleMs / 4)
        catch { case _: InterruptedException => () }
        if (!stop.get)
          scala.util.Try(fs.setTimes(claimFile, System.currentTimeMillis(), -1))
      }
    }, s"graft-index-claim-hb-${root.getName}")
    hb.setDaemon(true)
    hb.start()
    try body
    finally {
      stop.set(true)
      hb.interrupt()
      // release only if still ours: a swept-and-usurped claim belongs
      // to the usurper now
      if (claimToken().contains(token))
        scala.util.Try(fs.delete(claimFile, false))
      ()
    }
  }

  private def acquire(blocking: Boolean): Option[String] = {
    if (!fs.exists(root)) fs.mkdirs(root)
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + IndexStore.ClaimWaitMs
    while (true) {
      if (atomicCreate(claimFile, token)) return Some(token)
      val stale =
        scala.util.Try(fs.getFileStatus(claimFile).getModificationTime)
          .toOption
          .exists(System.currentTimeMillis() - _ > IndexStore.ClaimStaleMs)
      if (stale) scala.util.Try(fs.delete(claimFile, false))
      else if (!blocking) return None
      else Thread.sleep(25)
      if (System.currentTimeMillis() > deadline) return None
    }
    None // unreachable
  }

  // ------------------------------------------------------------------
  // crash-atomic staged append
  // ------------------------------------------------------------------

  /** Per-batch stage directory — write each component's output under
    * `stagePath(id)/<component>/`, then [[publishStaged]].
    */
  def stagePath(id: String): String = s"$path/_stage_$id"

  private def appendMarker(id: String) = new Path(path, s"_append_$id")

  private def isDataFileName(n: String): Boolean =
    !n.startsWith("_") && !n.startsWith(".")

  /** Atomically publish a completed stage: enumerate its component
    * files, land the intent marker (temp + rename), move every file
    * into its live component directory under a batch-unique name, then
    * clean up. The marker is written only once the stage is COMPLETE,
    * so [[repairAppends]] always rolls forward. Call under the claim.
    */
  def publishStaged(id: String, components: Seq[String]): Unit = {
    val stage = new Path(stagePath(id))
    val moves = components.flatMap { comp =>
      val d = new Path(stage, comp)
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq
        .filter(st => st.isFile && isDataFileName(st.getPath.getName))
        .map(st => s"$comp/b$id-${st.getPath.getName}")
    }
    IndexStore.crashHook("publish:staged")
    writeMarker(appendMarker(id), s"files=${moves.mkString(",")}\n")
    IndexStore.crashHook("publish:marker")
    finishPublish(id, moves)
  }

  /** The publish moves + cleanup, shared by the live path and repair.
    * Idempotent: a destination that already exists was moved by a
    * previous (crashed) attempt and is skipped.
    */
  private def finishPublish(id: String, moves: Seq[String]): Unit = {
    val stage = new Path(stagePath(id))
    moves.foreach { destRel =>
      val dest = new Path(path, destRel)
      if (!fs.exists(dest)) {
        val comp = destRel.takeWhile(_ != '/')
        val srcName = destRel.drop(comp.length + 1).stripPrefix(s"b$id-")
        val src = new Path(stage, s"$comp/$srcName")
        val destDir = new Path(path, comp)
        if (!fs.exists(destDir)) fs.mkdirs(destDir)
        if (!fs.exists(src) || !fs.rename(src, dest))
          throw new IllegalStateException(
            s"index publish $id under $path: could not move $destRel into " +
              "place — the intent marker is left for repairAppends to roll " +
              "forward once the store recovers")
        IndexStore.crashHook("publish:move")
      }
    }
    IndexStore.crashHook("publish:moved")
    // order matters for repair determinism: stage before marker, so a
    // marker with NO stage means every move completed
    if (fs.exists(stage)) fs.delete(stage, true)
    fs.delete(appendMarker(id), false)
    ()
  }

  /** Roll orphaned publishes forward and sweep dead pre-marker stages.
    * MUST run under the claim: stages/markers only exist while their
    * creator holds it, so everything found here is a crashed writer's.
    * Returns the number of publishes completed.
    */
  def repairAppends(): Int = {
    if (!fs.exists(root)) return 0
    val entries = fs.listStatus(root).toSeq.map(_.getPath)
    var repaired = 0
    entries.filter(p => p.getName.startsWith("_append_") &&
        !p.getName.endsWith(".tmp")).foreach { m =>
      val id = m.getName.stripPrefix("_append_")
      val in = fs.open(m)
      val moves =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .find(_.startsWith("files=")).map(_.stripPrefix("files="))
          .getOrElse(throw new IllegalStateException(
            s"corrupt index append marker $m — inspect $path, then delete it"))
          .split(",").toSeq.filter(_.nonEmpty)
        finally in.close()
      finishPublish(id, moves)
      repaired += 1
    }
    // a stage without a marker is a pre-publish crash: nothing was
    // published, delete outright (roll back)
    entries.filter(_.getName.startsWith("_stage_")).foreach { s =>
      val id = s.getName.stripPrefix("_stage_")
      if (!fs.exists(appendMarker(id))) fs.delete(s, true)
    }
    repaired
  }

  // ------------------------------------------------------------------
  // fold swap (component compaction)
  // ------------------------------------------------------------------

  private def foldIntent = new Path(s"$path/_fold_intent")

  private def writeMarker(p: Path, content: String): Unit = {
    val tmp = new Path(p.toString + ".tmp")
    val o = fs.create(tmp, true)
    try o.write(content.getBytes("UTF-8")) finally o.close()
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"could not write marker $p")
  }

  /** Stage → marker → swap one component directory; contents identical
    * by construction, so the only atomicity needed is "readers see the
    * old or the new directory, and a crash heals" — the marker is
    * written only once the staged build is complete, so rolling
    * FORWARD is always safe. Every rename is CHECKED before the delete
    * that would destroy the last copy: a failed rename throws with the
    * marker left in place for [[repairFold]], never deletes.
    */
  def swapDir(sub: String, build: String => Unit): Unit = {
    prepareFoldStage(sub)
    build(new Path(s"$path/${sub}__fold").toString)
    swapStaged(sub)
  }

  /** Build several components' staged folds CONCURRENTLY (independent
    * Spark jobs overlap their scheduling tails — the same back-fill
    * pattern as the compaction rewrite batches), then swap each one in
    * strictly SEQUENTIALLY via the single intent marker. The crash
    * contract is unchanged: a marker only ever exists after its
    * component's staged build is complete (forward-safe), at most one
    * marker at any instant, and a crash between swaps leaves earlier
    * components fully swapped and later components as markerless stage
    * directories (swept on the next writer's entry). If any build
    * fails, every sibling's completed stage is deleted before the
    * first failure is rethrown — nothing was published.
    */
  def swapDirs(subs: Seq[(String, String => Unit)]): Unit = {
    require(subs.map(_._1).distinct.size == subs.size,
      s"swapDirs got duplicate components: ${subs.map(_._1).mkString(",")}")
    subs.foreach { case (sub, _) => prepareFoldStage(sub) }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(subs.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // transform to Try so ALL builds run to completion before any
      // failure propagates — the failure state is quiescent and the
      // cleanup below sees every stage dir that was actually created
      val tried = Await.result(
        Future.sequence(subs.map { case (sub, build) =>
          Future(build(new Path(s"$path/${sub}__fold").toString))
            .transform(scala.util.Success(_))
        }), Duration.Inf)
      tried.collectFirst { case scala.util.Failure(e) => e }.foreach { e =>
        subs.foreach { case (sub, _) =>
          val stage = new Path(s"$path/${sub}__fold")
          if (fs.exists(stage)) fs.delete(stage, true)
        }
        throw e
      }
    } finally { pool.shutdown(); () }
    subs.foreach { case (sub, _) => swapStaged(sub) }
  }

  private def prepareFoldStage(sub: String): Unit = {
    val stage = new Path(s"$path/${sub}__fold")
    val old = new Path(s"$path/${sub}__old")
    if (fs.exists(stage)) fs.delete(stage, true)
    if (fs.exists(old)) fs.delete(old, true)
    ()
  }

  /** The marker → rename → cleanup swap of one COMPLETE staged fold —
    * the serialized tail of [[swapDir]]/[[swapDirs]].
    */
  private def swapStaged(sub: String): Unit = {
    val live = new Path(s"$path/$sub")
    val stage = new Path(s"$path/${sub}__fold")
    val old = new Path(s"$path/${sub}__old")
    writeMarker(foldIntent, s"sub=$sub\n")
    if (fs.exists(live) && !fs.rename(live, old))
      throw new IllegalStateException(
        s"fold swap of '$sub' under $path: could not park the live " +
          "directory — marker left; repairFold finishes the swap")
    if (!fs.rename(stage, live))
      throw new IllegalStateException(
        s"fold swap of '$sub' under $path: could not move the staged fold " +
          "into place (live is parked at ${sub}__old) — marker left; " +
          "repairFold rolls forward from the staged copy")
    fs.delete(old, true)
    fs.delete(foldIntent, false)
    ()
  }

  /** Heal a [[swapDir]] orphaned by a crash — deterministic from which
    * directories survived: the intent exists only while the staged
    * fold is complete, so forward is always safe; only-the-old-left
    * restores it. Renames are checked like [[swapDir]]'s.
    */
  def repairFold(): Boolean =
    if (!fs.exists(foldIntent)) false
    else {
      val in = fs.open(foldIntent)
      val sub =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .find(_.startsWith("sub=")).map(_.stripPrefix("sub=")).getOrElse(
            throw new IllegalStateException(
              s"corrupt fold intent $foldIntent — inspect $path, restore the " +
                "__old directory if its live sibling is missing, then delete " +
                "the marker"))
        finally in.close()
      val live = new Path(s"$path/$sub")
      val stage = new Path(s"$path/${sub}__fold")
      val old = new Path(s"$path/${sub}__old")
      def renameOrDie(from: Path, to: Path, what: String): Unit =
        if (!fs.rename(from, to))
          throw new IllegalStateException(
            s"fold repair of '$sub' under $path: could not $what — marker " +
              "left in place; retry once the store recovers")
      if (fs.exists(stage)) {
        // staged fold complete (the marker is written only after the
        // build): finish the swap forward
        if (fs.exists(live)) {
          if (fs.exists(old)) fs.delete(old, true)
          renameOrDie(live, old, "park the live directory")
        }
        renameOrDie(stage, live, "move the staged fold into place")
        fs.delete(old, true)
      } else if (fs.exists(live)) {
        fs.delete(old, true) // swap done; only cleanup was lost
      } else if (fs.exists(old)) {
        renameOrDie(old, live, "restore the parked directory")
      } else
        throw new IllegalStateException(
          s"orphaned fold intent for '$sub' under $path but no directory " +
            "survived — rebuild the index")
      fs.delete(foldIntent, false)
      true
    }

  /** All repairs, in dependency order. Call under the claim. */
  def repairAll(): Unit = {
    repairFold()
    repairAppends()
    ()
  }
}

object IndexStore {
  /** Test hook fired at every publish boundary (named like
    * `TargetTable.crashHook`): "publish:staged" (stage complete, no
    * marker yet), "publish:marker" (marker landed, nothing moved),
    * "publish:move" (after each file move), "publish:moved" (all
    * moved, stage + marker not yet cleared). A hook that throws
    * simulates a crash at that boundary; [[IndexStore.repairAppends]]
    * must converge the store to pre-append (no marker) or post-append
    * (marker) — never in between.
    */
  @volatile var crashHook: String => Unit = _ => ()

  /** A claim whose heartbeat is older than this is a crashed writer's
    * and may be swept by the next acquirer (heartbeats land every
    * quarter of it).
    */
  @volatile var ClaimStaleMs: Long = 60000L

  /** How long an acquirer waits on a LIVE rival before failing loudly
    * — index appends/folds are seconds, so minutes of contention means
    * a storm or a stuck store.
    */
  @volatile var ClaimWaitMs: Long = 600000L
}

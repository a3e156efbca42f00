package graft.queries

/** Scratch directories for queries that materialize a [[graft.ibtp.TargetTable]]
  * or a retrieval index as part of their own execution (the loop
  * family, q98's concurrent append, the q99–q102 index builds).
  *
  * `Files.createTempDirectory` per invocation leaked: a bench loop
  * re-running q98 three times parked three full event-table copies in
  * /tmp, and nothing ever deleted them across JVM runs. Scratch paths
  * here are DETERMINISTIC per query name and wiped at hand-out, so a
  * repeat invocation — same JVM or a later one — reuses the same disk
  * footprint; a shutdown hook removes the whole root at JVM exit as
  * well. The wipe at hand-out is also a correctness guard: a stale
  * target directory from a previous invocation would make the loop
  * RESUME instead of building fresh.
  */
object QueryScratch {

  private val root = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_qscratch")

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(root),
      "graft-qscratch-cleanup"))
    ()
  }

  private def deleteRec(f: java.io.File): Unit = {
    // never FOLLOW a symlink (delete the link itself): this runs in a
    // JVM shutdown hook, and a planted link inside a scratch slot must
    // not let the recursion escape the scratch root
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRec)
    }
    f.delete()
    ()
  }

  /** A fresh (wiped) scratch directory for `name`, stable across
    * invocations. Distinct queries use distinct names, so concurrent
    * queries never collide; a re-run of the SAME query reuses (and
    * first clears) its own slot.
    */
  def fresh(name: String): String = {
    hookInstalled
    val d = new java.io.File(root, name)
    deleteRec(d)
    if (!d.mkdirs() && !d.isDirectory)
      throw new IllegalStateException(s"could not create query scratch $d")
    d.toString
  }
}

package graft.tools

import java.nio.file.{Files, Path}

/** JVM-lifetime scratch directories for queries that materialize
  * intermediate tables (upsert targets, bucketed layouts, incremental
  * state, oracle-replay spills).
  *
  * `Files.createTempDirectory` alone leaks: a bench session calls the
  * materializing queries hundreds of times (reps × rungs × rounds) and
  * left >30 GB of orphaned scratch behind in round 5. Every directory
  * handed out here is registered once with a shutdown hook that
  * recursively deletes it when the JVM exits — the right lifetime for
  * per-run scratch (the paths live inside memos and cached plans, so
  * deleting earlier than JVM exit would break reuse within the run).
  * At a real deployment these would be job-scoped paths under a
  * lifecycle-managed prefix; the API shape (prefix → fresh dir) is the
  * same.
  */
object Scratch {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p =>
        try deleteRecursively(p) catch { case _: Throwable => () }
      }
    }, "graft-scratch-cleanup"))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  /** A fresh scratch directory, deleted on JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  private val reusable =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  /** A scratch directory REUSED across calls with the same tag, wiped
    * at every call. For queries that materialize a table per
    * invocation and are invoked many times in one JVM (bench reps ×
    * ladder rungs): with [[dir]], every rep leaked a full table copy
    * until JVM exit — at the sf100 rung the accumulated upsert tables
    * plus live shuffle spill filled the disk and killed the rung
    * ("No space left on device" in stage 2050's sort spill). Wiping
    * at call start bounds disk to ONE live copy per tag.
    *
    * Contract: the caller must fully consume any DataFrame reading a
    * previous call's output before calling again with the same tag —
    * true for the bench/verify loops, which materialize each query's
    * result before the next invocation. */
  def reusableDir(tag: String): String = {
    hookInstalled
    val p = reusable.computeIfAbsent(tag, _ => {
      val d = Files.createTempDirectory(tag)
      created.add(d)
      d
    })
    // wipe contents, keep the dir itself
    val s = Files.list(p)
    try s.forEach(deleteRecursively) finally s.close()
    p.toString
  }

  /** Proactively wipe the CONTENTS of every reusable dir (round-11
    * scratch management): wipe-at-call bounds disk to one live copy
    * per tag, but that copy still sits on disk until the tag's NEXT
    * call — at the sf100 rung the two events-sized upsert tables
    * (~13 GB) outlived their rows and starved every row scheduled
    * after them (14 disk-gate skips). The ladder calls this between
    * rows; safe under the reusableDir contract (any DataFrame reading
    * a previous call's output is fully consumed before the next row
    * starts). */
  def wipeReusable(): Unit =
    reusable.forEach { (_, p) =>
      try {
        val s = Files.list(p)
        try s.forEach(deleteRecursively) finally s.close()
      } catch { case _: Throwable => () }
    }
}

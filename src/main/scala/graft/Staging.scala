package graft

import java.nio.file.Files

/** Per-JVM staging root for queries that materialize intermediate
  * files/tables (CSV/JSON/ORC roundtrips, bucketed and partitioned
  * layouts, model persistence). A fresh `createTempDirectory` per JVM
  * means concurrent processes (a Bench run next to a Verify run) can
  * never race on each other's `mode("overwrite")` deletes, while
  * re-invocations WITHIN a session keep hitting the same path — the
  * idempotent-overwrite behavior the `--twice` probes check. The root
  * is deleted on JVM exit: staging is scratch, and without the hook
  * every Bench/Verify invocation would leave its roundtrip files and
  * staged tables behind (steady litter on a long-lived cluster node —
  * the checkpoint-dir lesson, ADVICE r8).
  */
object Staging {
  lazy val root: String = {
    val d = Files.createTempDirectory("graft_stage_")
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(d), "graft-staging-cleanup"))
    d.toString
  }

  /** Stable per-purpose subdirectory within this JVM's staging root. */
  def dir(purpose: String, sfDir: String): String =
    s"$root/${purpose}_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"

  /** STRICT recursive delete: any failure to remove an entry throws.
    * For certification paths — [[graft.Verify]]'s stale-dump purge —
    * where a swallowed delete failure would silently re-admit a
    * previous run's artifacts into the compare. The best-effort
    * variant below stays for shutdown/cleanup paths, where the
    * opposite trade-off holds. */
  private[graft] def deleteRecursivelyStrict(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverseIterator
          .foreach(Files.delete(_))
      } finally walk.close()
    }

  /** Best-effort recursive delete for self-created local temp dirs (a
    * caller-provided directory is never passed here). Shared by the
    * staging shutdown hook and [[graft.ml.Recsys]]'s temp checkpoint
    * cleanup. */
  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(Files.deleteIfExists(_))
        finally walk.close()
      }
      // NonFatal, not just IOException: Files.walk's iterator wraps IO
      // errors in UncheckedIOException (a RuntimeException), and this is
      // called from finally blocks — a traversal hiccup must not replace
      // a successful result with an exception (ADVICE r9)
    } catch { case scala.util.control.NonFatal(_) => () }
}

package graft

import java.nio.file.Files

/** Per-JVM staging root for queries that materialize intermediate
  * files/tables (CSV/JSON/ORC roundtrips, bucketed and partitioned
  * layouts, model persistence). A fresh `createTempDirectory` per JVM
  * means concurrent processes (a Bench run next to a Verify run) can
  * never race on each other's `mode("overwrite")` deletes, while
  * re-invocations WITHIN a session keep hitting the same path — the
  * idempotent-overwrite behavior the `--twice` probes check. */
object Staging {
  lazy val root: String =
    Files.createTempDirectory("graft_stage_").toString

  /** Stable per-purpose subdirectory within this JVM's staging root. */
  def dir(purpose: String, sfDir: String): String =
    s"$root/${purpose}_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
}

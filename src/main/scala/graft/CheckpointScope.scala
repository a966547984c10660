package graft

import org.apache.spark.SparkContext

/** Restores the session-global checkpoint dir after a scoped override
  * (the pattern [[graft.ext.Dedup.connectedComponents]] uses: point the
  * session at the caller's dir for a loop's duration, then put back what
  * was there).
  *
  * Spark exposes no exact-restore API: `setCheckpointDir(root)` resolves
  * and mkdirs a fresh UUID-suffixed subdir of `root`, and
  * `getCheckpointDir` returns that RESOLVED path. Restoring with the
  * latest resolved path therefore re-anchors one UUID level DEEPER on
  * every scoped call — repeated calls in a session with a pre-set
  * checkpoint dir would nest directories unboundedly (ADVICE r9). This
  * helper remembers, for every resolved path a restore produced, the
  * root string that produced it, and restores with the ROOT — so no
  * matter how many scoped calls run, the session dir stays anchored one
  * level under the first prior dir ever seen, never deeper.
  *
  * What this does NOT prevent: each restore's `setCheckpointDir(root)`
  * still mkdirs one fresh empty UUID SIBLING under the pinned root
  * (Spark offers no way to re-point at an existing resolved dir), so N
  * scoped calls leave up to N empty sibling dirs there — flat,
  * bounded by call count, and under the dir the user already owns and
  * cleans; only the unbounded DEPTH growth is the hazard this fixes.
  */
private[graft] object CheckpointScope {
  // resolved checkpoint path -> the root string whose setCheckpointDir
  // produced it. One small-string entry per restore call in this JVM —
  // growth is bounded by the number of scoped-override calls, not data.
  private val rootOf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Put the session checkpoint dir back to `prev` (a value captured
    * from `sc.getCheckpointDir` before the override). None restores the
    * unset state exactly; Some(p) restores to p's recorded ROOT when p
    * was itself produced by an earlier restore, else to p itself (the
    * one unavoidable extra level for an externally-set dir).
    *
    * Failure contract (ADVICE r10/r11): `primary` carries the scoped
    * work's own exception when the caller is already propagating one.
    * A restore failure (pinned root deleted, mkdirs refused) then must
    * not REPLACE it — it is attached via `addSuppressed` and swallowed,
    * so the loop's error stays the one the caller sees with the restore
    * failure preserved on its suppressed list. When the scoped work
    * SUCCEEDED (`primary` empty) the restore failure is rethrown:
    * silently leaving the session at the scoped dir — which callers are
    * documented as free to delete — would point later checkpoint users
    * at a dangling dir with only a stderr line as evidence.
    *
    * Known limitation (ADVICE r12): `addSuppressed` is a silent no-op
    * when the primary was constructed with suppression DISABLED
    * (`enableSuppression = false`, used by some framework exceptions) —
    * in that rare case the restore failure survives only as the stderr
    * line. Accepted: the callers here propagate ordinary loop/Spark
    * exceptions, which keep suppression enabled. */
  def restore(sc: SparkContext, prev: Option[String],
              primary: Option[Throwable] = None): Unit =
    try prev match {
      case None => sc.setCheckpointDir(null)
      case Some(p) =>
        val root = rootOf.getOrDefault(p, p)
        sc.setCheckpointDir(root)
        sc.getCheckpointDir.foreach(resolved => rootOf.put(resolved, root))
    } catch {
      case scala.util.control.NonFatal(e) => primary match {
        case Some(t) =>
          t.addSuppressed(e)
          System.err.println(
            s"[graft] checkpoint-dir restore failed (suppressed into the " +
              s"primary exception; session left at the scoped dir): $e")
        case None => throw e
      }
    }
}

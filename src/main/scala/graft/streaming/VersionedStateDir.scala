package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The versioned-parquet state-dir protocol shared by the incremental
  * maintainers ([[ProjectionMaintenance]] for the co-purchase pair
  * support, [[MinhashMaintenance]] for the near-dup signature store +
  * pairs): immutable `v{batchId}` version paths, an atomically-replaced
  * `_current` pointer file (temp + ATOMIC_MOVE — readers resolve the
  * pointer and scan exactly one version; a crash mid-write leaves a
  * dangling unreferenced dir, never a torn state), a `_query_id`
  * checkpoint-identity file (a deleted/replaced checkpoint restarts
  * Structured Streaming batchIds at 0, which the replay guard would
  * read as stale — the identity mismatch fails LOUDLY at start instead
  * of silently dropping every new append), and retention GC (committed
  * versions older than the `keepVersions` most recent are deleted after
  * each commit; keepVersions >= 2 leaves the previous version for
  * readers that resolved the pointer just before the commit, and
  * versions NEWER than the pointer — crash orphans or a concurrent
  * committer's in-flight write — are never touched). Factored out of
  * ProjectionMaintenance in r17 so the minhash maintainer rides the
  * identical commit/replay/lineage machinery instead of a second copy
  * that could drift. A real lakehouse would swap the pointer file for a
  * table format's transaction log; the shape (immutable versions +
  * atomic pointer + retention + lineage identity) is the same. */
private[streaming] final class VersionedStateDir(
    stateDir: String, keepVersions: Int) {
  import VersionedStateDir._

  /** Largest batchId already folded into the state (-1 = empty). */
  def lastApplied(): Long = {
    val p = Paths.get(stateDir, PointerFile)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  def versionPath(batchId: Long): String = s"$stateDir/v$batchId"

  /** Commit `batchId`: atomically advance the pointer, then GC stale
    * committed versions. The caller must have finished writing every
    * table under [[versionPath]] before calling. */
  def commit(batchId: Long): Unit = {
    val dir = Paths.get(stateDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$PointerFile.tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, dir.resolve(PointerFile),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    pruneVersions(batchId)
  }

  private def pruneVersions(committed: Long): Unit = {
    val dir = Paths.get(stateDir)
    if (!Files.isDirectory(dir)) return
    // Files.list / Files.walk streams hold an open directory fd until
    // closed, and this runs on EVERY micro-batch commit — a long-running
    // maintainer must not lean on GC to release them (ADVICE r17).
    val vs = scala.collection.mutable.ArrayBuffer.empty[(Long, java.nio.file.Path)]
    val listing = Files.list(dir)
    try listing.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith("v") && n.length > 1 && n.drop(1).forall(_.isDigit))
        vs += ((n.drop(1).toLong, p))
    } finally listing.close()
    vs.filter(_._1 <= committed).sortBy(-_._1).drop(keepVersions)
      .foreach { case (_, p) =>
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
  }

  /** The streaming-query id recorded in a checkpoint's metadata file
    * (None for a fresh checkpoint). Structured Streaming assigns one id
    * per checkpoint and keeps it across restarts; a deleted/replaced
    * checkpoint gets a NEW id and restarts batchIds at 0. */
  def checkpointQueryId(checkpointDir: String): Option[String] = {
    val p = Paths.get(checkpointDir, "metadata")
    if (!Files.exists(p)) None
    else """"id"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(Files.readString(p)).map(_.group(1))
  }

  /** Checkpoint-identity guard (ADVICE r16): fail loudly before the
    * stream starts when the state was built under a different
    * checkpoint than the one supplied — the silent-data-loss
    * alternative is batchIds restarting at 0 and every new append
    * skipping as a "replay". */
  def guardIdentity(checkpointDir: String): Unit = {
    val idFile = Paths.get(stateDir, IdentityFile)
    val stored =
      if (Files.exists(idFile)) Some(Files.readString(idFile).trim) else None
    (stored, checkpointQueryId(checkpointDir)) match {
      case (Some(s), Some(c)) if s != c =>
        throw new IllegalStateException(
          s"state dir $stateDir was built under checkpoint query id $s " +
            s"but $checkpointDir belongs to query id $c — a replaced " +
            "checkpoint restarts batchIds at 0 and the replay guard " +
            "would silently drop every new append. Point the maintainer " +
            "at the original checkpoint, or start a fresh state dir.")
      case (None, Some(c)) if lastApplied() >= 0 =>
        throw new IllegalStateException(
          s"state dir $stateDir has committed versions but no recorded " +
            s"checkpoint identity, while $checkpointDir belongs to query " +
            s"id $c — the state's lineage cannot be verified (it may have " +
            "been built under a different, since-replaced checkpoint). " +
            "Refusing to start; rebuild the state or restore the " +
            "original checkpoint+identity pair.")
      case (Some(s), None) if lastApplied() >= 0 =>
        throw new IllegalStateException(
          s"state dir $stateDir (built under checkpoint query id $s) is " +
            s"non-empty but $checkpointDir has no metadata — the " +
            "checkpoint was deleted or replaced; refusing to start with " +
            "batchIds reset to 0 (every new append would be silently " +
            "skipped as stale).")
      case _ => ()
    }
  }

  /** Persist the checkpoint's query id if its metadata file already
    * exists (Structured Streaming writes it when the query object is
    * constructed, BEFORE the first batch runs). Maintainers call this at
    * the top of every batch fold so the identity lands before the first
    * state commit — a crash between v0's commit and a post-start
    * persist would otherwise leave a committed state with no lineage,
    * which a later start against a fresh checkpoint would silently
    * accept (ADVICE r17). No-op for direct spec replays (no metadata). */
  def persistIdentityFromCheckpoint(checkpointDir: String): Unit =
    checkpointQueryId(checkpointDir).foreach(persistIdentity)

  /** Record the checkpoint's query id on first start (no-op after). */
  def persistIdentity(queryId: String): Unit = {
    val dir = Paths.get(stateDir)
    Files.createDirectories(dir)
    val idFile = dir.resolve(IdentityFile)
    if (!Files.exists(idFile)) {
      val tmp = dir.resolve(s".$IdentityFile.tmp")
      Files.writeString(tmp, queryId)
      Files.move(tmp, idFile, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

private[streaming] object VersionedStateDir {
  private[streaming] val PointerFile = "_current"
  private[streaming] val IdentityFile = "_query_id"
}

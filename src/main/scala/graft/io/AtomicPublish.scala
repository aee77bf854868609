package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared stage → park → publish → restore-on-abort swap used by the
  * replace-style sinks ([[Rollup]] batch dirs, [[FilterStore]] images).
  * One implementation so a crash-safety fix cannot drift between them.
  *
  * Invariant: the last-good image is NEVER deleted before its
  * replacement is durable in `staging` — at every instant either
  * `target` or `parked` holds a complete previous version (or the
  * replacement is already live). A crash between the two renames leaves
  * the survivor in `parked`; [[recover]] (called by writers before
  * staging, under the single-writer contract) restores it.
  */
object AtomicPublish {

  /** Heal a crash between park and publish: `target` missing with
    * `parked` present → restore. Returns true if it restored.
    */
  def recover(fs: FileSystem, target: Path, parked: Path): Boolean =
    if (!fs.exists(target) && fs.exists(parked)) fs.rename(parked, target)
    else false

  /** Swap a FULLY-WRITTEN staging dir into place (caller verifies the
    * `_SUCCESS` marker first).
    */
  def replace(fs: FileSystem, staging: Path, target: Path, parked: Path,
      what: String): Unit = {
    val hadPrevious = fs.exists(target)
    // parked can only be stale here: if it held the survivor, recover()
    // moved it to target (or the caller skipped recover and target is
    // live anyway).
    if (hadPrevious) fs.delete(parked, true)
    if (hadPrevious && !fs.rename(target, parked))
      throw new java.io.IOException(s"$what: failed to park $target")
    if (!fs.rename(staging, target)) {
      if (hadPrevious) fs.rename(parked, target) // restore-on-abort
      throw new java.io.IOException(s"$what: failed to publish $staging to $target")
    }
    fs.delete(parked, true)
  }
}

package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Writer fencing for the path sinks — turns the documented "single
  * writer per table" TRUST into an enforced contract: every writer
  * acquires a monotonically-increasing epoch token when it STARTS, and
  * re-checks "am I still the newest writer?" immediately before each
  * irreversible commit step (snapshot promotion, manifest/pointer flip,
  * GC). A zombie writer — paused by GC/network partition while a newer
  * writer started and committed — fails loudly at its next check instead
  * of clobbering the newer state.
  *
  * Tokens are `_epoch.NNNNNNNNNNNN` marker files acquired by EXCLUSIVE
  * create (`FileSystem.create(overwrite = false)`): atomic on HDFS (a
  * namenode operation); on object stores substitute a conditional PUT —
  * the same API boundary as the manifest flip itself. As with all
  * check-then-act fencing against a store that does not verify tokens on
  * write, a writer superseded in the instant BETWEEN its check and its
  * flip can still race — the window is microseconds instead of the
  * unbounded zombie stall, and closing it entirely requires the store to
  * check tokens (Delta's txn log, conditional writes).
  */
private[io] object Fencing {

  private val MarkerRe = """^_epoch\.(\d{12})$""".r
  private def markerName(e: Long) = f"_epoch.$e%012d"

  def list(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap(st => st.getPath.getName match {
      case MarkerRe(n) => Some(n.toLong)
      case _ => None
    })

  /** Acquire the next epoch: exclusive-create the marker, retrying past
    * collisions with concurrent acquirers (each retry targets a higher
    * number, so the loop terminates with a unique token).
    */
  def acquire(fs: FileSystem, root: Path): Long = {
    fs.mkdirs(root)
    var e = list(fs, root).maxOption.getOrElse(0L) + 1
    var acquired = false
    while (!acquired) {
      try {
        fs.create(new Path(root, markerName(e)), false).close()
        acquired = true
      } catch {
        case _: java.io.IOException => e += 1
      }
    }
    e
  }

  /** Fail loudly if a newer writer has started on this table. Call
    * immediately before every irreversible commit step.
    */
  def check(fs: FileSystem, root: Path, epoch: Long): Unit =
    if (list(fs, root).exists(_ > epoch))
      throw new java.io.IOException(
        s"fencing violation: writer epoch $epoch superseded by a newer writer on $root — " +
          "aborting commit (zombie-writer protection; rerun picks up the newer state)")

  /** GC markers older than `epoch` (keep the caller's and any newer). */
  def gc(fs: FileSystem, root: Path, epoch: Long): Unit =
    list(fs, root).filter(_ < epoch)
      .foreach(e => fs.delete(new Path(root, markerName(e)), false))
}

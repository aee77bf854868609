package graft

/** Shared session sizing for the driver mains (Bench / Verify / RunQuery /
  * EntrySmoke). One knob lives here because round 12's sf100 point showed
  * it is SCALE-dependent: `spark.sql.shuffle.partitions` was pinned to
  * the core count (32), which is right through sf10 (every post-shuffle
  * partition fits in its task's memory share) but at sf100 a 19 GB input
  * pushed ~20 M-row partitions into single-task TimSorts and
  * spill-then-merge aggregates — the measured super-linear decade
  * (BASELINE.md sf100 table, pre-fix column). The production-shaped fix
  * from SCALING.md's config table ("≈ 2–3× total cores; AQE coalesces
  * down"): keep `shuffle.partitions` at the core count as the FLOOR, and
  * raise `spark.sql.adaptive.coalescePartitions.initialPartitionNum` in
  * proportion to the INPUT BYTES so AQE starts wide on big data and
  * coalesces small shuffles back down to a handful of tasks. Initial
  * partitions, not a bigger static count, because iterative loops (q61's
  * 22 rounds of ~MB-sized self-joins) must keep collapsing to tiny plans
  * at any data scale.
  */
object Sessions {

  /** ~one initial partition per 64 MB of on-disk input (the AQE advisory
    * post-shuffle size), clamped to [cpus, 1024]: ≤ sf10 (1.8 GB) stays
    * at the core count — bit-identical sessions to rounds 1–11 — while
    * sf100 (19 GB) starts ~300-wide. Env override:
    * `SPARK_GRAFT_INIT_PARTS`.
    */
  def initialParts(sfDir: String, cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_INIT_PARTS").map(_.toInt).getOrElse {
      // The walk is only a WIDTH HINT: an unreadable subdirectory or a
      // file deleted mid-walk must not abort the session build, so any
      // IO failure falls back to the core count (the pre-scaling
      // behavior) instead of propagating.
      val bytes = scala.util.Try {
        val root = java.nio.file.Paths.get(sfDir)
        if (!java.nio.file.Files.isDirectory(root)) 0L
        else {
          val s = java.nio.file.Files.walk(root)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      }.recover { case e =>
        Console.err.println(
          s"graft.Sessions: sfDir walk failed (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}); initialPartitionNum falls back to cpus=$cpus")
        0L
      }.get
      math.max(cpus, math.min(1024L, bytes / (64L << 20)).toInt)
    }

  /** The SPARK_GRAFT_ONLY subset contract, shared by Bench and Verify so
    * the two tools cannot drift (r13 ADVICE: Verify was exact-name-only
    * while Bench accepted bare qNN prefixes). A token matches a query by
    * full name OR by its bare qNN prefix; a token that matches NOTHING is
    * a sweep-script typo, and silently producing an empty (or thinner)
    * run corrupts the round's artifacts — fail loudly instead.
    */
  def subsetFilter(
      onlyEnv: Option[String], names: Seq[String]): Seq[String] = {
    onlyEnv.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case None => names
      case Some(tokens) =>
        val unmatched = tokens.filterNot(t =>
          names.exists(n => n == t || n.takeWhile(_ != '_') == t))
        require(unmatched.isEmpty,
          s"SPARK_GRAFT_ONLY tokens match no query: ${unmatched.toSeq.sorted.mkString(",")} " +
            s"(valid: full names or bare qNN prefixes of ${names.size} queries)")
        names.filter(n =>
          tokens.contains(n) || tokens.contains(n.takeWhile(_ != '_')))
    }
  }
}

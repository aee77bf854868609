package graft.io

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import graft.engine.Scd2
import graft.pipeline.Silver
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental SCD2 sink (graft.io.Scd2History) against the round-2
  * full-snapshot rewrite it replaces, on the reference's own raw data:
  *
  *  1. state is BIT-IDENTICAL to the pure Scd2.merge chain over 3 batches;
  *  2. closed partitions are byte-identical across a later merge (the
  *     write really is current + delta, not a snapshot rewrite);
  *  3. the merge plan reads ONLY the current partition (partition pruning
  *     on end_date IS NULL — closed history never rescans);
  *  4. re-running the same (batch, asOf) merge is idempotent.
  */
class Scd2IncrementalSpec extends SparkSpec {

  import DoctorsBatches.{writeBatches, partitionDigests}

  private val entity = Silver.entities.find(_.name == "doctors").get

  private def cleaned(raw: String): DataFrame =
    Silver.splitBatch(spark, raw, entity)._1

  private val cols = Seq("doctor_id", "first_name", "last_name", "speciality",
    "experience_years", "effective_date", "end_date", "is_current")

  private def canon(df: DataFrame): Seq[String] =
    df.select(cols.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("incremental sink: bit-identical to Scd2.merge over 3 batches, closed partitions immutable, pruned reads, idempotent rerun") {
    val (raw1, raw2, raw3) = writeBatches()
    val wh = Files.createTempDirectory("graft_incr_wh").toString
    val path = Silver.silverPath(wh, "doctors")
    val d1 = LocalDate.parse("2026-01-01")
    val d2 = LocalDate.parse("2026-02-01")
    val d3 = LocalDate.parse("2026-03-01")

    // --- the production path (incremental sink) ---
    Silver.runEntity(spark, raw1, wh, entity, d1)
    Silver.runEntity(spark, raw2, wh, entity, d2)
    val closedAfter2 = partitionDigests(path)
    assert(closedAfter2.nonEmpty, "batch 2 expired rows into a closed partition")

    Silver.runEntity(spark, raw3, wh, entity, d3)

    // --- the oracle: pure in-memory Scd2.merge chain ---
    val expected = Seq((cleaned(raw2), d2), (cleaned(raw3), d3))
      .foldLeft(Scd2.bootstrap(cleaned(raw1), d1)) {
        case (state, (batch, asOf)) =>
          Scd2.merge(state, batch, entity.keys, entity.compareCols, asOf)
      }

    // 1. bit-identical state
    assert(canon(Tables.read(spark, path)) == canon(expected))

    // 2. the 2026-02-01 closed partition is byte-identical after batch 3
    val after3 = partitionDigests(path)
    closedAfter2.foreach { case (f, digest) =>
      assert(after3.get(f).contains(digest), s"closed file $f changed across a merge")
    }
    assert(after3.keys.exists(_.startsWith("end_date=2026-03-01")),
      "batch 3's delta landed in its own closed partition")

    // 3. merge input reads only the current partition's live generation
    // (directory-name pruning — closed days are not even listed)
    val inputs = Scd2History.readCurrent(spark, path).inputFiles
    assert(inputs.nonEmpty &&
      inputs.forall(_.contains("end_date=__HIVE_DEFAULT_PARTITION__/gen=")),
      s"current read must target only the live current generation: ${inputs.mkString(", ")}")

    // 4. idempotent rerun of the same (batch, asOf)
    Scd2History.merge(spark, path, cleaned(raw3), entity.keys, entity.compareCols, d3)
    assert(canon(Tables.read(spark, path)) == canon(expected))
    val afterRerun = partitionDigests(path)
    closedAfter2.foreach { case (f, digest) =>
      assert(afterRerun.get(f).contains(digest), s"closed file $f changed on rerun")
    }
  }
}

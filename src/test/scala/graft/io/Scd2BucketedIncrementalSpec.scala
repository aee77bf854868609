package graft.io

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import graft.engine.Scd2
import graft.pipeline.Silver
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The UNIFIED bucketed-incremental SCD2 sink
  * ([[Scd2History.mergeBucketed]]): both 100 TB properties at once —
  *
  *  1. the merge plan has exactly ONE exchange (the incoming batch moving
  *     to the bucket layout; the current side reads its buckets);
  *  2. state is BIT-IDENTICAL to the pure Scd2.merge chain over 3 batches;
  *  3. closed partitions are byte-identical across a later merge (the
  *     write really is current + delta, not a table rewrite);
  *  4. re-running the same (batch, asOf) merge is idempotent.
  */
class Scd2BucketedIncrementalSpec extends SparkSpec {

  import DoctorsBatches.{writeBatches, partitionDigests}

  private val entity = Silver.entities.find(_.name == "doctors").get
  private val table = Silver.silverTable("doctors")

  private def cleaned(raw: String): DataFrame =
    Silver.splitBatch(spark, raw, entity)._1

  private val cols = Seq("doctor_id", "first_name", "last_name", "speciality",
    "experience_years", "effective_date", "end_date", "is_current")

  private def canon(df: DataFrame): Seq[String] =
    df.select(cols.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("unified sink: one-exchange merge plan, bit-identical state, immutable closed partitions, idempotent rerun") {
    val (raw1, raw2, raw3) = writeBatches()
    val wh = Files.createTempDirectory("graft_bincr_wh").toString
    val path = Silver.silverHistoryPath(wh, "doctors")
    val d1 = LocalDate.parse("2026-01-01")
    val d2 = LocalDate.parse("2026-02-01")
    val d3 = LocalDate.parse("2026-03-01")
    try {
      Silver.runEntityBucketed(spark, raw1, wh, entity, d1)

      // 1. the merge over the unified current plans with ONE exchange: the
      // batch moving to the bucket layout; the current side reads its
      // buckets directly. (A key-unique literal batch isolates the merge
      // join — the production batch adds its own upstream dedup shuffle,
      // which is batch-side cost, not a history-side exchange.)
      import spark.implicits._
      val literalBatch = Seq(
        ("00000000-0000-0000-0000-0000000000aa", "A", "B", "Cardiology", 1))
        .toDF("doctor_id", "first_name", "last_name", "speciality", "experience_years")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try Scd2.merge(Scd2History.readCurrentBucketed(spark, table),
            literalBatch, entity.keys, entity.compareCols, d2)
          .queryExecution.executedPlan.toString
        finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      val exchanges = "(?m)^[^\\n]*\\bExchange\\b".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange (batch side only), got $exchanges:\n$plan")
      assert(plan.contains("Bucketed: true"), s"current scan not bucketed:\n$plan")

      Silver.runEntityBucketed(spark, raw2, wh, entity, d2)
      val closedAfter2 = partitionDigests(path)
      assert(closedAfter2.nonEmpty, "batch 2 expired rows into a closed partition")

      Silver.runEntityBucketed(spark, raw3, wh, entity, d3)

      // --- the oracle: pure in-memory Scd2.merge chain ---
      val expected = Seq((cleaned(raw2), d2), (cleaned(raw3), d3))
        .foldLeft(Scd2.bootstrap(cleaned(raw1), d1)) {
          case (state, (batch, asOf)) =>
            Scd2.merge(state, batch, entity.keys, entity.compareCols, asOf)
        }

      // 2. bit-identical state (full history = closed partitions ∪ current table)
      assert(canon(Scd2History.readAllBucketed(spark, path, table)) == canon(expected))

      // 3. the 2026-02-01 closed partition is byte-identical after batch 3
      val after3 = partitionDigests(path)
      closedAfter2.foreach { case (f, digest) =>
        assert(after3.get(f).contains(digest), s"closed file $f changed across a merge")
      }
      assert(after3.keys.exists(_.startsWith("end_date=2026-03-01")),
        "batch 3's delta landed in its own closed partition")

      // 4. idempotent rerun of the same (batch, asOf)
      Scd2History.mergeBucketed(spark, path, table, cleaned(raw3),
        entity.keys, entity.compareCols, d3, numBuckets = 8)
      assert(canon(Scd2History.readAllBucketed(spark, path, table)) == canon(expected))
      val afterRerun = partitionDigests(path)
      closedAfter2.foreach { case (f, digest) =>
        assert(afterRerun.get(f).contains(digest), s"closed file $f changed on rerun")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__staging")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__old")
    }
  }
}

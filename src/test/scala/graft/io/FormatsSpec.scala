package graft.io

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the pipeline's parquet/CSV/NDJSON
  * reads: ORC, CSV and JSON sinks round-trip the same relational data, and
  * ORC scans take predicate pushdown like parquet does — so the engine is
  * not parquet-bound if a user's lake speaks another format.
  */
class FormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val src = Tables.load(spark, dir, "customer")
    .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("c_custkey"), col("c_name"),
      col("c_acctbal").cast("string"), col("c_mktsegment"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("ORC sink/source round-trip with pushed filters") {
    val out = Files.createTempDirectory("graft_orc").toString
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(canon(back) == canon(src))
    val plan = back.filter(col("c_custkey") === 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"),
      s"ORC scan did not receive the pushed filter:\n$plan")
  }

  test("CSV sink/source round-trip (header + explicit schema)") {
    val out = Files.createTempDirectory("graft_csv").toString
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert(canon(back) == canon(src))
  }

  test("JSON (NDJSON) sink/source round-trip") {
    val out = Files.createTempDirectory("graft_json").toString
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(canon(back) == canon(src))
  }
}

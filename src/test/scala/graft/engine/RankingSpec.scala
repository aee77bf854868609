package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking.globalRank: exact parity with the single-task window form on
  * every layout (including heavy duplicate keys resolved by tiebreaker),
  * and no GLOBAL sort anywhere in the physical plan.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int) =
    (1 to n).map(i => ((i * 131) % 97, i.toLong)).toDF("v", "id")

  test("matches window row_number under any input layout") {
    val expected = data(5000)
      .withColumn("rank",
        row_number().over(Window.orderBy($"v", $"id")).cast("long"))
      .orderBy("id").collect().toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = Ranking.globalRank(
        data(5000).repartition(parts), Seq($"v", $"id"), "rank")
        .orderBy("id").collect().toSeq
      assert(got == expected, s"layout parts=$parts diverged")
    }
  }

  test("reliable-checkpoint mode: same ranks, checkpoint files actually written") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val expected = Ranking.globalRank(data(1000), Seq($"v", $"id"), "rank")
      .orderBy("id").collect().toSeq
    spark.conf.set(Materialize.ReliableDirConf, dir)
    try {
      val got = Ranking.globalRank(data(1000).repartition(5), Seq($"v", $"id"), "rank")
        .orderBy("id").collect().toSeq
      assert(got == expected)
      // the pin really went through reliable checkpoint, not local blocks
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "no checkpoint files written under the reliable dir")
    } finally {
      spark.conf.unset(Materialize.ReliableDirConf)
    }
  }

  test("no global sort in the plan; ranks are dense 1..N") {
    val out = Ranking.globalRank(data(2000), Seq($"v", $"id"), "rank")
    out.collect()
    val plan = out.queryExecution.executedPlan
    val physical = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val globalSorts = physical.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, s"found global sorts:\n$globalSorts")
    val ranks = out.select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 2000L).toSeq)
  }
}

package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExactQuantiles.byCounts must be BIT-IDENTICAL to Spark's built-in
  * `percentile` aggregate — q41's oracle hash depends on it. The suite
  * drives adversarial distributions through both plans and asserts raw
  * double equality (no rounding): heavy ties (runs covering both
  * interpolation indices), all-distinct values, single-row groups,
  * integral positions (p=0, p=1, and n making p·(n−1) exact), nulls
  * ignored, and a seeded random sweep across group sizes.
  */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9,
    "p0" -> 0.0, "p100" -> 1.0)

  private def builtin(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("v").isNotNull).groupBy(col("g")).agg(
      ps.map { case (n, p) =>
        expr(s"percentile(v, ${p}D)").as(n)
      }.head, ps.tail.map { case (n, p) =>
        expr(s"percentile(v, ${p}D)").as(n)
      }: _*)

  /** Runs `f` once per cumulative strategy (the round-18 size gate would
    * otherwise route every tiny test frame to the one-phase path and the
    * two-phase plan would lose its regression coverage): minBytes=0
    * forces two-phase, minBytes=MaxValue forces one-phase.
    */
  private def bothPaths(f: => Unit): Unit = {
    for (min <- Seq(0L, Long.MaxValue)) {
      spark.conf.set(ExactQuantiles.TwoPhaseMinBytesConf, min.toString)
      try f
      finally spark.conf.unset(ExactQuantiles.TwoPhaseMinBytesConf)
    }
  }

  private def assertParity(rows: Seq[(String, java.lang.Double)]): Unit = bothPaths {
    val df = rows.toDF("g", "v")
    val got = ExactQuantiles.byCounts(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val want = builtin(df)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got.keySet == want.keySet,
      s"group sets differ: ${got.keySet} vs ${want.keySet}")
    for (g <- want.keySet)
      assert(got(g) == want(g), s"group $g: got ${got(g)}, want ${want(g)}")
  }

  test("heavy ties: runs cover both interpolation indices") {
    assertParity(Seq.tabulate(1000)(i =>
      ("a", java.lang.Double.valueOf((i / 100).toDouble))) ++
      Seq.tabulate(7)(_ => ("b", java.lang.Double.valueOf(3.5))))
  }

  test("all-distinct values, several group sizes incl. n=1 and n=2") {
    val rng = new scala.util.Random(41)
    assertParity(
      Seq.tabulate(997)(i => ("big", java.lang.Double.valueOf(rng.nextDouble() * 1e6))) ++
        Seq(("one", java.lang.Double.valueOf(42.0)),
          ("two", java.lang.Double.valueOf(-1.5)),
          ("two", java.lang.Double.valueOf(8.25))))
  }

  test("nulls are ignored; all-null group is dropped (documented)") { bothPaths {
    val rows = Seq(("a", java.lang.Double.valueOf(1.0)),
      ("a", null.asInstanceOf[java.lang.Double]),
      ("a", java.lang.Double.valueOf(3.0)),
      ("dead", null.asInstanceOf[java.lang.Double]))
    val df = rows.toDF("g", "v")
    val got = ExactQuantiles.byCounts(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("a" -> 2.0)) // null ignored; "dead" dropped
  }}

  test("keepAllNullGroups emits dead groups with null percentiles") { bothPaths {
    val rows = Seq(("a", java.lang.Double.valueOf(1.0)),
      ("a", java.lang.Double.valueOf(3.0)),
      ("dead", null.asInstanceOf[java.lang.Double]),
      (null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]))
    val df = rows.toDF("g", "v")
    val got = ExactQuantiles.byCounts(df, "g", "v", Seq("p50" -> 0.5),
        keepAllNullGroups = true)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map("a" -> Some(2.0), "dead" -> None, (null: String) -> None))
  }}

  test("null GROUP key with non-null values survives the slice join") { bothPaths {
    val rows = Seq((null.asInstanceOf[String], java.lang.Double.valueOf(1.0)),
      (null.asInstanceOf[String], java.lang.Double.valueOf(5.0)),
      ("a", java.lang.Double.valueOf(2.0)))
    val df = rows.toDF("g", "v")
    val got = ExactQuantiles.byCounts(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map((null: String) -> 3.0, "a" -> 2.0))
  }}

  test("few groups, many distinct values: parity across slice boundaries") {
    // 3 groups × ~4000 distinct values with 32 shuffle partitions forces
    // every group to span many slices — exercises the two-phase offsets.
    val rng = new scala.util.Random(99)
    assertParity(Seq.tabulate(12000) { i =>
      (s"g${i % 3}", java.lang.Double.valueOf(rng.nextDouble() * 1e9))
    })
  }

  test("seeded random sweep: ties + scale mix, exact equality") {
    val rng = new scala.util.Random(1717)
    assertParity(Seq.tabulate(5000) { _ =>
      val g = s"g${rng.nextInt(7)}"
      // mix of tied small ints and continuous values
      val v = if (rng.nextBoolean()) rng.nextInt(20).toDouble
        else rng.nextDouble() * 1e3
      (g, java.lang.Double.valueOf(v))
    })
  }

  test("matches q41's own shape on the sf0.001 lineitem") { bothPaths {
    val li = graft.io.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val got = ExactQuantiles.byCounts(li, "g", "v", ps)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val want = builtin(li).collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got == want)
  }}
}

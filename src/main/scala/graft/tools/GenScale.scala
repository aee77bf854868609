package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the bench tables: produces an sf-N× copy of a
  * driver testdata directory (TESTDATA.md) so the bench can be pinned at
  * a scale factor the driver didn't ship (BASELINE.md sf1 table).
  *
  * The driver's own generator is not available, so scaling mirrors its
  * OBSERVED statistics rather than its code:
  *
  *   - `region`/`nation` are copied verbatim — fixed dimensions that do
  *     not scale with sf (TPC-H's own rule).
  *   - The relational fact/dim tables (`customer supplier part orders
  *     lineitem events`) are replicated `copies`× with every key column
  *     offset by `i * (max(key)+1)` — per-key distributions, join fan-out,
  *     group cardinalities per month, and session shapes per user are
  *     EXACTLY preserved; only the key domains grow, which is what a
  *     bigger sf does.
  *   - `documents`/`embeddings` are NOT replicated: exact copies would
  *     plant a 10-way duplicate group on every document, turning the
  *     dedup/pair queries' workload quadratic-in-copies instead of
  *     scaling the way a real corpus does. Fresh rows are synthesized
  *     from the source tables' measured distributions instead — vocabulary
  *     frequencies, words-per-doc histogram, lang/source mix, and the
  *     planted exact-duplicate rate for documents; per-(label, dim)
  *     Gaussian fits for embeddings. Deterministic: every row is seeded
  *     by its own id, so output is identical across reruns/partitionings.
  *
  * Usage: `runMain graft.tools.GenScale <srcDir> <outDir> [copies=10]`.
  */
object GenScale {

  /** Parquet codec, PER TABLE. The r13 I/O-regime A/B (SCALING.md round
    * 13) measured where each codec wins: at sf100 the scan-heavy fact
    * tables (lineitem/orders/events) no longer page-cache beside a
    * right-sized heap, so on-disk bytes ARE their scan wall — zstd's
    * ~30–40 % fewer read bytes bought 3.3× on the one read-bound query
    * (q49) for a decode tax that is noise against the read. The
    * documents/embeddings scans are CPU-bound (hashing, HOFs, vector
    * arithmetic dominate decode), so they keep snappy's cheaper decode.
    * That mixed policy is the DEFAULT from round 14 (the canonical
    * testdata_sf100 regime); `SPARK_GRAFT_CODEC=<codec>` forces one
    * codec uniformly for A/B sweeps (any Spark parquet codec: snappy,
    * zstd, gzip, lz4).
    */
  private val ZstdTables = Set("lineitem", "orders", "events")
  private def codecFor(table: String): String =
    sys.env.get("SPARK_GRAFT_CODEC").filter(_.nonEmpty).getOrElse(
      if (ZstdTables(table)) "zstd" else "snappy")

  /** Key columns per table, each offset by i·domain on copy i. The domain
    * of a key is max(value)+1 in the SOURCE data — offsets never collide
    * because the driver's keys are dense from 0.
    */
  private val keyDomains: Map[String, Seq[(String, String)]] = Map(
    // table -> (column, domain-defining table+column)
    "customer" -> Seq("c_custkey" -> "customer.c_custkey"),
    "supplier" -> Seq("s_suppkey" -> "supplier.s_suppkey"),
    "part" -> Seq("p_partkey" -> "part.p_partkey"),
    "orders" -> Seq(
      "o_orderkey" -> "orders.o_orderkey",
      "o_custkey" -> "customer.c_custkey"),
    "lineitem" -> Seq(
      "l_orderkey" -> "orders.o_orderkey",
      "l_partkey" -> "part.p_partkey",
      "l_suppkey" -> "supplier.s_suppkey"),
    "events" -> Seq(
      "event_id" -> "events.event_id",
      "user_id" -> "events.user_id"))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "testdata_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, src, out, copies)
    println(s"GENERATED $out (${copies}x $src)")
    spark.stop()
  }

  /** Core generation, callable from tests with an existing session.
    * `slices` fixes the partition count of the synthesis ranges (default:
    * session parallelism) — output values must be identical regardless,
    * which GenScaleSpec asserts by varying it.
    */
  def run(spark: SparkSession, src: String, out: String, copies: Int,
      slices: Option[Int] = None): Unit = {
    // zstd effort level for the zstd tables (parquet-hadoop default 3).
    // SPARK_GRAFT_ZSTD_LEVEL=1 generates the cheaper-decode twin for the
    // warm-scan decode-tax A/B (SCALING.md round 15): same policy, same
    // tables, only the codec's internal effort changes.
    sys.env.get("SPARK_GRAFT_ZSTD_LEVEL").filter(_.nonEmpty).foreach(lvl =>
      spark.sparkContext.hadoopConfiguration
        .set("parquet.compression.codec.zstd.level", lvl))
    // SPARK_GRAFT_GEN_TABLES=lineitem,orders regenerates only the named
    // tables — for codec A/B twins where the rest of the directory is
    // shared (symlinked) with the canonical generation.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_GEN_TABLES")
      .filter(_.nonEmpty).map(_.split(",").map(_.trim).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    def rd(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String, parts: Int): Unit =
      if (wanted(name)) df.repartition(parts).write.mode("overwrite")
        .option("compression", codecFor(name))
        .parquet(s"$out/$name.parquet")

    // Fixed dims: verbatim.
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    // Key domains, one tiny max() aggregate per referenced column.
    val domains: Map[String, Long] =
      keyDomains.values.flatten.map(_._2).toSet.map { (ref: String) =>
        val Array(t, c) = ref.split('.')
        ref -> (rd(t).agg(max(col(c)).cast("long")).head.getLong(0) + 1L)
      }.toMap

    for ((table, keys) <- keyDomains if wanted(table)) {
      val base = rd(table)
      val scaled = (0 until copies).map { i =>
        keys.foldLeft(base) { case (df, (k, ref)) =>
          // Cast back so replicated keys keep the source column type
          // (events.event_id is BIGINT, nation fks INTEGER, ...).
          df.withColumn(k,
            (col(k).cast("long") + lit(i.toLong * domains(ref)))
              .cast(base.schema(k).dataType))
        }
      }.reduce(_ unionByName _)
      wr(scaled, table, math.max(copies, 4))
    }

    if (wanted("documents"))
      synthDocuments(spark, rd("documents"), out, copies, slices)
    if (wanted("embeddings"))
      synthEmbeddings(spark, rd("embeddings"), out, copies, slices)
  }

  private def rangeIds(spark: SparkSession, start: Long, end: Long,
      slices: Option[Int]) =
    slices.fold(spark.range(start, end))(s => spark.range(start, end, 1L, s))

  /** Fresh documents with the source corpus's measured shape. Copy 0 is
    * the source verbatim (sf1 ⊇ sf0.1, like a growing corpus); copies
    * 1..n-1 are synthesized: vocabulary sampled by measured frequency,
    * words-per-doc drawn from the empirical histogram, lang/source drawn
    * from their measured mixes, and the planted exact-duplicate rate
    * reproduced by re-emitting the previous synthesized text.
    */
  private def synthDocuments(
      spark: SparkSession, docs: DataFrame, out: String, copies: Int,
      slices: Option[Int]): Unit = {
    import spark.implicits._
    val n = docs.count()
    // Vocabulary by frequency (the corpus is a small closed vocab).
    val vocab: Array[(String, Long)] = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().orderBy(desc("count"), asc("w"))
      .as[(String, Long)].collect()
    val words = vocab.map(_._1)
    val cum = vocab.map(_._2).scanLeft(0L)(_ + _).tail
    val totalW = cum.last
    // Empirical words-per-doc histogram (collectable: one int per doc).
    val lens: Array[Int] =
      docs.select(size(split(col("text"), " "))).as[Int].collect().sorted
    val langs: Array[(String, Long)] =
      docs.groupBy("lang").count().orderBy("lang").as[(String, Long)].collect()
    val langCum = langs.map(_._2).scanLeft(0L)(_ + _).tail
    // Measured source mix (cumulative weights, same pick() as lang) — a
    // uniform draw over distinct sources would distort per-source
    // distributions (e.g. q91 token budgets) at scale.
    val sources: Array[(String, Long)] =
      docs.groupBy("source").count().orderBy("source").as[(String, Long)].collect()
    val sourceCum = sources.map(_._2).scanLeft(0L)(_ + _).tail
    // Planted exact-dup rate: dup pairs per doc in the source.
    val dupRate =
      (n - docs.select("text").distinct().count()).toDouble / n

    def pick(r: java.util.Random, cumW: Array[Long], tot: Long): Int = {
      val x = (r.nextDouble() * tot).toLong
      val i = java.util.Arrays.binarySearch(cumW, x + 1)
      if (i >= 0) i else -i - 1
    }

    // Every per-row decision is a pure function of the row id, so output
    // is byte-identical across reruns AND partition layouts (the dup
    // plant must not thread mutable state through mapPartitions).
    def dupCoin(id: Long): Boolean =
      new java.util.Random(1000003L * id + 42L).nextDouble() < dupRate
    def freshText(id: Long): String = {
      val rt = new java.util.Random(3000017L * id + 7L)
      val nw = lens(rt.nextInt(lens.length))
      val sb = new StringBuilder
      var i = 0
      while (i < nw) {
        if (i > 0) sb.append(' ')
        sb.append(words(pick(rt, cum, totalW)))
        i += 1
      }
      sb.toString
    }

    val extra = rangeIds(spark, n, n * copies, slices).map { id =>
      val r = new java.util.Random(1000003L * id + 42L)
      val dup = r.nextDouble() < dupRate && id > n
      val lang = langs(pick(r, langCum, langCum.last))._1
      val source = sources(pick(r, sourceCum, sourceCum.last))._1
      val text =
        if (dup) {
          // Walk back over any dup'd predecessors so the planted pair
          // shares the STORED text of the previous row (exact dup), not
          // that row's unused fresh draw. Geometric chain, expected O(1).
          var t = id - 1
          while (t > n && dupCoin(t)) t -= 1
          freshText(t)
        } else freshText(id)
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

    docs.unionByName(extra).repartition(math.max(copies, 4))
      .write.mode("overwrite").option("compression", codecFor("documents"))
      .parquet(s"$out/documents.parquet")
  }

  /** Fresh embeddings from per-(label, dim) Gaussian fits of the source
    * (the source is visibly label-clustered; sampling the fit preserves
    * cluster geometry, so k-means/IVF/SemDeDup see the same cell shapes
    * at every scale instead of 10 exact copies of each point).
    */
  private def synthEmbeddings(
      spark: SparkSession, emb: DataFrame, out: String, copies: Int,
      slices: Option[Int]): Unit = {
    import spark.implicits._
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    // labels × dim means/stds: tiny (10 × 64), collect once.
    val stats: Map[Int, (Array[Double], Array[Double])] = emb
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy("label", "pos")
      .agg(avg("col").as("mu"), stddev_pop("col").as("sd"))
      .as[(Int, Int, Double, Double)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        val byDim = rows.sortBy(_._2)
        l -> (byDim.map(_._3).toArray, byDim.map(_._4).toArray)
      }
    val labels: Array[(Int, Long)] =
      emb.groupBy("label").count().orderBy("label").as[(Int, Long)].collect()
    val labelCum = labels.map(_._2).scanLeft(0L)(_ + _).tail

    val extra = rangeIds(spark, n, n * copies, slices).map { id =>
      val r = new java.util.Random(2000003L * id + 42L)
      val x = (r.nextDouble() * labelCum.last).toLong
      var li = java.util.Arrays.binarySearch(labelCum, x + 1)
      if (li < 0) li = -li - 1
      val label = labels(li)._1
      val (mu, sd) = stats(label)
      val vec = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        vec(d) = (mu(d) + sd(d) * r.nextGaussian()).toFloat
        d += 1
      }
      (id, vec.toSeq, label)
    }.toDF("vec_id", "embedding", "label")

    emb.unionByName(extra.withColumn("embedding", col("embedding").cast("array<float>")))
      .repartition(math.max(copies, 4))
      .write.mode("overwrite").option("compression", codecFor("embeddings"))
      .parquet(s"$out/embeddings.parquet")
  }
}

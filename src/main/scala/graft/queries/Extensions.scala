package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Dedup, KmeansCodebook, Ranking, Skew}
import graft.engine.Materialize.PinOps
import graft.functions.{SimilarityFunctions => Sim, TextFunctions => Txt}
import graft.functions.NumFunctions.r4
import graft.io.Tables
import graft.multimodal.Multimodal

/** Training-data-pipeline operator family (builder prompt + SURVEY.md §7.5):
  * deduplication (exact/MinHash-LSH/SimHash/n-gram-Jaccard/embedding-cosine),
  * similarity search, text analysis, multimodal plumbing. All hashes are
  * md5- or integer-arithmetic-based so DuckDB oracles reproduce bit-for-bit.
  */
object Extensions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The local testdata documents/embeddings tables arrive as one small
    * parquet file → ONE input split, which would serialize every CPU-heavy
    * map stage (md5 shingling, simhash votes, cosine) onto a single core.
    * When — and ONLY when — the scan is narrower than the session's
    * parallelism, a repartition to full width is a tiny shuffle that buys
    * full-width execution, the local-mode analogue of "size your splits to
    * your cluster". On a real multi-TB scan the input is already at least
    * cluster-wide (maxPartitionBytes splitting), the gate is false, and no
    * extra exchange enters the plan.
    *
    * LOCAL-MODE-ONLY crutch, and conf-killable as such: set
    * `spark.graft.widen.enabled=false` on a cluster and this is the
    * identity function — zero repartitions injected regardless of scan
    * width, so cluster plans carry no gratuitous exchange
    * (WidenSpec asserts both modes).
    */
  private[graft] def widenIfNarrow(s: SparkSession, df: DataFrame): DataFrame = {
    if (!s.conf.get("spark.graft.widen.enabled", "true").toBoolean) return df
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else {
      // Hash-partition on the row id rather than round-robin: round-robin
      // partitioning is non-deterministic, which blocks ReuseExchange when
      // the widened frame feeds both sides of a self-join (the whole minhash
      // computation would run twice).
      val key = if (df.columns.contains("doc_id")) "doc_id" else df.columns.head
      df.repartition(target, col(key))
    }
  }

  private def widen(s: SparkSession, df: DataFrame): DataFrame = widenIfNarrow(s, df)

  /** documents with a schema-NON-NULLABLE text column (null → "").
    *
    * Load-bearing for PLANS, not just semantics: downstream joins/filters
    * over columns derived from a nullable `text` make Catalyst infer
    * isnotnull(<derived>) constraints, and predicate pushdown substitutes
    * the whole derived EXPRESSION below the repartition — re-running the
    * tokenize/shingle/md5 work on the single pre-shuffle input partition
    * (observed: +4s single-task stage in q20). coalesce(text, '') is
    * non-nullable by construction, so derived columns are non-nullable and
    * no such filter can be inferred. The testdata has no null/empty texts,
    * so "" never actually flows (and would only yield zero grams anyway).
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    widen(s, t(s, dir, "documents")
      .withColumn("text", coalesce(col("text"), lit(""))))

  /** MinHash/LSH tuning: the testdata documents are same-vocabulary word
    * soup with background 5-gram Jaccard ≈ 0.19 — at that density 2-sig
    * bands (P = J²) flood the band join with ~10⁶ noise pairs at sf0.1.
    * 8-char shingles (background J ≈ 0.04) + 2 bands × 4 rows (P = J⁴)
    * keep noise out while still catching J ≳ 0.7 near-dups.
    */
  val MinhashK = 8
  val ShingleN = 8
  val BandRows = 4
  val LshPlanes = 8
  val EmbeddingDim = 64

  /** Per-bucket membership cap for the GROUP-BY-bucket pair generators
    * (q18/q37/q32): each bucket keeps only its `HotBucketCap` smallest
    * member ids (graft.expressions.BoundedSortedList — O(cap) aggregation
    * state), so a degenerate duplicate flood (millions of identical docs →
    * one bucket) cannot blow a task buffer or emit C(flood, 2) pairs. Far
    * above any bucket size the banding parameters admit on real corpora
    * (testdata max bucket ≈ 10), so the cap never binds outside floods;
    * when it does bind, the bucket's minimum id — the dedup survivor — is
    * always among the kept members. HotBucketSpec pins both behaviors.
    */
  val HotBucketCap = 64

  /** q20's join-back broadcasts the survivor bucket-key set only while
    * its MEASURED row count stays under this cap (4 M rows ≈ 160 MB of
    * (source, band, key) — comfortably inside Spark's broadcast limits);
    * above it the plan falls back to the shuffle join automatically. The
    * survivor set grows with corpus dup MASS, not corpus size, so real
    * corpora sit orders of magnitude below the cap (sf10: ~115 k rows) —
    * the gate exists for the adversarial dup-flood input where forcing
    * the broadcast would fail the query outright.
    */
  val BroadcastLiveMaxRows = 4L << 20

  /** Byte companion to [[BroadcastLiveMaxRows]] (r14 ADVICE): a row cap
    * alone under-gates wide rows — 4 M BINARY(16) digests plus per-row
    * overhead is already ~100+ MB driver-side, and a build side with a
    * long string payload could pass the row gate while blowing the
    * driver. 256 MB stays comfortably inside Spark's broadcast limits
    * (8 GB hard cap; executors hold one copy each) while admitting every
    * legitimate vocabulary/survivor table the gate exists for.
    */
  val BroadcastLiveMaxBytes = 256L << 20

  /** The shared runtime broadcast gate (q20 join-back, q70 df table, q97
    * rare-window set): measure the PINNED build side — one count+bytes
    * aggregate over already-materialized blocks — and broadcast only
    * while both the row count and the estimated serialized payload stay
    * under the caps; above either, return the frame unchanged so the
    * caller's equi-join falls back to the hash-partitioned shuffle plan.
    * Payload bytes are exact for binary/string columns (`octet_length`)
    * plus fixed widths for the rest and 16 B/row overhead — the frames
    * gated here are digest/key tables, not nested payloads. That flat
    * shape is ENFORCED, not assumed (r15 ADVICE): a complex-typed column
    * (array/map/struct) would be priced at `defaultSize` and could admit
    * an oversized broadcast, so such a frame skips the broadcast hint
    * entirely — the shuffle fallback is always correct, just slower, and
    * the one legitimate complex-payload broadcast in the engine (the
    * one-row IVF codebook) never routes through this gate.
    */
  private[graft] def gatedBroadcast(df: DataFrame): DataFrame = {
    val complex = df.schema.fields.exists { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => true
        case _ => false
      }
    }
    if (complex) return df
    val rowBytes = df.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.BinaryType |
             org.apache.spark.sql.types.StringType =>
          coalesce(octet_length(col(f.name)).cast("long"), lit(0L))
        case dt => lit(dt.defaultSize.toLong)
      }
    }.reduceLeft(_ + _) + lit(16L)
    val m = df.select(count(lit(1)).as("n"), sum(rowBytes).as("b")).head()
    val (rows, bytes) = (m.getLong(0), if (m.isNullAt(1)) 0L else m.getLong(1))
    if (rows <= BroadcastLiveMaxRows && bytes <= BroadcastLiveMaxBytes)
      broadcast(df)
    else df
  }

  /** Directed-edge count above which connectedComponents switches to
    * per-round edge contraction (see connectedComponentsWithRounds).
    * 1 M sits between sf1's ~0.7 M (classic wins — job-count-dominated)
    * and sf10's 6.8 M (contraction measured 2× faster).
    */
  val ContractMinEdges = 1000000L

  /** Capped bucket-member list for the pair generators: the flood-proof
    * `bounded_sorted_list` aggregate when the session has GraftExtensions
    * registered; on a bare session, `slice(array_sort(collect_list(…)))` —
    * identical output whenever the cap doesn't bind (all non-adversarial
    * data; the oracles agree either way), but the collect materializes the
    * FULL bucket first, so the O(cap)-state flood guarantee requires the
    * extension (HotBucketSpec runs with it registered). Same degradation
    * contract as [[Sim.cosineByName]]/`topk_pairs`: every extension
    * dependency in the query surface is optional-with-fallback.
    */
  private def boundedSortedList(s: SparkSession, cap: Int, e: String): Column =
    if (s.catalog.functionExists("bounded_sorted_list"))
      expr(s"bounded_sorted_list($cap, $e)")
    else slice(array_sort(collect_list(expr(e))), 1, cap)

  /** Shared deterministic hyperplanes for embedding LSH (md5-parity ±1). */
  lazy val Planes: Array[Array[Double]] = Sim.hyperplanes(LshPlanes, EmbeddingDim)

  /** Trained coarse-quantizer parameters for the IVF/SemDeDup family
    * (q34/q53/q64/q90): [[kmeansK]] cells via KmeansIters Lloyd iterations
    * ([[graft.engine.KmeansCodebook]]). K is the scale knob, COMPUTED from
    * the embeddings-table row count at training time — production rule
    * K ∝ √N (SemDeDup paper shape), clamped to [16, 65536]: a user at
    * 10⁹ docs gets 2¹⁶ cells without editing source, and the 500–2000-row
    * testdata sits at K = 23–45, the √N regime the paper runs at. The
    * DuckDB oracles compute the SAME K from the same count
    * (`Oracles.kmeansCtes`' scalar-subquery LIMIT), so the two engines'
    * codebooks stay bit-identical at every scale factor. The ±1
    * [[Planes]] stay behind the sign-hash LSH paths (q19/q22/q33/q35/q50),
    * where fixed hyperplanes are the operator's actual definition.
    *
    * `ceil` of an IEEE `sqrt` is portable: sqrt is correctly rounded, so
    * perfect squares come out exact and both engines agree on the ceil.
    */
  def kmeansK(n: Long): Int =
    math.min(65536L, math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
  val KmeansIters = 2

  /** (vec_id, vec double[]) embeddings, widened and materialized ONCE —
    * the shared input of codebook training and the final query plan (3+
    * passes at training, so the scan must not re-run per pass).
    */
  private def embVec(s: SparkSession, dir: String): DataFrame =
    widen(s, t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec")))
      .pinned

  /** The shared trained codebook (one row) over this sf's embeddings —
    * TRAINED ONCE per distinct input and memoized for the JVM's lifetime
    * ([[cbCache]]). The coarse quantizer is an index-build artifact, not
    * per-query work: FAISS trains its IVF cells once and serves every
    * later query from them, and [[graft.io.CodebookStore]] is this
    * repo's cross-JOB form of that contract (train, persist, assign
    * anywhere). This memo is the in-PROCESS form: the first of
    * q34/q53/q64/q90 to touch a given embeddings table pays the Lloyd
    * iterations; the rest assign against the identical cached cells.
    * Identical is exact, not approximate — training is deterministic
    * (DECIMAL-exact order-insensitive centroid means, rank-based seed),
    * so the cached codebook is bit-equal to what in-plan retraining
    * would produce and every oracle stays hash-green.
    *
    * Cache key = canonical path + the embeddings files' (name, length,
    * mtime) listing + (K, iters): a rewritten table re-trains, same
    * content reuses. The cached value is the COLLECTED one-row result
    * (K·dim doubles, ~32 KB at K=64) rebuilt as a LocalRelation per
    * call, so the downstream crossJoin(broadcast(...)) shape — and the
    * PlanShapeSpec pins on it — are unchanged, and the cache works
    * across SparkSessions (test suites spin up many).
    */
  /** Bounded like BloomContains' executor cache: far more live
    * codebooks than this means tables are being rewritten in a loop —
    * drop the lot and retrain on demand rather than accrete ~32 KB
    * entries forever.
    */
  private val MaxCachedCodebooks = 64
  private[graft] val cbCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType, Long)]

  private[graft] def trainedCb(s: SparkSession, dir: String, emb: => DataFrame): DataFrame =
    trainedCbN(s, dir, emb)._1

  /** [[trainedCb]] plus the embeddings row count N measured on the same
    * training pass — the input every data-derived scale knob
    * ([[kmeansK]], [[semDedupCap]]) is a function of. Memoized together
    * with the codebook, so a cache hit serves N without touching the
    * input frame.
    */
  private[graft] def trainedCbN(
      s: SparkSession, dir: String, emb: => DataFrame): (DataFrame, Long) = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // Recursive listing, DATA FILES only: a partitioned layout's
    // top-level entries are directories whose (len, mtime) an object
    // store may synthesize as constants — fingerprinting those would
    // serve a stale codebook after an in-place partition rewrite. Full
    // paths (not basenames) so a row moving between partition dirs
    // changes the key too. Hidden-ness is judged on every path
    // component BELOW the base (Spark's own file-index rule): a file
    // under `_temporary/` from an in-flight write is invisible to the
    // reader and must not mint a new cache key.
    val base = fs.makeQualified(p).toString
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(base).stripPrefix("/")
      val hidden = rel.split('/').exists(c => c.startsWith("_") || c.startsWith("."))
      if (!hidden) buf += s"${f.getPath}:${f.getLen}:${f.getModificationTime}"
    }
    val files = buf.sorted.mkString(",")
    // K is data-derived (kmeansK(N)), so the file fingerprint alone
    // covers it: same files => same N => same K.
    val key = s"${fs.makeQualified(p)}|$files|sqrtK|$KmeansIters"
    if (cbCache.size() >= MaxCachedCodebooks && !cbCache.containsKey(key)) cbCache.clear()
    val (rows, schema, n) = cbCache.computeIfAbsent(key, _ => {
      val e = emb // evaluate the by-name input once for count + train
      val nRows = e.count()
      val cb = KmeansCodebook.train(e, kmeansK(nRows), KmeansIters)
      (cb.collect(), cb.schema, nRows)
    })
    (s.createDataFrame(java.util.Arrays.asList(rows: _*), schema), n)
  }

  /** Exact content dedup by md5 — only digests shuffle, not documents. */
  def q16DedupHash(s: SparkSession, dir: String): DataFrame =
    Dedup.exactByHash(t(s, dir, "documents"), "text", "doc_id")

  private def sigFrame(s: SparkSession, dir: String): DataFrame = {
    // Content-deterministic shingle sampling: keep shingles whose first
    // codepoint is even — a predicate far cheaper than the md5s it saves
    // (~2× fewer digests). Sampling by CONTENT keeps the surviving subsets
    // aligned across near-duplicate docs (position-based striding would
    // desync on a single insertion), so the Jaccard estimate is unbiased
    // over the sampled shingle space.
    //
    // Native `minhash_sigs` fuses shingle → sample → md5 → per-slice min
    // into one pass over the text bytes (the HOF chain spent ~48 s of
    // task time at sf0.1, of which raw md5 work was ~1-2 s — the rest
    // was interpreter overhead and shingle/hex string churn); the
    // bit-identical composable chain remains the no-extensions fallback
    // (MinhashSigsSpec pins parity including multi-byte text).
    val base = docs(s, dir).filter(length(col("text")) >= ShingleN)
    if (s.catalog.functionExists("minhash_sigs"))
      base.withColumn("ms", expr(s"minhash_sigs(text, $ShingleN, $MinhashK)"))
        .select(col("doc_id") +: (0 until MinhashK).map(j =>
          element_at(col("ms"), j + 1).as(s"sig_$j")): _*)
    else {
      val sampled = filter(Txt.charShinglesExpr("text", ShingleN),
        sh => pmod(ascii(substring(sh, 1, 1)), lit(2)) === 0)
      base
        .withColumn("digests", Sim.shingleDigests(sampled))
        .select(col("doc_id") +: Sim.minhashFromDigests(col("digests"), MinhashK): _*)
    }
  }

  /** MinHash signatures over char shingles (k = MinhashK). */
  def q17MinhashSig(s: SparkSession, dir: String): DataFrame = sigFrame(s, dir)

  /** MinHash-LSH candidate pairs: signatures banded BandRows-per-band; docs
    * sharing any band bucket become a candidate pair. The band hash is the
    * shuffle key — candidate generation is a per-bucket self-join, never an
    * all-pairs product.
    */
  def q18LshPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = sigFrame(s, dir)
    val nBands = MinhashK / BandRows
    val bandStructs = (0 until nBands).map { b =>
      val slice = (b * BandRows until (b + 1) * BandRows).map(j => col(s"sig_$j"))
      struct(lit(b).as("band"), Sim.bandHash(slice).as("h"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
    // Pairs come from a GROUP BY on the bucket, not a self-join: a
    // self-join would compute the whole minhash frame twice (round-robin &
    // self-join alias plans defeat exchange reuse). One aggregation
    // collects each bucket's (sorted) member list — CAPPED at HotBucketCap
    // (bounded_sorted_list keeps O(cap) state, so a duplicate flood cannot
    // blow the aggregation buffer) — and an in-plan combination expansion
    // emits the i<j pairs. Bucket membership is tiny by construction (the
    // banding parameters keep background-similarity collisions out), so
    // the per-bucket quadratic is bounded and the cap never binds on
    // non-adversarial data.
    bands
      .groupBy(col("band"), col("h"))
      .agg(boundedSortedList(s, HotBucketCap, "doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> named_struct('a_id', x, 'b_id', y))))""".stripMargin)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .distinct()
  }

  /** (doc_id, source, simhash) via the native fused `simhash16` when the
    * session has GraftExtensions registered (one pass: md5 per token
    * straight from the bytes, votes from raw digest nibbles); the
    * bit-identical two-step digest-array fold otherwise — the same
    * native-with-fallback contract as `cosine_sim`/`argmax_dot`.
    */
  private def simhashFrame(s: SparkSession, dir: String): DataFrame =
    if (s.catalog.functionExists("simhash16"))
      docs(s, dir).select(col("doc_id"), col("source"),
        expr("simhash16(text)").as("simhash"))
    else docs(s, dir)
      .withColumn("td", Sim.tokenDigestsExpr("text"))
      .select(col("doc_id"), col("source"), Sim.simhash16FromDigests("td").as("simhash"))

  /** 16-bit SimHash per document (md5-parity bit votes). */
  def q19Simhash(s: SparkSession, dir: String): DataFrame =
    simhashFrame(s, dir).select(col("doc_id"), col("simhash"))

  /** SimHash near-duplicate pairs: same-source doc pairs whose 16-bit
    * simhashes differ in ≤ 2 bits.
    *
    * Candidate generation is pigeonhole band blocking, NOT an all-pairs
    * self-join: split the 16 bits into 3 segments (6+5+5). Two hashes
    * within Hamming distance 2 have their differing bits in at most 2
    * segments, so at least one segment is *exactly* equal — an equi-key.
    * Candidates are generated per (source, segment_idx, segment_value)
    * bucket via the same GROUP-BY-bucket expansion as q18 (no self-join →
    * simhash computed once, one shuffle on the bucket key), then the full
    * 16-bit Hamming test verifies candidates only. Pair volume is
    * Σ per-bucket C(n,2) — bounded by hash dispersion instead of (docs per
    * source)², which is what survives a 100 TB corpus.
    */
  def q37SimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val h = simhashFrame(s, dir)
    val segs = Seq((0, 6), (6, 5), (11, 5)) // (shift, width): 6+5+5 = 16 bits
    val segStructs = segs.zipWithIndex.map { case ((shift, width), i) =>
      struct(lit(i).as("seg"),
        shiftright(col("simhash"), shift).bitwiseAND(lit((1 << width) - 1)).as("v"))
    }
    h.select(col("source"), explode(array(segStructs: _*)).as("sv"),
        struct(col("doc_id"), col("simhash")).as("m"))
      .groupBy(col("source"), col("sv.seg"), col("sv.v"))
      // capped bucket list (struct elements order by doc_id first — same
      // order array_sort gave); flood-bounded like q18
      .agg(boundedSortedList(s, HotBucketCap, "m").as("ms"))
      .filter(size(col("ms")) > 1)
      .select(col("source"), explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms)),
          |            y -> named_struct('a', x, 'b', y))))""".stripMargin)).as("p"))
      .select(col("source"),
        col("p.a.doc_id").as("a_id"), col("p.b.doc_id").as("b_id"),
        Sim.hamming16(col("p.a.simhash"), col("p.b.simhash")).as("hamming"))
      .filter(col("hamming") <= 2)
      .distinct()
  }

  /** Word-bigram Jaccard near-dup pairs, blocked by `source` (blocking key
    * bounds the pair space; at scale the block key would be an LSH bucket).
    */
  /** q20's LSH banding parameters: [[JacBands]] bands of [[JacRows]]
    * minhashes over word-[[JacShingle]]-shingles (round 12 — see
    * JaccardLsh.SigShingle for why the signature shingle is wider than
    * the verified bigram predicate) ⇒ candidate recall
    * 1 − (1 − j_w^rows)^bands in the pair's SHINGLE Jaccard j_w — for
    * run-sharing near-dups j_w tracks bigram J within O(w/|doc|), so the
    * curve is ~0.81 at the τ = 0.2 floor, ≥ 0.99 from j ≈ 0.3, ~1 for
    * real near-dups (LshRecallSpec pins measured floors). The
    * permutation family is multiply-add mod 2³¹ over a 32-bit md5-prefix
    * gram hash — exact in 64-bit integer arithmetic on BOTH engines
    * (products < 2⁶³, no overflow), so the DuckDB oracle replays the
    * identical permutations. Constants are fixed draws (odd multipliers
    * < 2³¹) from one seeded generator.
    */
  val JacBands: Int = graft.expressions.JaccardLsh.Bands
  val JacRows: Int = graft.expressions.JaccardLsh.Rows
  val JacShingle: Int = graft.expressions.JaccardLsh.SigShingle
  val jacA: Array[Long] = graft.expressions.JaccardLsh.a
  val jacC: Array[Long] = graft.expressions.JaccardLsh.c

  def q20JaccardPairs(s: SparkSession, dir: String): DataFrame = {
    // Exact-verified LSH similarity join — the formulation that survives
    // a 100 TB corpus. History: round 2 replaced per-pair array_intersect
    // with an inverted-index co-occurrence COUNT join, linear in gram
    // co-occurrences; the round-10 sf1 measurement showed that term is
    // itself quadratic when the vocabulary is closed (df ∝ N ⇒ co-pairs
    // ∝ N²: 3.9 M at sf0.1 → 369 M at sf1 → bench timeout). Exact
    // blocking (PPJoin prefix filtering) prunes only ~24 % here (flat
    // df), and rare-gram candidate capping has a measured 0/22 recall at
    // sf1 — qualifying pairs share only common grams. So q20 now does
    // what production near-dup does at scale (MinHash blocking + exact
    // verification): candidates come from banded minhash collisions over
    // the word-[[JacShingle]]-SHINGLE set ([[JacBands]]×[[JacRows]],
    // recall curve above; round 12 widened the signature shingle from 2
    // to 4 words after Q20Diag measured the bigram signature's background
    // collisions at Θ(N²·c) on the closed vocabulary — see
    // JaccardLsh.SigShingle), and every candidate is verified with an
    // EXACT Jaccard over the full BIGRAM arrays — reported values are
    // exact; the miss class is a pair colliding in no band of the
    // shingle minhash, the same documented contract as q18/q90. Cost: signatures are one md5 + 2·bands·rows multiply-adds
    // per gram posting (one hash aggregate), buckets are equi-grouped
    // with the [[HotBucketCap]] flood cap, and verification touches only
    // actual candidates — every stage linear in the corpus.
    // Compact per-doc arrays of 60-bit md5-prefix gram hashes. TWO gram
    // families since round 12 (see JaccardLsh.SigShingle):
    //   ghs — word-BIGRAM hashes, the VERIFY set (the reported predicate
    //         is exact bigram Jaccard ≥ 0.2, unchanged);
    //   sgs — word-[[JacShingle]]-SHINGLE hashes, the SIGNATURE set. On
    //         the closed 31-word vocabulary the bigram universe is ≤ 961,
    //         so bigram minhashes collide for ~26 % of ALL pairs
    //         (background J ≈ 0.05–0.1 — the measured Θ(N²·c) slot term,
    //         179 M slots at sf10); 4-shingle background J is ~0
    //         (universe 31⁴) while true near-dups share contiguous runs
    //         and keep shingle-J high. Measured (Q20Diag): slots drop
    //         2.8 M → 1,687 at sf1 and 179 M → 114,651 at sf10, with the
    //         sf10 remainder dominated by TRUE pairs × band multiplicity.
    // |hashed ∩| = |string ∩| absent collisions, P ≈ 2⁻⁶⁰ per pair — the
    // string-based oracle still matches. Native fused `bigram_h60s` /
    // `ngram_h60s` when registered (one pass over the raw bytes, zero
    // string allocations); the composable twins otherwise. ghs is sorted
    // ONCE PER DOC: its consumers are order-independent (set intersection
    // size, cardinality), and the ascending order lets the per-PAIR
    // verify run as a merge walk (`sorted_inter_size`) instead of a
    // per-call hash set.
    // ONE pinned gram frame (r11's shape, round-12 payload): per doc the
    // sorted verify bigrams (ghs) plus the PRE-COMPUTED band keys (bks)
    // of the shingle signature — `jac_band_keys(ngram_h60s(...))` folds
    // the shingle md5 + 2·bands·rows multiply-adds into the pin build,
    // so the signature math runs ONCE and the pin carries [[JacBands]]
    // longs per doc instead of the ~|doc| shingle hashes. Three
    // consumers read the pin: the band posting explode TWICE (bucket
    // count + join-back — those two cannot share an exchange, the count
    // side's exchange carries partial-agg state while the join side's
    // carries raw postings, so without the pin the signature pass runs
    // twice) and the verify join's array side once. Round-12 A/B at
    // sf10: unpinned dual-stream 39–65 s (erratic, signature ×2), pin of
    // the 64·N exploded postings 69–102 s (checkpoint too fat), this
    // shape 24 s.
    // A doc with < JacShingle tokens has an empty shingle set, hence
    // empty bks, and emits no band postings — it can never be a
    // candidate (the documented sub-w miss class; the oracle's unnest
    // replays the same drop).
    val native = s.catalog.functionExists("bigram_h60s") &&
      s.catalog.functionExists("jac_band_keys")
    val hashed = (if (native)
      docs(s, dir).select(col("source"), col("doc_id"),
        array_sort(expr("bigram_h60s(text)")).as("ghs"),
        expr(s"jac_band_keys(ngram_h60s(text, $JacShingle))").as("bks"))
    else
      docs(s, dir)
        .withColumn("tk", Txt.tokens(col("text")))
        .withColumn("grams", array_distinct(Txt.wordBigramsExpr("tk")))
        .withColumn("shingles", array_distinct(Txt.wordShinglesExpr("tk", JacShingle)))
        .select(col("source"), col("doc_id"),
          array_sort(transform(col("grams"),
            g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))).as("ghs"),
          transform(col("shingles"),
            g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("sgs")))
      .withColumn("gsz", size(col("ghs")))
      .filter(col("gsz") > 0)
      .pinned
    // One 64-bit bucket KEY per (doc, band): minhash j is the packed min
    // perm_j·2³² + h32 (perm mod 2³¹ keeps it under 2⁶³; the low 32
    // bits ARE the argmin gram's h32), and band b packs its two argmins
    // as (k₁−2³¹)·2³² + k₂ — 64 key bits, no narrow-bucket aliasing at
    // billion-doc scale; a same-h32 gram collision only mints a false
    // candidate for the exact verify to kill. The native `jac_band_keys`
    // computes ALL of a doc's keys in one register loop consumed by one
    // posexplode — map-only, no signature shuffle, and crucially ONE
    // evaluation per row (exposing the 96 raw mins to 96 element_at
    // consumers re-evaluated the producer per reference under projection
    // collapse — measured 43 s of task time at sf0.1). The exploded
    // 96-way packed-long min aggregate is the composable parity twin.
    val bands =
      if (native)
        hashed.select(col("source"), col("doc_id"), posexplode(col("bks")))
          .withColumnsRenamed(Map("pos" -> "band", "col" -> "k"))
      else {
        val post = hashed.select(
          col("source"), col("doc_id"), explode(col("sgs")).as("h60"))
          // h32 = first 8 hex = h60 >> 28 (integer `div` — a double `/`
          // would round h60 past 53 bits first)
          .withColumn("h32", expr("h60 div 268435456"))
        val mins = (0 until JacBands * JacRows).map { j =>
          min(((lit(jacA(j)) * col("h32") + lit(jacC(j))) % lit(2147483648L)) *
            lit(4294967296L) + col("h32")).as(s"m$j")
        }
        val keyCols = (0 until JacBands).map { b =>
          struct(lit(b).as("band"),
            (((col(s"m${JacRows * b}") % lit(4294967296L)) - lit(2147483648L)) *
              lit(4294967296L) +
              (col(s"m${JacRows * b + 1}") % lit(4294967296L))).as("k"))
        }
        post.groupBy(col("source"), col("doc_id")).agg(mins.head, mins.tail: _*)
          .select(col("source"), col("doc_id"),
            explode(array(keyCols: _*)).as("bh"))
          .select(col("source"), col("doc_id"),
            col("bh.band").as("band"), col("bh.k").as("k"))
      }
    // Pair expansion. q18's one-shot GROUP-BY + bounded-list shape is
    // wrong here: 48 bands × N docs make ~48·N bucket keys, nearly all
    // singletons, and an ObjectHashAggregate materializing a typed
    // state object per singleton group measured 67 s of task time at
    // sf0.1. Instead: (1) a codegen'd LONG count per bucket — cheap at
    // any group count; (2) keep buckets with 2 ≤ members ≤ cap (a
    // FLOODED bucket is dropped whole — an adversarial dup flood
    // contributes zero pairs instead of a truncated sample; the oracle
    // mirrors the same rule); (3) join the surviving keys back and
    // collect members — the list aggregate now touches only real
    // buckets. The join-back is an EXPLICIT broadcast of the survivor
    // set: AQE alone plans a shuffle join (the count exchange and the
    // join's posting exchange cannot be one — partial-agg state vs raw
    // rows), which re-shuffles AND re-sorts all 64·N postings (measured
    // the dominant q20 stage at sf10: 1.3 GB shuffle, 400–1100 s task
    // time, SMJ sort of 32 M rows); broadcasting instead probes the
    // postings MAP-SIDE straight off the pin — no posting exchange, no
    // sort (sf10 wall 27 s → 23 s, and the 2× run-to-run variance from
    // that sort's GC goes with it). Scale bound: survivors are capped
    // buckets, so |live| ∝ true near-dup pairs + background collisions
    // — ~100 k rows / ~3 MB at sf10, growing ~linearly with corpus dup
    // mass. The broadcast is SIZE-GATED at run time (see liveSide below):
    // the survivor set is pinned and counted, and a dup-heavy corpus
    // whose survivors exceed [[BroadcastLiveMaxRows]] falls back to the
    // shuffle join automatically instead of blowing the driver's
    // broadcast limit; spark.graft.q20.broadcastLive=true|false remains
    // a hard override in either direction.
    val live = bands
      .groupBy(col("source"), col("band"), col("k"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= HotBucketCap)
      .drop("n")
    // EXACT verification INSIDE the bucket (r11). The r10 shape distinct'd
    // the exploded candidate pairs and joined the gram arrays onto them —
    // at sf10 the closed-vocabulary corpus pushes bucket occupancy up
    // (candidates are Θ(N²·c) under ANY banding when background Jaccard
    // is a constant ≈0.05–0.1 over the vocabulary head — Q20Diag: 2.6 M
    // candidates at sf1, 99 % below j=0.1), so the array-to-candidate
    // join shuffled arrays PER CANDIDATE — hundreds of GB at sf10,
    // 1224 s. Now the bucket aggregate collects (doc_id, gsz, ghs)
    // structs and the pairwise exact Jaccard runs where the candidates
    // are born: compute ∝ candidate slots, data movement ∝ live bucket
    // MEMBERS (arrays shuffle once per member, never per pair),
    // sub-threshold pairs die inside the flatten, and the distinct
    // touches only qualifying pairs (~1e3, not ~1e8). Same bucket
    // membership (boundedSortedList orders by the struct's leading
    // doc_id), same flood cap, same exact Jaccard — identical result,
    // oracle unchanged.
    // "auto" (default) gates the broadcast on the MEASURED survivor
    // count: pin the survivor set (tiny — a capped-bucket key list) so
    // the size probe and the join-back share ONE execution of the
    // bucket count aggregate, then broadcast iff the count is under the
    // cap. "true"/"false" are hard overrides that skip the pin+count
    // entirely (zero probe overhead when the caller already knows).
    val liveSide =
      s.conf.get("spark.graft.q20.broadcastLive", "auto").toLowerCase match {
        case "true" => broadcast(live)
        case "false" => live
        case _ =>
          gatedBroadcast(live.pinned)
      }
    bands
      .join(liveSide, Seq("source", "band", "k"))
      .join(hashed.select(col("source"), col("doc_id"), col("gsz"), col("ghs")),
        Seq("source", "doc_id"))
      .select(col("source"), col("band"), col("k"),
        struct(col("doc_id"), col("gsz"), col("ghs")).as("m"))
      .groupBy(col("source"), col("band"), col("k"))
      .agg(boundedSortedList(s, HotBucketCap, "m").as("ms"))
      .select(col("source"), explode(expr(
        s"""flatten(transform(ms, (x, i) ->
          |  filter(
          |    transform(slice(ms, i + 2, size(ms)), y ->
          |      named_struct('a_id', x.doc_id, 'b_id', y.doc_id,
          |        'inter', ${if (s.catalog.functionExists("sorted_inter_size"))
                    "sorted_inter_size(x.ghs, y.ghs)"
                  else "size(array_intersect(x.ghs, y.ghs))"},
          |        'den', x.gsz + y.gsz)),
          |    p -> cast(p.inter as double) /
          |           cast(p.den - p.inter as double) >= 0.2d)))""".stripMargin)).as("p"))
      .select(col("source"), col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        (col("p.inter").cast("double") /
          (col("p.den") - col("p.inter")).cast("double")).as("jac"))
      .distinct()
      .select(col("source"), col("a_id"), col("b_id"), r4(col("jac")).as("jaccard"))
  }

  /** Brute-force cosine top-5 neighbors for query vectors (vec_id < 10) —
    * the ANN correctness baseline; q22 is the bucketed scale path.
    */
  def q21KnnCosine(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    Sim.cosineKnn(emb.filter(col("vec_id") < 10), widen(s, emb), "vec_id", "vec", 5)
  }

  /** Random-hyperplane LSH bucket per embedding — the map-side shuffle key
    * that makes ANN joins scale (per-bucket blocks instead of O(n²)).
    */
  def q22AnnLshBucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(
      col("vec_id"),
      Sim.lshBucket(col("embedding").cast("array<double>"), Planes).as("bucket"))

  /** Eagerly materialized: every consumer (q32/q33/q35/q50) references this
    * frame at least twice (candidates + queries, or pairs + vector
    * lookups), and self-join aliasing defeats ReuseExchange — without the
    * checkpoint the scan + 8-plane bucket computation runs per reference.
    */
  private def bucketedEmb(s: SparkSession, dir: String): DataFrame =
    widen(s, t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec")))
      .withColumn("bucket", Sim.lshBucket(col("vec"), Planes))
      .pinned

  /** Embedding-cosine near-duplicate dedup, blocked by LSH bucket: pairs
    * sharing a hyperplane bucket with cosine ≥ 0.3 (the testdata embeddings
    * are random — no true near-dups exist, and 0.3 captures the top
    * percentile of same-bucket similarity so the filter path is exercised;
    * a real corpus would use ~0.9); keep = lower vec_id.
    * The bucket bounds candidate generation (per-bucket combinations, not
    * all-pairs); cosine runs through the native codegen'd expression.
    */
  def q32CosineNeardup(s: SparkSession, dir: String): DataFrame = {
    val b = bucketedEmb(s, dir)
    val pairs = b
      .groupBy(col("bucket"))
      .agg(boundedSortedList(s, HotBucketCap, "vec_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> named_struct('keep_id', x, 'dup_id', y))))""".stripMargin)).as("p"))
      .select(col("p.keep_id").as("keep_id"), col("p.dup_id").as("dup_id"))
    val vecs = b.select(col("vec_id"), col("vec"))
    pairs
      .join(broadcast(vecs.as("va")), col("keep_id") === col("va.vec_id"))
      .join(broadcast(vecs.as("vb")), col("dup_id") === col("vb.vec_id"))
      .select(col("keep_id"), col("dup_id"),
        Sim.cosineByName(s, "va.vec", "vb.vec").as("sim"))
      .filter(col("sim") >= 0.3)
      .select(col("keep_id"), col("dup_id"), r4(col("sim")).as("sim"))
  }

  /** LSH-bucketed ANN search — the scale path of q21's brute force: each
    * query probes only its own hyperplane bucket (candidate set ~n/2^planes)
    * for top-3 neighbors. Recall is tunable via planes/multi-probe; the
    * plan shape (bucket equi-join + per-query top-k) is what survives 10⁹
    * vectors.
    */
  def q33AnnSearch(s: SparkSession, dir: String): DataFrame = {
    val b = bucketedEmb(s, dir)
    val q = b.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("bucket"))
    val sims = b.as("c")
      .join(broadcast(q), col("c.bucket") === q("bucket") && col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        Sim.cosineByName(s, "q_vec", "c.vec").as("sim"))
    // per-query top-k via the bounded-heap aggregate (graft.expressions
    // .TopKPairs): map-side state is O(k) per (query, partition) and
    // partials merge — no per-query sort of the full candidate set, unlike
    // a rank window. Same output contract (ties → lower id).
    sims.groupBy(col("q_id"))
      .agg(expr("topk_pairs(3, sim, n_id)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("n_id"),
        (col("pos") + 1).cast("int").as("rank"), r4(col("p.score")).as("sim"))
  }

  /** Multi-probe LSH ANN: each query probes its own bucket PLUS the 8
    * buckets at Hamming distance 1 (one sign bit flipped) — the standard
    * recall lever for hyperplane LSH: vectors near a hyperplane land on
    * either side, and flipping the corresponding bit recovers them without
    * growing the index. Candidate set is ~9n/2^planes per query; output
    * contract matches q33 (top-3, ties → lower id).
    */
  def q35AnnMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val b = bucketedEmb(s, dir)
    val probeCols = col("bucket") +:
      (0 until LshPlanes).map(j => col("bucket").bitwiseXOR(lit(1 << j)))
    val q = b.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(array(probeCols: _*)).as("pbucket"))
    val sims = b.as("c")
      .join(broadcast(q), col("c.bucket") === col("pbucket") && col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        Sim.cosineByName(s, "q_vec", "c.vec").as("sim"))
    sims.groupBy(col("q_id"))
      .agg(expr("topk_pairs(3, sim, n_id)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("n_id"),
        (col("pos") + 1).cast("int").as("rank"), r4(col("p.score")).as("sim"))
  }

  /** Query-directed probe schedule (Lv et al., multi-probe LSH): which
    * MARGIN-RANKED hyperplane bits to flip, per probe, in order. Rank 1 =
    * the plane the query is closest to (smallest |dot|) — the bit most
    * likely to be wrong for its true neighbors. Shared constant: both the
    * Spark plan and the DuckDB oracle are generated from it, so the two
    * sides cannot drift. 13 probes ≈ 2.6× the d1 schedule's candidate
    * volume for ~2× its recall (measured 0.97 vs 0.50 on AnnRecallSpec's
    * geometry).
    */
  val ProbeFlipPattern: Seq[Seq[Int]] = Seq(
    Seq(), Seq(1), Seq(2), Seq(1, 2), Seq(3), Seq(1, 3), Seq(2, 3),
    Seq(1, 2, 3), Seq(4), Seq(1, 4), Seq(2, 4), Seq(1, 2, 4), Seq(3, 4))

  /** `ms` = margin-sorted (|dot|, plane) structs for a query vector. */
  def marginSortExpr(vecCol: Column, planes: Array[Array[Double]]): Column =
    array_sort(array(planes.indices.map(j =>
      struct(abs(Sim.dot(vecCol, typedlit(planes(j).toSeq))).as("m"),
        lit(j).as("j"))): _*))

  /** Probe masks from the flip pattern over a margin-sorted `ms` column. */
  def probeMasks(msCol: String): Seq[Column] = {
    def bit(i: Int) = expr(s"shiftleft(1, element_at($msCol, $i).j)")
    ProbeFlipPattern.map(fl => fl.map(bit).foldLeft(lit(0): Column)(_ bitwiseOR _))
  }

  /** Query-directed multi-probe ANN — q35's recall lever done properly:
    * instead of blindly flipping every bit (d1 neighborhood), each query
    * probes the buckets reachable by flipping its SMALLEST-MARGIN bits —
    * the hyperplanes it nearly straddles, where true neighbors land on the
    * wrong side. Same plan shape as q35 (probe explosion → bucket
    * equi-join → bounded-heap top-k), so it scales identically; the probe
    * schedule only changes WHICH ~13 buckets each query visits. Margin
    * computation is per-QUERY (tiny side), never per-candidate.
    */
  def q50AnnQueryDirected(s: SparkSession, dir: String): DataFrame = {
    val b = bucketedEmb(s, dir)
    val qm = b.filter(col("vec_id") < 10)
      .withColumn("ms", marginSortExpr(col("vec"), Planes))
    val q = qm.select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("bucket"),
        explode(array(probeMasks("ms"): _*)).as("mask"))
      .select(col("q_id"), col("q_vec"),
        col("bucket").bitwiseXOR(col("mask")).as("pbucket"))
    val sims = b.as("c")
      .join(broadcast(q), col("c.bucket") === col("pbucket") && col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        Sim.cosineByName(s, "q_vec", "c.vec").as("sim"))
    sims.groupBy(col("q_id"))
      .agg(expr("topk_pairs(3, sim, n_id)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("n_id"),
        (col("pos") + 1).cast("int").as("rank"), r4(col("p.score")).as("sim"))
  }

  /** IVF-style cell assignment — the coarse-quantizer half of an IVF ANN
    * index: each vector joins the cell of its most-aligned TRAINED
    * centroid (argmax dot against the [[trainedCb]] k-means codebook,
    * [[kmeansK]](N) cells). Search then probes only the query's cell(s), exactly
    * like q33 does for sign buckets. Assignment is map-only — the
    * codebook rides a one-row broadcast and the argmax is an
    * in-expression fold, so the corpus pass adds no exchange.
    */
  def q34IvfAssign(s: SparkSession, dir: String): DataFrame = {
    val emb = embVec(s, dir)
    emb.crossJoin(broadcast(trainedCb(s, dir, emb)))
      .withColumn("b", KmeansCodebook.bestByName(s, "vec", "cbs"))
      .select(
        col("vec_id"),
        col("b.id").as("cell"),
        r4(col("b.d")).as("cell_score"))
  }

  /** IVF probe search — the query half q34's coarse quantizer exists for:
    * candidates live in their argmax-dot cell (the inverted file); each
    * query probes its `IvfNprobe` best-scoring cells and ranks only those
    * cells' members. Candidate volume per query ≈ nprobe·n/cells — the
    * IVF recall/cost knob — and the plan is the same bucket equi-join +
    * bounded-heap top-k as the LSH paths, so it scales the same way.
    * Cell scores are computed per-QUERY only; candidates carry just their
    * int cell id through the join.
    */
  val IvfNprobe = 3

  def q53IvfSearch(s: SparkSession, dir: String): DataFrame = {
    // materialized once: feeds codebook training, candidates, and queries
    val base = embVec(s, dir)
    val cb = broadcast(trainedCb(s, dir, base))
    val cand = base.crossJoin(cb)
      .select(col("vec_id"), col("vec"),
        KmeansCodebook.bestByName(s, "vec", "cbs").getField("id").as("cell"))
    // per-query probe cells: the IvfNprobe highest-dot TRAINED cells.
    // Relational top-k (explode the broadcast codebook, rank per query) is
    // fine here because it runs over the handful of query rows only — the
    // corpus side never explodes against the codebook.
    val q = base.filter(col("vec_id") < 10).crossJoin(cb)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(col("cbs")).as("c"))
      .select(col("q_id"), col("q_vec"), col("c.cb_id").as("pcell"),
        Sim.dot(col("q_vec"), col("c.cb_vec")).as("dd"))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dd").desc, col("pcell").asc)))
      .filter(col("prn") <= IvfNprobe)
      .select(col("q_id"), col("q_vec"), col("pcell"))
    val sims = cand.as("c")
      .join(broadcast(q), col("c.cell") === col("pcell") && col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        Sim.cosineByName(s, "q_vec", "c.vec").as("sim"))
    sims.groupBy(col("q_id"))
      .agg(expr("topk_pairs(3, sim, n_id)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("n_id"),
        (col("pos") + 1).cast("int").as("rank"), r4(col("p.score")).as("sim"))
  }

  /** Stopword-hit language ID (deterministic heuristic classifier). */
  def q23LangId(s: SparkSession, dir: String): DataFrame = {
    val toks = Txt.tokens(col("text"))
    val withHits = t(s, dir, "documents").select(
      col("doc_id") +:
        Txt.StopwordsByLang.map { case (l, sw) => Txt.stopwordHits(toks, sw).as(s"${l}_hits") }: _*)
    withHits.withColumn(
      "detected_lang",
      when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits") &&
        col("en_hits") >= col("de_hits"), lit("en"))
        .when(col("es_hits") >= col("fr_hits") && col("es_hits") >= col("de_hits"), lit("es"))
        .when(col("fr_hits") >= col("de_hits"), lit("fr"))
        .otherwise(lit("de")))
  }

  /** Quality scoring: token stats + punctuation/stopword ratios combined
    * into a bounded score. All ratios are single divisions of exact integer
    * counts — deterministic cross-engine.
    */
  def q24QualityScore(s: SparkSession, dir: String): DataFrame = {
    // Native `quality_components` computes all five signals in ONE byte
    // walk (the chain walks the document once per signal — the
    // regexp_extract_all alone materializes a match list — 156 s at
    // sf100). Composable chain stays as the bit-identical fallback;
    // NativeTextSpec pins parity, including multi-byte text.
    val toks = Txt.tokens(col("text"))
    val base =
      if (s.catalog.functionExists("quality_components"))
        t(s, dir, "documents")
          .withColumn("qc", expr("quality_components(text)"))
          .select(col("doc_id"),
            col("qc.n_tokens").as("n_tokens"), col("qc.sum_len").as("sum_len"),
            col("qc.punct_cnt").as("punct_cnt"), col("qc.stop_occ").as("stop_occ"),
            col("qc.len").as("len"))
      else t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        expr("aggregate(filter(split(text, ' '), t -> t <> ''), 0, (acc, t) -> acc + length(t))").as("sum_len"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0))).as("punct_cnt"),
        Txt.stopwordOccurrences(toks, Txt.StopwordsByLang.head._2).as("stop_occ"),
        length(col("text")).as("len"))
    base.select(
      col("doc_id"), col("n_tokens"),
      r4(col("sum_len") / col("n_tokens")).as("avg_token_len"),
      r4(col("punct_cnt") / col("len")).as("punct_ratio"),
      r4(col("stop_occ") / col("n_tokens")).as("stop_ratio"),
      // THE shared quality formula (Txt.qualityScoreFrom — also the
      // Curation gate) over the component columns computed once above.
      r4(Txt.qualityScoreFrom(
        col("n_tokens"), col("punct_cnt"), col("stop_occ"), col("len")))
        .as("quality"))
  }

  /** Token counting: whitespace + BPE-ish regex segmentation. Native
    * `quality_components` carries both counts (and the char length) out
    * of its single byte walk — the regex segmentation alone was most of
    * q25's 37.6 s at sf100; the composable pair stays as the
    * bit-identical fallback (NativeTextSpec pins bpe parity).
    */
  def q25TokenCount(s: SparkSession, dir: String): DataFrame =
    if (s.catalog.functionExists("quality_components"))
      t(s, dir, "documents")
        .withColumn("qc", expr("quality_components(text)"))
        .select(col("doc_id"),
          col("qc.n_tokens").as("ws_tokens"),
          col("qc.bpe_tokens").as("bpe_tokens"),
          col("qc.len").as("n_chars_m"))
    else t(s, dir, "documents").select(
      col("doc_id"),
      Txt.tokenCountWs(col("text")).as("ws_tokens"),
      Txt.tokenCountBpe(col("text")).as("bpe_tokens"),
      length(col("text")).as("n_chars_m"))

  /** Document fingerprints: md5 of normalized text + polynomial rolling
    * hash of the raw text.
    */
  def q26Fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      Txt.fingerprint(col("text")).as("fp"),
      Txt.rollingHashExpr("text").as("rhash"))

  /** n-gram-profile language ID: score each language by occurrences of its
    * characteristic character bigrams (multiset count over the text's
    * 2-gram shingles), argmax with a fixed precedence — the n-gram twin of
    * q23's stopword classifier, catching languages tokenizers miss.
    */
  def q47LangIdNgram(s: SparkSession, dir: String): DataFrame = {
    // Native `lang_bigram_hits` scores all four languages in ONE pass
    // over the text bytes (the chain re-shingles the whole document —
    // O(len²) of substr re-seeks plus an interpreted filter — once PER
    // language; q47 was the most expensive map-only row at sf100, 272 s,
    // and this chain ×4 was all of it). Composable chain stays as the
    // bit-identical no-extensions fallback; NativeTextSpec pins parity.
    val withHits =
      if (s.catalog.functionExists("lang_bigram_hits"))
        docs(s, dir)
          .withColumn("ng", expr("lang_bigram_hits(text)"))
          .select(col("doc_id") +:
            Txt.CharBigramProfiles.zipWithIndex.map { case ((l, _), j) =>
              element_at(col("ng"), j + 1).as(s"${l}_ng")
            }: _*)
      else docs(s, dir).select(
        col("doc_id") +:
          Txt.CharBigramProfiles.map { case (l, p) =>
            Txt.ngramProfileHits("text", p).as(s"${l}_ng")
          }: _*)
    withHits.withColumn(
      "detected_lang",
      when(col("en_ng") >= col("es_ng") && col("en_ng") >= col("fr_ng") &&
        col("en_ng") >= col("de_ng"), lit("en"))
        .when(col("es_ng") >= col("fr_ng") && col("es_ng") >= col("de_ng"), lit("es"))
        .when(col("fr_ng") >= col("de_ng"), lit("fr"))
        .otherwise(lit("de")))
  }

  /** Corpus vocabulary statistics: global top-20 terms by document
    * frequency and total occurrences — explode tokens, aggregate, top-k
    * with a total tie-break. The shape every tokenizer-training /
    * stopword-mining pass runs.
    */
  def q46TermFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(Txt.tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("occurrences"), countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("term").asc)
      .limit(20)

  /** Multimodal metadata extraction via the mapPartitions decode stub. */
  def q27MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.documentBlobMeta(s, t(s, dir, "documents"))

  /** Frame sampling through the mapPartitions fan-out path (one blob row →
    * `MultimodalFrameCount` frame rows, per-partition init, iterator in /
    * iterator out — the batch shape a codec/GPU stage needs). The stub
    * fingerprints fixed-stride windows with exact integer arithmetic, so
    * unlike most imperative decode paths this one has a full DuckDB
    * oracle: the driver hash-checks the fan-out, offsets, and hashes,
    * proving the mapPartitions plumbing end-to-end, not just rows>0.
    */
  val MultimodalFrameCount = 4

  def q54MultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[Multimodal.MediaBlob]
    Multimodal.sampleFrames(blobs, MultimodalFrameCount).toDF()
  }

  /** Gopher/C4-style repetition quality signals per document: duplicate
    * word fraction, most-frequent-word fraction, duplicate bigram
    * fraction — the filters a pretraining pipeline uses to drop
    * boilerplate/spam before training.
    *
    * Plan shape: explode → count per (doc, term) → re-aggregate per doc.
    * Both aggregations are codegen hash aggregates with map-side partials;
    * the second GROUP BY reuses the first's (doc_id ⊂ keys) partitioning
    * modulo hash width, and the word/bigram branches join on doc_id AFTER
    * aggregation — only per-doc scalar stats cross that join, never token
    * lists. No interpreted HOF in the per-token path.
    */
  def q51RepetitionStats(s: SparkSession, dir: String): DataFrame = {
    // Native `token_rep_stats` makes this query MAP-ONLY: the signals
    // are per-document, but the composable formulation below can only
    // say "count per (doc, term)" as explode → two stacked groupBys —
    // twice, plus a join — which shuffles the entire exploded token
    // corpus (~250 M rows at sf100, 51 s) to compute per-doc scalars.
    // One in-expression hash map per document deletes all four
    // exchanges; at 100 TB that is a full-corpus token shuffle that
    // never happens. Zero-token docs: the exploded plan simply has no
    // rows for them (they vanish from the output), so the native path
    // filters w_n > 0; b_n = 0 maps to the chain's NULL-coalesce.
    if (s.catalog.functionExists("token_rep_stats"))
      return docs(s, dir)
        .withColumn("rs", expr("token_rep_stats(text)"))
        .filter(col("rs.w_n") > 0)
        .select(col("doc_id"),
          col("rs.w_n").as("word_count"),
          r4(lit(1.0) - col("rs.w_distinct").cast("double")
            / col("rs.w_n").cast("double")).as("dup_word_frac"),
          r4(col("rs.w_max").cast("double")
            / col("rs.w_n").cast("double")).as("top_word_frac"),
          r4(when(col("rs.b_n") === 0, lit(0.0))
            .otherwise(lit(1.0) - col("rs.b_distinct").cast("double")
              / col("rs.b_n").cast("double"))).as("dup_bigram_frac"))
    def stats(termCol: Column, prefix: String)(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(termCol).as("t"))
        .groupBy(col("doc_id"), col("t"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"${prefix}_n"),
          max(col("c")).as(s"${prefix}_max"),
          count(lit(1)).as(s"${prefix}_distinct"))
    val toks = docs(s, dir).select(col("doc_id"), Txt.tokens(col("text")).as("tk"))
    val words = stats(col("tk"), "w")(toks)
    val bigrams = stats(Txt.wordBigramsExpr("tk"), "b")(
      toks.filter(size(col("tk")) >= 2))
    words.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("w_n").cast("int").as("word_count"),
        r4(lit(1.0) - col("w_distinct").cast("double") / col("w_n").cast("double")).as("dup_word_frac"),
        r4(col("w_max").cast("double") / col("w_n").cast("double")).as("top_word_frac"),
        r4(coalesce(lit(1.0) - col("b_distinct").cast("double") / col("b_n").cast("double"), lit(0.0))).as("dup_bigram_frac"))
  }

  /** PII scrub — regex redaction of emails/phone numbers plus per-doc
    * redaction counts, the mechanical core of a pretraining PII pass. The
    * testdata corpus contains no organic PII, so a deterministic synthetic
    * contact line is appended to every 7th document IN the query — the
    * scrubber then has real work whose counts the oracle independently
    * reproduces. Patterns are RE2-safe (no backrefs/lookaround), so Java
    * and DuckDB agree. Map-only: scan → project, no shuffle.
    */
  def q52PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val salted7 = when(col("doc_id") % 7 === 0,
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or 555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit("-4567 now")))
      .otherwise(col("text"))
    // second salt line: the 3-3-4 and parenthesized phone shapes, so the
    // widened pattern's new alternatives have oracle-checked work too
    val salted = when(col("doc_id") % 11 === 0,
      concat(salted7, lit(" call (555) 123-4567 or 555-987-6543 soon")))
      .otherwise(salted7)
    docs(s, dir)
      .withColumn("t", salted)
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(PiiEmailRe), lit(0))).as("email_count"),
        size(regexp_extract_all(col("t"), lit(PiiPhoneRe), lit(0))).as("phone_count"),
        md5(regexp_replace(regexp_replace(col("t"), PiiEmailRe, "<EMAIL>"),
          PiiPhoneRe, "<PHONE>")).as("clean_md5"))
  }

  /** Character-diversity quality signal: per-doc Simpson index
    * `1 − Σ (c_i/n)²` over character frequencies plus the distinct-char
    * count — the cheap gibberish/keyboard-mash detector ("aaaa…" → 0,
    * uniform text → ≈1). Simpson was chosen over Shannon entropy
    * DELIBERATELY: it is exact rational arithmetic (sums, squares, one
    * division), so the DuckDB oracle matches bit-for-bit, while `log`
    * is not correctly-rounded-guaranteed across libm implementations and
    * would make cross-engine hashes flaky at rounding boundaries.
    * Same two-level aggregate shape as q51; map-side partial combines.
    */
  def q55CharDiversity(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("distinct_chars"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("doc_id"),
        col("n").cast("int").as("char_count"),
        col("distinct_chars").cast("int").as("distinct_chars"),
        r4(lit(1.0) - col("ss").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("simpson_diversity"))

  /** One Lloyd (k-means) iteration over the embeddings — the codebook
    * TRAINING step the IVF index (q34/q53) consumes: assign every vector
    * to its argmax-dot cell, then recompute each cell's centroid as the
    * per-dimension mean. Output is relational (cell, dim, n, centroid) —
    * the layout a next-iteration literal codebook is built from.
    *
    * Plan shape: map-only assign → posexplode → one hash aggregate on
    * (cell, dim) — ≤ cells×dim groups regardless of corpus size, with
    * map-side partials; no driver collect, no window. Sums run through
    * DECIMAL so the mean is exact-then-rounded — bit-stable under any
    * partitioning/merge order (float sums are not associative; a decimal
    * sum is), which is also what lets DuckDB reproduce it.
    */
  def q56KmeansStep(s: SparkSession, dir: String): DataFrame = {
    val dots = array(Planes.indices.map(j => Sim.dot(col("vec"), typedlit(Planes(j).toSeq))): _*)
    val assigned = widen(s, t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec")))
      .withColumn("dots", dots)
      .select(col("vec"),
        (array_position(col("dots"), array_max(col("dots"))) - 1).cast("int").as("cell"))
    assigned
      .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "v")))
      .groupBy(col("cell"), (col("pos") + 1).cast("int").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(28,14)")).as("sv"))
      .select(col("cell"), col("dim"), col("n"),
        r4(col("sv").cast("double") / col("n")).as("centroid"))
  }

  /** Deterministic stratified sampling by CONTENT hash — the reproducible
    * alternative to rand() sampling a training-data pipeline needs: the
    * same document always samples the same way, across reruns, engines,
    * and cluster layouts (no RNG state, no seed-plus-partition coupling).
    * The stratum rate hangs off the source: strata whose first source
    * byte is even keep ~25 % (md5 prefix < '4000'), the rest ~50 %.
    * Map-only: scan → project → filter, zero shuffles.
    */
  def q57HashSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("h", substring(md5(col("text")), 1, 4))
      .withColumn("threshold",
        when(pmod(ascii(substring(col("source"), 1, 1)), lit(2)) === 0, lit("4000"))
          .otherwise(lit("8000")))
      .filter(col("h") < col("threshold"))
      .select(col("doc_id"), col("source"))

  /** Per-document top-3 terms by tf-idf — the relevance/keyword-extraction
    * primitive. The idf factor is the RATIONAL form n_docs/df (ranking-
    * equivalent to the log form for per-doc ordering, since log is
    * monotone): tf·n_docs stays exact integer arithmetic and the single
    * double division is IEEE-deterministic, so the oracle matches
    * bit-for-bit — `ln` is not correctly-rounded across libms (same
    * reasoning as q55's Simpson-over-entropy choice).
    *
    * Plan: explode → two hash aggregates (tf, df) → term equi-join →
    * per-doc top-k via the O(k)-state `bounded_sorted_list` heap keyed
    * on struct(-score, term) — smallest negated score first IS
    * (score DESC, term ASC), the window's exact order, and the IEEE sign
    * flip is lossless so the recovered score r4-matches the oracle's.
    * The round-14 rework: the original `row_number` window repartitioned
    * AND SORTED the full (doc, term) frame (~155 M rows at sf100 —
    * measured 83.8 s, the worst undocumented per-decade row of the r14
    * sweep); the heap aggregate keeps ≤ 3 structs per doc with no sort
    * of the data (sf100: 83.8 → 60.3 s, and the 60.3 was measured while
    * a sustained-streaming run shared the box — a quiet-box upper
    * bound). Group cardinality scales with the corpus, so no q21-style
    * few-key parallelism ceiling either way.
    */
  def q58TfidfTopk(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(Txt.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "term").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
    scored
      .groupBy(col("doc_id"))
      .agg(boundedSortedList(s, 3, "struct(-score as ns, term)").as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("doc_id"), col("t.term").as("term"),
        (col("p") + 1).cast("int").as("rank"),
        r4(-col("t.ns")).as("score"))
  }

  /** Percentile-clip curation: per source, keep only documents whose text
    * length lies inside the stratum's [p05, p95] — the outlier-trimming
    * gate (truncated boilerplate / concatenation blobs) a pretraining
    * corpus passes through before tokenization. Exact percentiles ride
    * the same engine-parity contract as q41 (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, linear interpolation); the bounds join back as a
    * broadcast (one row per stratum).
    */
  def q59LengthClip(s: SparkSession, dir: String): DataFrame = {
    val lens = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), length(col("text")).as("len"))
    val bounds = lens.groupBy(col("source")).agg(
      expr("percentile(len, 0.05)").as("lo"),
      expr("percentile(len, 0.95)").as("hi"))
    lens.join(broadcast(bounds), "source")
      .filter(col("len") >= col("lo") && col("len") <= col("hi"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), min(col("len")).as("min_len"), max(col("len")).as("max_len"))
  }

  /** Interval self-join via TIME BINNING — the scalable form of
    * "pairs of same-user events within 300 s": each event lands in a
    * 300-s bin and probes only {its bin, next bin} (|Δt| ≤ W ⇒ bins
    * differ by ≤ 1), so candidates come from an EQUI-join on
    * (user, bin) instead of the O(n²)-per-user range theta-join Spark
    * would otherwise plan (BroadcastNestedLoop). Same-bin pairs are
    * ordered by id to emit once; cross-bin pairs arise exactly once (only
    * the earlier bin probes forward). Output ids are normalized a < b.
    */
  def q60TimePairs(s: SparkSession, dir: String): DataFrame = {
    val W = 300L
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("tsec"))
      .withColumn("bin", floor(col("tsec") / W))
    val probes = ev.select(col("user_id").as("u"), col("event_id").as("a_id"),
      col("tsec").as("a_t"), col("bin").as("a_bin"),
      explode(array(col("bin"), col("bin") + 1)).as("p"))
    probes.join(ev,
        col("p") === col("bin") && col("u") === col("user_id") &&
          abs(col("a_t") - col("tsec")) <= W &&
          (col("a_bin") =!= col("bin") || col("a_id") < col("event_id")))
      .select(col("u").as("user_id"),
        least(col("a_id"), col("event_id")).as("a_id"),
        greatest(col("a_id"), col("event_id")).as("b_id"),
        abs(col("a_t") - col("tsec")).cast("long").as("dt_s"))
  }

  /** Connected components over the q18 near-dup pairs — the step that turns
    * PAIRS into DEDUP CLUSTERS: transitive near-duplicates collapse to one
    * cluster whose representative (the minimum doc_id) is the kept
    * survivor; everything else in the cluster is droppable. Without this,
    * pairwise dedup keeps B and C of an A≈B, B≈C chain.
    *
    * Algorithm: iterative min-label propagation + pointer jumping to
    * fixpoint — per round one equi-join (edge × label) + one min-aggregate
    * + one label self-join (the shortcut l(v) := l(l(v))), all codegen
    * hash ops; labels monotonically decrease so the fixpoint is unique and
    * deterministic under any partitioning. The jump step is what bounds
    * rounds at O(log diameter) instead of O(diameter): propagation alone
    * moves a label one hop per round, while jumping doubles the collapsed
    * distance every round (path halving, the standard parallel
    * union-find / Shiloach–Vishkin shortcut). Near-dup clusters are
    * clique-like and collapse in 2–3 rounds either way; the jump is the
    * insurance for the pathological chain shape (template-drift A≈B≈C≈…)
    * where plain propagation needs diameter rounds — Q61RoundsSpec pins a
    * planted 4,000-doc chain at ≤ 16 rounds. The data never leaves the
    * cluster — the driver only counts label changes per round (O(1) per
    * iteration, bounded iterations).
    */
  def q61DedupClusters(s: SparkSession, dir: String): DataFrame =
    connectedComponents(q18LshPairs(s, dir))

  /** Min-label connected components over an (a_id, b_id) pair frame —
    * see [[q61DedupClusters]] for the algorithm and scale notes.
    *
    * Each round ends in an EAGER pin ([[graft.engine.Materialize]]): the
    * round's labels reference the previous round's twice (self union +
    * propagation), so without lineage truncation the analyzed plan tree
    * DOUBLES per round — exponential analysis cost long before any data
    * is big (caching alone doesn't help; it truncates execution, not
    * analysis). This is the standard iterative-algorithm discipline on
    * Spark (GraphFrames does the same); setting
    * `spark.graft.checkpoint.reliable` routes the same pins to reliable
    * `checkpoint()` for fault-tolerant cluster runs.
    */
  private[queries] def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** [[connectedComponents]] plus the number of rounds it took — exposed so
    * Q61RoundsSpec can pin the O(log diameter) convergence guarantee as a
    * regression gate (a future edit that drops the jump step would pass the
    * small-clique oracles but blow the chain spec's round budget).
    *
    * Two per-round propagation strategies, same labels/jump/convergence
    * machinery and IDENTICAL output (ClusterSpec/ClusterPropsSpec/
    * Q61RoundsSpec run both):
    *
    *   - STATIC EDGES (default): every round joins the full pinned edge
    *     frame against the labels. Per-round cost ∝ |E| forever — at
    *     sf100 that is a 68 M-row join × 12 rounds, and round-13 stage
    *     accounting shows q61 is SHUFFLE-bound there (14.6 GB shuffle
    *     writes, zero disk reads — tools/sweeps/r13_sf100_x110_stats).
    *   - CONTRACTION: after each round, edge endpoints are rewritten to
    *     their current reps, self-loops dropped, duplicates collapsed —
    *     the rep-graph preserves component structure (contraction of a
    *     connected graph is connected; the component min is its own rep,
    *     so min labels keep flowing), while the edge frame COLLAPSES as
    *     components converge (a giant component becomes one rep with
    *     zero internal edges). Round 1 pays ~2 extra |E|-wide joins for
    *     the rewrite; every later round's propagate+rewrite runs on the
    *     shrunken frame. Non-rep nodes keep converging through the
    *     pointer jump exactly as before (the labels frame always covers
    *     all N nodes, and the fixpoint guard is unchanged). Measured
    *     (round 13, 64 GB-heap regime): sf10 24.0 → 12.4 s, sf100
    *     123.5 → 61.7 s — 2× at both decades, identical label frames.
    *
    * `spark.graft.q61.contract` = `auto` (default) | `true` | `false`.
    * Auto contracts when the directed edge frame exceeds
    * [[ContractMinEdges]]: below it the per-round rewrite's fixed job
    * overhead (2 joins + a distinct + a pin × rounds) outweighs the
    * shuffle it saves — the r11 lesson that small-scale CC cost is job
    * COUNT, not data. The edge frame is already pinned, so the gate's
    * count() reads materialized blocks — no extra plan execution.
    */
  private[queries] def connectedComponentsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    var edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .pinned
    val contract = pairs.sparkSession.conf
      .get("spark.graft.q61.contract", "auto").toLowerCase match {
        case "true" => true
        case "false" => false
        case _ => edges.count() >= ContractMinEdges
      }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id")).pinned
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      // The previous rep rides the union as a `prev` tag (exactly one
      // non-null per id — the labels row; max() picks it out), so the
      // convergence check is a filter-count over the already-pinned
      // round result instead of an extra join against the old labels —
      // one aggregation and zero additional shuffles per round.
      val prop = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("rep"),
          lit(null).cast("bigint").as("prev"))
      // pinnedResetStats, not pinned: the round plan joins this frame with
      // itself (the jump below), and checkpointing PRESERVES origin-plan
      // stats — the size-only join estimate would square per round until
      // the driver spends its time multiplying megabit BigInts
      // (measured: 70 s/round by round 22 at sf10; see Materialize
      // .pinResetStats and Q61Diag's statsBits column).
      val next = labels.withColumn("prev", col("rep")).unionByName(prop)
        .groupBy(col("id")).agg(min(col("rep")).as("rep"), max(col("prev")).as("prev"))
        .pinnedResetStats
      // Pointer jump (path halving): l(v) := l(l(v)). Every rep is itself
      // a node id present in `next` (reps only ever flow from node ids),
      // so the lookup is an equi self-join of the pinned round frame; the
      // left join + coalesce is belt-and-braces for the impossible miss.
      // Monotone (l(l(v)) <= l(v)), so the fixpoint and its loud
      // non-convergence guard are unchanged; changed-count still compares
      // against the pre-round label via the riding prev tag.
      // The convergence count RIDES the pin job via observe():
      // Dataset.checkpoint runs through withAction, which fires the
      // QueryExecutionListener that Observation awaits, so the metric is
      // ready the moment the eager localCheckpoint returns — one job
      // per pin and ZERO extra jobs for the count (r11 ran a separate
      // filter-count over the pinned frame each round; at 22 rounds ×
      // 32 near-empty tasks the fixed job overhead, not data, dominated
      // the sf10 CC wall — see SCALING.md). coalesce: sum() over an
      // empty frame observes null.
      val obs = org.apache.spark.sql.Observation(s"q61_round_$rounds")
      val jumped = next
        .join(next.select(col("id").as("rep"), col("rep").as("rep2")), Seq("rep"), "left")
        .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"), col("prev"))
        .observe(obs, coalesce(sum(when(col("rep") =!= col("prev"), 1L)), lit(0L))
          .as("changed"))
        .pinnedResetStats
      changed = obs.get("changed").asInstanceOf[Long]
      labels = jumped.drop("prev")
      if (contract && changed > 0) {
        // Rewrite edge endpoints to their current reps; drop the edges
        // that became internal to a converged (sub)component. distinct
        // keeps the frame ∝ live inter-rep adjacency instead of raw
        // multiplicity. pinnedResetStats: iterated self-feeding frame —
        // same stats-firewall discipline as the labels (a plain pin
        // would compound the join cardinality estimate per round).
        edges = edges
          .join(labels.select(col("id").as("src"), col("rep").as("csrc")), "src")
          .join(labels.select(col("id").as("dst"), col("rep").as("cdst")), "dst")
          .select(col("csrc").as("src"), col("cdst").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .pinnedResetStats
      }
      rounds += 1
    }
    // Fail LOUD on non-convergence: returning partially-propagated labels
    // would silently keep extra "survivors" (and hash-mismatch the
    // transitive-closure oracle with no hint why).
    require(changed == 0,
      s"connectedComponents: not converged after $rounds rounds ($changed labels still changing) — component diameter exceeds the round cap")
    val sizes = labels.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    val out = labels.join(sizes, "rep")
      .select(col("id").as("doc_id"), col("rep").as("cluster_rep"), col("cluster_size"))
    (out, rounds)
  }

  /** Sequential token-budget packing — chunking documents into
    * ~`PackCapacity`-token training sequences in a stable order: per
    * source, documents are laid out by doc_id and a chunk boundary falls
    * every time the RUNNING token total crosses the capacity. This is the
    * distributed-friendly form of greedy sequence packing (true greedy
    * "close the bin early" needs sequential recursion; budget chunking is
    * one window over one sort and its chunks overflow capacity by at most
    * one document — the standard approximation a pretraining pipeline
    * runs). Deterministic: exact integer cumsum, stable (doc_id) order.
    */
  val PackCapacity = 2048

  def q62SeqPacking(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"), Txt.tokenCountWs(col("text")).as("tokens"))
      .withColumn("before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("tokens"),
        floor(col("before") / PackCapacity).cast("int").as("chunk_id"))
  }

  /** RE2-safe PII patterns (no backrefs/lookaround — Java regex and DuckDB
    * RE2 match identically), shared with the DuckDB oracle. The phone
    * pattern covers the common US shapes: 3-3-4 (`555-123-4567`),
    * parenthesized (`(555) 123-4567`, space optional), and the 3-4-4 form
    * the synthetic contact lines use.
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhoneRe = "(\\([0-9]{3}\\) ?|[0-9]{3}-)[0-9]{3,4}-[0-9]{4}"

  /** Product-quantization geometry: EmbeddingDim splits into PqM
    * subspaces of PqSubDim dims, each quantized against PqK centroids —
    * a vector compresses to PqM small codes (here 8 × 4 bits), the
    * memory shape that fits 10⁹-vector indexes in RAM (FAISS IVFPQ's
    * layout). Codebooks here are the PqK lowest-id vectors — a
    * deterministic stand-in with the exact shape a trained codebook
    * (q56's k-means output) drops into.
    */
  val PqM = 8
  val PqSubDim: Int = EmbeddingDim / PqM
  val PqK = 16

  /** Sequential-order dot of subspace `sub` (0-based) of two vectors —
    * [[Sim.dot]] over aligned slices, bit-reproducible in DuckDB.
    */
  private def subDot(a: Column, b: Column, sub: Column): Column =
    Sim.dot(
      slice(a, sub * PqSubDim + 1, lit(PqSubDim)),
      slice(b, sub * PqSubDim + 1, lit(PqSubDim)))

  /** The whole PqK-entry codebook collected onto ONE row (sorted by
    * rank — deterministic fold order), for a scale-free single-row
    * broadcast: encoding is then a per-row higher-order-function fold,
    * no join and no row explosion against the corpus. Seeded exactly
    * like the coarse quantizer ([[KmeansCodebook.seed]]: the PqK
    * lowest-id vectors, cb_id = 0-based rank) — no dense-zero-based-id
    * assumption, so snowflake-style id domains get a full codebook
    * instead of a silently empty one.
    */
  private def pqCodebookRow(emb: DataFrame): DataFrame =
    KmeansCodebook.seed(emb, PqK)

  /** Per-subspace argmax-dot code array: element s is
    * struct(code, score) for subspace s. Strict `>` keeps the FIRST
    * (lowest-id) centroid on ties — matching the oracle's
    * `ORDER BY d DESC, cb_id`. Prefer [[pqCodesCol]]: the native fused
    * loop when the session has GraftExtensions registered, this
    * bit-identical HOF fold otherwise (same contract as `argmax_dot` /
    * `cosine_sim`).
    */
  private[graft] def pqCodesExpr: Column =
    transform(sequence(lit(0), lit(PqM - 1)), sub => {
      val best = aggregate(
        col("cbs"),
        struct(lit(Double.NegativeInfinity).as("d"), lit(-1).as("id")),
        (acc, cb) => {
          val d = subDot(col("vec"), cb.getField("cb_vec"), sub)
          when(d > acc.getField("d"),
            struct(d.as("d"), cb.getField("cb_id").as("id"))).otherwise(acc)
        })
      struct(best.getField("id").as("code"), best.getField("d").as("score"))
    })

  /** [[pqCodesExpr]] via the native fused-loop `pq_codes` when the
    * session has GraftExtensions registered; the bit-identical HOF fold
    * (with the matching null-in → null-out guard a native expression
    * gets for free) otherwise.
    */
  private def pqCodesCol(s: SparkSession): Column =
    if (s.catalog.functionExists("pq_codes"))
      expr(s"pq_codes(vec, cbs, $PqM, $PqSubDim)")
    else when(col("vec").isNull || col("cbs").isNull,
      lit(null).cast("array<struct<code:int,score:double>>"))
      .otherwise(pqCodesExpr)

  /** PQ encode: each embedding compresses to PqM per-subspace codes
    * (argmax dot against the subspace codebook). Map-only over the corpus
    * — the codebook rides a one-row broadcast and the argmax is an
    * in-expression fold, so no join, no shuffle, no explosion; output is
    * relational (vec_id, subspace, code, score) for the oracle.
    */
  def q63PqEncode(s: SparkSession, dir: String): DataFrame = {
    val emb = widen(s, t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec")))
    emb.crossJoin(broadcast(pqCodebookRow(emb)))
      .select(col("vec_id"), posexplode(pqCodesCol(s)).as(Seq("subspace", "best")))
      .select(col("vec_id"), col("subspace").cast("int").as("subspace"),
        col("best.code").as("code"), r4(col("best.score")).as("score"))
  }

  /** IVF-PQ search — q53's coarse quantizer composed with q63's codes:
    * candidates enter the cell equi-join carrying ONLY their PqM codes
    * (never their vectors), and matched candidates are scored by
    * asymmetric distance — the query subvector dotted with the
    * candidate's CODEBOOK centroid per subspace, summed. This is the
    * 10⁹-vector memory/plan shape (FAISS IVFPQ): the corpus-wide state is
    * codes + cells, the full-precision vectors appear only on the query
    * side. Explosion to (pair × subspace) happens AFTER cell selection —
    * cost follows matched candidates, not the corpus — and the ADC sum
    * runs through DECIMAL, so ranking is bit-stable under any
    * partitioning/merge order (float sums are not associative).
    */
  def q64IvfpqSearch(s: SparkSession, dir: String): DataFrame = {
    // materialized once: feeds coarse training, the PQ codebook row, the
    // candidate side, and the query side
    val base = embVec(s, dir)
    // renamed: pqCodebookRow also emits a `cbs` column and both ride the
    // same candidate row
    val coarse = broadcast(trainedCb(s, dir, base).withColumnRenamed("cbs", "coarse_cbs"))
    // the PQ codebook in exploded (cb_id, cb_vec) form for the ADC join —
    // same rank-based seed as pqCodebookRow, so codes and centroids agree
    val cb = pqCodebookRow(base)
      .select(explode(col("cbs")).as("c"))
      .select(col("c.cb_id").as("cb_id"), col("c.cb_vec").as("cb_vec"))
    val cand = base.crossJoin(coarse).crossJoin(broadcast(pqCodebookRow(base)))
      .select(col("vec_id"),
        KmeansCodebook.bestByName(s, "vec", "coarse_cbs").getField("id").as("cell"),
        pqCodesCol(s).as("codes"))
    val q = base.filter(col("vec_id") < 10).crossJoin(coarse)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(col("coarse_cbs")).as("c"))
      .select(col("q_id"), col("q_vec"), col("c.cb_id").as("pcell"),
        Sim.dot(col("q_vec"), col("c.cb_vec")).as("dd"))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dd").desc, col("pcell").asc)))
      .filter(col("prn") <= IvfNprobe)
      .select(col("q_id"), col("q_vec"), col("pcell"))
    val partials = cand
      .join(broadcast(q), col("cell") === col("pcell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("q_vec"), col("vec_id").as("n_id"),
        posexplode(col("codes")).as(Seq("subspace", "best")))
      .join(broadcast(cb), col("best.code") === col("cb_id"))
      .select(col("q_id"), col("n_id"),
        subDot(col("q_vec"), col("cb_vec"), col("subspace")).cast("decimal(28,14)").as("pd"))
    partials.groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("pd")).as("sd"))
      .select(col("q_id"), col("n_id"), col("sd").cast("double").as("adc"))
      .groupBy(col("q_id"))
      .agg(expr("topk_pairs(3, adc, n_id)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("n_id"),
        (col("pos") + 1).cast("int").as("rank"), r4(col("p.score")).as("adc"))
  }

  /** q66: the "line" unit for boilerplate removal. The synthetic documents
    * carry no newlines, so the unit is non-overlapping k-token chunks —
    * the operator shape (explode -> corpus-wide frequency -> drop -> ordered
    * reassembly) is exactly C4/CCNet line-level dedup.
    */
  val ChunkTokens = 3
  /** q66: a chunk appearing in >= this many distinct docs is boilerplate. */
  val BoilerplateMinDocs = 5
  /** q67: contamination shingle width (tokens). */
  val DecontamGram = 4
  /** q67: docs with doc_id % this == 0 form the held-out benchmark set. */
  val BenchmarkMod = 97

  /** C4/CCNet-style boilerplate line removal (SURVEY.md §7.5 dedup
    * family): explode every document into its k-token chunks, count each
    * chunk's document frequency CORPUS-WIDE, drop chunks that appear in >=
    * BoilerplateMinDocs distinct documents, and reassemble the remaining
    * chunks in original order. 100 TB shape: the frequency aggregation
    * shuffles 16-byte md5 digests (never chunk text); the flagged set is
    * tiny by construction (only corpus-repeated content) so the removal
    * join is a broadcast anti-join — document text crosses the wire only
    * for the per-document reassembly, whose state is bounded by document
    * length. Docs whose every chunk is boilerplate surface with a NULL
    * text_clean rather than disappearing.
    */
  def q66LineDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val chunks = widen(s, docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / $ChunkTokens.0) as int) - 1), " +
          s"i -> concat_ws(' ', slice(toks, i * $ChunkTokens + 1, $ChunkTokens)))"))
        .as(Seq("pos", "chunk")))
      .withColumn("h", md5(col("chunk")))
      .pinned // feeds the count AND the removal join once
    val flagged = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= BoilerplateMinDocs)
      .select("h")
    val kept = chunks.join(broadcast(flagged), Seq("h"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        expr("transform(array_sort(collect_list(struct(pos, chunk))), x -> x.chunk)"))
        .as("text_clean"))
    docs
      .select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / lit(ChunkTokens.toDouble))
          .cast("long").as("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Benchmark decontamination (the training-data hygiene step every LLM
    * pipeline runs before training): a deterministic held-out set
    * (doc_id % BenchmarkMod == 0) contributes its distinct token
    * DecontamGram-shingles; every other document is scored by how many of
    * its shingles collide with that set. 100 TB shape: the benchmark side
    * is distinct-reduced digests (benchmarks are small by definition) and
    * rides a broadcast, so the corpus side is one map-side explode + hash
    * join + per-doc count — no corpus-vs-corpus shuffle. Shingles shorter
    * than the gram width produce no grams (document shorter than the
    * window), matching the oracle's empty generate_series.
    */
  def q67Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    // Gram digests via the native fused walk where registered (the same
    // `word_ngram_md5s` q95-q99 ride, at DecontamGram width): the chain
    // materialized every gram STRING and hex-md5'd it — most of q67's
    // 126 s at sf100 was gram construction, not the join. Digests ride
    // as BINARY(16) (16 B vs the 32-char hex string on the shuffle and
    // in the broadcast set); same count semantics — each side maps
    // gram -> digest identically, and the join compares digests.
    val grams =
      if (s.catalog.functionExists("word_ngram_md5s"))
        widen(s, docs)
          .select(col("doc_id"),
            explode(expr(s"word_ngram_md5s(text, $DecontamGram)")).as("h"))
      else widen(s, docs)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(expr(
          s"case when size(toks) >= $DecontamGram then " +
            s"transform(sequence(1, size(toks) - $DecontamGram + 1), " +
            s"i -> unhex(md5(concat_ws(' ', slice(toks, i, $DecontamGram))))) " +
            "else array() end")).as("h"))
    val bench = grams.filter(col("doc_id") % BenchmarkMod === 0)
      .select("h").distinct()
    val hits = grams.filter(col("doc_id") % BenchmarkMod =!= 0)
      .join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    docs.filter(col("doc_id") % BenchmarkMod =!= 0)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_hits"),
        (coalesce(col("n"), lit(0L)) > 0).as("contaminated"))
  }

  /** q70: a bigram appearing in <= this many docs is "rare" (noise signal). */
  val RareMaxDocs = 2

  /** Generic range join (graft.engine.RangeJoin — interval binning to an
    * equi-join, SURVEY.md §2.7): attribute each purchase to the same
    * user's view-session span (min..max view time per user-day) it falls
    * inside. The naive formulation is a `BETWEEN` theta-join Spark can
    * only plan nested-loop; the operator replicates each interval (here
    * <= 24 h, so <= 5 six-hour bins) and hash-joins on (user, bin) — one
    * shuffle per side, codegen'd, point side never replicated. All range
    * arithmetic at epoch-second precision on both engines (q60's
    * convention).
    */
  def q71RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("psec"))
    val iv = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("i_user_id"), to_date(col("ts")).as("i_day"),
        col("ts").cast("long").as("vsec"))
      .groupBy(col("i_user_id"), col("i_day"))
      .agg(min(col("vsec")).as("s_sec"), max(col("vsec")).as("e_sec"),
        count(lit(1)).as("n_views"))
    graft.engine.RangeJoin.pointInInterval(p, iv, "psec", "s_sec", "e_sec",
        keys = Seq("user_id" -> "i_user_id"), binWidth = 21600L)
      .select(col("event_id"), col("user_id"), col("psec"),
        date_format(col("i_day"), "yyyy-MM-dd").as("day_s"),
        col("n_views"), (col("psec") - col("s_sec")).as("into_session_s"))
  }

  /** q72: synthetic transit interval length in days — deterministic from
    * the line identity so both engines derive identical intervals.
    */
  val TransitModDays = 21

  /** Interval-overlap range join (graft.engine.RangeJoin.intervalOverlap):
    * same-supplier shipment pairs whose transit windows overlap — the
    * "concurrent in-flight inventory" shape. Intervals are
    * [ship, ship + 7 + (id % 21)] days (synthesized: the table carries
    * only l_shipdate); both sides replicate to <= 3 sixteen-day bins and
    * hash-join on (supplier, bin); the canonical-bin rule (emit only
    * where the overlap STARTS) makes output exactly-once without a dedup
    * shuffle. The DuckDB oracle is the naive BETWEEN theta self-join —
    * fine at oracle scale, nested-loop at ours, which is the point.
    */
  def q72IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("a_id"),
        col("l_suppkey").as("a_supp"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("a_s"))
      .withColumn("a_e",
        col("a_s") + 7L + pmod(col("a_id"), lit(TransitModDays)))
    val rv = li.select(col("a_id").as("b_id"), col("a_supp").as("b_supp"),
      col("a_s").as("b_s"), col("a_e").as("b_e"))
    graft.engine.RangeJoin.intervalOverlap(li, rv,
        "a_s", "a_e", "b_s", "b_e",
        keys = Seq("a_supp" -> "b_supp"), binWidth = 16L)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_supp").as("supp"), col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s")) + 1L).as("overlap_days"))
  }

  /** Bigram fluency statistics (KenLM-style LM scoring's exact-arithmetic
    * cousin): count every bigram's document frequency CORPUS-WIDE, then
    * score each document by the average corpus df of its bigrams and by
    * its rare-bigram fraction — high avg df = boilerplate-ish common
    * phrasing, high rare fraction = noise/garble; the pair is the standard
    * C4/Gopher-family fluency curation signal without a trained LM.
    * Cross-engine determinism: both scores are ratios of exact integers
    * computed in ONE double division (IEEE correctly-rounded, so
    * bit-identical in Spark and DuckDB — the q68 pattern), then
    * floor-rounded for display.
    * 100 TB shape: text never shuffles — bigrams ride as 16-byte md5
    * digests, and BOTH exchanges the r13 plan paid on the 500 M-row
    * exploded frame are gone. (1) Document frequency needs distinct
    * (doc, bigram) pairs; a corpus-wide `distinct()` on the exploded
    * frame keyed its hash aggregate on the PAIR, so partial state grew
    * with the corpus slice per task and spilled 7–13 GB map-side under a
    * right-sized 64 GB heap (r13's one `weak`). But pair-distinctness is
    * a PER-DOCUMENT property: `array_distinct` on the per-doc digest
    * array collapses it map-side inside the row, so the only aggregate
    * keyed frame the df pass ever builds is vocabulary-sized. (2) The
    * score join's build side IS that df table; it is pinned, counted,
    * and broadcast while measured rows stay under
    * [[BroadcastLiveMaxRows]] (the q20 auto gate) — the bigram
    * vocabulary grows far sublinearly in the corpus, so the broadcast
    * normally holds and the 500 M-row probe side never shuffles; an
    * open-vocabulary corpus above the cap falls back to the digest
    * equi-join, both sides hash-partitioned, which was r13's
    * plan-of-record.
    */
  def q70BigramFluency(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    // Native `word_bigram_md5s` is one pass over the text bytes (each
    // bigram concat IS a contiguous byte window, so md5 runs with no
    // token array, concat strings, or HOF interpreter — ~23 s of task
    // time at sf0.1 down to the raw hashing); the composable chain is
    // the bit-identical no-extensions fallback (WordBigramMd5sSpec).
    val wide = widen(s, docs)
    // The pin holds the per-doc BINARY(16) digest ARRAY, not exploded
    // rows: same information, one row-overhead per document instead of
    // per bigram, and it feeds the df pass and the score pass once.
    val arr = (if (s.catalog.functionExists("word_bigram_md5s"))
      wide.select(col("doc_id"),
        expr("transform(word_bigram_md5s(text), x -> unhex(x))").as("hs"))
    else wide
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), expr(
        "case when size(toks) >= 2 then " +
          "transform(sequence(1, size(toks) - 1), " +
          "i -> unhex(md5(concat(toks[i - 1], ' ', toks[i])))) " +
          "else array() end").as("hs")))
      .pinned
    // bdf = number of documents containing the bigram: within-doc dups
    // die in `array_distinct` (map-side, no keyed state), so the count
    // aggregate's partial maps hold at most the vocabulary.
    val df = arr.select(explode(array_distinct(col("hs"))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("bdf"))
      .pinned
    val dfSide = gatedBroadcast(df)
    val grams = arr.select(col("doc_id"), explode(col("hs")).as("h"))
    grams.join(dfSide, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("bdf")).as("sum_df"),
        sum(when(col("bdf") <= RareMaxDocs, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"),
        r4(col("sum_df").cast("double") / col("n_bigrams")).as("avg_df"),
        r4(col("n_rare").cast("double") / col("n_bigrams")).as("rare_frac"))
  }

  /** Tolerance-bounded as-of join (pandas merge_asof's `tolerance`,
    * graft.plans.AsOf): q65's attribution but only when the user's last
    * view happened within ONE HOUR of the purchase — stale context rows
    * fall back to null instead of attributing a week-old view. The
    * tolerance is enforced inside the same merge/binary-search match (no
    * extra operator, no post-filter pass over candidate pairs);
    * timestamps measure it in internal MICROSECONDS.
    */
  def q74AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // Times at epoch-SECOND granularity (q60's cross-engine convention):
    // the raw timestamps carry sub-microsecond noise that Spark's µs and
    // DuckDB's ns representations would truncate differently at the
    // tolerance boundary.
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("psec"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").cast("long").as("vsec"))
    graft.plans.AsOf.join(p, v,
        Seq("user_id"), Seq("v_user_id"), "psec", "vsec", Seq("v_event_id"),
        tolerance = Some(3600L)) // 1 h
      .select(col("event_id"), col("user_id"), col("psec"),
        col("v_event_id"), col("vsec"))
  }

  /** q73: Misra-Gries counter budget — 28 counters over 31 distinct
    * tokens keeps eviction active while the n/(k+1) threshold lands
    * between the frequent cluster and the tail.
    */
  val HeavyK = 28

  /** Corpus heavy hitters via the `freq_items` Misra-Gries aggregate
    * (graft.expressions.FreqItems) + exact confirmation — the canonical
    * two-step that makes heavy-hitter mining deterministic AND scalable:
    * the sketch reduces the corpus to <= k candidates in one O(k)-state
    * aggregation (an exact GROUP BY would shuffle the whole vocabulary),
    * the candidates ride a broadcast semi-join to prune the corpus, and
    * only candidate keys are exact-counted. The MG guarantee (every item
    * with true count > n/(k+1) is among the candidates) makes the
    * confirmed set EQUAL to the true heavy-hitter set under any
    * partitioning — which is what the hash oracle checks. Fallback on a
    * bare session: skip the sketch prune (exact counts directly) —
    * identical output, the usual optional-extension contract.
    */
  def q73HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = widen(s, t(s, dir, "documents").select("doc_id", "text"))
      .select(explode(split(col("text"), " ")).as("tok"))
      .pinned // feeds sketch, prune join, and total count
    val counts =
      if (s.catalog.functionExists("freq_items")) {
        val cand = toks.agg(expr(s"freq_items($HeavyK, tok)").as("c"))
          .select(explode(col("c")).as("tok"))
        toks.join(broadcast(cand), Seq("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      } else toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = toks.agg(count(lit(1)).as("n"))
    counts.crossJoin(broadcast(tot))
      .filter(col("cnt") > col("n") / lit(HeavyK + 1.0))
      .select(col("tok"), col("cnt"))
  }

  /** Robust outlier envelope per event_type: exact median and MAD (median
    * absolute deviation) — the curation filter that survives heavy-tailed
    * telemetry where mean/stddev break. Two exact-percentile aggregations
    * over (event_type) — a handful of groups, so the per-group sorted
    * state is the only non-map cost — then one counting pass with the
    * 3-group stats broadcast. Median/MAD interpolation is the same
    * p*(n-1) formula in Spark's percentile and DuckDB's quantile_cont on
    * identical doubles, so the unrounded values the outlier comparison
    * uses are bit-identical; display columns go through the portable
    * floor-rounding.
    */
  def q68RobustOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val stats = ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), col("med"))
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), r4(col("med")).as("med"),
        r4(col("mad")).as("mad"), col("n"), col("n_outliers"))
  }

  /** Native as-of join (graft.plans.AsOfJoinExec — custom LogicalPlan +
    * Strategy + SparkPlan, SURVEY.md §2.7): stamp each purchase event with
    * the user's last view at-or-before it. The composed alternative is a
    * range join (every view before every purchase — quadratic in events
    * per user) plus a window to keep rank 1; the native operator is one
    * co-partitioned exchange per side and a single forward merge pass, so
    * at 100 TB the cost is two shuffles and O(|events|) scan work with
    * constant per-task state. Tie-break on v_event_id keeps the winner —
    * and the oracle hash — deterministic.
    */
  def q65AsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"), col("value").as("v_value"))
    graft.plans.AsOf.join(p, v,
        Seq("user_id"), Seq("v_user_id"), "ts", "v_ts", Seq("v_event_id"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("v_event_id"), col("v_value"))
  }

  /** Forward + inner as-of join (graft.plans.AsOfJoinExec): stamp each
    * view event with the user's FIRST purchase at-or-after it — the
    * time-to-conversion attribution shape — dropping views that never
    * convert (inner mode). Same two-shuffle single-merge-pass plan as
    * q65; forward just flips which side of the merge frontier wins, and
    * inner filters inside the iterator (no extra operator). Tie-break on
    * p_event_id keeps the winner deterministic for the oracle hash.
    */
  def q69AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    graft.plans.AsOf.join(v, p,
        Seq("user_id"), Seq("p_user_id"), "ts", "p_ts", Seq("p_event_id"),
        direction = graft.plans.AsOfForward, leftOuter = false)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("p_event_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts_s"),
        col("p_value"))
  }

  /** q77: documents kept per (lang, source) stratum. */
  val SampleK = 3

  /** Balanced per-stratum sampling: exactly k documents from every
    * (lang, source) stratum, selected by smallest content hash — the
    * fixed-quota complement to q57's fixed-RATE hash sampling (a training
    * mix wants "3 docs from every stratum", not "2 % of each"). Selection
    * is by md5(doc_id:text), so membership is a pure function of content:
    * stable across reruns, engines, partitionings, and corpus growth
    * *elsewhere* in the stratum's hash range. The naive form is a
    * rank-over-window — a full shuffle AND sort of the corpus; this runs
    * as the O(k)-state `bounded_sorted_list` heap aggregate (q18's
    * flood-cap machinery reused as an operator of its own): map-side
    * partials keep k rows per stratum, the one shuffle moves ≤ k·strata
    * digest structs, and no sort of the data ever happens. Bare-session
    * fallback: the same capped collect, per the optional-extension
    * contract.
    */
  def q77BalancedSample(s: SparkSession, dir: String): DataFrame = {
    val d = widen(s, t(s, dir, "documents"))
      .select(col("lang"), col("source"), col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))).as("h"))
    d.groupBy(col("lang"), col("source"))
      .agg(boundedSortedList(s, SampleK, "struct(h, doc_id)").as("kept"))
      .select(col("lang"), col("source"), explode(col("kept")).as("k"))
      .select(col("lang"), col("source"),
        col("k.doc_id").as("doc_id"), col("k.h").as("h"))
  }

  /** Temperature-scaled domain mixture weights (alpha = 0.5): the standard
    * multi-domain training recipe — sample domains proportionally to
    * tokens^alpha, flattening the natural distribution so small domains
    * are not drowned out — computed with every floating-point step
    * cross-engine deterministic. Token totals are exact integer sums; the
    * alpha weight is floor(sqrt(tokens)) — one correctly-rounded IEEE
    * sqrt plus a floor, bit-identical on any libm — so the weight SUM is
    * again exact integer arithmetic and the only double ops are three
    * final divisions in a fixed tree shape. `boost` is the upsampling
    * factor vs proportional sampling (weight/share > 1 ⇔ the domain is
    * over-sampled by the temperature). One hash aggregation over the
    * corpus + a broadcast of the one-row totals: no second corpus pass
    * (the per-domain frame is checkpointed), no driver math.
    */
  /** Sized ~16× above the largest bench-scale build side (sf0.1 urgent
    * orders ≈ 30 k keys) — over-sizing only LOWERS the false-positive
    * rate, never correctness (the confirm join owns that). ~450 KB at the
    * default 3 % design fpp; kept sub-MB deliberately because every map
    * partial serializes a full-size (bit-OR-mergeable) image through the
    * one-row final aggregation — the filter's build cost scales with
    * `size × map-tasks`, its benefit with probe-side selectivity, the
    * sizing tradeoff a 100 TB deployment must make explicitly.
    */
  val BloomExpected = 500000

  /** Bloom-pruned join: revenue per ship month for lineitems of URGENT
    * orders. The build side's filtered key set is aggregated into a
    * [[graft.expressions.BloomFilterAgg]] Bloom image, collected to the
    * driver (ONE sub-MB row — the documented C1-acceptable scalar
    * collect) and inlined as a FOLDABLE literal into the probe filter, so
    * [[graft.expressions.BloomContains]] deserializes once per task and
    * the per-row cost is a hash probe. The probe scan drops non-matching
    * lineitems BEFORE the join shuffle, and the exact join then removes
    * the fpp stragglers — result ≡ the plain join (the oracle IS the
    * plain join). At 100 TB this is the shape for a build side whose key
    * set outgrows broadcast-hash (10⁹ keys) while its ~9.6-bit/key Bloom
    * image does not: the fact-table shuffle shrinks by the prefilter's
    * selectivity (~80 % here), which is the dominant cost of the
    * sort-merge join. The image must reach the expression as a plan
    * constant, NOT as a `crossJoin(broadcast(aggRow))` column — a
    * column-valued image is re-copied by UnsafeRow.getBinary on every
    * probe row (~45 µs/row at 450 KB; and a 981 s round-6 bench failure
    * when the deserialization cache missed too). Same contract as the
    * other extension-backed queries: on a bare session the prefilter
    * vanishes and the exact join stands alone.
    */
  def q79BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = t(s, dir, "lineitem")
    val pruned =
      if (s.catalog.functionExists("bloom_agg")) {
        val image = o.agg(expr(s"bloom_agg($BloomExpected, o_orderkey)").as("bf"))
          .head.getAs[Array[Byte]]("bf")
        li.filter(graft.io.FilterStore.probe(image, col("l_orderkey")))
      } else li
    pruned.join(o, pruned("l_orderkey") === o("o_orderkey"))
      .groupBy(
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("line_count"))
  }

  /** Skew-salted fact-to-dim join ([[Skew.saltedJoin]]): per-segment event
    * value totals, with the events side salted on `event_id` (a column
    * that varies WITHIN a hot key) and the customer dim replicated once
    * per salt, so a flash-crowd user's rows split across `buckets` tasks
    * instead of pinning one reducer. This is the shape for the skew AQE
    * can NOT fix: AQE's skew-join splits sort-merge partitions at runtime,
    * but a stream-static join, a bucketed-layout join, or a join feeding a
    * same-key aggregation (this query — the salt also spreads the partial
    * aggregate) re-skews on the key. Salting trades ×buckets build-side
    * replication for a hard 1/buckets bound on any task's share of a hot
    * key — the explicit form of the tradeoff at 100 TB, where one 10⁸-row
    * user key otherwise parks a 30-minute straggler on an 8-second stage.
    * Result ≡ the unsalted join (the oracle is the plain join+group-by).
    */
  def q80SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val cust = t(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Skew.saltedJoin(ev, cust, Seq("user_id"), Seq(col("event_id")), buckets = 8)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("total_value"),
        count(lit(1)).as("n_events"))
  }

  /** q81's fixed retrieval query: one rare term (df ≈ 5 % of docs) and two
    * common ones — the oracle SQL is GENERATED from this constant so the
    * two engines cannot drift.
    */
  val Bm25Terms = Seq("dup", "vector", "join")

  /** BM25-style relevance scoring (k1 = 1.2, b = 0.75) with every
    * floating-point step cross-engine deterministic. Two standard-BM25
    * departures, both for bit-exactness (the q78 policy):
    * the rarity weight is the raw odds ratio (N − df + ½)/(df + ½)
    * without the usual ln(1 + ·) (same per-term ranking, no
    * correctly-rounded-log guarantee needed), and with k1, b rational the
    * whole term score reduces to one integer-exact fraction
    *   22·tf·S·(2N − 2df + 1)  /  (10·tf·S + 3S + 9·dl·N)(2df + 1)
    * (S = Σ dl, avgdl = S/N substituted through) — long arithmetic, ONE
    * IEEE division per term, and a fixed left-associated 3-term sum, so
    * Spark and DuckDB agree bit-for-bit before the presentation rounding.
    * (Long-safe to ~sf10 corpus sizes; a 100 TB corpus moves the
    * numerators to decimal(38,0) — same plan shape.)
    * Plan shape: one corpus pass for (N, S, df) — a one-row aggregate
    * riding a broadcast — and one scoring pass; tf comes from the doc's
    * own token array (map-side, no per-term shuffle). A zero tf zeroes
    * the numerator, so absent terms contribute exactly +0.0 — no
    * branches.
    */
  def q81Bm25(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.NumFunctions.portableRound
    val d = docs(s, dir)
      .select(col("doc_id"), Txt.tokens(col("text")).as("tk"))
      .withColumn("dl", size(col("tk")).cast("long"))
    val statAggs =
      Seq(count(lit(1)).as("n"), sum(col("dl")).as("slen")) ++
        Bm25Terms.map(t =>
          sum(when(array_contains(col("tk"), lit(t)), 1L).otherwise(0L)).as(s"df_$t"))
    val stats = d.agg(statAggs.head, statAggs.tail: _*)
    val withTf = Bm25Terms.foldLeft(d.crossJoin(broadcast(stats))) { (df, t) =>
      df.withColumn(s"tf_$t",
        size(filter(col("tk"), x => x === lit(t))).cast("long"))
    }
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t"); val dfT = col(s"df_$t")
      val num = lit(22L) * tf * col("slen") *
        (lit(2L) * col("n") - lit(2L) * dfT + lit(1L))
      val den = (lit(10L) * tf * col("slen") + lit(3L) * col("slen") +
        lit(9L) * col("dl") * col("n")) * (lit(2L) * dfT + lit(1L))
      num.cast("double") / den.cast("double")
    }
    val score = Bm25Terms.map(termScore).reduce(_ + _)
    withTf.select(
      Seq(col("doc_id")) ++
        Bm25Terms.map(t => col(s"tf_$t")) :+
        portableRound(score, 6).as("bm25"): _*)
  }

  /** Two-level mergeable distinct count via DataSketches HLL
    * (`hll_sketch_agg` → `hll_union_agg` → `hll_sketch_estimate`): one
    * sketch per (returnflag, ship-month) partial, then a register-wise
    * union up to flag level. This is the INCREMENTAL shape q30's direct
    * `approx_count_distinct` cannot give: persist the per-month sketches
    * (a few KB each) and any later rollup — new month arrives, year
    * total, ad-hoc flag × quarter — is a union over stored sketches with
    * ZERO rescans of the 100 TB fact history. Same-lgK HLL union is
    * register-max, i.e. lossless: the merged estimate IS the
    * direct-sketch estimate (HllSketchSpec pins that equality), so
    * correctness degrades nowhere by staging. The hash-checked output is
    * q30's envelope contract — each engine's own estimate lands within
    * 5 % of its own exact twin.
    */
  def q83HllUnion(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val monthly = li.groupBy(
        col("l_returnflag"),
        year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = monthly.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"))
    exact.join(broadcast(merged), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("parts"),
        (abs(col("est").cast("double") - col("parts").cast("double")) /
          col("parts").cast("double") <= 0.05).as("parts_within_5pct"))
  }

  /** q83's PRODUCTION/BENCH surface: the staged sketch alone — the
    * q30/q43 split ([[graft.queries.Parity.q43ProductionSketch]]). The
    * envelope above computes `countDistinct(l_partkey)` beside the HLL
    * union so DuckDB can hash-check the estimate's 5 % contract, but
    * that exact twin's full key-space shuffle is precisely the cost the
    * staged sketch exists to avoid (it dominated q83's 64.1 s sf100
    * wall; the sketch side is fixed-state mergeable — per-month sketches
    * are a few KB each and union is register-max lossless at equal lgK,
    * HllSketchSpec). Verify keeps hashing [[q83HllUnion]]'s envelope;
    * Bench and a 100 TB job submit THIS: monthly partial sketches →
    * flag-level union → estimate, zero exact distinct anywhere. Wired
    * via [[graft.SparkEntry.benchVariants]].
    */
  def q83ProductionSketch(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "lineitem").groupBy(
        col("l_returnflag"),
        year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    monthly.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("parts_est"))
  }

  /** Ordered funnel (view → click → purchase): per-user first-view, first
    * click strictly after it, first purchase strictly after that —
    * conversion analysis as THREE chained window-mins over ONE
    * hash-partitioning. Each stage's `min(when(...))` window references
    * the previous stage's column, and all three share
    * `Window.partitionBy(user_id)`, so Catalyst plans one exchange and
    * stacks the Window operators on it; the closing per-user dedup
    * aggregate reuses the same partitioning (exchange-free). At 100 TB
    * this is the funnel shape that does NOT self-join the event log per
    * stage — k stages cost k linear passes over each user's partition,
    * not k shuffled joins. Timestamps emit as epoch micros (the engines'
    * shared precision; events carry none finer).
    */
  def q84Funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    t(s, dir, "events")
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(
        unix_micros(min(col("t_view"))).as("t_view_us"),
        unix_micros(min(col("t_click"))).as("t_click_us"),
        unix_micros(min(col("t_purchase"))).as("t_purchase_us"))
  }

  /** Retention cohorts: users grouped by first-activity day, activity
    * counted per (cohort day, day offset) — the classic retention
    * triangle. The first-touch frame is a per-user aggregate joined back
    * onto the events (both shuffles key on user_id, so the join reuses
    * the aggregation's partitioning); the closing distinct-count shuffles
    * on the (cohort, offset) pair. On a production 100 TB log the
    * first-touch frame is a maintained dimension (one SCD1 upsert per
    * load, [[graft.io.Scd2History]]'s cheaper sibling) rather than a
    * recomputed min — the query then reads it broadcast-sized.
    */
  def q85RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val firstTouch = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    e.join(firstTouch, Seq("user_id"))
      .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Exact equi-depth revenue deciles over [[Ranking.globalRank]] — the
    * distributed exact ranking (range repartition + local rank +
    * broadcast offsets) instead of the `ntile() OVER (ORDER BY …)`
    * single-task global sort. Decile assignment is pure integer/exact
    * arithmetic — floor(((rank−1)·10)/N) on longs exact in doubles — so
    * the bucket edges match the window-form oracle row-for-row. This is
    * the stats-collection step for range-partitioned writes and the
    * exact twin of the approx-percentile path (q43) a 100 TB run would
    * sample instead.
    */
  def q87Deciles(s: SparkSession, dir: String): DataFrame = {
    val ranked = Ranking.globalRank(
      t(s, dir, "orders"), Seq(col("o_totalprice"), col("o_orderkey")), "rk")
    val total = t(s, dir, "orders").agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total))
      .withColumn("decile",
        (floor(((col("rk") - 1) * 10).cast("double") / col("n_total").cast("double"))
          .cast("int") + 1))
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").as("revenue"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
  }

  /** Per-group mean / sample-stddev / correlation WITHOUT the built-in
    * stddev/corr aggregates — those sum doubles in partition order, so
    * their last-ulp value depends on the merge tree and no exact oracle
    * can exist. Instead: the five raw moments (Σx, Σy, Σx², Σy², Σxy)
    * accumulate as EXACT decimals (inputs quantized to decimal(18,6),
    * products decimal(37,12) — no rounding anywhere in the aggregation),
    * and the statistics come out of the closed-form identities in a fixed
    * double expression tree. Distributed determinism for free — the
    * moments are associative integers in disguise — plus one extra win:
    * the same five numbers serve ANY of the derived statistics, so a
    * 100 TB profiling pass stores tiny per-partition moment rows
    * ([[graft.io.Rollup]] shape) and derives mean/std/corr per rollup
    * instead of re-aggregating. Presentation-rounded r4; the only
    * cross-engine wobble is the final decimal→double casts (≤ 1 ulp),
    * invisible at 4 digits.
    */
  def q88PortableStats(s: SparkSession, dir: String): DataFrame = {
    val qd = col("l_quantity").cast("decimal(18,6)")
    val pd = col("l_extendedprice").cast("decimal(18,6)")
    // Round 18: the five moment sums fused into ONE native aggregate
    // whose per-row arithmetic is 64/128-bit integer math on the
    // decimals' unscaled longs (expressions.ExactMoments) — the separate
    // decimal sums paid BigDecimal per row (Decimal.* always routes
    // through toJavaBigDecimal.multiply, and the product sums run
    // non-compact), measured 2,023 CPU-s at sf100 for this 3-group
    // aggregate. The exact integer sums convert to the SAME decimal
    // types once per group, so the moment values — and everything
    // derived below — are bit-identical (ExactMomentsSpec).
    val m = (
      if (s.catalog.functionExists("exact_moments"))
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("exact_moments(cast(l_quantity as decimal(18,6)), " +
            "cast(l_extendedprice as decimal(18,6)))").as("m"))
          .select(col("l_returnflag"), col("m.n").as("n"),
            col("m.sq").as("sq"), col("m.sp").as("sp"), col("m.sqq").as("sqq"),
            col("m.spp").as("spp"), col("m.sqp").as("sqp"))
      else
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(qd).as("sq"), sum(pd).as("sp"),
            sum(qd * qd).as("sqq"), sum(pd * pd).as("spp"), sum(qd * pd).as("sqp"))
      )
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val bessel = nD * (nD - lit(1d))
    val varQ = (nD * d("sqq") - d("sq") * d("sq")) / bessel
    val varP = (nD * d("spp") - d("sp") * d("sp")) / bessel
    val cov = (nD * d("sqp") - d("sq") * d("sp")) / bessel
    m.select(
      col("l_returnflag"), col("n"),
      r4(d("sq") / nD).as("mean_qty"),
      r4(sqrt(varQ)).as("std_qty"),
      r4(cov / (sqrt(varQ) * sqrt(varP))).as("corr_qty_price"))
  }

  /** Deterministic train/val/test split — the leakage-safe fold
    * assignment a training pipeline needs: membership is a pure function
    * of `md5("split:" || doc_id)`, so the same document lands in the same
    * fold across reruns, engines, cluster layouts, and corpus growth
    * (appending documents never moves an existing one between folds —
    * the property rand()-with-seed does NOT have under repartitioning).
    * The "split:" prefix is domain separation: the same id hashed for
    * sampling (q57 hashes content) or sharding can never correlate with
    * fold membership. Fold fractions are hex-threshold widths
    * (val 0x0800/0x10000 ≈ 3.1 %, test the next 3.1 %). Map-only scan +
    * a 3-row aggregate: nothing here is harder at 100 TB.
    */
  def q89TrainSplit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("split", Txt.foldOf(col("doc_id"))) // THE shared fold fn
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))

  /** Per-DOCUMENT candidate cap for q90: each document is compared against
    * at most this many earlier (lower-rank-within-cell) cell-mates, so
    * total pair volume is ≤ cap·N no matter how hot a cell gets — the
    * flood contract of [[HotBucketCap]], moved from "truncate the corpus
    * at 128 rows/cell" (round 7's scale bug: everything past the cap was
    * silently never dedup-checked) to "bound the work per covered doc".
    *
    * DATA-DERIVED, like [[kmeansK]]: with K = ⌈√N⌉ cells the mean cell
    * holds ~√N members, so cap = 4·⌈√N⌉ (clamped to [64, 4096]) covers
    * any cell up to 4× the mean COMPLETELY (exact SemDeDup) while still
    * bounding a pathological hot cell's pair volume at cap·N. The DuckDB
    * q90 oracle computes the same cap from the same count
    * (scalar-subquery rank-delta bound), so results match at every sf.
    */
  def semDedupCap(n: Long): Int =
    math.min(4096L, math.max(64L,
      4L * math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** No-stats fallback cap for callers that cannot measure a corpus size
    * at all. Streaming no longer needs it — StreamSemDedup re-measures
    * the kept-doc history per micro-batch and derives [[semDedupCap]]
    * from it (CapAuto).
    */
  val SemDedupNeighborCap = 128

  /** q90's duplicate threshold — tuned to the synthetic embeddings' cosine
    * distribution (near-N(0, 0.12), tail to ~0.5): 0.4 marks the top
    * ~0.1 % most-similar cell-mates as duplicates. Real deployments
    * calibrate against labeled near-dups (SemDeDup uses ~0.95+ on
    * contrastive embeddings, whose similarity mass sits far higher).
    */
  val SemDedupTau = 0.4

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * embeddings are blocked by their TRAINED k-means cell ([[trainedCb]],
    * [[kmeansK]](N) cells — the paper's clustering step), pairs are formed ONLY
    * within a cell, and a document is marked a duplicate if an earlier-id
    * cell-mate sits above the cosine threshold. Output per dropped doc:
    * its keeper (`dup_of` = min earlier neighbor), how many near-dups it
    * has, and the tightest similarity.
    *
    * Scale contract (round-8 rework): EVERY document is assigned and
    * enters pairing — no corpus truncation — and the per-doc candidate
    * set is bounded at [[semDedupCap]](N) earlier cell-mates, so
    * pair volume is ≤ cap·N. The bound is enforced BEFORE the join
    * explodes anything: cell-mates are banded by ⌈rank/cap⌉ and each
    * right-side row joins only its own and its predecessor band
    * ((cell, band) equi-join keys), then the exact `1 ≤ Δrank ≤ cap`
    * window filters the ≤ 2·cap survivors. Assignment itself is map-only
    * (broadcast codebook + in-expression fold — no exchange); the only
    * window is the per-cell rank, whose parallelism is [[kmeansK]](N) —
    * the data-derived ∝√N knob, not a constant (SemDedupScaleSpec pins
    * all three properties).
    */
  def q90Semdedup(s: SparkSession, dir: String): DataFrame = {
    val base = embVec(s, dir)
    val (cb, n) = trainedCbN(s, dir, base)
    val cells = base.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("vec"),
        KmeansCodebook.bestByName(s, "vec", "cbs").getField("id").as("cell"))
    semdedupFromCells(s, cells, semDedupCap(n), SemDedupTau)
  }

  /** The banded within-cell pairing half of q90, parameterized for
    * SemDedupScaleSpec: `cells` is (vec_id, vec, cell). A doc pairs with
    * its ≤ `cap` immediately-preceding (by within-cell vec_id rank)
    * cell-mates — pair-identical to the predicate
    * `a.cell = b.cell AND 1 ≤ b.rn − a.rn ≤ cap` (the oracle's form),
    * but generated through a (cell, band) EQUI-join: band = ⌊(rn−1)/cap⌋,
    * and any pair within cap spans at most adjacent bands
    * (b.rn ≤ a.rn+cap ⇒ b.band ∈ {a.band, a.band+1}), so the left side
    * explodes to exactly two band keys and join output is ≤ 2·cap rows
    * per doc BEFORE the exact range filter — never |cell|².
    */
  private[graft] def semdedupFromCells(
      s: SparkSession, cells: DataFrame, cap: Int, tau: Double): DataFrame = {
    val ranked = cells
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("vec_id"))))
      .withColumn("band", floor((col("rn") - 1) / cap).cast("int"))
      .pinned // both sides of the self-join read it once
    val a = ranked.select(col("cell").as("a_cell"), col("vec_id").as("a_id"),
      col("vec").as("a_vec"), col("rn").as("a_rn"),
      explode(array(col("band"), col("band") + 1)).as("bk"))
    ranked.as("b")
      .join(a, col("a_cell") === col("b.cell") && col("bk") === col("b.band"))
      .filter(col("b.rn") - col("a_rn") >= 1 && col("b.rn") - col("a_rn") <= cap)
      .select(col("b.vec_id").as("vec_id"), col("a_id"),
        Sim.cosineByName(s, "a_vec", "b.vec").as("sim"))
      .filter(col("sim") >= tau)
      .groupBy(col("vec_id"))
      .agg(
        min(col("a_id")).as("dup_of"),
        count(lit(1)).as("n_dups"),
        r4(max(col("sim"))).as("max_sim"))
  }

  /** Token-budget curation cut: per source, keep documents in
    * deterministic-hash order until ⌊3/5⌋ of the source's tokens are
    * spent — the "N tokens of domain X" step that turns mixture weights
    * (q78) into an actual kept set. The naive form is a per-SOURCE
    * global cumulative sum — a parallelism ceiling of #sources, i.e. a
    * handful of multi-TB single tasks. This is the scalable two-pass
    * form: (1) one small aggregation of token sums per (source,
    * 256-way hash-prefix bucket); its ≤ 256·#sources rows come to the
    * driver (C1 scalar-sized) where a prefix sum marks each bucket
    * KEEP-ALL / BOUNDARY / DROP-ALL; (2) only the ONE boundary bucket
    * per source — 1/256 of the data — pays an exact within-bucket
    * cumulative-sum window. Because the bucket is a PREFIX of the
    * ordering hash, bucket-then-hash order equals global hash order, so
    * the kept set is row-identical to the naive form (the oracle IS the
    * naive window form). Budget arithmetic is integer-exact
    * (total·3/5) — no float boundary wobble between engines. The
    * two-pass machinery is [[graft.engine.BudgetCut]] (spec'd against
    * the naive window on adversarial boundary data).
    */
  def q91TokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"),
        md5(col("text")).as("h"))
    val c = graft.engine.BudgetCut.cut(
      d, groupCol = "source", weightCol = "tok",
      orderHashCol = "h", tieCol = "doc_id", budgetOf = _ * 3 / 5)
    c.kept
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("tokens_kept"))
      .join(broadcast(c.totals.withColumnRenamed("total", "total_tokens")), Seq("source"))
  }

  /** q92's per-group sample size: quantile error ~ 1/√k → ~6 % at 256;
    * state is O(k) structs per group regardless of group size.
    */
  val SketchSampleK = 256

  /** Deterministic mergeable quantile sketch: per-group BOTTOM-K-BY-HASH
    * sample (the k smallest md5(primary key) rows — a uniform sample
    * that is a pure function of content), then quantiles OF THE SAMPLE.
    * This is the percentile analogue of the staged-HLL pattern (q83):
    * the sample rides [[graft.expressions.BoundedSortedList]]'s O(k)
    * heap state, map-side partials merge EXACTLY (bottom-k of a union =
    * bottom-k of bottom-ks), so per-partition/per-batch samples can be
    * persisted ([[graft.io.Rollup]] shape) and any later rollup
    * re-derives quantiles with zero history rescans — what
    * `approx_percentile` cannot do across jobs (its sketch state is not
    * exposed). Unlike t-digest/KLL the estimate is DETERMINISTIC and
    * engine-reproducible: the oracle selects the identical sample
    * (row_number over the same md5 order) and applies the same linear
    * interpolation (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    * q41 precedent) — so this approximate operator carries an EXACT
    * oracle, not an envelope.
    */
  def q92SampleQuantiles(s: SparkSession, dir: String): DataFrame =
    sampleQuantiles(s,
      t(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"),
          md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))).as("h"),
          col("l_extendedprice").as("v")),
      k = SketchSampleK)
      .withColumnRenamed("g", "l_returnflag")

  /** Parameterized core of q92 over a (g, h, v) frame: bottom-`k`-by-hash
    * sample per group, then p50/p90/p99 of the sample. `k` is the
    * accuracy/state knob (error ~ 1/√k, SampleQuantileErrorSpec pins the
    * envelope across k); exposed for the spec, q92 runs it at
    * [[SketchSampleK]].
    */
  private[graft] def sampleQuantiles(s: SparkSession, ghv: DataFrame, k: Int): DataFrame = {
    val sampled = ghv.groupBy(col("g"))
      .agg(boundedSortedList(s, k, "struct(h, v)").as("smp"))
      .select(col("g"), explode(col("smp")).as("e"))
      .select(col("g"), col("e.v").as("v"))
    sampled.groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_sample"),
        r4(expr("percentile(v, 0.5)")).as("p50"),
        r4(expr("percentile(v, 0.9)")).as("p90"),
        r4(expr("percentile(v, 0.99)")).as("p99"))
  }

  def q78MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.NumFunctions.portableRound
    val per = widen(s, t(s, dir, "documents"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      .withColumn("wint", floor(sqrt(col("tokens").cast("double"))).cast("long"))
      .pinned // feeds the totals row AND the final select once
    val tot = per.agg(sum(col("tokens")).as("ttok"), sum(col("wint")).as("twint"))
    val share = col("tokens").cast("double") / col("ttok").cast("double")
    val weight = col("wint").cast("double") / col("twint").cast("double")
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        portableRound(share, 6).as("share"),
        portableRound(weight, 6).as("weight"),
        r4(weight / share).as("boost"))
  }

  /** q93 — REAL image decode, oracle-checked: render a deterministic PNG
    * per doc (dims a closed-form function of doc_id, see
    * [[Multimodal.pngWidth]]/[[Multimodal.pngHeight]]), decode it back
    * through the true `javax.imageio` header path, and report the decoded
    * dimensions. The oracle recomputes the dims arithmetically — so a
    * codec regression (wrong band count, off-by-one header parse, stub
    * silently taking over) is a hash mismatch, not a test-only concern.
    * 48 docs: enough to cover every (width, height) residue class while
    * keeping the encode cost a rounding error in the bench.
    */
  def q93RealDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.syntheticPngMeta(s,
      t(s, dir, "documents").where(col("doc_id") < 48))

  /** q94 — REAL feature extraction over REAL pixels, oracle-checked: the
    * q93 blobs are decoded IN FULL (`ImageIO.read`, not the header-only
    * probe), per-cell luma sums accumulate over the fixed
    * [[Multimodal.LumaGrid]]² grid, and each image is assigned to its
    * best [[Multimodal.AnchorK]]-anchor codebook cell by argmax
    * dot/‖anchor‖ — the blob → decode → features → IVF-assign chain the
    * round-10 verdict asked to make end-to-end real. Every output column
    * is an exact integer (dims, cell, winning dot, total luma); the
    * DuckDB oracle recomputes all of them arithmetically from the
    * closed-form [[Multimodal.pngPixel]], so a pixel-decode or
    * grid-indexing regression is a hash mismatch. The unit-normalized
    * double form of the same features ([[Multimodal.embedReal]]) feeds
    * the embedding family; MultimodalSpec pins its geometry.
    */
  def q94RealFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.lumaAnchorAssign(Multimodal.syntheticPngBlobs(s,
      t(s, dir, "documents").where(col("doc_id") < 48)))

  /** q95/q96: sliding passage-shingle width (tokens). Wider than q66's
    * non-overlapping 3-token chunks and q20's 4-word signature shingles:
    * 8 consecutive tokens is the exact-substring-dedup granularity
    * (Lee et al. 2022 use 50-token suffix runs; on the ~40–80-token
    * synthetic docs, 8 plays the same "long enough that chance repeats
    * are negligible" role — the closed 31-word vocabulary still gives a
    * 31^8 ≈ 8.5e11 shingle universe, so any cross-document repeat is
    * copied content, not coincidence).
    */
  val PassageW = 8
  /** q95: a shingle counts as a duplicated passage at >= this many docs. */
  val PassageMinDocs = 2

  /** Per-doc array of full-md5 BINARY(16) digests of every SLIDING
    * PassageW-token window — the shared frame under q95/q96. Full md5,
    * not the 60-bit prefixes of `ngram_h60s`: these digests feed GLOBAL
    * df counting (birthday regime — ~3×10⁸ distinct shingles at sf100
    * would already expect dozens of 60-bit collisions, each a wrong df),
    * and they ride the shuffle as BINARY(16), the q70 lesson (half the
    * bytes of hex strings). Docs shorter than the window yield an empty
    * array (explode drops them) — same guard shape as q70's bigrams.
    */
  private def passageDigests(s: SparkSession, dir: String): DataFrame =
    passageDigestsOf(docs(s, dir))

  /** [[passageDigests]] over an arbitrary (doc_id, text, ...) frame — the
    * seam that lets pipeline.Curation's containment-collapse stage run
    * the same windowing over its quality/dedup/near-dup SURVIVORS instead
    * of the raw table. Caller contract: `text` is non-null (both entry
    * points coalesce) and the frame is already width-adjusted. Columns
    * other than `text` ride through unchanged (`text` is replaced by the
    * `hs` digest array) — [[contaminationPairs]] needs its `is_bench` tag
    * beside the digests; every caller selects its columns before pinning,
    * so unused passengers are pruned, never materialized.
    */
  private[graft] def passageDigestsOf(wide: DataFrame): DataFrame = {
    val s = wide.sparkSession
    val keep = wide.columns.filter(_ != "text").map(col).toSeq
    // Native `word_ngram_md5s` hashes each window as a contiguous byte
    // range of the raw text — no token array, no per-window concat string,
    // no HOF interpreter (see the expression's scaladoc); the composable
    // chain is the bit-identical no-extensions fallback
    // (WordNgramMd5sSpec pins parity on both paths).
    if (s.catalog.functionExists("word_ngram_md5s"))
      wide.select(keep :+
        expr(s"word_ngram_md5s(text, $PassageW)").as("hs"): _*)
    else wide
      .select(keep :+ split(col("text"), " ").as("toks"): _*)
      .select(keep :+ expr(
        s"case when size(toks) >= $PassageW then " +
          s"transform(sequence(1, size(toks) - ${PassageW - 1}), " +
          s"i -> unhex(md5(concat_ws(' ', slice(toks, i, $PassageW))))) " +
          "else array() end").as("hs"): _*)
  }

  /** Exact duplicated-passage detection (the sliding-window complement of
    * q66's chunk-aligned boilerplate removal): every PassageW-token window
    * that appears verbatim in >= PassageMinDocs DISTINCT documents, with
    * its document frequency and the smallest containing doc_id as the
    * exemplar. Chunk-aligned dedup misses copies that straddle a chunk
    * boundary; sliding windows catch a copied passage at every offset.
    *
    * 100 TB shape: within-doc repeats die in `array_distinct` map-side
    * (zero keyed state, the q70 move), so the single hash aggregate
    * shuffles one BINARY(16) digest + one doc_id per distinct
    * (doc, window) — never window text — and its partial maps collapse
    * duplicated content before the exchange. Output is bounded by
    * actually-duplicated content, not the corpus.
    */
  def q95DupPassages(s: SparkSession, dir: String): DataFrame =
    passageDigests(s, dir)
      .select(col("doc_id"), explode(array_distinct(col("hs"))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("first_doc"))
      .filter(col("df") >= PassageMinDocs)
      .select(lower(hex(col("h"))).as("h"), col("df"), col("first_doc"))

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * PassageW-token windows that appear in NO other document — the
    * memorization/duplication risk score a pretraining curation pass
    * ranks documents by (novelty 1.0 = all-original text, 0.0 = every
    * passage exists elsewhere in the corpus).
    *
    * The plan exploits df = 1 ⇒ the owning document is identifiable
    * INSIDE the frequency aggregate: `min(doc_id)` over a
    * single-document group IS that document, so novel-window counts come
    * straight out of the df pass — no corpus-sized join-back of the df
    * table onto 10⁸ exploded windows (the naive plan's second shuffle at
    * full corpus width). What remains after the digest aggregate is two
    * doc_id-keyed frames of ~|corpus| rows (per-doc window counts,
    * per-doc novel counts) whose join is trivial at any scale.
    */
  def q96NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    // Pin the DISTINCT'd per-doc arrays (the q97 shape): within-doc dups
    // die once before the pin, so the pinned bytes are smaller and
    // neither downstream pass re-runs array_distinct on pin-read.
    val arr = passageDigests(s, dir)
      .select(col("doc_id"), array_distinct(col("hs")).as("hs"))
      .pinned // feeds both passes once
    val perDoc = arr
      .select(col("doc_id"), size(col("hs")).as("n_windows"))
      .filter(col("n_windows") > 0)
    val novel = arr
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("d"))
      .filter(col("df") === 1)
      .groupBy(col("d")).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, perDoc("doc_id") === novel("d"), "left")
      .select(col("doc_id"), col("n_windows").cast("long").as("n_windows"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        r4(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_windows")).as("novelty"))
  }

  /** q97: windows with df above this are boilerplate, not evidence of one
    * doc containing another — they are excluded from the pair join, which
    * also caps per-window pair fan-out at cap²/2 (the flood gate; the
    * documented miss class is a pair related ONLY through corpus-common
    * windows, q66's territory).
    */
  val ContainCap = 16
  /** q97: minimum shared rare windows for a reported pair. */
  val ContainMinShared = 3

  /** Asymmetric containment pairs — the subsumption detector symmetric
    * Jaccard misses: a short doc quoted whole inside a long one has
    * J = |A|/|B| ≈ 0 but containment C(A→B) = |W_A ∩ W_B| / |W_A| ≈ 1.
    * Reports doc pairs sharing >= ContainMinShared rare windows with both
    * window counts and the smaller side's containment.
    *
    * 100 TB shape: candidates can only arise from windows that are
    * actually duplicated (df >= 2 — df = 1 windows cannot produce a pair)
    * and not boilerplate (df <= ContainCap), so the self-join runs over
    * the RARE-window posting list — sized by duplicated content, not the
    * corpus — with per-window fan-out bounded by the cap. The df table
    * broadcast is runtime-size-gated like q70's (equi-join fallback above
    * the gate). Exact counting join, no minhash estimate: the report is
    * the true shared-window count.
    */
  def q97Containment(s: SparkSession, dir: String): DataFrame =
    containmentPairs(docs(s, dir))
      .select(col("a_id"), col("b_id"), col("shared"), col("nw_a"), col("nw_b"),
        r4(col("containment")).as("containment"))

  /** The q97 pair plan over an arbitrary (doc_id, text) frame, raw
    * (unrounded) containment — shared by the q97 query surface and
    * pipeline.Curation's containment-collapse stage, so the funnel's
    * drop decisions and the oracle-checked query cannot drift.
    */
  private[graft] def containmentPairs(docsWide: DataFrame): DataFrame = {
    // Pin the per-doc ARRAY frame, not the exploded postings: one
    // row-overhead per document instead of per window (the q70/q20 pin
    // lesson), and per-doc window counts come out of the array map-side —
    // the exploded-frame formulation paid a full corpus-width doc_id
    // shuffle just to count windows per doc (measured at sf100: 69.4 s
    // vs 46.9 s for this plan — the residual is the inherent second
    // pass over the postings for the live-window probe).
    val arr = passageDigestsOf(docsWide)
      .select(col("doc_id"), array_distinct(col("hs")).as("hs"))
      .pinned // feeds per-doc counts, the df pass, and the posting join
    val perDoc = arr
      .select(col("doc_id"), size(col("hs")).cast("long").as("nw"))
      .filter(col("nw") > 0)
    val sh = arr.select(col("doc_id"), explode(col("hs")).as("h"))
    val live = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= PassageMinDocs && col("df") <= ContainCap)
      .select("h")
      .pinned
    val liveSide = gatedBroadcast(live)
    val posting = sh.join(liveSide, Seq("h"))
    val pairs = posting.select(col("h"), col("doc_id").as("a_id"))
      .join(posting.select(col("h"), col("doc_id").as("b_id")), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= ContainMinShared)
    pairs
      .join(perDoc.select(col("doc_id").as("a_id"), col("nw").as("nw_a")), Seq("a_id"))
      .join(perDoc.select(col("doc_id").as("b_id"), col("nw").as("nw_b")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("shared"), col("nw_a"), col("nw_b"),
        (col("shared").cast("double") / least(col("nw_a"), col("nw_b")))
          .as("containment"))
  }

  /** q99: docs with doc_id % this == 0 form the held-out benchmark side
    * of the contamination-attribution pairs. Deliberately WIDER than
    * q67's 1-in-97 flag set (1-in-11): attribution is a pair surface,
    * and a 1 % held-out share leaves it empty at the small verify scales
    * — production passes the real benchmark list, the modulus only
    * stands in for it in the testdata.
    */
  val ContamBenchMod = 11

  /** Cross-corpus contamination ATTRIBUTION — the pair-level complement
    * of q67's per-doc flag: q67 says "this training doc overlaps the
    * held-out set somewhere"; this says WHICH benchmark doc, how many
    * shared rare PassageW-token windows, and what fraction of the
    * training doc is benchmark content (the decontamination-forensics
    * report a pipeline needs before deciding drop-vs-trim).
    *
    * 100 TB shape: identical skeleton to q97 — pairs can only arise from
    * windows that are duplicated (df >= 2) and not boilerplate
    * (df <= ContainCap), so the cross join runs over the rare-window
    * postings sized by actual duplication; the benchmark posting side is
    * further 1/ContamBenchMod of that. The df table broadcast is
    * runtime-gated with the shuffle fallback; the miss class (pairs
    * related only through above-cap boilerplate) is q66's territory,
    * same as q97.
    */
  def q99ContaminationPairs(s: SparkSession, dir: String): DataFrame =
    contaminationPairs(docs(s, dir)
      .select(col("doc_id"), col("text"),
        (col("doc_id") % ContamBenchMod === 0).as("is_bench")))
      .select(col("train_id"), col("bench_id"), col("shared"), col("nw_train"),
        r4(col("contamination")).as("contamination"))

  /** The q99 pair plan over an arbitrary TAGGED corpus — the production
    * seam (mirroring [[containmentPairs]] and Curation.curate's heldOut
    * parameter): `docsTagged` needs (doc_id, text, is_bench), where
    * production builds the tag from the real held-out benchmark list
    * (`train.withColumn("is_bench", lit(false)).unionByName(bench
    * .withColumn("is_bench", lit(true)))` — doc_id spaces may even
    * overlap, pair keys are (train_id, bench_id)), and q99 stands in
    * with the doc_id-modulus split over the testdata. ONE pass: window
    * document frequency is computed over the whole tagged corpus —
    * "rare" must mean rare across train AND bench, or boilerplate that
    * happens to be benchmark-only floods the pair join — and the tag
    * rides beside the digests through a single pinned array frame, so
    * the seam costs no second scan over the modulus wrapper it replaced.
    */
  private[graft] def contaminationPairs(docsTagged: DataFrame): DataFrame = {
    // Honor passageDigestsOf's non-null-text caller contract HERE, not
    // just in q99's docs() wrapper: the scaladoc above tells production
    // callers to union raw train/bench frames, and a NULL text in either
    // would null the digest array. Coalesce is identity on non-null
    // text, so q99's oracle hash is unchanged.
    val arr = passageDigestsOf(
      widenIfNarrow(docsTagged.sparkSession,
        docsTagged.withColumn("text", coalesce(col("text"), lit("")))))
      .select(col("doc_id"), col("is_bench"), array_distinct(col("hs")).as("hs"))
      .pinned // feeds per-doc counts, the df pass, and both posting sides
    // nw_train comes from the TRAIN side only: with overlapping doc_id
    // spaces a same-id bench doc would otherwise duplicate the join row
    val perDoc = arr
      .filter(!col("is_bench"))
      .select(col("doc_id"), size(col("hs")).cast("long").as("nw"))
      .filter(col("nw") > 0)
    val sh = arr.select(col("doc_id"), col("is_bench"), explode(col("hs")).as("h"))
    val live = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= PassageMinDocs && col("df") <= ContainCap)
      .select("h")
      .pinned
    val posting = sh.join(gatedBroadcast(live), Seq("h"))
    val bench = posting.filter(col("is_bench"))
      .select(col("h"), col("doc_id").as("bench_id"))
    val train = posting.filter(!col("is_bench"))
      .select(col("h"), col("doc_id").as("train_id"))
    val pairs = train.join(bench, Seq("h"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= ContainMinShared)
    pairs
      .join(perDoc.select(col("doc_id").as("train_id"), col("nw").as("nw_train")),
        Seq("train_id"))
      .select(col("train_id"), col("bench_id"), col("shared"), col("nw_train"),
        (col("shared").cast("double") / col("nw_train")).as("contamination"))
  }

  /** q100: context-window chunking — tokens per chunk and the stride
    * between chunk starts (overlap = ChunkWin - ChunkStride = 32).
    */
  val ChunkWin = 128
  val ChunkStride = 96

  /** Sliding context-window chunking (the SPLITTING complement of q62's
    * sequence packing, which handles the short side): every document is
    * cut into ChunkWin-token chunks whose starts step by ChunkStride, so
    * consecutive chunks overlap by 32 tokens — the standard long-document
    * preparation for embedding models and fixed-context pretraining
    * (no token is ever more than one chunk away from ChunkWin-32 tokens
    * of its context). Documents at or under the window yield exactly one
    * chunk; the final chunk is the short tail plus nothing (starts never
    * step past the text). Chunks ride as md5 digests + offsets — the
    * downstream shuffle (if any) never carries chunk text.
    *
    * 100 TB shape: pure map-side — split, transform, posexplode; no
    * exchange at all. Output rows ≈ corpus tokens / ChunkStride.
    */
  def q100ContextChunks(s: SparkSession, dir: String): DataFrame = {
    // coalesce like every other text entry point (r15 ADVICE): a NULL
    // text would otherwise null size(toks), clamp the sequence to [0],
    // and emit a phantom chunk row the oracle's NULL propagation drops.
    // Inline rather than via docs() to keep the plan exchange-free —
    // this is the one documents query with zero algorithmic shuffles.
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    widen(s, docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n"), col("toks"))
      .select(col("doc_id"), col("n"), posexplode(expr(
        s"transform(sequence(0, greatest(cast(ceil((n - $ChunkWin) / $ChunkStride.0) as int), 0)), " +
          s"k -> md5(concat_ws(' ', slice(toks, k * $ChunkStride + 1, $ChunkWin))))"))
        .as(Seq("k", "chunk_md5")))
      .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
        (col("k") * ChunkStride + 1).cast("long").as("start_tok"),
        least(lit(ChunkWin), col("n") - col("k") * ChunkStride).cast("long")
          .as("n_toks"),
        col("chunk_md5"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity / near-duplicate operators: MinHash, SimHash, n-gram Jaccard,
  * cosine ANN (brute-force + random-hyperplane LSH).
  *
  * Hash-function portability: every hash is derived from `md5` over strings
  * (identical in any engine) or from exact integer/double arithmetic — never
  * from engine-private hashes (xxhash64/murmur3), so DuckDB oracles can
  * reproduce results bit-for-bit.
  */
object SimilarityFunctions {

  // ---------- MinHash ----------

  /** Per-shingle digest material: md5(s) — 32 hex chars, computed ONCE per
    * shingle. Signature components are 4-hex-char (16-bit) slices of this,
    * so a k=8 signature costs ONE md5 call per shingle.
    *
    * 16-bit slices were chosen over 32-bit (two md5s) by measurement, not
    * guesswork: at sf0.1 the one-md5 scheme matched the two-md5 scheme on
    * true near-dups (255 vs 254 pairs with exact sampled-shingle J ≥ 0.5)
    * while emitting 78 % fewer noise pairs (47 vs 221 with J < 0.5) and
    * running 4.6× faster. Min-collisions in a 16-bit space only inflate
    * per-slice AGREEMENT slightly (both documents' mins collapse to the
    * same small value); a band match still needs 4 simultaneous
    * agreements, so the collision term stays far below the background
    * vocabulary-sharing term that actually drives band noise.
    */
  def shingleDigests(shingles: Column): Column =
    transform(shingles, s => md5(s))

  /** Hex chars per MinHash signature slice (16-bit slices). */
  val SliceHex = 4

  /** k MinHash components (k ≤ 8) as columns sig_0..sig_{k-1}: component j
    * is the min over shingles of hex slice [j*SliceHex+1, SliceHex] of the
    * digest. Lexicographic min over fixed-width hex == numeric min.
    */
  def minhashFromDigests(digests: Column, k: Int): Seq[Column] = {
    require(k * SliceHex <= 32, "slices must fit one md5")
    (0 until k).map { j =>
      array_min(transform(digests, d => substring(d, j * SliceHex + 1, SliceHex))).as(s"sig_$j")
    }
  }

  /** LSH band hash: md5 of the concatenated signature slice. */
  def bandHash(sigCols: Seq[Column]): Column = md5(concat(sigCols: _*))

  // ---------- SimHash ----------

  /** Per-token md5 hex digests — materialize as a column BEFORE
    * simhash16FromDigests: each of the 16 bit folds references the shared
    * attribute, so every token is hashed exactly once (inlining md5 into
    * each bit's lambda would hash it 16 times — separate lambdas defeat
    * common-subexpression elimination).
    */
  def tokenDigestsExpr(textCol: String): Column =
    expr(s"transform(filter(split($textCol, ' '), t -> t <> ''), t -> md5(t))")

  /** 16-bit SimHash from a token-digest array column. Bit j of a token =
    * parity of the (j+1)-th hex digit of its md5; the document bit is the
    * sign of the +1/-1 vote sum; bits assemble little-endian.
    * Exact integer arithmetic → portable.
    */
  def simhash16FromDigests(digestsCol: String): Column = {
    val bits = (0 until 16).map { j =>
      s"""if(aggregate($digestsCol, 0,
         |  (acc, d) -> acc + if(instr('13579bdf', substr(d, ${j + 1}, 1)) > 0, 1, -1)) >= 0,
         |  ${1 << j}, 0)""".stripMargin
    }
    expr(s"cast(${bits.mkString(" + ")} as int)")
  }

  /** Hamming distance between two simhash ints (bit_count of xor). */
  def hamming16(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---------- Jaccard ----------

  /** Set Jaccard over two array columns (distinct semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // ---------- Cosine / ANN ----------

  /** Sequential-order dot product of two double arrays — same accumulation
    * order as a C loop, so oracle engines match bitwise.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine via the native codegen'd expression when the session has
    * graft.GraftExtensions registered; the composable HOF form otherwise.
    * Both produce bit-identical doubles (same accumulation order).
    */
  def cosineByName(s: org.apache.spark.sql.SparkSession, aName: String, bName: String): Column =
    if (s.catalog.functionExists("cosine_sim")) expr(s"cosine_sim($aName, $bName)")
    else cosine(col(aName), col(bName))

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * rows of `candidates` (excluding itself). Both frames must have
    * (`idCol`, `vecCol: array<double>`).
    *
    * Scale path: `queries` is broadcast (it is the small side by
    * construction); candidates stream map-side computing sims inside
    * codegen; the per-query top-k runs through the bounded-heap
    * `topk_pairs` aggregate — map-side state is O(k) per (query,
    * partition) and partials merge, so the exchange carries k rows per
    * query per partition. The rank-window alternative (kept as the
    * no-extensions fallback) shuffles EVERY candidate row to as many
    * tasks as there are distinct queries — 10 queries ⇒ ≤10-way
    * parallelism sorting the full candidate set, which is both the r2
    * q21 regression and a genuine scale ceiling.
    */
  def cosineKnn(queries: DataFrame, candidates: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val s = candidates.sparkSession
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = candidates.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val sims = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", cosineByName(s, "q_vec", "n_vec"))
    if (s.catalog.functionExists("topk_pairs"))
      sims.groupBy(col("q_id"))
        .agg(expr(s"topk_pairs($k, sim, n_id)").as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("q_id"), col("p.id").as("n_id"),
          (col("pos") + 1).cast("int").as("rank"), NumFunctions.r4(col("p.score")).as("sim"))
    else {
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      sims.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("rank"), NumFunctions.r4(col("sim")).as("sim"))
    }
  }

  /** Deterministic ±1 random hyperplanes for LSH, derived from md5 parity:
    * plane(j)(i) = +1 iff the first hex digit of md5("p<j>_<i>") is odd.
    * Generated driver-side once (tiny), inlined as literals into both the
    * Spark plan and any SQL oracle.
    */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val mdigest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (j, i) =>
      val hex = mdigest.digest(s"p${j}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("13579bdf".contains(hex.charAt(0))) 1.0 else -1.0
    }
  }

  /** Random-hyperplane LSH bucket id: bit j set iff dot(vec, plane_j) >= 0.
    * Pure map-side expression — the bucket becomes the shuffle key for
    * bucketed ANN joins, collapsing the candidate space from O(n²) to
    * per-bucket blocks.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(vec, typedlit(p.toSeq)) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")
}

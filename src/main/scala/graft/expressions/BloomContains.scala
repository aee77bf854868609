package graft.expressions

import java.io.ByteArrayInputStream
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains(filter, e)` → boolean: membership test against a
  * [[BloomFilterAgg]]-built filter. May return true for absent values
  * (bounded fpp), never false for present ones — so it is ONLY a
  * prefilter; q79 pairs it with an exact confirm join.
  *
  * The INTENDED plan form passes the filter as a FOLDABLE binary literal
  * (collect the one-row `bloom_agg` image to the driver — scalar-sized,
  * the documented C1-acceptable shape — and inline it, q79): the
  * expression then deserializes once per instance and the per-row cost is
  * a hash probe, the same contract Spark's own `BloomFilterMightContain`
  * enforces by REQUIRING a foldable/subquery build side. A column-valued
  * filter (e.g. `crossJoin(broadcast(aggRow))`) also works but is
  * per-row O(image): `UnsafeRow.getBinary` copies the image afresh on
  * EVERY evaluation (measured ~45 µs/row at 450 KB) before the cache can
  * even be consulted — fine for small filters, wrong at sub-MB and up.
  *
  * For the column form the cache key is the EXACT image content —
  * length fast-reject, then `Arrays.equals` against the cached copy —
  * NOT reference identity (fresh copies mean `eq` can never hit) and
  * NOT a sampled fingerprint (a sparse image — few keys, large
  * `expected` — is almost all zero bytes, so sampled words collide
  * between DISTINCT filters and a stale hit would be a false NEGATIVE).
  * The memcmp is O(image) per row, but the column form already pays an
  * O(image) copy per row in `getBinary` before this code runs — the
  * compare changes the constant, not the asymptotics, and buys exact
  * correctness. The cache entry is an immutable case class published
  * through a plain var: JMM final-field semantics mean a racing reader
  * sees null/stale (and harmlessly re-deserializes) or a consistent
  * (bytes, filter) pair — never a mismatch. Codegen'd via a reference
  * to the expression instance, so the probe side stays inside
  * WholeStageCodegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects a binary filter, got ${left.dataType.sql}")
    else right.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains supports integral and string keys, got ${dt.sql}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  // Foldable fast path: a literal filter (the q79 shape — the image is a
  // scalar-sized driver collect inlined into the plan) deserializes ONCE
  // per instance, with no per-row fingerprint and — critically — no
  // per-row image copy: a binary Literal's codegen is a references[]
  // access, whereas an image flowing through a joined row is re-copied by
  // UnsafeRow.getBinary on EVERY evaluation (~45 µs/row at 450 KB, the
  // dominant cost of the broadcast-column form even with a perfect cache).
  @transient private lazy val folded: BloomFilter =
    if (left.foldable) {
      val b = left.eval().asInstanceOf[Array[Byte]]
      if (b == null) null else {
        BloomContains.deserializations.incrementAndGet()
        BloomFilter.readFrom(new ByteArrayInputStream(b))
      }
    } else null

  @transient private lazy val keyIsString: Boolean = right.dataType == StringType

  // Single-entry exact-content cache (see class doc) for the
  // non-foldable (column-valued) filter form. Plain var + immutable
  // entry: racy publication costs a wasted deserialization, never an
  // inconsistent (key, filter) pair.
  @transient private var cached: BloomContains.Entry = _

  private def filterFor(bytes: Array[Byte]): BloomFilter = {
    val c = cached
    if (c != null && c.bytes.length == bytes.length &&
        java.util.Arrays.equals(c.bytes, bytes)) c.filter
    else {
      val filter = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      BloomContains.deserializations.incrementAndGet()
      cached = BloomContains.Entry(bytes.clone(), filter)
      filter
    }
  }

  // Entry point for generated code (and nullSafeEval): boxed key, typed
  // dispatch matching BloomFilterAgg.update.
  def test(bytes: Array[Byte], key: Any): Boolean = {
    val f = if (folded != null) folded else filterFor(bytes)
    if (keyIsString) f.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
    else f.mightContainLong(key.asInstanceOf[Number].longValue())
  }

  override protected def nullSafeEval(f: Any, k: Any): Any =
    test(f.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) => {
      val self = ctx.addReferenceObj("bloomContains", this, classOf[BloomContains].getName)
      val keyBoxed = right.dataType match {
        case StringType => k
        case _ => s"((Object)(Long)(long)$k)"
      }
      s"${ev.value} = $self.test($f, $keyBoxed);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  /** Immutable cache entry (bytes are a private clone — the caller's
    * array is reused by the row pipeline) — final fields make racy
    * publication safe.
    */
  private final case class Entry(bytes: Array[Byte], filter: BloomFilter)

  /** Test-visible count of actual `BloomFilter.readFrom` calls. The
    * performance contract is ≤ 1 per (task, distinct filter) — a probe
    * stage over N rows must add ~#tasks, never ~N
    * (ExpressionThroughputSpec pins this; the q79 regression it guards
    * against was 1.7 ms/row = 981 s at sf0.1).
    */
  val deserializations = new java.util.concurrent.atomic.AtomicLong(0)

  /** JVM-wide (= per-executor) filter cache for the broadcast form,
    * keyed by (application id, broadcast id): the handle OBJECT is
    * deserialized fresh per task, so identity keys would cache per task,
    * not per executor; the broadcast id is stable across every task's
    * copy — but ONLY within one SparkContext (ids restart at 0 per
    * context, so a bare-id key could serve a previous session's filter
    * to a new one in the same JVM: a silent false NEGATIVE, which the
    * Bloom contract forbids). The app id disambiguates contexts; if no
    * SparkEnv is live (bare unit-test eval), skip the cache rather than
    * risk a cross-context hit. Bounded: far more live filters than
    * `MaxCachedFilters` means something is leaking broadcasts — drop the
    * lot and re-deserialize on demand rather than pin dead GB-scale
    * images for the executor's lifetime.
    */
  private val MaxCachedFilters = 32
  private val byBroadcastId =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), BloomFilter]()

  private[expressions] def forBroadcast(
      b: org.apache.spark.broadcast.Broadcast[Array[Byte]]): BloomFilter = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) {
      deserializations.incrementAndGet()
      return BloomFilter.readFrom(new ByteArrayInputStream(b.value))
    }
    val key = (env.conf.getAppId, b.id)
    val hit = byBroadcastId.get(key)
    if (hit != null) hit
    else byBroadcastId.synchronized {
      val again = byBroadcastId.get(key)
      if (again != null) again
      else {
        if (byBroadcastId.size() >= MaxCachedFilters) byBroadcastId.clear()
        deserializations.incrementAndGet()
        val f = BloomFilter.readFrom(new ByteArrayInputStream(b.value))
        byBroadcastId.put(key, f)
        f
      }
    }
  }
}

/** Broadcast-variable form of [[BloomContains]] for LARGE images: the
  * serialized plan carries only the broadcast HANDLE (bytes travel via
  * Spark's torrent broadcast, once per executor), so driver plan memory
  * and per-stage task-binary size are independent of image size — a
  * 1.2 GB 10⁹-key image stops being a plan literal re-shipped with every
  * stage that references it. Probe cost contract is unchanged: one
  * `BloomFilter.readFrom` per EXECUTOR — a shared BOUNDED STRONG cache
  * keyed by (application id, broadcast id), wholesale-cleared past
  * `MaxCachedFilters` entries and re-deserialized on demand (see
  * `forBroadcast`) — then a hash probe per row inside codegen.
  *
  * Not SQL-registered — a broadcast handle has no SQL literal form; build
  * it through [[graft.io.FilterStore.probe]], which picks literal vs
  * broadcast by image size.
  */
case class BloomContainsBroadcast(
    bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_bcast supports integral and string keys, got ${dt.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_bcast"

  @transient private lazy val filter: BloomFilter = BloomContains.forBroadcast(bcast)
  @transient private lazy val keyIsString: Boolean = child.dataType == StringType

  /** Entry point for generated code (and nullSafeEval). */
  def test(key: Any): Boolean =
    if (keyIsString) filter.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
    else filter.mightContainLong(key.asInstanceOf[Number].longValue())

  override protected def nullSafeEval(k: Any): Any = test(k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, k => {
      val self = ctx.addReferenceObj(
        "bloomContainsBcast", this, classOf[BloomContainsBroadcast].getName)
      val keyBoxed = child.dataType match {
        case StringType => k
        case _ => s"((Object)(Long)(long)$k)"
      }
      s"$self.test($keyBoxed)"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomContainsBroadcast =
    copy(child = newChild)
}

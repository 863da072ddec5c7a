package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** DDSketch quantile primitives (Masson, Rim & Lee, VLDB 2019) — the
  * QUANTILE member of the persistable-sketch family (HLL = distinct,
  * KMV = set algebra, CMS = frequency, Bloom = membership). Spark's own
  * `percentile_approx` answers one query over one scan; what a day-2
  * pipeline needs is the sketch as a COLUMN VALUE: build one tiny
  * log-bucket histogram per (day, key), persist it, and answer any later
  * quantile-over-union question (to-date p99, rolling-window medians,
  * cross-segment latency) by MERGING sketches — never rescanning
  * history. Merge is exact count addition, so incremental-merge ≡
  * one-shot BIT-FOR-BIT (stronger than t-digest/GK, whose merges lose
  * information — the property the specs pin), and every quantile
  * estimate carries the paper's ≤ alpha relative-error guarantee.
  *
  * Layout: bucket i holds counts of v with ceil(log_gamma(v)) = i,
  * gamma = (1+alpha)/(1-alpha); the sketch is the sorted (index, count)
  * pairs interleaved in an array<bigint> — size grows with the DYNAMIC
  * RANGE (log-scaled: ~700 buckets spans 10⁻³..10⁶ at alpha=0.01),
  * never with row count. v ≤ 0 lands in a reserved zero bucket
  * (estimate 0.0); nulls and NaNs are skipped (SUM-style).
  *
  * Engine portability: the bucket index grid-rounds log(v)/log(gamma)
  * to 1e-9 before ceil (the q_lm_score trick) so cross-libm ulps cannot
  * move a value across a bucket edge — the DuckDB oracle applies the
  * same rounding and reproduces the sketch EXACTLY.
  */
object DdExpressions {

  /** Aggregate positive doubles into one DDSketch per group. */
  def ddAgg(values: Column, alpha: Double): Column =
    Bridge.toColumn(DdAgg(Bridge.toExpression(values), alpha)
      .toAggregateExpression())

  /** Union previously-built sketches (exact count addition). */
  def ddMerge(sketches: Column): Column =
    Bridge.toColumn(DdMergeAgg(Bridge.toExpression(sketches))
      .toAggregateExpression())

  /** Quantile estimate from one sketch (q in (0, 1]). */
  def ddQuantile(sketch: Column, q: Double, alpha: Double): Column =
    Bridge.toColumn(DdQuantile(Bridge.toExpression(sketch), q, alpha))
}

/** Static bucket logic shared by the aggregates and the query expression
  * (the Bloom/Cms/Hll single-source-of-truth pattern).
  */
object Dd {
  /** Reserved index for v ≤ 0 — sorts before every real bucket. */
  val ZeroIdx: Int = Int.MinValue

  def requireAlpha(alpha: Double, who: String): Unit =
    require(alpha > 0.0 && alpha < 0.5,
      s"$who: relative accuracy alpha must be in (0, 0.5), got $alpha")

  def gamma(alpha: Double): Double = (1.0 + alpha) / (1.0 - alpha)

  /** ceil of the 1e-9-grid-rounded log ratio: the rounding absorbs
    * cross-libm ulps so engines can never disagree on a bucket edge.
    */
  def bucket(v: Double, gam: Double): Int = {
    val r = math.rint(math.log(v) / math.log(gam) * 1e9) / 1e9
    math.ceil(r).toInt
  }

  /** Midpoint estimate for bucket i: ≤ alpha relative error (paper §2). */
  def estimate(idx: Int, gam: Double): Double =
    if (idx == ZeroIdx) 0.0 else 2.0 * math.pow(gam, idx) / (gam + 1.0)

  /** Walk the sorted interleaved pairs for the rank-ceil(q·n) value. */
  def quantile(pairs: Array[Long], q: Double, gam: Double): Any = {
    var n = 0L
    var i = 1
    while (i < pairs.length) { n += pairs(i); i += 2 }
    if (n == 0L) return null
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    i = 0
    while (i < pairs.length) {
      cum += pairs(i + 1)
      if (cum >= rank) return estimate(pairs(i).toInt, gam)
      i += 2
    }
    estimate(pairs(pairs.length - 2).toInt, gam) // unreachable guard
  }

  /** Boxed bridge for generated code: null = empty sketch. */
  def quantileFromArray(a: ArrayData, q: Double,
                        gam: Double): java.lang.Double = {
    val pairs = new Array[Long](a.numElements())
    var i = 0
    while (i < pairs.length) {
      pairs(i) = requireSlot(a, i, "dd_quantile"); i += 1
    }
    quantile(pairs, q, gam) match {
      case null => null
      case d => java.lang.Double.valueOf(d.asInstanceOf[Double])
    }
  }

  def toPairs(m: mutable.HashMap[Int, Long]): Array[Long] = {
    val ks = m.keysIterator.toArray.sorted
    val out = new Array[Long](ks.length * 2)
    var i = 0
    while (i < ks.length) {
      out(2 * i) = ks(i).toLong
      out(2 * i + 1) = m(ks(i))
      i += 1
    }
    out
  }

  def serialize(m: mutable.HashMap[Int, Long]): Array[Byte] = {
    val pairs = toPairs(m)
    val bb = ByteBuffer.allocate(pairs.length * 8)
    pairs.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val m = mutable.HashMap.empty[Int, Long]
    while (bb.remaining() >= 16) {
      val idx = bb.getLong.toInt
      val cnt = bb.getLong
      m.update(idx, m.getOrElse(idx, 0L) + cnt)
    }
    m
  }

  /** A null slot is a corrupt sketch, never valid data — but it must be
    * rejected EXPLICITLY: ArrayData.getLong on a null slot silently
    * reads garbage, and parquet round-trips array<bigint> as
    * containsNull=true, so the analysis-time check alone can't protect
    * the persisted-table path.
    */
  def requireSlot(pairs: ArrayData, i: Int, who: String): Long = {
    if (pairs.isNullAt(i))
      throw new IllegalArgumentException(
        s"$who: sketch array has a null slot at $i — not a dd_agg/" +
          "dd_merge output")
    pairs.getLong(i)
  }

  /** Fold an interleaved pair array into the map (merge path). */
  def addPairs(m: mutable.HashMap[Int, Long], pairs: ArrayData): Unit = {
    var i = 0
    while (i + 1 < pairs.numElements()) {
      val idx = requireSlot(pairs, i, "dd_merge").toInt
      val cnt = requireSlot(pairs, i + 1, "dd_merge")
      m.update(idx, m.getOrElse(idx, 0L) + cnt)
      i += 2
    }
  }
}

/** DDSketch fold of doubles. Buffer = one (bucket → count) map per
  * (task, group); partial→final ships the sorted packed pairs — the
  * shuffle is bounded by the value DYNAMIC RANGE, never row count.
  */
case class DdAgg(
    child: Expression,
    alpha: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Long]]
  with UnaryLike[Expression] {

  Dd.requireAlpha(alpha, prettyName)
  @transient private lazy val gam = Dd.gamma(alpha)

  override def prettyName: String = "dd_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case DoubleType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires double input, got ${other.catalogString}")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty[Int, Long]

  override def update(buffer: mutable.HashMap[Int, Long],
                      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) {
        val idx = if (d <= 0.0) Dd.ZeroIdx else Dd.bucket(d, gam)
        buffer.update(idx, buffer.getOrElse(idx, 0L) + 1L)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[Int, Long],
                     other: mutable.HashMap[Int, Long])
      : mutable.HashMap[Int, Long] = {
    other.foreach { case (k, v) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + v)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[Int, Long]): Any =
    new GenericArrayData(Dd.toPairs(buffer))

  override def serialize(buffer: mutable.HashMap[Int, Long]): Array[Byte] =
    Dd.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] =
    Dd.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): DdAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DdAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): DdAgg =
    copy(child = c)
}

/** Union of previously-built sketches: exact count addition, so
  * merge-of-merges ≡ one-shot bit-for-bit under ANY grouping.
  */
case class DdMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "dd_merge"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      // containsNull=true is accepted because parquet round-trips the
      // sketch that way; null SLOTS are rejected at runtime
      // (Dd.requireSlot) instead of silently reading garbage
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires array<bigint> sketches, got " +
          other.catalogString)
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty[Int, Long]

  override def update(buffer: mutable.HashMap[Int, Long],
                      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) Dd.addPairs(buffer, v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: mutable.HashMap[Int, Long],
                     other: mutable.HashMap[Int, Long])
      : mutable.HashMap[Int, Long] = {
    other.foreach { case (k, v) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + v)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[Int, Long]): Any =
    new GenericArrayData(Dd.toPairs(buffer))

  override def serialize(buffer: mutable.HashMap[Int, Long]): Array[Byte] =
    Dd.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] =
    Dd.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): DdMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DdMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): DdMergeAgg =
    copy(child = c)
}

/** Quantile query over one sketch: rank-walk the sorted buckets, return
  * the midpoint estimate (≤ alpha relative error). Null for the empty
  * sketch; q must sit in (0, 1].
  */
case class DdQuantile(child: Expression, q: Double, alpha: Double)
    extends UnaryExpression {

  require(q > 0.0 && q <= 1.0, s"dd_quantile q must be in (0, 1], got $q")
  Dd.requireAlpha(alpha, prettyName)
  @transient private lazy val gam = Dd.gamma(alpha)

  override def prettyName: String = "dd_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      // parquet round-trip tolerance + runtime null-slot rejection,
      // same rationale as dd_merge
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires an array<bigint> sketch, got " +
          other.catalogString)
    }
  }

  override def nullSafeEval(sketch: Any): Any =
    Dd.quantileFromArray(sketch.asInstanceOf[ArrayData], q, gam)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("ddq")
      s"""
      java.lang.Double $tmp =
        graft.functions.Dd.quantileFromArray($c, $q, $gam);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildInternal(c: Expression): DdQuantile =
    copy(child = c)
}

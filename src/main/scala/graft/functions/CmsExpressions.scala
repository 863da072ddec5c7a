package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Count–min sketch primitives (Cormode & Muthukrishnan 2005) — the
  * frequency twin of the Bloom membership screen: find HEAVY HITTERS in
  * a stream whose distinct-key cardinality is too large to group-count
  * exactly (every distinct n-gram of a 100 TB corpus). The sketch is a
  * depth×width counter matrix; an element increments one counter per
  * row (Kirsch–Mitzenmacher probes from its 64-bit hash — the Bloom
  * layout), and its estimate is the MIN over rows. Estimates can only
  * OVERcount (collisions add, never subtract), so a ≥-threshold screen
  * has no false negatives — the same superset-then-exact-verify
  * discipline as the Bloom screen, giving EXACT results with all
  * shuffles bounded by candidate volume.
  *
  * Error bound: est ≤ true + εN with ε = e/width over N total
  * occurrences, w.p. 1 − e^(−depth); size width so εN ≪ the threshold.
  */
object CmsExpressions {
  /** Aggregate: fold long hashes into one depth×width count matrix
    * (array<bigint>, row-major). Partials merge by elementwise add.
    */
  def cmsAgg(hashes: Column, depth: Int, width: Int): Column =
    Bridge.toColumn(CmsAgg(Bridge.toExpression(hashes), depth, width)
      .toAggregateExpression())

  /** Point estimate (min over rows) for one hash against a sketch. */
  def cmsEstimate(sketch: Column, hash: Column, depth: Int,
                  width: Int): Column =
    Bridge.toColumn(CmsEstimate(
      Bridge.toExpression(sketch), Bridge.toExpression(hash), depth, width))
}

/** Static probe logic shared by the aggregate, interpreted eval, and
  * generated code (the Bloom single-source-of-truth pattern).
  */
object Cms {
  /** Counter column for hash h in sketch row i. */
  def col(h: Long, i: Int, width: Int): Int = {
    val h2 = Bloom.fmix64(h) | 1L
    (((h + i.toLong * h2) & Long.MaxValue) % width).toInt
  }

  def insert(counts: Array[Long], h: Long, depth: Int, width: Int): Unit = {
    var i = 0
    while (i < depth) {
      counts(i * width + col(h, i, width)) += 1L
      i += 1
    }
  }

  def estimate(sketch: ArrayData, h: Long, depth: Int, width: Int): Long = {
    // dims are free parameters at every probe site (incl. the SQL
    // surface) — a mismatch with the sketch's real layout would read
    // wrong in-bounds counters and silently UNDERCOUNT, breaking the
    // superset guarantee every screen builds on. Fail loudly instead
    // (the vector_sum mismatched-length discipline).
    if (sketch.numElements() != depth * width)
      throw new IllegalArgumentException(
        s"cms_estimate: sketch has ${sketch.numElements()} counters, " +
          s"but depth=$depth width=$width expects ${depth * width}")
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch.getLong(i * width + col(h, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

/** Count–min fold of long hashes. Buffer = one primitive
  * long[depth·width] per (task, group) mutated in place; partial→final
  * ships the packed counters once.
  */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 16, s"width must be >= 16, got $width")
  // bound where the SERIALIZED form still fits a ByteBuffer (Int-sized)
  require(depth.toLong * width <= Bloom.MaxWords.toLong,
    s"sketch $depth x $width exceeds the serializable counter bound " +
      s"(${Bloom.MaxWords})")

  override def prettyName: String = "cms_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case LongType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires bigint input, got ${other.catalogString}")
    }
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.insert(buffer, v.asInstanceOf[Long], depth, width)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    Bloom.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmsAgg =
    copy(child = c)
}

/** Min-over-rows point estimate; codegen emits one static call. */
case class CmsEstimate(left: Expression, right: Expression,
                       depth: Int, width: Int)
    extends BinaryExpression {

  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 16, s"width must be >= 16, got $width")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    left.dataType match {
      // only a complete counter array is a valid sketch: Cms.estimate
      // reads sketch.getLong(i) unchecked, and ArrayData.getLong on a
      // null slot silently yields garbage — reject nullable arrays at
      // analysis (cms_agg's output is containsNull=false already)
      case ArrayType(LongType, false) => right.dataType match {
        case LongType => TypeCheckSuccess
        case _ => TextExpressions.requireType(right, prettyName,
          "bigint")(_ => false)
      }
      case ArrayType(LongType, true) =>
        TypeCheckFailure(s"$prettyName sketch argument must be " +
          "array<bigint> without nulls (use cms_agg output)")
      case _ => TextExpressions.requireType(left, prettyName,
        "array<bigint>")(_ => false)
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    Cms.estimate(l.asInstanceOf[ArrayData], r.asInstanceOf[Long],
                 depth, width)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Cms.estimate($a, $b, $depth, $width);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(l, r)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** HyperLogLog primitives (Flajolet, Fusy, Gandouet & Meunier 2007) —
  * the PERSISTABLE distinct-count sketch. Spark's own
  * `approx_count_distinct` answers one query over one scan; what a
  * day-2 pipeline needs is the sketch as a first-class COLUMN VALUE:
  * build one register array per (day, key), persist the tiny sketch
  * table, and answer any later distinct-over-union question (to-date
  * users, rolling windows, cross-segment unions) by MERGING sketches —
  * never rescanning 100 TB of history. Register-wise max is exactly
  * union cardinality, so incremental-merge ≡ one-shot bit-for-bit (the
  * property the specs pin).
  *
  * Layout: 2^p byte registers (max leading-zero rank per bucket);
  * estimate = alpha·m²/Σ2^(−reg) with the paper's small-range
  * linear-counting correction. Standard error ≈ 1.04/√m — p=12 (4 KiB)
  * gives ~1.6%. Inputs are 64-bit hashes (xxhash64 upstream); with
  * 64−p rank bits the large-range correction is unnecessary
  * (HLL++ §4, Heule et al. 2013).
  */
object HllExpressions {

  /** Aggregate raw 64-bit hashes into one 2^p-byte register array. */
  def hllAgg(hashes: Column, p: Int): Column =
    Bridge.toColumn(HllAgg(Bridge.toExpression(hashes), p)
      .toAggregateExpression())

  /** Union previously-built sketches (register-wise max). */
  def hllMerge(sketches: Column, p: Int): Column =
    Bridge.toColumn(HllMergeAgg(Bridge.toExpression(sketches), p)
      .toAggregateExpression())

  /** Cardinality estimate of one sketch. */
  def hllCount(sketch: Column, p: Int): Column =
    Bridge.toColumn(HllCount(Bridge.toExpression(sketch), p))
}

/** Static register logic shared by the aggregates, interpreted eval,
  * and generated code (the Bloom/Cms single-source-of-truth pattern).
  */
object Hll {
  val MinP = 4
  val MaxP = 18 // 256 KiB registers — beyond this use p wisely, not more

  def m(p: Int): Int = 1 << p

  def requireP(p: Int, who: String): Unit =
    require(p >= MinP && p <= MaxP,
      s"$who: precision p must be in [$MinP, $MaxP], got $p")

  /** Fold one 64-bit hash into the registers: top p bits pick the
    * bucket, the rank of the remaining 64−p bits updates it by max.
    */
  def update(regs: Array[Byte], h: Long, p: Int): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank =
      (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** FFGM07 estimator with the small-range linear-counting branch. */
  def estimate(regs: Array[Byte], p: Int): Long = {
    val mm = m(p)
    if (regs.length != mm)
      throw new IllegalArgumentException(
        s"hll_count: sketch has ${regs.length} registers, but p=$p " +
          s"expects $mm — mismatched precision corrupts the estimate")
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < mm) {
      val r = regs(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha(mm) * mm.toDouble * mm.toDouble / sum
    val est =
      if (e <= 2.5 * mm && zeros > 0) mm * math.log(mm.toDouble / zeros)
      else e
    math.round(est)
  }

  /** Register-wise max: the union sketch. Mutates `into`. */
  def merge(into: Array[Byte], other: Array[Byte]): Unit = {
    require(into.length == other.length,
      s"hll merge: register arrays differ (${into.length} vs " +
        s"${other.length}) — sketches built at different precisions")
    var i = 0
    while (i < into.length) {
      if ((other(i) & 0xff) > (into(i) & 0xff)) into(i) = other(i)
      i += 1
    }
  }
}

/** HLL fold of long hashes. Buffer = one primitive byte[2^p] per
  * (task, group) mutated in place; partial→final ships the 2^p bytes
  * once (map-side combine makes the shuffle independent of row count).
  */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  Hll.requireP(p, prettyName)

  override def prettyName: String = "hll_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case LongType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires bigint input (a 64-bit hash), got " +
          other.catalogString)
    }
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Hll.m(p))

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buffer, v.asInstanceOf[Long], p)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllAgg =
    copy(child = c)
}

/** Union of stored sketches: register-wise max over a binary column.
  * This is what makes the sketch table INCREMENTAL — merging N daily
  * 2^p-byte rows answers distinct-over-union without touching the
  * events that built them.
  */
case class HllMergeAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  Hll.requireP(p, prettyName)

  override def prettyName: String = "hll_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case BinaryType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires binary input (an hll_agg sketch), got " +
          other.catalogString)
    }
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Hll.m(p))

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val other = v.asInstanceOf[Array[Byte]]
      if (other.length != Hll.m(p))
        throw new IllegalArgumentException(
          s"hll_merge: sketch has ${other.length} registers, but p=$p " +
            s"expects ${Hll.m(p)} — precisions must match")
      Hll.merge(buffer, other)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllMergeAgg =
    copy(child = c)
}

/** Cardinality estimate; codegen emits one static call. */
case class HllCount(child: Expression, p: Int) extends UnaryExpression {

  Hll.requireP(p, prettyName)

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case BinaryType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires binary input (an hll sketch), got " +
          other.catalogString)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    Hll.estimate(input.asInstanceOf[Array[Byte]], p)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hll.estimate($c, $p)")

  override protected def withNewChildInternal(c: Expression): HllCount =
    copy(child = c)
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native aggregates over embedding arrays. */
object VectorAggregates {
  /** Elementwise sum of float/double arrays as a real aggregate —
    * `groupBy(k).agg(vector_sum(vec))`. The buffer is one double[d], so
    * partial (map-side) combine ships d doubles per (task, group) — the
    * centroid/mean-pooling primitive a training pipeline needs WITHOUT
    * posexplode's n×d row blow-up and double shuffle.
    */
  def vectorSum(vec: Column): Column =
    Bridge.toColumn(VectorSum(Bridge.toExpression(vec))
      .toAggregateExpression())
}

/** Elementwise Σ over an array column (float/double), null-skipping like
  * SUM: null arrays are ignored, an all-null group evaluates to null.
  * Mismatched lengths in one group are a data error and fail loudly —
  * silently zipping short would corrupt a centroid.
  *
  * TypedImperativeAggregate (object buffer) rather than DeclarativeAggregate:
  * the buffer is a primitive double[] mutated in place — no per-row
  * catalyst array allocation — and serializes to packed bytes for the
  * partial→final shuffle.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def prettyName: String = "vector_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got ${other.catalogString}")
    }
  }

  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // null buffer = "no non-null input seen yet" — deliberately DISTINCT
  // from a zero-length input array, so a group of empty vectors sums to
  // an empty array (SUM analogy: non-null inputs give a non-null result)
  // and a length mismatch involving an empty vector fails identically
  // regardless of row/partition order.
  override def createAggregationBuffer(): Array[Double] = null

  private def lengthError(a: Int, b: Int): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: mismatched vector lengths in one group ($a vs $b)")

  private def add(buffer: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val out = if (buffer == null) new Array[Double](n) else buffer
    if (n != out.length) lengthError(out.length, n)
    var i = 0
    while (i < n) {
      // a null element poisons the whole vector? No: treat element-null
      // as 0 contribution would hide data errors — fail loudly instead.
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: null element at position $i")
      out(i) += (if (elemIsFloat) arr.getFloat(i).toDouble
                 else arr.getDouble(i))
      i += 1
    }
    out
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer else add(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other == null) return buffer
    if (buffer == null) return other
    if (buffer.length != other.length) lengthError(buffer.length, other.length)
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  // 1-byte header keeps the null sentinel distinct from a zero-length sum
  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array[Byte](0)
    val bb = ByteBuffer.allocate(1 + 8 * buffer.length)
    bb.put(1: Byte)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.length == 0 || bytes(0) == 0) return null
    val bb = ByteBuffer.wrap(bytes, 1, bytes.length - 1)
    val out = new Array[Double]((bytes.length - 1) / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VectorSum =
    copy(child = c)
}

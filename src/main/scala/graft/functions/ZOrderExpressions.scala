package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Morton (Z-order) curve primitives — multi-dimensional FILE
  * clustering (the public technique behind Delta Lake's OPTIMIZE
  * ZORDER and Databricks' liquid clustering ancestors; Morton 1966).
  *
  * A single-column sort clusters files for ONE predicate dimension;
  * every other dimension scatters uniformly, so its range predicates
  * touch every file. Interleaving the bits of k rank-bucketed columns
  * produces a 1-D key whose contiguous ranges are k-dimensional
  * boxes: range-partitioning files by the z-value gives each file a
  * tight min/max envelope in EVERY interleaved dimension, and parquet
  * footer stats then prune files for predicates on any of them. At
  * 100 TB the difference is reading ~1/N of files instead of all of
  * them for the non-sort dimensions.
  */
object ZOrderExpressions {

  /** Interleave the low bits of k int bucket columns, MSB-first, into
    * one orderable long. All inputs must already be bucket indexes in
    * [0, 2^bitsPerDim) — [[graft.io.Sinks.zorderWrite]] derives them
    * by rank-bucketing; this is the key, not the bucketizer.
    */
  def interleaveBits(cols: Seq[Column]): Column =
    Bridge.toColumn(InterleaveBits(cols.map(Bridge.toExpression)))

  /** Rank-bucket index of a double against sorted quantile boundaries
    * (#boundaries <= value — so output ∈ [0, |bounds|]). Rank, not
    * linear, bucketing: a skewed column's mass must spread EVENLY over
    * bucket indexes or the z-key cannot discriminate inside the heavy
    * region and the curve clusters nothing (linear min/max collapses a
    * long-tailed column into one bucket).
    */
  def rankBucket(v: Column, bounds: Array[Double]): Column =
    Bridge.toColumn(RankBucket(Bridge.toExpression(v), bounds))
}

object ZOrder {
  val MaxDims = 6

  /** Bits each dimension contributes: as many as fit a non-negative
    * long (63 bits) evenly, capped at 16 — beyond 65k buckets the file
    * envelope, not the key, is the resolution limit.
    */
  def bitsPerDim(dims: Int): Int = math.min(16, 63 / dims)

  /** MSB-first interleave: output bit stream is
    * v0[b-1] v1[b-1] … vk[b-1] v0[b-2] … — so the z-order's coarsest
    * split alternates dimensions, the property that makes contiguous
    * key ranges k-dimensional boxes.
    */
  def interleave(vals: Array[Int], bits: Int): Long = {
    var out = 0L
    var i = bits - 1
    while (i >= 0) {
      var d = 0
      while (d < vals.length) {
        out = (out << 1) | ((vals(d) >>> i) & 1).toLong
        d += 1
      }
      i -= 1
    }
    out
  }

  /** Binary search: number of boundaries <= v (so ∈ [0, |bounds|]). */
  def bucketOf(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** Codegen'd rank-bucket lookup; the sorted boundary array rides the
  * generated class as one reference object (the broadcast-fold
  * discipline — never a join against a boundary table).
  */
case class RankBucket(child: Expression, bounds: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "rank_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case DoubleType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires double input, got ${other.catalogString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    ZOrder.bucketOf(input.asInstanceOf[Double], bounds)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rankBounds", bounds, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ZOrder.bucketOf($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): RankBucket =
    copy(child = c)
}

/** Codegen'd n-ary interleave; null in any dimension → null key (the
  * writer routes null-keyed rows to the curve's origin explicitly).
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  require(children.nonEmpty && children.size <= ZOrder.MaxDims,
    s"interleave_bits takes 1..${ZOrder.MaxDims} columns, " +
      s"got ${children.size}")

  private val bits = ZOrder.bitsPerDim(children.size)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType != IntegerType =>
        TypeCheckFailure(s"$prettyName argument $i must be int (a " +
          s"bucket index), got ${c.dataType.catalogString}")
    }.getOrElse(TypeCheckSuccess)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Int](children.size)
    var d = 0
    while (d < children.size) {
      val v = children(d).eval(input)
      if (v == null) return null
      vals(d) = v.asInstanceOf[Int]
      d += 1
    }
    ZOrder.interleave(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val nullCheck =
      evals.map(e => s"if (${e.isNull}) { ${ev.isNull} = true; }")
        .mkString("\n")
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    val body =
      s"""
         |$childCode
         |boolean ${ev.isNull} = false;
         |long ${ev.value} = 0L;
         |$nullCheck
         |if (!${ev.isNull}) {
         |  int[] $arr = new int[${children.size}];
         |  $fill
         |  ${ev.value} = graft.functions.ZOrder.interleave($arr, $bits);
         |}
       """.stripMargin
    ev.copy(code = code"$body")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

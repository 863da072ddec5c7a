package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native cosine-similarity expression over embedding arrays.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a,b,multiply),…)`) allocates an intermediate array
  * per row and walks it three times; this expression is one fused loop,
  * codegen'd, no allocation — the difference between scan-bound and
  * compute-bound on a 100 TB embedding table. Accumulates in double
  * regardless of element type (float embeddings upcast per element), which
  * also makes it bit-comparable with the DuckDB double oracle at
  * round(·,6).
  */
object VectorExpressions {
  def cosineSim(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSimilarity(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  def lshBucket(vec: Column, bits: Int): Column =
    Bridge.toColumn(LshBucket(Bridge.toExpression(vec), bits))

  def int8Codes(vec: Column): Column =
    Bridge.toColumn(Int8Codes(Bridge.toExpression(vec)))
}

trait VectorBinaryOp extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def genGet(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)"
    else s"$arr.getDouble($i)"
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryOp {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || n == 0) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        // a null SLOT is a degenerate vector, not a zero: reading it
        // unchecked yields 0.0 (or stale unsafe-row bytes) and a
        // silently wrong similarity — propagate null like every other
        // degenerate case this expression already handles
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = getElem(left, a, i); val y = getElem(right, b, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $x = ${genGet(left, a, i)};
         |    double $y = ${genGet(right, b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb)); }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimilarity = copy(l, r)
}

case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryOp {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // null slot → null result (CosineSimilarity's rule)
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        dot += getElem(left, a, i) * getElem(right, b, i); i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $dot += (${genGet(left, a, i)}) * (${genGet(right, b, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(l, r)
}

/** Fused int8 symmetric quantization: out[i] = floor(x_i·(127/max|x|)
  * + 0.5) AS DOUBLE — one native pass replacing the serving path's
  * three interpreted HOF walks (abs/max transform, quantize transform,
  * int→double cast transform) per corpus row. Bit-identical to
  * `quantizeInt8`'s qvec cast to double: same IEEE double ops in the
  * same order, and the quantized magnitudes (≤ 127) round-trip int ↔
  * double exactly. Degenerate inputs (empty, all-null, max|x| = 0,
  * or ANY NaN/±Inf element) yield NULL — the quantizeInt8
  * defined-null contract; null elements propagate elementwise.
  */
case class Int8Codes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })
  override def nullable: Boolean = true
  override def prettyName: String = "int8_codes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          other.catalogString)
    }
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(
          if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        // NaN fails every > comparison, so without this check a NaN
        // element would silently NOT decide the max (diverging from
        // array_max, where NaN sorts greatest) — non-finite input is
        // degenerate in both paths
        if (v.isNaN || v.isInfinite) return null
        if (v > mx) mx = v
      }
      i += 1
    }
    if (mx <= 0.0) return null // empty / all-null / all-zero: no scale
    val s = 127.0 / mx
    if (!dataType.asInstanceOf[ArrayType].containsNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = math.floor(x * s + 0.5)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (arr.isNullAt(i)) null
          else {
            val x =
              if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            math.floor(x * s + 0.5)
          }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizer", this,
      classOf[Int8Codes].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
       |  $ref.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Int8Codes =
    copy(child = c)
}

/** Random-hyperplane LSH bucket id: bit j = sign(v · h_j) with hyperplane
  * components h_j[i] ∈ {±1} derived from xxhash64(j, i) — deterministic,
  * no stored model, bit-identical to the higher-order-function
  * formulation it replaces for every NON-NULL vector, null elements
  * included (`aggregate(zip_with(...))` per bit walked the whole vector
  * `bits` times through three intermediate arrays; this is one fused pass
  * with per-bit accumulators and zero allocation beyond one small
  * double[]). Per-element hyperplane signs come from
  * `XXH64.hashInt(i, seed_j)` parity, `seed_j = XXH64.hashInt(j, 42)` —
  * exactly Spark's `xxhash64(lit(j), i)` fold.
  *
  * Deliberate divergence on a NULL vector INPUT: this expression is
  * null-in/null-out (a missing embedding has no bucket, so joins drop the
  * row), whereas the HOF twin's `when(s > 0,...).otherwise(0)` would
  * claim bucket 0 for it — an artifact, not a semantic.
  */
case class LshBucket(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  // bits is validated here, NOT in a constructor require(): construction
  // happens while the SQL function registry builds the expression, where
  // a raw IllegalArgumentException surfaces as a planner-time failure —
  // a TypeCheckFailure becomes a proper AnalysisException with the
  // function name and query position for SQL callers.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (bits < 1 || bits > 63)
      TypeCheckFailure(s"$prettyName bits must be in [1,63], got $bits")
    else child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got ${other.catalogString}")
    }
  }

  // one hash fold per bit, shared across all rows/elements
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(bits)(j => XXH64.hashInt(j, 42L))
  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      // a null element null-poisons every bit's aggregate in the HOF
      // formulation, which `when(s > 0, ...)` turns into bucket 0 — match
      // it exactly rather than reading garbage from the null slot
      if (arr.isNullAt(i)) return 0L
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var j = 0
      while (j < bits) {
        // (h & 1) == pmod(h, 2) for two's-complement longs
        if ((XXH64.hashInt(i, seeds(j)) & 1L) == 0L) acc(j) += x
        else acc(j) -= x
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < bits) {
      if (acc(j) > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBucketer", this,
      classOf[LshBucket].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(c: Expression): LshBucket =
    copy(child = c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Edit-distance family for entity resolution (fuzzy record matching).
  * Kept as native codegen'd expressions so the blocked fuzzy join's
  * verify stage stays inside whole-stage codegen — the same preference
  * order as TextExpressions (built-in > native Expression > UDF).
  */
object StringDistance {

  /** Column API: Jaro–Winkler similarity in [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.toColumn(JaroWinkler(Bridge.toExpression(a),
                                Bridge.toExpression(b)))

  /** Jaro similarity over UTF-16 code units (BMP-correct; the synthetic
    * and typical entity corpora are BMP). 0.0 when either side is empty
    * and the strings differ; 1.0 on equality — the DuckDB convention,
    * so the oracle can recompute bit-for-bit.
    */
  private[graft] def jaro(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of relative order, halved with
    // an integer FLOOR — DuckDB's convention (t=3 raw → 1, not 1.5);
    // verified on 'large gear'/'red gear' (0.810714, not the half-t
    // 0.786905) and 'new widget'/'red widget' (0.825, not 0.804167)
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
  }

  /** Winkler boost: only above the classic 0.7 threshold, prefix scale
    * p = 0.1, common prefix capped at 4 — verified equal to DuckDB's
    * jaro_winkler_similarity on the classic pairs (martha/marhta
    * 0.961111…, dixon/dicksonx 0.813333…, DWAYNE/DUANE 0.84) and on the
    * sub-threshold shared-prefix case (no boost below 0.7).
    */
  private[graft] def jaroWinklerSim(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j < 0.7) j
    else {
      val max = math.min(4, math.min(s1.length, s2.length))
      var l = 0
      while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
      j + 0.1 * l * (1.0 - j)
    }
  }
}

/** jaro_winkler(a, b) — Jaro–Winkler similarity of two strings,
  * null-in/null-out, matching DuckDB's jaro_winkler_similarity exactly
  * (threshold 0.7, p = 0.1, prefix ≤ 4) so fuzzy joins are
  * oracle-checkable.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def checkInputDataTypes() = {
    val l = TextExpressions.requireType(left, prettyName, "string")(
      _ == StringType)
    if (l.isFailure) l
    else TextExpressions.requireType(right, prettyName, "string")(
      _ == StringType)
  }

  def compute(a: UTF8String, b: UTF8String): Double =
    StringDistance.jaroWinklerSim(a.toString, b.toString)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jw", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
}

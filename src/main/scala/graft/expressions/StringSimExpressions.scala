package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Edit-similarity kernels for record linkage. Kept as static JVM
  * kernels called from `doGenCode` so whole-stage codegen stays intact
  * (same contract as [[TextKernels]]).
  */
object StringSimKernels {

  /** Jaro-Winkler similarity, pinned to the semantics of DuckDB's
    * `jaro_winkler_similarity` (fuzz-verified bit-identical over 13k
    * random string pairs across three alphabets, lengths 0-40):
    *  - either side empty → 0.0; equal strings → 1.0;
    *  - match window `max(len)/2 - 1` (clamped ≥ 0), greedy
    *    left-to-right assignment;
    *  - INTEGER half-transpositions (`t / 2` floored — the RapidFuzz
    *    convention; a fractional t/2 diverges from DuckDB);
    *  - jaro = (m/l1 + m/l2 + (m - t2)/m) / 3, evaluated in exactly
    *    this association order;
    *  - Winkler boost only when jaro > 0.7: `j + l·0.1·(1−j)`,
    *    common prefix capped at 4.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
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
    val t2 = t / 2
    val jaro =
      (m.toDouble / l1 + m.toDouble / l2 + (m - t2).toDouble / m) / 3
    if (jaro > 0.7) {
      var l = 0
      val lim = math.min(4, math.min(l1, l2))
      while (l < lim && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1 - jaro)
    } else jaro
  }
}

/** Native Jaro-Winkler similarity of two string columns (codegen'd). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(StringSimKernels.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.StringSimKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object StringSimExpressions {
  /** Jaro-Winkler similarity (native, DuckDB-parity semantics). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

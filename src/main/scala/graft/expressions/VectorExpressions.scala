package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Single-pass JVM kernels for embedding math (same pattern as
  * [[TextKernels]]: static forwarders so generated code calls them
  * directly and whole-stage codegen survives).
  */
object VectorKernels {

  /** Cosine similarity with the same arithmetic as the HOF
    * formulation it replaces (`dot / (sqrt(na) * sqrt(nb))`, each
    * accumulator a sequential left fold) — bit-identical doubles, so
    * oracle hash parity is preserved, at ~10-50× the throughput (the
    * interpreted HOF chain re-walks the arrays per element). */
  def cosine(l: ArrayData, r: ArrayData): Double = {
    val a = l.toDoubleArray()
    val b = r.toDoubleArray()
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native cosine similarity over two array<double> columns — the hot
  * path of ANN scoring and pair mining (SURVEY §7.3 preference order:
  * custom Expression beats UDF beats interpreted HOFs). */
/** Inputs MUST be array<double> (callers cast; checkInputDataTypes
  * rejects anything else rather than mis-reading the array bytes). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Cosine similarity of two array<double> columns (native). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

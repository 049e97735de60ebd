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

  /** Plain sequential-fold dot product — the norm-cached pair-scoring
    * kernel: when each vector's `sqrt(Σx²)` is precomputed ONCE per
    * row, a pair scores as `dot/(na*nb)` with one accumulator instead
    * of [[cosine]]'s three — bit-identical doubles (same fold order,
    * same final expression tree), ~3× less array traffic in the
    * quadratic pair stages. */
  def dot(l: ArrayData, r: ArrayData): Double = {
    val a = l.toDoubleArray()
    val b = r.toDoubleArray()
    val n = math.min(a.length, b.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += a(i) * b(i); i += 1 }
    d
  }

  /** `sqrt(Σx²)` with [[cosine]]'s exact accumulation order. */
  def l2norm(l: ArrayData): Double = {
    val a = l.toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
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

/** Native dot product over two array<double> columns (the norm-cached
  * pair scorer's wide-phase kernel — see [[VectorKernels.dot]]). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

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
    VectorKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native `sqrt(Σx²)` over an array<double> column. */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<double> input, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.l2norm(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.VectorKernels.l2norm($a)")

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Merge-count of common elements of two SORTED array<bigint> columns
  * (round-11): the pair-verification hot loop computed
  * `size(array_intersect(sig_a, sig_b))`, which builds a hash set per
  * candidate pair; on sorted signature arrays the same count is one
  * allocation-free merge walk. Equal to the array_intersect size when
  * both inputs are sorted sets — the signature builders emit
  * sort_array over DISTINCT shingle hashes, so duplicates require an
  * xxhash64 collision (the 2^-64 class the posting hashing already
  * accepts, and the oracle hash-compare would surface). */
object SetKernels {
  def sortedIntersectCount(l: ArrayData, r: ArrayData): Long = {
    // index the ArrayData directly (round-12): toLongArray() copied
    // both sides into fresh arrays on EVERY pair — two allocations per
    // candidate pair in the verify stage's hottest loop. UnsafeArrayData
    // getLong is a direct word read; the merge itself is unchanged.
    val n = l.numElements()
    val m = r.numElements()
    var i = 0
    var j = 0
    var c = 0L
    var x = if (n > 0) l.getLong(0) else 0L
    var y = if (m > 0) r.getLong(0) else 0L
    while (i < n && j < m) {
      if (x == y) {
        c += 1; i += 1; j += 1
        if (i < n) x = l.getLong(i)
        if (j < m) y = r.getLong(j)
      } else if (x < y) {
        i += 1; if (i < n) x = l.getLong(i)
      } else {
        j += 1; if (j < m) y = r.getLong(j)
      }
    }
    c
  }
}

/** Native merge-intersection count over two sorted array<bigint>
  * columns — see [[SetKernels.sortedIntersectCount]]. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SetKernels.sortedIntersectCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.SetKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Cosine similarity of two array<double> columns (native). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Merge-count of common elements of two sorted array<bigint>
    * columns (native). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native dot product of two array<double> columns. */
  def dotProd(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native l2 norm of an array<double> column. */
  def l2Norm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))
}

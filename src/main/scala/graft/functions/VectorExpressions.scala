package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native vector math for the ANN path. The zip_with/aggregate
  * formulation in Similarity.cosine is the executable spec but runs
  * interpreted; this expression is the hot loop of every similarity
  * query — one fused pass over both arrays, primitive double
  * accumulation, no per-element boxing — and participates in codegen via
  * a single static call.
  *
  * Accumulation order is ascending index, identical to the HOF spec and
  * to the SQL oracle's list_transform/list_sum fold, so scores stay
  * bit-deterministic across engines.
  */
object VectorMath {

  /** Cosine similarity of two numeric arrays (float or double elements),
    * accumulated in double, ascending index order. Null if either array
    * is null; NaN propagates like IEEE division.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }
}

/** cosine_sim(array<float|double>, array<float|double>): DoubleType. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val lFloat = isFloat(left)
  @transient private lazy val rFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.cosine($a, $b, $lFloat, $rFloat)")

  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API: fused native cosine similarity. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.toColumn(CosineSimilarity(
      ColumnShim.toExpression(a), ColumnShim.toExpression(b)))
}

package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path. Lives in an
  * `org.apache.spark.sql` subpackage because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the standard placement for
  * library-provided expressions compiled against Spark; the public
  * entry point is `graft.functions.Native`.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * allocates an intermediate products array per row pair and walks it
  * twice. For ANN scoring — the one expression evaluated O(corpus ×
  * queries) times — a dedicated `BinaryExpression` with `doGenCode` is
  * justified (SURVEY §2.11 note): a single fused loop, no allocation,
  * inside WholeStageCodegen. On equal-length arrays of NON-NULL elements
  * semantics are identical to the composable form (each float widened to
  * double, products accumulated in element order), so oracle results are
  * bit-identical. Arrays *containing* null elements are outside the
  * embedding contract: the composable form propagates null, while this
  * expression reads such slots as 0.0 — do not rely on either behavior.
  */
object GraftNative {

  /** Σ aᵢ·bᵢ over two float arrays, double accumulation. Null if either
    * side is null or lengths mismatch; array ELEMENTS must be non-null
    * (embedding contract — null slots read as 0.0, unlike the composable
    * form which propagates null; see object doc).
    */
  case class FloatDotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "float_dot"

    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      // mismatched dimensions → null (matching the composable zip_with
      // form), never a silently-truncated partial dot
      if (n != y.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
          i += 1
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API entry point. */
  def floatDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

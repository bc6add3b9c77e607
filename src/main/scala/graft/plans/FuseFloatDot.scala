package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftnative.GraftNative.FloatDotProduct
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule that rewrites the composable dot-product pattern
  *
  *   `aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  *              0.0, (acc, v) => acc + v)`
  *
  * into the native codegen'd [[FloatDotProduct]] (single fused loop, no
  * intermediate array — see `functions/NativeExpressions`). Users write
  * the declarative builtin form; the library's scoring hot path appears
  * in their plan automatically.
  *
  * The match is deliberately conservative so the rewrite is always
  * semantics-preserving:
  *  - both inputs must be `array<float>` with `containsNull = false`
  *    (on null ELEMENTS the composable form returns null while the
  *    native loop reads 0.0 — those arrays are left untouched; note
  *    parquet reads mark elements nullable, so the rule fires on
  *    constructed/typed data, not raw nullable scans)
  *  - zero must be literal 0.0, the merge lambda exactly `acc + v`,
  *    the finish lambda the identity
  * Null ARRAYS and mismatched lengths already agree between the two
  * forms (both yield null).
  *
  * Registered either via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (cluster config) or [[FuseFloatDot.install]] on a live session.
  */
object FuseFloatDot extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isDoubleCastOfVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case c: Cast => c.dataType == DoubleType && isVar(c.child, v)
      case _ => false
    }

  private def isNonNullFloatArray(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(FloatType, containsNull) => !containsNull
      case _ => false
    }

  private def rewrite(agg: ArrayAggregate): Option[Expression] =
    agg.argument match {
      case zw: ZipWith
          if isNonNullFloatArray(zw.left) && isNonNullFloatArray(zw.right) =>
        val zeroOk = agg.zero match {
          case Literal(0.0, DoubleType) => true
          case _ => false
        }
        val productOk = zw.function match {
          case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable,
              y: NamedLambdaVariable), _) =>
            isDoubleCastOfVar(m.left, x) && isDoubleCastOfVar(m.right, y)
          case _ => false
        }
        val mergeOk = agg.merge match {
          case LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable,
              v: NamedLambdaVariable), _) =>
            isVar(a.left, acc) && isVar(a.right, v)
          case _ => false
        }
        val finishOk = agg.finish match {
          case LambdaFunction(body, Seq(r: NamedLambdaVariable), _) =>
            isVar(body, r)
          case _ => false
        }
        if (zeroOk && productOk && mergeOk && finishOk)
          Some(FloatDotProduct(zw.left, zw.right))
        else None
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg: ArrayAggregate => rewrite(agg).getOrElse(agg)
    }

  /** Adds the rule to a live session's extra optimizations (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(FuseFloatDot))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseFloatDot

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == FuseFloatDot)
}

/** `spark.sql.extensions` entry point: the fusion rule plus SQL names
  * for the native expressions, so a pure-SQL caller (`spark.sql`,
  * thrift, notebooks) reaches the same codegen'd hot paths as the
  * Column API:
  *
  *   SELECT graft_float_dot(a.embedding, b.embedding)        -- scoring
  *   SELECT graft_md5_base28(shingles)                       -- hashing
  *   SELECT graft_minhash_signature(graft_md5_base28(sh), 64)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseFloatDot)
    org.apache.spark.sql.graftnative.GraftNative.sqlFunctions
      .foreach(e.injectFunction)
  }
}

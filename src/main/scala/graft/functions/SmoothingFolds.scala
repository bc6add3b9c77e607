package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, DoubleType, StructField, StructType}

/** Native O(n) evaluators for the sequential-smoothing family
  * (MACD, Holt linear, Holt–Winters, Heikin-Ashi — SURVEY §2.18/2.20/
  * 2.21). The composable formulation folds the sorted per-key series
  * with `aggregate(xs, zero, acc => concat(acc.out, array(step)))`:
  * correct, but the `concat` copies the accumulated output array on
  * EVERY step — O(days²) struct copies per key, the one observed
  * superlinear pattern in the suite (a decade of daily data is ~3650²
  * copies per key inside a single task). These expressions run the
  * IDENTICAL recursion — same IEEE operation sequence, same dyadic/
  * exact-division coefficients, same first-row special cases — as one
  * JVM loop appending to a builder, so per-key cost returns to O(days)
  * while every emitted double stays bit-identical to the composable
  * form (spec-pinned). Rounding (`round(·, 6)`) is NOT done here: the
  * fold state was always carried unrounded and rounding was always
  * output-side only, so the callers apply the same `round` after the
  * explode — keeping the cross-engine rounding convention in exactly
  * one (Catalyst) place.
  *
  * Eval-only (`CodegenFallback`): the expression runs once per KEY (not
  * per event row) over an already-aggregated daily array, so the
  * interpreted-boundary cost is key-sized; the loop body itself is
  * plain JVM double arithmetic.
  */
object GraftSmoothing {

  private def outType(fields: (String, DataType)*): DataType =
    ArrayType(StructType(fields.map { case (n, t) =>
      StructField(n, t, nullable = false)
    }), containsNull = false)

  /** Shared plumbing: array<struct<…>> in, array<struct<…>> out. */
  abstract class SeriesFold extends UnaryExpression with CodegenFallback {
    override def nullable: Boolean = true
    protected def run(xs: ArrayData): GenericArrayData
    override protected def nullSafeEval(a: Any): Any =
      run(a.asInstanceOf[ArrayData])
  }

  /** MACD over a sorted array<struct<day:date,c:double>>: fast/slow EMAs
    * (α = 2/13, 2/27), macd = fast − slow, signal = EMA(α = 2/10) of the
    * macd, first row seeds fast = slow = c and signal = 0. Emits
    * UNROUNDED (day, macd, signal) per step.
    */
  case class MacdFold(child: Expression) extends SeriesFold {
    override def prettyName: String = "graft_macd_fold"
    override def dataType: DataType = outType(
      "day" -> DateType, "macd" -> DoubleType, "signal" -> DoubleType)

    override protected def run(xs: ArrayData): GenericArrayData = {
      val aF = 2.0 / 13.0; val bF = 11.0 / 13.0
      val aS = 2.0 / 27.0; val bS = 25.0 / 27.0
      val aG = 2.0 / 10.0; val bG = 8.0 / 10.0
      val n = xs.numElements()
      val out = new Array[Any](n)
      var fast = 0.0; var slow = 0.0; var sig = 0.0
      var i = 0
      while (i < n) {
        val x = xs.getStruct(i, 2)
        val c = x.getDouble(1)
        fast = if (i == 0) c else aF * c + bF * fast
        slow = if (i == 0) c else aS * c + bS * slow
        val m = fast - slow
        sig = if (i == 0) 0.0 else aG * m + bG * sig
        out(i) = new GenericInternalRow(
          Array[Any](x.getInt(0), m, sig))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Holt linear (α = β = ½) over a sorted array<struct<day,c>>:
    * l₁ = y₁, b₁ = 0, then l = ½y + ½(l+b), b = ½(l−l_prev) + ½b.
    * Emits UNROUNDED (day, level, trend, forecast_1 = l+b).
    */
  case class HoltLinearFold(child: Expression) extends SeriesFold {
    override def prettyName: String = "graft_holt_linear_fold"
    override def dataType: DataType = outType(
      "day" -> DateType, "level" -> DoubleType, "trend" -> DoubleType,
      "forecast_1" -> DoubleType)

    override protected def run(xs: ArrayData): GenericArrayData = {
      val n = xs.numElements()
      val out = new Array[Any](n)
      var lvl = 0.0; var trend = 0.0
      var i = 0
      while (i < n) {
        val x = xs.getStruct(i, 2)
        val c = x.getDouble(1)
        val l = if (i == 0) c else 0.5 * c + 0.5 * (lvl + trend)
        val b = if (i == 0) 0.0 else 0.5 * (l - lvl) + 0.5 * trend
        lvl = l; trend = b
        out(i) = new GenericInternalRow(
          Array[Any](x.getInt(0), l, b, l + b))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Additive Holt–Winters (α = β = γ = ½, seasonal period `period`)
    * over a sorted array<struct<day,c>>. Init from the first week
    * exactly as the composable form: l₀ = (left-fold Σ of the first
    * min(period, n) values)/period, b₀ = 0, s₀ = those values' deviations
    * from l₀; then ONE uniform rule per step with the season buffer
    * rotated left and the new index appended. Emits UNROUNDED
    * (day, level, trend, forecast_1 = l + b + s[1-after-rotation]).
    * Contract (as before): keys carry ≥ period days; shorter series get
    * a min(period, n)-length buffer exactly like slice-and-concat did.
    */
  case class HoltWintersFold(child: Expression, period: Int)
      extends SeriesFold {
    override def prettyName: String = "graft_holt_winters_fold"
    override def dataType: DataType = outType(
      "day" -> DateType, "level" -> DoubleType, "trend" -> DoubleType,
      "forecast_1" -> DoubleType)

    override protected def run(xs: ArrayData): GenericArrayData = {
      val n = xs.numElements()
      val out = new Array[Any](n)
      val k = math.min(period, n)
      var l0 = 0.0
      var i = 0
      while (i < k) { l0 += xs.getStruct(i, 2).getDouble(1); i += 1 }
      l0 = l0 / period
      // circular season buffer: logical first at `h`; rotate-left +
      // append = overwrite slot h, advance h (mod k)
      val seas = new Array[Double](math.max(k, 1))
      i = 0
      while (i < k) {
        seas(i) = xs.getStruct(i, 2).getDouble(1) - l0; i += 1
      }
      var h = 0
      var lvl = l0; var trend = 0.0
      i = 0
      while (i < n) {
        val x = xs.getStruct(i, 2)
        val c = x.getDouble(1)
        val sh = seas(h)
        val l = 0.5 * (c - sh) + 0.5 * (lvl + trend)
        val b = 0.5 * (l - lvl) + 0.5 * trend
        seas(h) = 0.5 * (c - l) + 0.5 * sh
        h = (h + 1) % math.max(k, 1)
        lvl = l; trend = b
        out(i) = new GenericInternalRow(
          Array[Any](x.getInt(0), l, b, l + b + seas(h)))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Heikin-Ashi candles over a sorted array<struct<day,o,h,l,c>>:
    * ha_close = (o+h+l+c)/4, ha_open = first ? o : (ha_open_prev +
    * ha_close_prev)/2, ha_high/low = extreme of {h|l, ha_open,
    * ha_close}. Emits UNROUNDED (day, ha_open, ha_close, ha_high,
    * ha_low).
    */
  case class HeikinAshiFold(child: Expression) extends SeriesFold {
    override def prettyName: String = "graft_heikin_ashi_fold"
    override def dataType: DataType = outType(
      "day" -> DateType, "ha_open" -> DoubleType, "ha_close" -> DoubleType,
      "ha_high" -> DoubleType, "ha_low" -> DoubleType)

    override protected def run(xs: ArrayData): GenericArrayData = {
      val n = xs.numElements()
      val out = new Array[Any](n)
      var ho = 0.0; var hc = 0.0
      var i = 0
      while (i < n) {
        val x = xs.getStruct(i, 5)
        val o = x.getDouble(1); val h = x.getDouble(2)
        val l = x.getDouble(3); val c = x.getDouble(4)
        val nhc = (o + h + l + c) / 4.0
        val nho = if (i == 0) o else (ho + hc) / 2.0
        ho = nho; hc = nhc
        out(i) = new GenericInternalRow(Array[Any](
          x.getInt(0), nho, nhc,
          math.max(math.max(h, nho), nhc),
          math.min(math.min(l, nho), nhc)))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Σ arr[i] · (1−α)^(n−1−i) over an array<double> frame — the
    * weighted-sum core of [[graft.ops.TimeSeries.ewmaTrailing]]. The
    * composable form (`aggregate(transform(arr, x·pow(1−α, n−1−i)),
    * 0.0, _+_)`) runs per EVENT row as two interpreted lambda passes
    * plus an intermediate array; this is one codegen'd loop. Identical
    * IEEE sequence: ascending-index fold from 0.0, each weight via
    * `StrictMath.pow` (what Catalyst's `Pow` evaluates — and exact
    * anyway for the dyadic α the cross-engine contract requires). The
    * n = 0 → NULL guard and the α/(1−(1−α)^n) normalization stay in
    * the caller, unchanged. Elements must be non-null (collect_list
    * output — the caller's frame contract).
    */
  case class EwmaWeightedSum(child: Expression, alpha: Double)
      extends UnaryExpression {
    override def prettyName: String = "graft_ewma_weighted_sum"
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val base = 1.0 - alpha
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += arr.getDouble(i) * StrictMath.pow(base, (n - 1 - i).toDouble)
        i += 1
      }
      acc
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val base = 1.0 - alpha
        s"""
           |final int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) *
           |    java.lang.StrictMath.pow($base, (double) ($n - 1 - $i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API entry points. */
  def ewmaWeightedSum(arr: Column, alpha: Double): Column =
    ExpressionUtils.column(
      EwmaWeightedSum(ExpressionUtils.expression(arr), alpha))
  def macdFold(xs: Column): Column =
    ExpressionUtils.column(MacdFold(ExpressionUtils.expression(xs)))
  def holtLinearFold(xs: Column): Column =
    ExpressionUtils.column(HoltLinearFold(ExpressionUtils.expression(xs)))
  def holtWintersFold(xs: Column, period: Int): Column =
    ExpressionUtils.column(
      HoltWintersFold(ExpressionUtils.expression(xs), period))
  def heikinAshiFold(xs: Column): Column =
    ExpressionUtils.column(HeikinAshiFold(ExpressionUtils.expression(xs)))
}

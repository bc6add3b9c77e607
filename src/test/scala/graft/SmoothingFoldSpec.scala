package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftSmoothing

/** The native O(n) smoothing folds (GraftSmoothing) must be
  * BIT-IDENTICAL to the composable Catalyst formulation they replaced
  * (`aggregate(xs, zero, acc => concat(acc.out, array(step)))` — the
  * O(n²) accumulator): same IEEE op sequence, same first-row seeding,
  * same first-week Holt–Winters init, same rotate-left season buffer.
  * Pinned here on series far longer than the testdata calendar
  * (500 days — many full buffer rotations) plus a shorter-than-period
  * edge key, comparing raw UNROUNDED doubles by their exact bit
  * patterns (so even a −0.0/+0.0 or last-ulp divergence would fail).
  */
class SmoothingFoldSpec extends SparkSpecBase {

  private val nDays = 500

  /** 3 long keys + 1 four-day key; irregular integer-valued doubles. */
  private def series: DataFrame =
    spark.range(3L * nDays)
      .select((col("id") % 3).as("k"),
        date_add(lit("2020-01-01").cast("date"),
          (col("id") / 3).cast("int")).as("day"),
        ((col("id") * 2654435761L) % 9973).cast("double").as("c"))
      .union(spark.range(4)
        .select(lit(9L).as("k"),
          date_add(lit("2020-01-01").cast("date"), col("id").cast("int"))
            .as("day"),
          ((col("id") * 97L) % 1009).cast("double").as("c")))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("xs"))

  /** Exact bit-pattern comparison of two (k, day, doubles…) frames. */
  private def assertBitIdentical(a: DataFrame, b: DataFrame): Unit = {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getDate(1).toString)
    val xs = a.collect().map(r => key(r) -> r).toMap
    val ys = b.collect().map(r => key(r) -> r).toMap
    assert(xs.keySet === ys.keySet)
    xs.foreach { case (k, r) =>
      val s = ys(k)
      (2 until r.length).foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(i)) ===
          java.lang.Double.doubleToRawLongBits(s.getDouble(i)),
          s"key=$k col=$i native=${r.getDouble(i)} composable=${s.getDouble(i)}")
      }
    }
  }

  test("macd fold: native == composable, bit for bit, over 500 days") {
    val native = series.select(col("k"),
      explode(GraftSmoothing.macdFold(col("xs"))).as("e"))
      .select(col("k"), col("e.day"), col("e.macd"), col("e.signal"))
    val aF = lit(2.0 / 13.0); val bF = lit(11.0 / 13.0)
    val aS = lit(2.0 / 27.0); val bS = lit(25.0 / 27.0)
    val aG = lit(2.0 / 10.0); val bG = lit(8.0 / 10.0)
    val zero = struct(
      lit(0.0).as("fast"), lit(0.0).as("slow"), lit(0.0).as("sig"),
      expr("CAST(array() AS " +
        "array<struct<day:date,macd:double,signal:double>>)").as("out"))
    val composable = series.withColumn("r",
      aggregate(col("xs"), zero, (acc, x) => {
        val first = size(acc("out")) === 0
        val f = when(first, x("c")).otherwise(aF * x("c") + bF * acc("fast"))
        val s = when(first, x("c")).otherwise(aS * x("c") + bS * acc("slow"))
        val m = f - s
        val g = when(first, lit(0.0)).otherwise(aG * m + bG * acc("sig"))
        struct(f.as("fast"), s.as("slow"), g.as("sig"),
          concat(acc("out"), array(struct(x("day").as("day"),
            m.as("macd"), g.as("signal")))).as("out"))
      }))
      .select(col("k"), explode(col("r")("out")).as("e"))
      .select(col("k"), col("e.day"), col("e.macd"), col("e.signal"))
    assertBitIdentical(native, composable)
  }

  test("holt linear fold: native == composable, bit for bit") {
    val native = series.select(col("k"),
      explode(GraftSmoothing.holtLinearFold(col("xs"))).as("e"))
      .select(col("k"), col("e.day"), col("e.level"), col("e.trend"),
        col("e.forecast_1"))
    val zero = struct(
      lit(0.0).as("lvl"), lit(0.0).as("trend"),
      expr("CAST(array() AS " +
        "array<struct<day:date,level:double,trend:double," +
        "forecast_1:double>>)").as("out"))
    val composable = series.withColumn("r",
      aggregate(col("xs"), zero, (acc, x) => {
        val first = size(acc("out")) === 0
        val l = when(first, x("c"))
          .otherwise(lit(0.5) * x("c") + lit(0.5) * (acc("lvl") + acc("trend")))
        val b = when(first, lit(0.0))
          .otherwise(lit(0.5) * (l - acc("lvl")) + lit(0.5) * acc("trend"))
        struct(l.as("lvl"), b.as("trend"),
          concat(acc("out"), array(struct(x("day").as("day"),
            l.as("level"), b.as("trend"), (l + b).as("forecast_1"))))
            .as("out"))
      }))
      .select(col("k"), explode(col("r")("out")).as("e"))
      .select(col("k"), col("e.day"), col("e.level"), col("e.trend"),
        col("e.forecast_1"))
    assertBitIdentical(native, composable)
  }

  test("holt-winters fold: native == composable, bit for bit, " +
      "incl. a shorter-than-period key") {
    val period = 7
    val native = series.select(col("k"),
      explode(GraftSmoothing.holtWintersFold(col("xs"), period)).as("e"))
      .select(col("k"), col("e.day"), col("e.level"), col("e.trend"),
        col("e.forecast_1"))
    val l0 = (aggregate(slice(col("xs"), 1, period), lit(0.0),
      (acc, x) => acc + x("c")) / period).as("l0")
    val s0 = transform(slice(col("xs"), 1, period),
      x => x("c") - col("l0")).as("s0")
    val zero = struct(
      col("l0").as("lvl"), lit(0.0).as("trend"), col("s0").as("seas"),
      expr("CAST(array() AS " +
        "array<struct<day:date,level:double,trend:double," +
        "forecast_1:double>>)").as("out"))
    val composable = series.withColumn("l0", l0).withColumn("s0", s0)
      .withColumn("r",
        aggregate(col("xs"), zero, (acc, x) => {
          val l = lit(0.5) * (x("c") - element_at(acc("seas"), 1)) +
            lit(0.5) * (acc("lvl") + acc("trend"))
          val b = lit(0.5) * (l - acc("lvl")) + lit(0.5) * acc("trend")
          val s = concat(slice(acc("seas"), 2, period - 1),
            array(lit(0.5) * (x("c") - l) +
              lit(0.5) * element_at(acc("seas"), 1)))
          struct(l.as("lvl"), b.as("trend"), s.as("seas"),
            concat(acc("out"), array(struct(x("day").as("day"),
              l.as("level"), b.as("trend"),
              (l + b + element_at(s, 1)).as("forecast_1")))).as("out"))
        }))
      .select(col("k"), explode(col("r")("out")).as("e"))
      .select(col("k"), col("e.day"), col("e.level"), col("e.trend"),
        col("e.forecast_1"))
    assertBitIdentical(native, composable)
  }

  test("heikin-ashi fold: native == composable, bit for bit") {
    // per-day OHLC struct input: derive four deterministic prices per day
    val candles = spark.range(3L * nDays)
      .select((col("id") % 3).as("k"),
        date_add(lit("2020-01-01").cast("date"),
          (col("id") / 3).cast("int")).as("day"),
        ((col("id") * 31L) % 997).cast("double").as("o"),
        ((col("id") * 37L) % 997 + 1000).cast("double").as("h"),
        ((col("id") * 41L) % 499).cast("double").as("l"),
        ((col("id") * 43L) % 997).cast("double").as("c"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("day"), col("o"), col("h"),
        col("l"), col("c")))).as("xs"))
    val native = candles.select(col("k"),
      explode(GraftSmoothing.heikinAshiFold(col("xs"))).as("e"))
      .select(col("k"), col("e.day"), col("e.ha_open"), col("e.ha_close"),
        col("e.ha_high"), col("e.ha_low"))
    val zero = struct(
      lit(0.0).as("ho"), lit(0.0).as("hc"),
      expr("CAST(array() AS array<struct<day:date,ha_open:double," +
        "ha_close:double,ha_high:double,ha_low:double>>)").as("out"))
    val composable = candles.withColumn("r",
      aggregate(col("xs"), zero, (acc, x) => {
        val first = size(acc("out")) === 0
        val hc = (x("o") + x("h") + x("l") + x("c")) / 4.0
        val ho = when(first, x("o"))
          .otherwise((acc("ho") + acc("hc")) / 2.0)
        struct(ho.as("ho"), hc.as("hc"),
          concat(acc("out"), array(struct(x("day").as("day"),
            ho.as("ha_open"), hc.as("ha_close"),
            greatest(x("h"), ho, hc).as("ha_high"),
            least(x("l"), ho, hc).as("ha_low")))).as("out"))
      }))
      .select(col("k"), explode(col("r")("out")).as("e"))
      .select(col("k"), col("e.day"), col("e.ha_open"), col("e.ha_close"),
        col("e.ha_high"), col("e.ha_low"))
    assertBitIdentical(native, composable)
  }
}

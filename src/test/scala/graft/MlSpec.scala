package graft

import org.apache.spark.ml.feature.{Imputer, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.functions._

import graft.ml.Baselines
import graft.ops.{Aggregates, Rollups}

/** The reference's modelling stack (`src/modelling/train.py:36-95`)
  * mapped to Spark: naive mean < linear closed form < GBTRegressor on
  * learnable data, with `ml.feature.Imputer` matching our exact
  * median-impute operator (SURVEY §2.11).
  */
class MlSpec extends SparkSpecBase {
  import spark.implicits._

  test("linearFit recovers exact coefficients on noiseless data") {
    val df = (1 to 50).map(i => ("g", i.toDouble, 3.0 * i + 7.0))
      .toDF("g", "x", "y")
    val fit = Baselines.linearFit(df, Seq(col("g")), col("x"), col("y"))
      .first()
    assert(fit.getAs[Double]("slope") == 3.0)
    assert(fit.getAs[Double]("intercept") == 7.0)
    assert(fit.getAs[Long]("n") == 50L)
  }

  test("GBT beats the naive mean baseline on learnable data") {
    val df = Tables.lineitem(spark, sf())
      .select(col("l_quantity").as("x"),
        (col("l_quantity") * 900.0 + col("l_discount") * 100.0).as("y"),
        col("l_discount").as("x2"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("x", "x2")).setOutputCol("features")
      .transform(df)
    val model = new GBTRegressor().setLabelCol("y").setMaxIter(10)
      .setMaxDepth(4).setSeed(42).fit(assembled)
    val pred = model.transform(assembled)
    val gbtMae = Aggregates.regressionMetrics(pred, col("y"),
      col("prediction")).first().getAs[Double]("mae")
    val naiveMae = Baselines.naiveMeanMetrics(df, col("y"))
      .first().getAs[Double]("mae")
    assert(gbtMae < naiveMae / 2,
      s"GBT mae $gbtMae should beat naive mae $naiveMae")
  }

  test("ml.feature.Imputer(median) agrees with Aggregates.medianImpute") {
    val df = Seq(Some(1.0), Some(2.0), Some(9.0), None)
      .toDF("x").withColumn("g", lit("a"))
    val viaImputer = new Imputer().setStrategy("median")
      .setInputCols(Array("x")).setOutputCols(Array("imp"))
      .fit(df).transform(df)
      .agg(sum("imp")).first().getDouble(0)
    val viaOp = Aggregates.medianImpute(df, col("g"), col("x"), "imp")
      .agg(sum("imp")).first().getDouble(0)
    assert(viaImputer == viaOp) // both impute the exact median 2.0
  }

  test("rollup refreshMerge repairs the stale window exactly") {
    val e = Tables.events(spark, sf())
    val winStart = lit("2024-01-02 00:00:00").cast("timestamp_ntz")
    val winEnd = lit("2024-03-01 00:00:00").cast("timestamp_ntz")
    val stale = Aggregates.timeBucketAgg(
      e.filter(col("ts") < winStart || col("event_id") % 3 =!= 0),
      col("ts"), "1 hour", Seq(col("event_type")), col("value"))
    val merged = Rollups.refreshMerge(stale, e, col("ts"), "1 hour",
      Seq(col("event_type")), col("value"), winStart, winEnd)
    val full = Aggregates.timeBucketAgg(e, col("ts"), "1 hour",
      Seq(col("event_type")), col("value"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }
}

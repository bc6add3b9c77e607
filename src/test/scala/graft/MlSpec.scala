package graft

import org.apache.spark.ml.feature.{Imputer, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.functions._

import graft.ml.{Baselines, KMeans}
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

  test("model persistence: save → load → identical predictions") {
    // the reference's joblib round-trip test family
    // (src/testing/unittests/test_model.py, docs/req.md:418-422):
    // persisted model must predict exactly like the in-memory one
    val df = Tables.lineitem(spark, sf())
      .select(col("l_quantity").as("x"),
        (col("l_quantity") * 900.0 + col("l_discount") * 100.0).as("y"),
        col("l_discount").as("x2"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("x", "x2")).setOutputCol("features")
      .transform(df)
    val model = new GBTRegressor().setLabelCol("y").setMaxIter(5)
      .setMaxDepth(3).setSeed(42).fit(assembled)
    val tmp = java.nio.file.Files.createTempDirectory("graft_model").toString
    model.write.overwrite().save(s"$tmp/gbt")
    val reloaded = org.apache.spark.ml.regression.GBTRegressionModel
      .load(s"$tmp/gbt")
    val diff = model.transform(assembled)
      .select(col("x"), col("x2"), col("prediction").as("p1"))
      .join(reloaded.transform(assembled)
        .select(col("x"), col("x2"), col("prediction").as("p2")),
        Seq("x", "x2"))
      .filter(col("p1") =!= col("p2")).count()
    assert(diff == 0L, "reloaded model must predict bit-identically")
  }

  test("metrics JSON artifact matches the reference shape") {
    import graft.ml.MetricsJson
    import graft.ml.MetricsJson.RegMetrics
    val df = Seq((10.0, 12.0), (20.0, 19.0), (30.0, 33.0))
      .toDF("y", "pred")
    val m = MetricsJson.fromRow(
      Aggregates.regressionMetrics(df, col("y"), col("pred")))
    assert(m.mae == 2.0)
    val naive = MetricsJson.fromRow(
      Baselines.naiveMeanMetrics(df, col("y")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_mx").toString
    val path = MetricsJson.save(
      Seq("naive" -> naive, "xgb" -> m), "metrics", tmp, "20260319")
    assert(path.getFileName.toString == "metrics_20260319.json")
    // artifact parses back and round-trips the values (reference shape:
    // model name → {mae, rmse, mape}, models/metrics_20260319.json:2-16)
    val parsed = spark.read.option("multiLine", true)
      .json(path.toString)
    assert(parsed.columns.sorted.toSeq == Seq("naive", "xgb"))
    val row = parsed.select(col("xgb.mae"), col("xgb.rmse"),
      col("naive.mae")).first()
    assert(row.getDouble(0) == m.mae && row.getDouble(1) == m.rmse)
    assert(row.getDouble(2) == naive.mae)
    // quality gate: warn above threshold, silent below (evaluate.py:126)
    assert(MetricsJson.checkLoadQuality(
      Map("model_load" -> RegMetrics(1, 1, 9.5))).isDefined)
    assert(MetricsJson.checkLoadQuality(
      Map("model_load" -> RegMetrics(1, 1, 7.9))).isEmpty)
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

  test("exactDistinctMerged: union beats the naive sum on returning members") {
    // user 10 active both days of the week: exact = 2 uniques, naive = 3
    val df = Seq(
      ("t", 1, 100, 10L), ("t", 1, 100, 11L), ("t", 2, 100, 10L),
      ("t", 8, 101, 10L)
    ).toDF("dim", "day", "wk", "u")
    val got = Rollups.exactDistinctMerged(df, col("dim"), col("day"),
        col("wk"), col("u"))
      .orderBy("bucket")
      .select("bucket", "exact_uniques", "naive_sum_uniques")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got === Seq((100, 2L, 3L), (101, 1L, 1L)))
  }

  test("KMeans: seeds, one-round assignment, and the recompute round by hand") {
    // 1-d vectors; stride 2 → seeds id0=[0] (cid 1), id2=[1] (cid 2)
    val df = Seq((0L, Seq(0.0)), (1L, Seq(10.0)), (2L, Seq(1.0)),
      (3L, Seq(11.0)), (4L, Seq(2.0)), (5L, Seq(12.0)))
      .toDF("vec_id", "qv")
    // iters=1: nearest seed — id4 is closer to [1] than [0]
    val a1 = KMeans.assignIterations(df, col("vec_id"), col("qv"),
      k = 2, stride = 2, iters = 1)
      .orderBy("vec_id").as[(Long, Int, Double)].collect().toSeq
    assert(a1.map(r => r._1 -> r._2) ===
      Seq(0L -> 1, 1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2))
    // iters=2: c1=[0], c2=mean(10,1,11,2,12)=[7.2] → ids 0,2,4 go to c1
    val a2 = KMeans.assignIterations(df, col("vec_id"), col("qv"),
      k = 2, stride = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Int, Double)].collect().toSeq
    assert(a2.map(r => r._1 -> r._2) ===
      Seq(0L -> 1, 1L -> 2, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2))
    assert(a2.find(_._1 == 1L).get._3 === 7.84) // (10 − 7.2)²
  }
}

package graft.ml

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.feature.{Imputer, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, ScalableRank}

/** Runnable Model-A training job — the reference's §3.2 export →
  * train → evaluate → gate flow as one Spark entry point
  * (`src/processing/export_pipeline.py:563-660` `run_load_export` +
  * `src/modelling/train.py:123-247` `train_load_model` /
  * `run_load_training`, gate `src/modelling/evaluate.py:126-146`).
  *
  * Two phases, same file contract as the reference so each phase can
  * also run standalone against the other engine's artifacts:
  *
  *  1. [[runLoadExport]] — feature view → target dropna → leakage
  *     validation → chronological 70/15/15 split
  *     ([[ScalableRank.chronoSplitThreeWay]]; bucket-offset global
  *     numbering, NO global sort) → `X_{train,val,test}.parquet` +
  *     `y_{train,val,test}.parquet`. One deviation from the pandas
  *     exports, made for scale: X and y files both carry the `time`
  *     key instead of relying on implicit row order — parquet row
  *     order is not a join key on a cluster.
  *  2. [[runLoadTraining]] — reads the exports back, trains the
  *     reference's three models (naive mean / linear / boosted trees),
  *     persists each under `<modelsDir>/<name>_<stamp>`, evaluates on
  *     the test split (masked MAPE, `evaluate.py:51`), writes the
  *     `metrics_load_<stamp>.json` artifact ([[MetricsJson]]) and
  *     emits the MAPE>8% quality warning (`evaluate.py:17,126-146`).
  *
  * Model mapping (public Spark ML, `org.apache.spark.ml.regression`):
  *  - DummyRegressor(mean) → the train-target mean, persisted as a
  *    one-line JSON artifact (a constant predictor has no Spark model
  *    class; predictions are `lit(mean)`).
  *  - LinearRegression → `ml.regression.LinearRegression` over
  *    median-imputed features (reference fills NaN with the median,
  *    then 0 — `train.py:42-47`; `ml.feature.Imputer` is the median
  *    step, the 0-fallback covers all-null columns).
  *  - XGBRegressor(n_estimators=300, lr=0.05, max_depth=7,
  *    subsample=0.8, colsample_bytree=0.8, seed=42,
  *    early_stopping_rounds on val) → `GBTRegressor` with maxIter /
  *    stepSize / maxDepth / subsamplingRate / featureSubsetStrategy /
  *    seed mapped 1:1 and `validationIndicatorCol` early stopping
  *    when the val split exists. One deviation: XGBoost routes NaN
  *    natively per split; Spark's GBT does not accept NaN, so the GBT
  *    consumes the same median-imputed features as the linear model.
  */
object TrainJob {

  /** `export_pipeline.py:374`. */
  val LoadTargetCol = "net_load_kwh"

  /** `export_pipeline.py:376-397` LOAD_FEATURE_COLS, restricted to the
    * columns the events-synthesized feature view carries (the two
    * Python-computed holiday flags are produced by the §2.3
    * holiday-ranges join in deployments that have a holiday table).
    */
  val LoadFeatureCols: Seq[String] = Seq(
    "load_lag_1h", "load_lag_1d", "load_lag_7d", "load_rolling_avg_24h",
    "hour", "weekday", "month", "quarter", "is_weekend",
    "temp_c", "wind_speed_ms", "ghi_wm2", "cloud_cover_pct",
    "precipitation_mm", "pv_feed_in")

  /** `export_pipeline.py:96-126` `validate_no_leakage`: the target and
    * the operational `api_call_log` columns must never be features.
    */
  def validateNoLeakage(featureCols: Seq[String], targetCol: String): Unit = {
    require(!featureCols.contains(targetCol),
      s"Data leakage detected: target column '$targetCol' is present " +
        "in feature_cols. Remove it before training.")
    val apiCallLogCols = Set("id", "source", "called_at", "status_code",
      "was_rate_limited", "response_ms", "date_fetched")
    val leaked = apiCallLogCols.intersect(featureCols.toSet)
    require(leaked.isEmpty,
      s"Isolation violation: api_call_log column(s) $leaked found in " +
        "feature_cols. api_call_log is operational metadata and must " +
        "never be used as an ML feature.")
  }

  /** Phase 1: split the feature view chronologically and write the six
    * X/y parquet exports. Returns the data directory.
    */
  def runLoadExport(
      features: DataFrame,
      dataDir: String,
      valRatio: Double = 0.15,
      testRatio: Double = 0.15): String = {
    validateNoLeakage(LoadFeatureCols, LoadTargetCol)
    val clean = features.filter(col(LoadTargetCol).isNotNull)
    val split = ScalableRank.chronoSplitThreeWay(clean,
      date_trunc("month", col("time")), Seq(col("time")),
      valRatio, testRatio)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (part <- Seq("train", "val", "test")) {
        val p = split.filter(col("split") === part)
        p.select(col("time") +:
            LoadFeatureCols.map(c => col(c).cast("double").as(c)): _*)
          .write.mode("overwrite").parquet(s"$dataDir/X_$part.parquet")
        p.select(col("time"), col(LoadTargetCol).cast("double"))
          .write.mode("overwrite").parquet(s"$dataDir/y_$part.parquet")
      }
    } finally split.unpersist()
    dataDir
  }

  case class TrainResult(
      metrics: Seq[(String, MetricsJson.RegMetrics)],
      modelPaths: Map[String, String],
      metricsPath: Option[String],
      qualityWarning: Option[String])

  private def readXy(spark: SparkSession, dataDir: String,
      part: String): Option[DataFrame] = {
    val x = Paths.get(s"$dataDir/X_$part.parquet")
    val y = Paths.get(s"$dataDir/y_$part.parquet")
    if (!Files.exists(x) || !Files.exists(y)) None
    else Some(spark.read.parquet(x.toString)
      .join(spark.read.parquet(y.toString), Seq("time")))
  }

  /** Phase 2: read the exports, train the three models, persist, and
    * (when the test split exists) evaluate + write the metrics
    * artifact + run the quality gate.
    */
  def runLoadTraining(
      spark: SparkSession,
      dataDir: String,
      modelsDir: String,
      stamp: String,
      maxIter: Int = 300): TrainResult = {
    val train = readXy(spark, dataDir, "train").getOrElse(
      throw new java.io.FileNotFoundException(
        s"Load training parquet files not found in '$dataDir'. " +
          "Run runLoadExport first."))
    val valDf = readXy(spark, dataDir, "val")
    val test = readXy(spark, dataDir, "test")
    Files.createDirectories(Paths.get(modelsDir))

    // Median imputation fitted on TRAIN ONLY (no test leakage), then
    // the reference's fillna(0) fallback for all-null columns.
    val impCols = LoadFeatureCols.map(_ + "_imp").toArray
    val imputer = new Imputer().setStrategy("median")
      .setInputCols(LoadFeatureCols.toArray).setOutputCols(impCols)
      .fit(train)
    val assembler = new VectorAssembler()
      .setInputCols(impCols).setOutputCol("features")
    def prep(df: DataFrame): DataFrame =
      assembler.transform(
        imputer.transform(df).na.fill(0.0, impCols.toIndexedSeq))
    val trainP = prep(train)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 1. Naive mean predictor (DummyRegressor(strategy="mean")).
    val trainMean = train.agg(avg(col(LoadTargetCol))).head().getDouble(0)
    val naivePath = s"$modelsDir/naive_load_$stamp.json"
    Files.writeString(Paths.get(naivePath),
      s"""{"model": "naive_load", "strategy": "mean", "mean": $trainMean}""")

    // 2. Linear baseline.
    val linear = new LinearRegression().setLabelCol(LoadTargetCol)
      .setFeaturesCol("features").fit(trainP)
    val linearPath = s"$modelsDir/linear_load_$stamp"
    linear.write.overwrite().save(linearPath)

    // 3. Boosted trees (the XGBRegressor role), early-stopped on the
    // val split when present (train.py:123-167).
    val gbtBase = new GBTRegressor().setLabelCol(LoadTargetCol)
      .setFeaturesCol("features").setMaxIter(maxIter).setStepSize(0.05)
      .setMaxDepth(7).setSubsamplingRate(0.8)
      .setFeatureSubsetStrategy("0.8").setMinInstancesPerNode(3)
      .setSeed(42)
    val gbt = valDf match {
      case Some(v) =>
        val both = trainP.withColumn("__is_val", lit(false))
          .unionByName(prep(v).withColumn("__is_val", lit(true)))
        gbtBase.setValidationIndicatorCol("__is_val").fit(both)
      case None => gbtBase.fit(trainP)
    }
    val gbtPath = s"$modelsDir/model_load_$stamp"
    gbt.write.overwrite().save(gbtPath)
    trainP.unpersist()

    val paths = Map("naive_load" -> naivePath, "linear_load" -> linearPath,
      "model_load" -> gbtPath)

    // Evaluate on test when available (train.py:236-246): masked MAPE
    // (|y| ≥ 10 only, evaluate.py:51) via Aggregates.regressionMetrics.
    test match {
      case Some(t) =>
        val tp = prep(t)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def metricsOf(pred: DataFrame): MetricsJson.RegMetrics =
          MetricsJson.fromRow(Aggregates.regressionMetrics(
            pred, col(LoadTargetCol), col("prediction")))
        val metrics = Seq(
          "naive_load" -> metricsOf(tp.withColumn("prediction", lit(trainMean))),
          "linear_load" -> metricsOf(linear.transform(tp)),
          "model_load" -> metricsOf(gbt.transform(tp)))
        tp.unpersist()
        val mPath = MetricsJson.save(metrics, "metrics_load", modelsDir, stamp)
        val warning = MetricsJson.checkLoadQuality(metrics.toMap)
        TrainResult(metrics, paths, Some(mPath.toString), warning)
      case None => TrainResult(Nil, paths, None, None)
    }
  }

  /** CLI: `TrainJob [sfDir] [outDir] [maxIter]`. Builds the net-load
    * feature view from the events table (the same construction the
    * correctness-gated `feature_net_load_view` query runs), exports,
    * trains, evaluates, prints the metrics artifact path and any
    * quality warning.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else Files.createTempDirectory("graft_trainjob").toString
    val maxIter = if (args.length > 2) args(2).toInt else 300
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-train-load").getOrCreate()
    try {
      val stamp = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
      val features =
        graft.SparkEntry.queries("feature_net_load_view")(spark, sfDir)
      val dataDir = runLoadExport(features, s"$outDir/data")
      val res = runLoadTraining(spark, dataDir, s"$outDir/models", stamp,
        maxIter)
      res.metrics.foreach { case (name, m) =>
        println(f"$name%-12s mae=${m.mae}%.3f rmse=${m.rmse}%.3f " +
          f"mape=${m.mape}%.2f%%")
      }
      res.metricsPath.foreach(p => println(s"Saved metrics: $p"))
      res.modelPaths.toSeq.sortBy(_._1).foreach { case (n, p) =>
        println(s"Saved $n: $p")
      }
      res.qualityWarning.foreach(w => println(s"WARNING: $w"))
    } finally spark.stop()
  }
}

package graft.ml

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Row}

/** Metrics JSON artifact writer (SURVEY §7.1 module 8; reference
  * `src/modelling/evaluate.py:98-124` `save_metrics`, artifact shape
  * `models/metrics_20260319.json:2-16`): persists a
  * model-name → {mae, rmse, mape} map as
  * `<dir>/<name>_<stamp>.json`, plus the reference's load-quality gate
  * (`evaluate.py:126-146` `check_load_quality`).
  *
  * The metrics themselves come from one-row DataFrames as produced by
  * `Aggregates.regressionMetrics` / `Baselines.naiveMeanMetrics` —
  * driver-side here is only the final one-row-per-model collect and the
  * file write, exactly like the reference.
  */
object MetricsJson {

  /** Model A MAPE quality threshold, `evaluate.py:17`. */
  val LoadMapeThreshold: Double = 8.0

  case class RegMetrics(mae: Double, rmse: Double, mape: Double)

  /** Extracts {mae, rmse, mape} from a one-row metrics DataFrame
    * (missing columns → NaN, matching the reference's NaN-tolerant
    * handling).
    */
  def fromRow(df: DataFrame): RegMetrics = {
    val row: Row = df.first()
    def get(name: String): Double =
      if (!row.schema.fieldNames.contains(name) || row.isNullAt(
          row.fieldIndex(name))) Double.NaN
      else row.getAs[Double](name)
    RegMetrics(get("mae"), get("rmse"), get("mape"))
  }

  /** JSON rendering matching `json.dump(metrics, indent=2)` closely
    * enough to round-trip: 2-space indent, insertion order preserved,
    * NaN emitted as `NaN` (the reference uses Python's default
    * `allow_nan=True`, which does the same).
    */
  def render(metrics: Seq[(String, RegMetrics)]): String = {
    def num(d: Double): String =
      if (d.isNaN) "NaN" else d.toString
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    metrics.map { case (rawName, m) =>
      val name = esc(rawName)
      s"""  "$name": {
         |    "mae": ${num(m.mae)},
         |    "rmse": ${num(m.rmse)},
         |    "mape": ${num(m.mape)}
         |  }""".stripMargin
    }.mkString("{\n", ",\n", "\n}")
  }

  /** Writes `<dir>/<name>_<stamp>.json` (the reference stamps UTC
    * YYYYMMDD; the stamp is a parameter here so jobs are reproducible).
    * Returns the written path.
    */
  def save(
      metrics: Seq[(String, RegMetrics)],
      name: String,
      dir: String,
      stamp: String): Path = {
    val out = Paths.get(dir)
    Files.createDirectories(out)
    val path = out.resolve(s"${name}_$stamp.json")
    Files.writeString(path, render(metrics))
    path
  }

  /** The reference's load-quality gate: Some(warning) when the
    * `model_load` MAPE exceeds the threshold — a warning, not an error,
    * so training DAGs continue and the model still saves.
    */
  def checkLoadQuality(
      metrics: Map[String, RegMetrics]): Option[String] =
    metrics.get("model_load")
      .map(_.mape)
      .filter(m => !m.isNaN && m > LoadMapeThreshold)
      .map(m => f"Model A MAPE=$m%.2f%% exceeds quality threshold of " +
        f"$LoadMapeThreshold%.0f%%. Consider retraining or collecting " +
        "more load/PV data.")
}

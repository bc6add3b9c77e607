package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.MetricsJson

/** Pins the committed sf1 TrainJob artifacts
  * (`models/metrics_20260814.json`, `models/metrics_load_20260814
  * .json` — produced by `graft.ml.TrainJob.main` over
  * `testdata_sf1`, reference artifact shape
  * `models/metrics_20260319.json:2-16`) to the cross-model invariants
  * actually measured:
  *
  *  - every learned model beats the naive mean predictor on MAE and
  *    MAPE for BOTH model families;
  *  - the Model A quality gate (`evaluate.py:17,126-146`: MAPE > 8% →
  *    warning, not error) fires on this corpus, same shape as the
  *    reference's own committed runs warn on theirs.
  *
  * Deliberately NOT asserted: GBT beating linear. On this synthetic
  * corpus the target is linear-dominated (the generator derives it
  * from affine feature combinations plus noise), so LinearRegression
  * is the Bayes-ish fit and trees can only approximate it piecewise —
  * the reference's own `xgb` loses to `linear` on Model B MAPE in both
  * committed runs (BASELINE.md: 9.303%/10.552% vs 8.696%/9.231%), so
  * "GBT beats linear" is not an invariant even on their real data.
  * GBT-beats-naive on learnable nonlinear data is covered separately
  * in MlSpec.
  */
class Sf1MetricsArtifactSpec extends AnyFunSuite {

  private def parse(path: String): Map[String, MetricsJson.RegMetrics] = {
    val p = Paths.get(path)
    assert(Files.exists(p), s"missing committed artifact $path")
    val txt = Files.readString(p)
    val block = ("\"([a-z_]+)\":\\s*\\{\\s*\"mae\":\\s*([-0-9.eE]+)," +
      "\\s*\"rmse\":\\s*([-0-9.eE]+),\\s*\"mape\":\\s*([-0-9.eE]+)").r
    block.findAllMatchIn(txt).map(m =>
      m.group(1) -> MetricsJson.RegMetrics(m.group(2).toDouble,
        m.group(3).toDouble, m.group(4).toDouble)).toMap
  }

  test("sf1 energy metrics: learned models beat naive; all finite") {
    val m = parse("models/metrics_20260814.json")
    assert(m.keySet == Set("naive", "linear", "xgb"))
    m.values.foreach { r =>
      assert(!r.mae.isNaN && r.mae > 0)
      assert(!r.rmse.isNaN && r.rmse >= r.mae * 0.999)
      assert(!r.mape.isNaN && r.mape > 0)
    }
    assert(m("linear").mae < m("naive").mae)
    assert(m("linear").mape < m("naive").mape)
    assert(m("xgb").mae < m("naive").mae)
    assert(m("xgb").mape < m("naive").mape)
  }

  test("sf1 load metrics: learned models beat naive; gate warns >8%") {
    val m = parse("models/metrics_load_20260814.json")
    assert(m.keySet == Set("naive_load", "linear_load", "model_load"))
    m.values.foreach { r =>
      assert(!r.mae.isNaN && r.mae > 0)
      assert(!r.rmse.isNaN && r.rmse > 0)
      assert(!r.mape.isNaN && r.mape > 0)
    }
    assert(m("linear_load").mae < m("naive_load").mae)
    assert(m("linear_load").mape < m("naive_load").mape)
    assert(m("model_load").mae < m("naive_load").mae)
    assert(m("model_load").mape < m("naive_load").mape)
    // the measured Model A MAPE (10.04%) exceeds the 8% threshold →
    // the gate must produce the reference's warning (and only warn:
    // training completed and the artifacts exist)
    val warn = MetricsJson.checkLoadQuality(m)
    assert(warn.exists(_.contains("exceeds quality threshold")))
  }
}

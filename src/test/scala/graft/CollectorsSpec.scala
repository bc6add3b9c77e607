package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.sources.{Collectors, CsvMulti}

/** Fixture-payload parser tests mirroring the reference's collector unit
  * tests (FIXTURES.md; reference `src/testing/conftest.py:16-173`).
  * Payloads are byte-identical to the fixtures; assertions check row
  * counts, timestamp correctness incl. CET→UTC, value extraction, unit
  * filtering, and empty-payload behavior.
  */
class CollectorsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ldt(s: String): LocalDateTime = LocalDateTime.parse(s)

  test("ENTSO-E A44 XML: point expansion start + (pos-1)*PT60M") {
    val xml =
      """<Publication_MarketDocument xmlns="urn:iec62325.351:tc57wg16:451-3:publicationdocument:7:3">
        |  <TimeSeries>
        |    <currency_Unit.name>EUR</currency_Unit.name>
        |    <Period>
        |      <timeInterval><start>2026-02-28T00:00Z</start><end>2026-02-28T02:00Z</end></timeInterval>
        |      <resolution>PT60M</resolution>
        |      <Point><position>1</position><price.amount>85.50</price.amount></Point>
        |      <Point><position>2</position><price.amount>92.10</price.amount></Point>
        |    </Period>
        |  </TimeSeries>
        |</Publication_MarketDocument>""".stripMargin
    val got = Collectors.parseEntsoeDayAhead(
      Seq(xml).toDF("xml"), col("xml"), "10YCH-SWISSGRIDZ")
      .orderBy("time").collect()
    assert(got.length == 2)
    assert(got(0).getAs[LocalDateTime]("time") == ldt("2026-02-28T00:00"))
    assert(got(1).getAs[LocalDateTime]("time") == ldt("2026-02-28T01:00"))
    assert(got(0).getAs[Double]("price_eur_mwh") == 85.50)
    assert(got(1).getAs[Double]("price_eur_mwh") == 92.10)
    assert(got(0).getAs[String]("currency") == "EUR")
    assert(got(0).getAs[String]("domain") == "10YCH-SWISSGRIDZ")
  }

  test("ENTSO-E empty document yields zero rows") {
    val got = Collectors.parseEntsoeDayAhead(
      Seq("<Publication_MarketDocument/>").toDF("xml"), col("xml"), "X")
    assert(got.count() == 0)
  }

  test("open-meteo columnar JSON zips parallel arrays; naive = UTC") {
    val json =
      """{"latitude": 47.5001, "longitude": 8.7502,
        | "hourly": {"time": ["2026-02-28T00:00", "2026-02-28T01:00"],
        |            "temperature_2m": [3.5, 4.1], "wind_speed_10m": [12.3, 14.0],
        |            "shortwave_radiation": [0.0, 0.0], "cloud_cover": [80, 75],
        |            "precipitation": [0.0, 0.2]}}""".stripMargin
    val got = Collectors.parseOpenMeteo(Seq(json).toDF("js"), col("js"))
      .orderBy("time").collect()
    assert(got.length == 2)
    assert(got(0).getAs[LocalDateTime]("time") == ldt("2026-02-28T00:00"))
    assert(got(0).getAs[Double]("latitude") == 47.5001)
    assert(got(0).getAs[Double]("temperature_2m") == 3.5)
    assert(got(1).getAs[Double]("precipitation_mm") == 0.2)
    assert(got(1).getAs[Double]("cloud_cover") == 75.0)
  }

  test("EKZ tariff JSON: unit filter + CET->UTC + per-component rows") {
    val json =
      """{"prices": [
        |  {"start_timestamp": "2026-02-28T00:00:00+01:00",
        |   "end_timestamp":   "2026-02-28T00:15:00+01:00",
        |   "electricity": [{"unit": "CHF_m", "value": 3.0}, {"unit": "CHF_kWh", "value": 0.1192}]},
        |  {"start_timestamp": "2026-02-28T00:00:00+01:00",
        |   "end_timestamp":   "2026-02-28T00:15:00+01:00",
        |   "integrated": [{"unit": "CHF_m", "value": 3.0}, {"unit": "CHF_kWh", "value": 0.2352}]}]}"""
        .stripMargin
    val got = Collectors.parseTariff(Seq(json).toDF("js"), col("js"),
      Seq("electricity", "integrated")).orderBy("tariff_type").collect()
    assert(got.length == 2) // CHF_m rows dropped
    assert(got(0).getAs[LocalDateTime]("time") == ldt("2026-02-27T23:00"))
    assert(got(0).getAs[String]("tariff_type") == "electricity")
    assert(got(0).getAs[Double]("price_chf_kwh") == 0.1192)
    assert(got(1).getAs[Double]("price_chf_kwh") == 0.2352)
  }

  test("BAFU kv JSON pivots flow/height into one wide row") {
    val json =
      """{"payload": [
        |  {"timestamp": 1772236800, "loc": "2018", "par": "flow",   "val": 245.3},
        |  {"timestamp": 1772236800, "loc": "2018", "par": "height", "val": 322.1},
        |  {"timestamp": 1772240400, "loc": "2018", "par": "flow",   "val": 243.8},
        |  {"timestamp": 1772240400, "loc": "2018", "par": "height", "val": 321.9}]}"""
        .stripMargin
    val got = Collectors.parseBafu(Seq(json).toDF("js"), col("js"))
      .orderBy("time").collect()
    assert(got.length == 2)
    assert(got(0).getAs[LocalDateTime]("time") == ldt("2026-02-28T00:00"))
    assert(got(0).getAs[String]("station_id") == "2018")
    assert(got(0).getAs[Double]("discharge_m3s") == 245.3)
    assert(got(0).getAs[Double]("level_masl") == 322.1)
    assert(got(1).getAs[Double]("discharge_m3s") == 243.8)
  }

  test("Stadtwerk CSVs: +0100 offsets, category filter, multi-file union") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sw").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/brutto.csv"),
      "zeitpunkt,bruttolastgang_kwh\n2022-01-01T00:15:00+0100,1234.5\nbad,,\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/pv.csv"),
      "zeitpunkt,energietraeger,lastgang_kwh\n" +
        "2022-01-01T00:15:00+0100,photovoltaik,321.0\n" +
        "2022-01-01T00:15:00+0100,thermisch,100.0\n")
    val load = Collectors.parseBruttolastgang(
      spark.read.option("header", "true").csv(s"$tmp/brutto.csv")).collect()
    assert(load.length == 1) // malformed row skipped
    assert(load(0).getAs[LocalDateTime]("time") == ldt("2021-12-31T23:15"))
    assert(load(0).getAs[Double]("load_kwh") == 1234.5)
    val pv = Collectors.parseNetzeinspeisung(
      spark.read.option("header", "true").csv(s"$tmp/pv.csv")).collect()
    assert(pv.length == 1) // thermisch filtered out
    assert(pv(0).getAs[Double]("pv_kwh") == 321.0)

    // header-flexible multi-file union (column orders differ)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/m1.csv"), "a,b\n1,x\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/m2.csv"), "b,a\ny,2\n")
    val multi = CsvMulti.read(spark, Seq(s"$tmp/m1.csv", s"$tmp/m2.csv"))
    assert(multi.count() == 2)
    assert(multi.select("a").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }
}

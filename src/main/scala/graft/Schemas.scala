package graft

import org.apache.spark.sql.types._

/** Declared schemas for the reference's 13 base tables (SURVEY.md §1.2,
  * reference `infra/db/init.sql`). TIMESTAMPTZ → TimestampNTZ under the
  * always-UTC session convention; DOUBLE PRECISION → DoubleType; TEXT →
  * StringType. Schemas are declared, not inferred (§1.3).
  */
object Schemas {
  private def ts = StructField("time", TimestampNTZType, nullable = false)
  private def d(n: String) = StructField(n, DoubleType)
  private def s(n: String) = StructField(n, StringType)

  val entsoeDayAheadPrices: StructType =
    StructType(Seq(ts, s("domain"), d("price_eur_mwh"), s("currency")))

  val weatherHourly: StructType = StructType(Seq(ts,
    d("latitude"), d("longitude"), d("temperature_2m"), d("wind_speed_10m"),
    d("shortwave_radiation"), d("cloud_cover"), d("precipitation_mm")))

  val ekzTariffsRaw: StructType =
    StructType(Seq(ts, s("tariff_type"), d("price_chf_kwh")))
  val ckwTariffsRaw: StructType = ekzTariffsRaw
  val groupeETariffsRaw: StructType = ekzTariffsRaw

  val bafuHydro: StructType =
    StructType(Seq(ts, s("station_id"), d("discharge_m3s"), d("level_masl")))

  val entsoeActualLoad: StructType =
    StructType(Seq(ts, s("domain"), d("load_mwh")))
  val entsoeLoadForecast: StructType = entsoeActualLoad

  val entsoeGeneration: StructType =
    StructType(Seq(ts, s("domain"), s("psr_type"), d("quantity_mwh")))

  val entsoeCrossborderFlows: StructType =
    StructType(Seq(ts, s("in_domain"), s("out_domain"), d("flow_mwh")))

  val apiCallLog: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("called_at", TimestampNTZType),
    s("source"), StructField("status_code", IntegerType),
    StructField("was_rate_limited", BooleanType),
    StructField("response_ms", IntegerType), s("date_fetched")))

  val winterthurLoad: StructType = StructType(Seq(ts, d("load_kwh")))
  val winterthurPv: StructType = StructType(Seq(ts, d("pv_kwh")))
}

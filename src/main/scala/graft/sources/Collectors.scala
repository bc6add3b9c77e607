package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-faithful payload parsers for the five external sources
  * (SURVEY.md §2.1, fixtures in FIXTURES.md). Each consumes a DataFrame
  * of raw payload strings — one document per row, the shape a distributed
  * fetch lands — and emits rows in the reference's table schemas
  * (graft.Schemas). Pure `from_json`/regex/array expressions throughout.
  */
object Collectors {

  /** Naive-or-offset ISO timestamp → UTC-naive. Offset-less strings are
    * assumed UTC (reference `transformers.py:14-30`); `try_to_timestamp`
    * skips malformed values instead of throwing under ANSI mode.
    */
  private def toUtcNtz(c: Column): Column =
    try_to_timestamp(c).cast("timestamp_ntz")

  /** open-meteo hourly JSON (`openmeteo_collector.py:93-124`): columnar
    * parallel arrays zipped into rows; naive times are UTC already;
    * missing array slots become null (`_safe_float`).
    */
  def parseOpenMeteo(raw: DataFrame, jsonCol: Column): DataFrame = {
    val measures = Seq("temperature_2m", "wind_speed_10m",
      "shortwave_radiation", "cloud_cover", "precipitation")
    val hourly = StructType(
      StructField("time", ArrayType(StringType)) +:
        measures.map(m => StructField(m, ArrayType(DoubleType))))
    val schema = StructType(Seq(
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("hourly", hourly)))
    raw
      .withColumn("__doc", from_json(jsonCol, schema))
      .select(col("__doc.latitude").as("latitude"),
        col("__doc.longitude").as("longitude"),
        explode(arrays_zip(
          (col("__doc.hourly.time") +:
            measures.map(m => col(s"__doc.hourly.$m"))): _*)).as("__z"))
      .select(
        toUtcNtz(col("__z.time")).as("time"),
        col("latitude"), col("longitude"),
        col("__z.temperature_2m").as("temperature_2m"),
        col("__z.wind_speed_10m").as("wind_speed_10m"),
        col("__z.shortwave_radiation").as("shortwave_radiation"),
        col("__z.cloud_cover").as("cloud_cover"),
        col("__z.precipitation").as("precipitation_mm"))
      .filter(col("time").isNotNull)
  }

  /** EKZ/CKW/Groupe-E tariff JSON (`ekz_collector.py:73-93` et al.):
    * `prices[].{start_timestamp, <component>[]{unit, value}}` → one row
    * per (interval, component) keeping only `unit == "CHF_kWh"`.
    * CET offsets in start_timestamp normalize to UTC. `components` names
    * the arrays each entry may carry (absent → no rows for it).
    */
  def parseTariff(
      raw: DataFrame,
      jsonCol: Column,
      components: Seq[String]): DataFrame = {
    val item = ArrayType(StructType(Seq(
      StructField("unit", StringType), StructField("value", DoubleType))))
    val entry = StructType(
      StructField("start_timestamp", StringType) +:
        StructField("end_timestamp", StringType) +:
        components.map(c => StructField(c, item)))
    val schema = StructType(Seq(StructField("prices", ArrayType(entry))))
    val exploded = raw
      .withColumn("__doc", from_json(jsonCol, schema))
      .select(explode(col("__doc.prices")).as("__p"))
    components.map { c =>
      exploded
        .select(toUtcNtz(col("__p.start_timestamp")).as("time"),
          lit(c).as("tariff_type"),
          explode(col(s"__p.$c")).as("__item"))
        .filter(col("__item.unit") === "CHF_kWh")
        .select(col("time"), col("tariff_type"),
          col("__item.value").as("price_chf_kwh"))
    }.reduce(_.unionByName(_))
  }

  /** BAFU hydro JSON (`bafu_collector.py:67-106`): long/kv entries
    * (unix-epoch seconds, station, par ∈ {flow, height}) pivoted to one
    * wide row per (time, station).
    */
  def parseBafu(raw: DataFrame, jsonCol: Column): DataFrame = {
    val schema = StructType(Seq(StructField("payload", ArrayType(StructType(Seq(
      StructField("timestamp", LongType), StructField("loc", StringType),
      StructField("par", StringType), StructField("val", DoubleType)))))))
    raw
      .withColumn("__doc", from_json(jsonCol, schema))
      .select(explode(col("__doc.payload")).as("__e"))
      .select(timestamp_seconds(col("__e.timestamp")).cast("timestamp_ntz")
          .as("time"),
        col("__e.loc").as("station_id"), col("__e.par").as("par"),
        col("__e.val").as("val"))
      .groupBy(col("time"), col("station_id"))
      .pivot("par", Seq("flow", "height"))
      .agg(first(col("val")))
      .withColumnsRenamed(Map("flow" -> "discharge_m3s",
        "height" -> "level_masl"))
  }

  /** ENTSO-E A44 day-ahead XML (`entsoe_collector.py:70-106`): TimeSeries
    * → Period → positioned points; `time = start + (pos−1)·resolution`;
    * currency from the document envelope. Multi-Period documents are
    * split with a dot-all regex before point expansion (XmlPoints).
    */
  def parseEntsoeDayAhead(
      raw: DataFrame,
      xmlCol: Column,
      domain: String): DataFrame = {
    val withDoc = raw
      .withColumn("currency", regexp_extract(xmlCol,
        "<currency_Unit.name>([^<]+)</currency_Unit.name>", 1))
      .withColumn("__period", explode(regexp_extract_all(xmlCol,
        lit("(?s)<Period>(.*?)</Period>"), lit(1))))
    XmlPoints.parse(withDoc, col("__period"), Seq(col("currency")))
      .select(col("point_ts").as("time"), lit(domain).as("domain"),
        col("price").as("price_eur_mwh"), col("currency"))
  }

  /** Stadtwerk Winterthur Bruttolastgang CSV
    * (`stadtwerk_winterthur_collector.py:136-179`): `zeitpunkt` +
    * flexible value column (first non-zeitpunkt column); `+0100`-style
    * offsets → UTC; malformed rows skipped.
    */
  def parseBruttolastgang(csv: DataFrame): DataFrame = {
    val valueCol = csv.columns.filter(_ != "zeitpunkt").head
    csv.select(
        try_to_timestamp(col("zeitpunkt"), lit("yyyy-MM-dd'T'HH:mm:ssZ"))
          .cast("timestamp_ntz").as("time"),
        col(valueCol).try_cast(DoubleType).as("load_kwh"))
      .filter(col("time").isNotNull && col("load_kwh").isNotNull)
  }

  /** Stadtwerk Netzeinspeisung CSV (`:205-248`): keep only
    * `energietraeger == 'photovoltaik'` rows → (time, pv_kwh). */
  def parseNetzeinspeisung(csv: DataFrame): DataFrame = {
    val valueCol = csv.columns
      .filter(c => c != "zeitpunkt" && c != "energietraeger").head
    csv.filter(lower(trim(col("energietraeger"))) === "photovoltaik")
      .select(
        try_to_timestamp(col("zeitpunkt"), lit("yyyy-MM-dd'T'HH:mm:ssZ"))
          .cast("timestamp_ntz").as("time"),
        col(valueCol).try_cast(DoubleType).as("pv_kwh"))
      .filter(col("time").isNotNull && col("pv_kwh").isNotNull)
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parsers for the reference's JSON payload shapes, as pure DataFrame
  * transforms (SURVEY.md §2.1). Each takes a DataFrame holding raw JSON
  * strings — one document per row, exactly how a distributed ingest lands
  * payloads — and explodes it into relational rows. All are `from_json` +
  * array-function compositions: codegen'd, no UDFs, scale-linear in the
  * number of documents.
  */
object JsonShapes {

  /** Columnar parallel-array JSON (the open-meteo shape,
    * `openmeteo_collector.py:93-124`): `{"ids": [...], "vals": [...]}`
    * where row i zips all arrays at index i. Short/missing arrays yield
    * nulls, the `_safe_float` behavior.
    */
  def parseColumnar(
      raw: DataFrame,
      jsonCol: Column,
      keepCols: Seq[Column]): DataFrame = {
    val schema = StructType(Seq(
      StructField("ids", ArrayType(LongType)),
      StructField("vals", ArrayType(DoubleType))))
    raw
      .withColumn("__doc", from_json(jsonCol, schema))
      .withColumn("__zipped",
        arrays_zip(col("__doc.ids"), col("__doc.vals")))
      .select((keepCols :+ explode(col("__zipped")).as("__row")): _*)
      .withColumn("event_id", col("__row.ids"))
      .withColumn("value", col("__row.vals"))
      .drop("__doc", "__zipped", "__row")
  }

  /** Nested tariff JSON (EKZ/CKW/GroupeE shape, `ekz_collector.py:73-93`):
    * `{"prices": [{"t": ..., "components": [{"unit": ..., "value": ...}]}]}`
    * → one row per (interval, component) with `unit == keepUnit` only.
    */
  def parseNestedTariff(
      raw: DataFrame,
      jsonCol: Column,
      keepCols: Seq[Column],
      keepUnit: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("prices", ArrayType(StructType(Seq(
        StructField("t", LongType),
        StructField("components", ArrayType(StructType(Seq(
          StructField("unit", StringType),
          StructField("value", DoubleType)))))))))))
    raw
      .withColumn("__doc", from_json(jsonCol, schema))
      .select((keepCols :+ explode(col("__doc.prices")).as("__p")): _*)
      .select((keepCols ++ Seq(col("__p.t").as("t"),
        explode(col("__p.components")).as("__c"))): _*)
      .filter(col("__c.unit") === keepUnit)
      .withColumn("value", col("__c.value"))
      .drop("__c")
  }

  /** Key-value merge (the BAFU shape, `bafu_collector.py:67-106`): rows of
    * (time, par, val) pivoted into one wide row per time. The reference
    * takes the single value per (time, par); with duplicates we keep max
    * for determinism.
    */
  def pivotKv(
      df: DataFrame,
      timeCol: Column,
      parCol: Column,
      valCol: Column,
      pars: Seq[String]): DataFrame =
    df.filter(parCol.isin(pars.map(x => x: Any): _*))
      .groupBy(timeCol.as("bucket"))
      .pivot(parCol, pars)
      .agg(max(valCol))
}

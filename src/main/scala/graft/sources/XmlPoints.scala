package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ScalarFns

/** ENTSO-E-style XML point expansion (SURVEY.md §2.1 `scan_xml_points`,
  * reference `entsoe_collector.py:70-106`): each Period document carries a
  * start instant, a resolution code, and positioned points; the timestamp
  * of point p is `start + (position − 1) · resolution`.
  *
  * Implemented with `regexp_extract(_all)` + `arrays_zip` + `explode` —
  * pure Catalyst expressions (no UDF, no DOM), so a billion small XML
  * documents parse inside WholeStageCodegen across executors. The
  * reference's resolution map PT15M/PT30M/PT60M/P1D
  * (`entsoe_collector.py:446-448`) is reproduced as a CASE expression.
  */
object XmlPoints {

  /** Minutes for a resolution code column. */
  def resolutionMinutes(res: Column): Column =
    when(res === "PT15M", 15)
      .when(res === "PT30M", 30)
      .when(res === "PT60M", 60)
      .when(res === "P1D", 1440)

  /** Explodes one XML Period document per input row into point rows with
    * columns `point_ts` (timestamp) and `price` (double), keeping
    * `keepCols`. Empty documents (no points) produce no rows, matching
    * the reference's empty-payload behavior.
    */
  def parse(raw: DataFrame, xmlCol: Column, keepCols: Seq[Column]): DataFrame = {
    val start = to_timestamp(
      regexp_extract(xmlCol, "<start>([^<]+)</start>", 1),
      "yyyy-MM-dd'T'HH:mmX").cast("timestamp_ntz")
    val res = regexp_extract(xmlCol, "<resolution>([^<]+)</resolution>", 1)
    val positions = transform(
      regexp_extract_all(xmlCol, lit("<position>([0-9]+)</position>"), lit(1)),
      x => x.cast("long"))
    val prices = transform(
      regexp_extract_all(xmlCol,
        lit("<price\\.amount>([^<]+)</price\\.amount>"), lit(1)),
      x => x.cast("double"))
    raw
      .withColumn("__start", start)
      .withColumn("__res_min", resolutionMinutes(res))
      .withColumn("__pts", arrays_zip(positions.as("pos"), prices.as("price")))
      .select((keepCols ++ Seq(col("__start"), col("__res_min"),
        explode(col("__pts")).as("__p"))): _*)
      .withColumn("point_ts",
        ScalarFns.pointTimestamp(col("__start"), col("__p.pos"), col("__res_min"))
          .cast("timestamp_ntz"))
      .withColumn("price", col("__p.price"))
      .drop("__start", "__res_min", "__p")
  }
}

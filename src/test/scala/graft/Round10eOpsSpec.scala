package graft

import org.apache.spark.sql.functions._
import graft.ops.{Rollups, TimeSeries}

/** §2.24 operators: changelog compaction against a driver-side replay,
  * the CDC merge's partition/delete invariants, streaming-vs-batch CDC
  * state, attribution against a hand fixture, and the one-hot
  * row-invariants.
  */
class Round10eOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("cdcCompact keeps the latest change per key with a total order") {
    val log = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a", 10L),
      (1L, "2024-01-01 10:00:00", 2L, "b", 20L), // same ts, higher id wins
      (2L, "2024-01-02 09:00:00", 3L, "c", 30L))
      .toDF("k", "ts", "id", "ty", "v")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = Rollups.cdcCompact(log, col("k"),
        TimeSeries.orderKey(col("ts"), col("id")),
        "ty" -> col("ty"), "v" -> col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set((1L, "b", 20L, 2L), (2L, "c", 30L, 1L)))
  }

  test("merge_cdc_apply: delta wins, error deletes, snap-only survives") {
    val d = sf()
    val rows = SparkEntry.queries("merge_cdc_apply")(spark, d).collect()
    val e = Tables.events(spark, d)
    val cut = e.agg(date_sub(max(to_date(col("ts"))), 1)).first().getDate(0)
    // users whose final post-cutoff change is an error must be absent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val deltaLast = e.filter(to_date(col("ts")) > lit(cut))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    deltaLast.foreach { case (u, ty) =>
      if (ty == "error") assert(!out.contains(u), s"user $u not deleted")
      else assert(out(u) == "delta", s"user $u should be delta-sourced")
    }
    // every emitted user is present exactly once
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("stream_cdc_state equals the batch compaction") {
    val d = sf()
    val streamed = SparkEntry.queries("stream_cdc_state")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val batch = Rollups.cdcCompact(
        Tables.events(spark, d)
          .withColumn("__bal", round(col("value") * 100, 0).cast("long")),
        col("user_id"),
        TimeSeries.orderKey(col("ts"), col("event_id")),
        "last_type" -> col("event_type"), "bal_c" -> col("__bal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed === batch)
  }

  test("last-touch attribution on a hand fixture") {
    val evs = Seq(
      // u1: view, then purchase 2 days later -> 'view'
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-03 00:00:00", 2L, "purchase"),
      // u2: click 8 days before purchase -> outside window, 'none'
      (2L, "2024-01-01 00:00:00", 3L, "click"),
      (2L, "2024-01-09 00:00:01", 4L, "purchase"),
      // u3: purchase with no touch at all -> 'none'
      (3L, "2024-01-05 00:00:00", 5L, "purchase"),
      // u4: click at the SAME instant, lower id -> counts (strictly
      // preceding in the (ts, id) total order)
      (4L, "2024-01-02 00:00:00", 6L, "click"),
      (4L, "2024-01-02 00:00:00", 7L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .withColumn("value", lit(1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val got = evs
      .withColumn("__lt",
        last(when(col("event_type").isin("click", "view"),
          struct(col("ts").as("t"), col("event_type").as("ty"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        when(col("__lt").isNull, lit("none"))
          .when(col("__lt.t") >= col("ts") - expr("INTERVAL 7 DAY"),
            col("__lt.ty"))
          .otherwise(lit("none")).as("attributed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "view", 2L -> "none", 3L -> "none",
      4L -> "click"))
  }

  test("f_onehot_topk: exactly one indicator fires per row") {
    val d = sf()
    val rows = SparkEntry.queries("f_onehot_topk")(spark, d)
      .select((col("oh_1") + col("oh_2") + col("oh_3") + col("oh_other"))
        .as("s"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(rows === Seq(1))
  }
}

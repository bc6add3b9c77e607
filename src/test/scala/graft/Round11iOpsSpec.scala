package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 9: clustering-coefficient identities on planted graphs,
  * degree conservation, burstiness extremes, pivot leakage safety.
  */
class Round11iOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11i").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("graph_clustering_coeff: bounded in [0,1]; 3T ≤ W") {
    val r = SparkEntry.queries("graph_clustering_coeff")(spark, sf())
      .head()
    val (edges, wedges, tris, cc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(edges > 0 && wedges > 0)
    assert(3 * tris <= wedges, "each triangle closes 3 wedges")
    assert(cc >= 0 && cc <= 1)
  }

  test("graph_degree_histogram: node-degree mass equals 2|E|") {
    val hist = SparkEntry.queries("graph_degree_histogram")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = SparkEntry.queries("graph_clustering_coeff")(spark, sf())
      .head().getLong(0)
    assert(hist.map { case (d, n) => d * n }.sum === 2 * edges,
      "sum of degrees = 2 × edges (handshake lemma)")
  }

  test("agg_interevent_burstiness: metronome → −1-ish, extremes bounded") {
    // perfectly regular gaps → σ = 0 → B = −1
    val regular = eventsDir((1 to 20).map(i =>
      (i.toLong, f"2024-01-01 ${i / 6}%02d:${(i * 10) % 60}%02d:00", 7L,
        "m", 1.0, "{}")))
    val r = SparkEntry.queries("agg_interevent_burstiness")(spark, regular)
      .head()
    assert(r.getLong(0) === 7L)
    assert(r.getDouble(2) === -1.0, "zero-variance gaps → B = −1")
    SparkEntry.queries("agg_interevent_burstiness")(spark, sf()).collect()
      .foreach(r =>
        assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }

  test("win_pivot_points: ordering S2 < S1 < P < R1 < R2 when range > 0") {
    val rows = SparkEntry.queries("win_pivot_points")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, r1, s1, r2, s2) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(s2 <= s1 + 1e-9 && s1 <= p + 1e-9 ||
        s1 <= p + 1e-9, "supports below pivot")
      assert(p <= r1 + 1e-9 && r1 <= r2 + 1e-9 ||
        p <= r1 + 1e-9, "resistances above pivot")
      assert(s2 <= p + 1e-9 && p <= r2 + 1e-9)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** §2.25 operators: logistic scoring and the DP-noise transform against
  * driver-side formula replays, keyframe selection on a hand fixture.
  */
class Round10fOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("ml_logreg_score replays the sigmoid formula") {
    val d = sf()
    val got = SparkEntry.queries("ml_logreg_score")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2)))
      .toMap
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.take(20).foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val z = -2.0 + 0.01 * toks.length + 0.0005 * text.length +
        2.0 * (toks.distinct.length.toDouble / toks.length)
      val score = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(got(id)._1 - score) < 1e-6, s"doc $id")
      assert(got(id)._2 === (if (score >= 0.5) 1 else 0))
    }
  }

  test("agg_dp_noised_counts replays the keyed Laplace transform") {
    val d = sf()
    val rows = SparkEntry.queries("agg_dp_noised_counts")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.take(20).foreach { case (ty, day, n, noised) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$ty|$day".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5.take(13), 16) /
        4503599627370496.0
      val noise = if (u >= 0.5) -2.0 * math.log(2.0 * (1.0 - u))
        else 2.0 * math.log(2.0 * u)
      assert(math.abs(noised - (n + noise)) < 1e-5, s"cell $ty/$day")
    }
    // noise is symmetric-ish: both signs must occur across cells
    assert(rows.exists { case (_, _, n, v) => v > n })
    assert(rows.exists { case (_, _, n, v) => v < n })
  }

  test("sample_diverse_cells floors coverage of every occupied cell") {
    val d = sf()
    val rows = SparkEntry.queries("sample_diverse_cells")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val perCell = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ <= 10), "cell quota respected")
    assert(perCell.size >= 2, "multiple cells represented")
    // ranks are contiguous 1..n within each cell
    rows.groupBy(_._2).foreach { case (c, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length), s"cell $c")
    }
  }

  test("keyframesTopK picks the k most energetic frames") {
    // frame size 4: frames "aaaa"(388), "zzzz"(488), "mmmm"(436), "a"(97)
    val docs = Seq((1L, "aaaazzzzmmmma")).toDF("doc_id", "text")
    val got = Multimodal.keyframesTopK(
        Multimodal.asPayload(docs, col("doc_id"), col("text")),
        frameBytes = 4, k = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, 1, 488L), (2, 2, 436L)))
  }
}

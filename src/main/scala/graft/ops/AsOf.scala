package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical time-series operator Spark lacks as a
  * built-in (the reference only needs the coarse `date_trunc` alignment
  * of `join_left_expr`, but any serving/backtest pipeline needs the real
  * thing): for each left row, attach the payload of the LATEST right row
  * with `rightTime <= leftTime` within the same key group.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder — no custom plan node needed): tag and union both sides, one
  * window partitioned by key ordered by (time, side-tag) carrying
  * `last(payload, ignoreNulls)` — right rows sort before left rows at
  * equal times, so `<=` semantics fall out of the sort order; left rows
  * carry null payloads so they never leak values to each other.
  *
  * Scale: ONE shuffle+sort on the key (both inputs together), no join
  * blow-up, no per-row probing. Works at any right-side lookback depth
  * (unlike a fringe/bucket scheme). Requires a keyed join (the usual
  * case); for keyless global as-of, bucket the time axis and treat the
  * bucket as the key with a carried last-value — not needed here.
  *
  * Right side must be unique per (keys, rightTime) — pre-aggregate with
  * e.g. `max_by` if it isn't (the spec and query do).
  */
object AsOf {

  private val T = "__graft_t"
  private val L = "__graft_is_l"

  /** @param left       probe side, kept row-for-row
    * @param right      payload side: keys ++ rightTime ++ payloadCols
    * @param keys       equality key column names (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payloadCols right payload column names to attach (null when
    *                    no prior right row exists)
    */
  def joinPrior(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: Column,
      rightTime: Column,
      payloadCols: Seq[String]): DataFrame = {
    val P = "__graft_payload"
    val l = left.withColumn(T, leftTime).withColumn(L, lit(1))
    // the payload travels as ONE struct (non-null for every right row):
    // last(ignoreNulls) then selects the latest right ROW, so a null
    // payload FIELD on the matched row is returned as null — not skipped
    // in favor of an older value
    val r = right
      .select(keys.map(col) :+ rightTime.as(T) :+
        struct(payloadCols.map(col): _*).as(P): _*)
      .withColumn(L, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(T), col(L))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn(P, last(col(P), ignoreNulls = true).over(w))
    payloadCols.foldLeft(filled) { (df, c) =>
        df.withColumn(c, col(P).getField(c))
      }
      .filter(col(L) === 1).drop(T, L, P)
  }

  /** [[joinPrior]] with a staleness bound — the backtest/serving form
    * "latest quote, but only if it is fresh enough": a match older than
    * `toleranceSeconds` is treated as no match (payload nulled). Same
    * single shuffle+sort; the matched right timestamp rides along in
    * the payload struct and the bound is a post-window row-local filter.
    */
  def joinPriorWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: Column,
      rightTime: Column,
      payloadCols: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, "tolerance must be non-negative")
    val RT = "__graft_rt"
    val joined = joinPrior(left, right.withColumn(RT, rightTime),
      keys, leftTime, rightTime, payloadCols :+ RT)
    val fresh = col(RT).isNotNull &&
      (unix_micros(leftTime.cast("timestamp")) -
        unix_micros(col(RT).cast("timestamp"))) <=
        toleranceSeconds * 1000000L
    payloadCols.foldLeft(joined) { (df, c) =>
        df.withColumn(c, when(fresh, col(c)))
      }
      .drop(RT)
  }

  /** Forward as-of join: for each left row, attach the payload of the
    * EARLIEST right row with `rightTime >= leftTime` in the key group —
    * the `merge_asof(direction='forward')` operator ("next fill after
    * this order", "next reading at-or-after the alert"). Exact mirror
    * of [[joinPrior]] — same single shuffle+sort, but the window frame
    * looks FORWARD (`first(payload) over current..unbounded following`)
    * and left rows sort BEFORE right rows at equal times so an
    * equal-time right row is inside the frame (`>=` semantics). Left
    * rows with no following right row carry nulls. Right side unique
    * per (keys, rightTime); at duplicates the FIRST row in sort order
    * wins (the earliest — mirroring joinPrior's latest-wins).
    */
  def joinNext(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: Column,
      rightTime: Column,
      payloadCols: Seq[String]): DataFrame = {
    val P = "__graft_payload"
    val l = left.withColumn(T, leftTime).withColumn(L, lit(0))
    val r = right
      .select(keys.map(col) :+ rightTime.as(T) :+
        struct(payloadCols.map(col): _*).as(P): _*)
      .withColumn(L, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(T), col(L))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = unioned
      .withColumn(P, first(col(P), ignoreNulls = true).over(w))
    payloadCols.foldLeft(filled) { (df, c) =>
        df.withColumn(c, col(P).getField(c))
      }
      .filter(col(L) === 0).drop(T, L, P)
  }

  /** [[joinNext]] with a forward deadline — "the next fill, but only if
    * it lands within `toleranceSeconds`": a following right row later
    * than the bound is treated as no match (payload nulled). The
    * windowed-funnel primitive (converted iff the next purchase falls
    * inside the attribution window). Same single shuffle+sort.
    */
  def joinNextWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: Column,
      rightTime: Column,
      payloadCols: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, "tolerance must be non-negative")
    val RT = "__graft_nxrt"
    val joined = joinNext(left, right.withColumn(RT, rightTime),
      keys, leftTime, rightTime, payloadCols :+ RT)
    val inWindow = col(RT).isNotNull &&
      (unix_micros(col(RT).cast("timestamp")) -
        unix_micros(leftTime.cast("timestamp"))) <=
        toleranceSeconds * 1000000L
    payloadCols.foldLeft(joined) { (df, c) =>
        df.withColumn(c, when(inWindow, col(c)))
      }
      .drop(RT)
  }

  /** Nearest-in-time join, EITHER direction: for each left row, the
    * right row minimizing |rightTime − leftTime| within the key group
    * (ties go to the earlier right row — i.e. the backward match). The
    * pandas `merge_asof(direction='nearest')` operator.
    *
    * Same single shuffle+sort as [[joinPrior]]: both directions come
    * from ONE sorted union — `last(payload) over (… rows unbounded
    * preceding .. current)` carries the latest right row at-or-before,
    * `first(payload) over (… current .. unbounded following)` the
    * earliest strictly-after (right rows sort before left rows at equal
    * times, so the at-equal match is owned by the backward frame) —
    * then a row-local comparison picks the closer side. No join
    * blow-up: a key's clicks never pair with all its views, only with
    * the two frame-adjacent candidates.
    *
    * Left rows whose key group has no right row at all are DROPPED
    * (inner-join semantics, matching the SQL formulation). Right side
    * must be unique per (keys, rightTime) — pre-aggregate (e.g.
    * `min(id)`) if it isn't, which also pins the tie rule at duplicate
    * timestamps.
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: Column,
      rightTime: Column,
      payloadCols: Seq[String]): DataFrame = {
    val P = "__graft_np"
    val RT = "__graft_nrt"
    val l = left.withColumn(T, leftTime).withColumn(L, lit(1))
    val r = right
      .select(keys.map(col) :+ rightTime.as(T) :+
        struct((rightTime.as(RT) +: payloadCols.map(col)): _*).as(P): _*)
      .withColumn(L, lit(0))
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col(T), col(L))
    val back = base.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = base.rowsBetween(0, Window.unboundedFollowing)
    val unioned = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__b", last(col(P), ignoreNulls = true).over(back))
      .withColumn("__f", first(col(P), ignoreNulls = true).over(fwd))
    val tUs = unix_micros(col(T).cast("timestamp"))
    val dB = tUs - unix_micros(col("__b").getField(RT).cast("timestamp"))
    val dF = unix_micros(col("__f").getField(RT).cast("timestamp")) - tUs
    val best = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(dB <= dF, col("__b")) // tie → earlier right row (backward)
      .otherwise(col("__f"))
    val picked = unioned
      .filter(col(L) === 1)
      .withColumn(P, best)
      .filter(col(P).isNotNull)
    payloadCols.foldLeft(picked) { (df, c) =>
        df.withColumn(c, col(P).getField(c))
      }
      .drop(T, L, P, "__b", "__f")
  }
}

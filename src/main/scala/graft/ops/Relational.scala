package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core relational operators mirroring the reference's SQL surface
  * (SURVEY.md §2.2, §2.3, §2.6, §2.7). All joins in the reference are
  * left equi-joins over time keys with small right sides → broadcast.
  */
object Relational {

  /** Left join against a dimension filtered to constants, the reference's
    * `LEFT JOIN weather_hourly ON time = time AND lat = c1 AND lon = c2`
    * pattern (`infra/db/init.sql:349-360`): the same dim table joined
    * repeatedly under different constant bindings. The filtered dim is
    * broadcast — at 100 TB the fact side never shuffles.
    */
  def leftJoinConstDim(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      dimFilter: Column,
      renames: Map[String, String]): DataFrame = {
    val filtered = renames.foldLeft(dim.filter(dimFilter)) {
      case (d, (from, to)) => d.withColumnRenamed(from, to)
    }
    fact.join(broadcast(filtered.select((keys ++ renames.values).map(col): _*)),
      keys, "left")
  }

  /** Plain left equi-join (`infra/db/init.sql:361-368,450-451`). */
  def leftJoin(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame =
    l.join(r, keys, "left")

  /** Expression left join, the reference's coarse as-of alignment of
    * 15-min rows to hourly rows via
    * `date_trunc('hour', w.time) = wr.time` (`infra/db/init.sql:452-455`).
    */
  def leftJoinExpr(l: DataFrame, r: DataFrame, cond: Column): DataFrame =
    l.join(r, cond, "left")

  /** Date-in-range membership against a small ranges dim (the holiday
    * flags of `src/processing/export_pipeline.py:409-534`). The ranges
    * table is tiny by contract (the reference hardcodes 66 ranges), so it
    * is collected at plan time and folded into a single OR predicate —
    * the exact shape of the reference's membership closure. Zero joins,
    * zero shuffles, input cardinality preserved row-for-row (including
    * legitimately duplicate input rows, and dates covered by several
    * overlapping ranges flag exactly once).
    *
    * The tiny-dim contract is ENFORCED: more than `maxRanges` ranges
    * fails fast — an unbounded ranges table would mean an unbounded
    * driver collect and a codegen-hostile giant OR predicate. For a
    * genuinely large ranges relation use a range join instead.
    */
  def flagInRanges(
      df: DataFrame,
      dateCol: Column,
      ranges: DataFrame, // columns: start DATE, end DATE
      flagName: String,
      maxRanges: Int = 512): DataFrame = {
    val rs = ranges.select(col("start"), col("end"))
      .limit(maxRanges + 1).collect()
    require(rs.length <= maxRanges,
      s"flagInRanges: ranges table exceeds the tiny-dim contract " +
        s"(> $maxRanges rows); fold-to-OR-predicate is for small " +
        s"dimension tables only — use a range join for large ones")
    // balanced OR tree: a linear reduce(_ || _) nests one stack frame
    // per range in Catalyst's Column→Expression conversion and overflows
    // around ~600 terms; pairwise folding keeps the depth logarithmic
    def balancedOr(cs: IndexedSeq[Column]): Column =
      if (cs.length == 1) cs.head
      else balancedOr(cs.grouped(2)
        .map(g => if (g.length == 2) g(0) || g(1) else g(0)).toIndexedSeq)
    val preds = rs.toIndexedSeq
      .map(r => dateCol.between(lit(r.get(0)), lit(r.get(1))))
    val hit = if (preds.isEmpty) lit(false) else balancedOr(preds)
    df.withColumn(flagName, when(hit, lit(1)).otherwise(lit(0)))
  }

  /** Idempotent append semantics of `INSERT ... ON CONFLICT DO NOTHING`
    * (`src/db/timescale_client.py:53-229`): rows of `incoming` whose key is
    * not already present in `existing`, deduped within the batch. The
    * reference keeps the first writer; batch-internal dedup keeps an
    * arbitrary row, acceptable per SURVEY.md §7.4(5).
    */
  def upsertNothing(
      incoming: DataFrame,
      existing: DataFrame,
      keys: Seq[String]): DataFrame =
    incoming
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).dropDuplicates(keys),
        keys, "left_anti")

  /** Multi-source concatenation keeping one schema
    * (`stadtwerk_winterthur_collector.py:117-134`). */
  def unionSources(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** `ORDER BY time DESC LIMIT n OFFSET m` pagination
    * (`src/api/main.py:429-452`). Spark plans orderBy+limit as a
    * distributed TakeOrdered — no single-partition sort.
    */
  def page(df: DataFrame, order: Seq[Column], offset: Int, limit: Int): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(limit)

  /** Last-N-rows-then-ascending (`src/api/main.py:355-372`). */
  def lastNAscending(df: DataFrame, timeOrder: Seq[Column], n: Int): DataFrame =
    df.orderBy(timeOrder.map(_.desc): _*).limit(n)
      .orderBy(timeOrder: _*)

  /** Calendar 3-way split (`export_pipeline.py:537-560,626-641`): labels
    * rows train/val/test by date thresholds anchored to `max(date)`.
    */
  def splitByDates(
      df: DataFrame,
      dateCol: Column,
      valDays: Int,
      testDays: Int,
      name: String = "split"): DataFrame = {
    val anchors = df
      .agg(max(dateCol).as("__graft_maxd"))
      .select(
        date_sub(col("__graft_maxd"), testDays + valDays).as("__graft_train_end"),
        date_sub(col("__graft_maxd"), testDays).as("__graft_val_end"))
    df.crossJoin(broadcast(anchors))
      .withColumn(
        name,
        when(dateCol <= col("__graft_train_end"), lit("train"))
          .when(dateCol <= col("__graft_val_end"), lit("val"))
          .otherwise(lit("test")))
      .drop("__graft_train_end", "__graft_val_end")
  }

  /** Left anti join on a single key — `WHERE NOT EXISTS` / orphan-row
    * detection. The probe side is reduced to its DISTINCT keys first:
    * the anti join then runs against a keys-sized relation (AQE
    * broadcasts it when small), so the fact table's payload columns
    * never shuffle — at 100 TB the distinct is one map-side-combined
    * pass and the join is a broadcast probe instead of a full co-shuffle
    * of both inputs.
    */
  def antiJoinKeys(
      l: DataFrame,
      r: DataFrame,
      lKey: String,
      rKey: String): DataFrame =
    l.join(r.select(col(rKey).as(lKey)).distinct(), Seq(lKey), "left_anti")
}

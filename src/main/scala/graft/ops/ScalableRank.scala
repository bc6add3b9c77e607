package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global row numbering / positional operators.
  *
  * The reference's chronological splits and stride downsampling
  * (`src/processing/export_pipeline.py:129-207`, `src/api/main.py:1038-1045`)
  * are positional over a global time order. A bare
  * `row_number().over(Window.orderBy(ts))` funnels the table through one
  * partition. Instead: count rows per coarse bucket (a tiny aggregate),
  * turn the counts into per-bucket starting offsets with a window over the
  * *bucket list* (thousands of rows at most), broadcast the offsets back,
  * and number rows within each bucket independently.
  *
  * Requires `bucket` to be monotone in `orderCols` (a coarse prefix of the
  * global ordering), which holds for any time-bucket of a time ordering.
  */
object ScalableRank {

  private val B = "__graft_bucket"

  /** Adds a 1-based global row number column named `name`, plus (when
    * `totalName` is set) the total row count — derived from the same
    * per-bucket count pass, so callers that need `n` (splits, strides)
    * don't pay a second scan.
    */
  def globalRowNumber(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      name: String,
      totalName: Option[String] = None): DataFrame = {
    val withB = df.withColumn(B, bucket)
    // Tiny: one row per bucket. The unpartitioned windows over it are safe.
    val offsets = withB
      .groupBy(col(B))
      .agg(count(lit(1)).as("__graft_cnt"))
      .withColumn(
        "__graft_offset",
        coalesce(
          sum(col("__graft_cnt"))
            .over(Window.orderBy(col(B)).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__graft_total",
        sum(col("__graft_cnt")).over(Window.partitionBy()))
      .drop("__graft_cnt")
    val wLocal = Window.partitionBy(col(B)).orderBy(orderCols: _*)
    val numbered = withB
      .join(broadcast(offsets), Seq(B))
      .withColumn(
        name,
        (row_number().over(wLocal).cast("long") + col("__graft_offset")))
    totalName match {
      case Some(t) => numbered.withColumnRenamed("__graft_total", t)
        .drop(B, "__graft_offset")
      case None => numbered.drop(B, "__graft_offset", "__graft_total")
    }
  }

  /** Chronological ratio split (reference `export_pipeline.py:129-207`):
    * first `floor(n * (1 - testRatio))` rows by the global order → "train",
    * rest → "test". Emits a `split` label column; row count semantics match
    * the reference's `int(n * (1 - r))` floor.
    */
  def chronoSplit(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      testRatio: Double,
      name: String = "split"): DataFrame = {
    val rn = "__graft_rn"
    val numbered = globalRowNumber(df, bucket, orderCols, rn, Some("__graft_n"))
    numbered
      .withColumn(
        name,
        when(col(rn) <= floor(col("__graft_n") * lit(1.0 - testRatio)), lit("train"))
          .otherwise(lit("test")))
      .drop(rn, "__graft_n")
  }

  /** Chronological three-way split (reference
    * `export_pipeline.py:164-207` `split_chronological_three_way`):
    * train = first `floor(n·(1−val−test))` rows of the global order,
    * val = the next `floor(n·val)`-ish band up to `floor(n·(1−test))`,
    * test = the rest — the boundary arithmetic matches the reference's
    * `int(n * ratio)` cutoffs exactly. Same bucket-offset global
    * numbering as [[chronoSplit]] (no global sort, no collect).
    */
  def chronoSplitThreeWay(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      valRatio: Double = 0.15,
      testRatio: Double = 0.15,
      name: String = "split"): DataFrame = {
    require(valRatio > 0 && testRatio > 0 && valRatio + testRatio < 1,
      s"ratios must be positive and sum below 1, got $valRatio/$testRatio")
    val rn = "__graft_rn"
    val numbered = globalRowNumber(df, bucket, orderCols, rn, Some("__graft_n"))
    numbered
      .withColumn(
        name,
        when(col(rn) <= floor(col("__graft_n") *
            lit(1.0 - valRatio - testRatio)), lit("train"))
          .when(col(rn) <= floor(col("__graft_n") * lit(1.0 - testRatio)),
            lit("val"))
          .otherwise(lit("test")))
      .drop(rn, "__graft_n")
  }

  /** Adds a global running sum of `value` over the global ordering —
    * the same bucket-offset decomposition as [[globalRowNumber]], but
    * summing a value column instead of counting rows: per-bucket totals
    * (tiny aggregate) → exclusive bucket offsets (window over the bucket
    * list) → broadcast back → within-bucket running sum. By default the
    * sum is EXCLUSIVE (tokens/bytes *before* this row), which is the
    * form positional packing needs; `inclusive = true` gives the
    * classic cumulative sum. `value` must be non-null; `bucket` must be
    * monotone in `orderCols`.
    */
  def globalPrefixSum(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      value: Column,
      name: String,
      inclusive: Boolean = false): DataFrame = {
    val withB = df.withColumn(B, bucket).withColumn("__graft_v", value.cast("long"))
    val offsets = withB
      .groupBy(col(B))
      .agg(sum(col("__graft_v")).as("__graft_bsum"))
      .withColumn(
        "__graft_offset",
        coalesce(
          sum(col("__graft_bsum"))
            .over(Window.orderBy(col(B)).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__graft_bsum")
    val upper = if (inclusive) 0L else -1L
    val wLocal = Window.partitionBy(col(B)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, upper)
    withB
      .join(broadcast(offsets), Seq(B))
      .withColumn(name,
        coalesce(sum(col("__graft_v")).over(wLocal), lit(0L)) + col("__graft_offset"))
      .drop(B, "__graft_v", "__graft_offset")
  }

  /** Concatenate-and-split sequence packing — the pretraining layout
    * where every document's tokens are appended to one endless stream
    * that is then cut into fixed `seqLen`-token training sequences.
    * Emits, per document: `seq_id` (the sequence its first token lands
    * in) and `seq_offset` (position within that sequence); a document
    * whose tokens cross a cut simply continues into the next sequence,
    * exactly as GPT-style packing does. Built on [[globalPrefixSum]],
    * so no global sort ever materializes. `tokens` must be non-null.
    */
  def packSequences(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      tokens: Column,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val p = "__graft_prefix"
    globalPrefixSum(df, bucket, orderCols, tokens, p)
      .withColumn("seq_id", floor(col(p) / lit(seqLen.toLong)))
      .withColumn("seq_offset", pmod(col(p), lit(seqLen.toLong)))
      .drop(p)
  }

  /** Exact `ntile(k)` over a GLOBAL ordering without the
    * single-partition window (r19, VERDICT r18 item 3): a bare
    * `ntile(k).over(Window.orderBy(...))` funnels the whole relation
    * through one reducer — a one-task wall at 100 TB on any row-scale
    * input (customer/user dims grow with data). This computes the
    * identical tile assignment from [[globalRowNumber]]'s bucket-offset
    * global row number plus the standard SQL split formula (the first
    * `n % k` tiles take `n div k + 1` rows, the rest `n div k` — what
    * Spark's and DuckDB's NTile both implement), all in exact integer
    * arithmetic:
    *
    *   cut  = (n % k) * (n div k + 1)
    *   tile = rn <= cut ? (rn-1) div (n div k + 1) + 1
    *                    : (n % k) + (rn-1-cut) div (n div k) + 1
    *
    * (`n < k` degenerates to tile = rn via the first branch — cut = n
    * and `n div k` = 0 never divides because the ELSE arm is
    * unreached.) Same contract as every operator here: `bucket` must be
    * monotone ASCENDING in `orderCols` (for a DESC ordering pass the
    * negated column), and the bucket count must be value-domain-bounded
    * (the offsets relation is broadcast).
    */
  def globalNtile(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      k: Int,
      name: String): DataFrame = {
    require(k >= 1, s"ntile needs k >= 1, got $k")
    val rn = "__graft_ntile_rn"
    val nT = "__graft_ntile_n"
    val numbered = globalRowNumber(df, bucket, orderCols, rn, Some(nT))
    numbered
      .withColumn(name, expr(
        s"""CASE WHEN `$rn` <= (`$nT` % $k) * ((`$nT` div $k) + 1)
             THEN ((`$rn` - 1) div ((`$nT` div $k) + 1)) + 1
             ELSE (`$nT` % $k) +
               ((`$rn` - 1 - (`$nT` % $k) * ((`$nT` div $k) + 1))
                 div (`$nT` div $k)) + 1 END""").cast("int"))
      .drop(rn, nT)
  }

  /** Stride downsample to at most `maxPoints` rows (reference
    * `src/api/main.py:1038-1045`): step = ceil(n / maxPoints), keep rows at
    * global positions 0, step, 2·step, … of the given ordering.
    */
  def downsampleStride(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      maxPoints: Int): DataFrame = {
    val rn = "__graft_rn"
    val numbered = globalRowNumber(df, bucket, orderCols, rn, Some("__graft_n"))
    numbered
      .withColumn("__graft_step", ceil(col("__graft_n") / lit(maxPoints)).cast("long"))
      .filter(pmod(col(rn) - 1, col("__graft_step")) === 0)
      .drop(rn, "__graft_n", "__graft_step")
  }
}

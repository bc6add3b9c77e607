package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic corpus-mixture sampling — the "data mixture" step of a
  * training-data pipeline: each source/domain gets a target retention
  * weight (de-weight boilerplate web text, keep all of a high-quality
  * domain) and rows are kept by a per-row hash coin so the sample is
  * reproducible, embarrassingly parallel, and stable under reruns and
  * repartitioning (no RNG state, no seed plumbing — the row id IS the
  * seed). Per-row filter only: no shuffle, fully codegen'd, and the
  * per-domain keep-rate concentrates around its weight at corpus scale.
  */
object Sampling {

  /** Keep each row of `df` with probability `weightsPerMille(domain)`
    * (defaultPerMille when the domain is unlisted), decided by the
    * portable md5 hash of `idCol` — identical row sets in any engine
    * with md5 (the DuckDB oracle replays the same predicate).
    */
  def mixtureSample(
      df: DataFrame,
      idCol: Column,
      domainCol: Column,
      weightsPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    require((weightsPerMille.values ++ Seq(defaultPerMille))
      .forall(w => w >= 0 && w <= 1000), "weights are per-mille: 0..1000")
    val rate = weightsPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (dom, w)) => when(domainCol === dom, lit(w)).otherwise(acc)
    }
    df.filter(
      pmod(PortableHash.md5Long(idCol.cast("string"), 15), lit(1000)) < rate)
  }
}

package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable.r6

/** Deterministic Lloyd iterations for k-means clustering of an embedding
  * column — the "cluster the corpus, then sample/inspect per cluster"
  * step of a curation pipeline, expressed as pure DataFrame ops so every
  * round is one broadcast join + two hash aggregates.
  *
  * Determinism contract (what makes this oracle-replicable):
  *  - init is hash-stride sampling (id % stride == 0, first k by id) —
  *    no RNG ships anywhere;
  *  - the caller passes INTEGER-quantized vectors (as doubles): every
  *    distance and every centroid-mean numerator is then EXACT in
  *    double arithmetic, so assignment is partition-order independent
  *    (raw float vectors would make the mean's partial-sum order
  *    observable in the last bits and boundary assignments unstable);
  *  - argmin ties break on centroid id via a struct-min.
  *
  * Scale shape: centroids are aggregate output of size k — broadcast by
  * construction; assignment is a map-side broadcast nested loop over
  * the vector scan (no shuffle of vectors), and the centroid recompute
  * is a (cid, dim) hash aggregate, k·dim groups. Per iteration: one
  * scan, one bounded shuffle. Vectors never cross the wire row-wise.
  */
object KMeans {

  /** Run `iters` Lloyd rounds (iters − 1 centroid recomputes + a final
    * assignment) and return (vec_id, cluster, dist) — `dist` the squared
    * L2 distance to the winning centroid, rounded for cross-engine
    * stability at the emit boundary only (the internal math is exact).
    */
  def assignIterations(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      k: Int,
      stride: Int,
      iters: Int): DataFrame = {
    require(iters >= 1, "need at least one assignment pass")
    val q = df.select(idCol.as("__id"), vecCol.as("__v"))
    // k seed rows — the limit's single-partition window is over k rows of
    // aggregate-sized data, never over the corpus
    val init = q.filter(col("__id") % stride === 0).orderBy(col("__id")).limit(k)
    val seedW = Window.orderBy(col("__id"))
    val c0 = init.select(row_number().over(seedW).cast("int").as("__cid"),
      col("__v").as("__c"))

    def assign(c: DataFrame): DataFrame =
      q.crossJoin(broadcast(c))
        .select(col("__id"), col("__cid"),
          aggregate(
            zip_with(col("__v"), col("__c"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x).as("__dist"))
        .groupBy(col("__id"))
        .agg(min(struct(col("__dist"), col("__cid"))).as("__m"))
        .select(col("__id"), col("__m.__cid").as("__cid"),
          col("__m.__dist").as("__dist"))

    var centroids = c0
    for (_ <- 1 until iters) {
      val a = assign(centroids)
      centroids = a.join(q, "__id")
        .select(col("__cid"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy(col("__cid"), col("__pos"))
        .agg(avg(col("__x")).as("__mean"))
        .groupBy(col("__cid"))
        .agg(transform(
          sort_array(collect_list(struct(col("__pos"), col("__mean")))),
          s => s.getField("__mean")).as("__c"))
    }
    assign(centroids)
      .select(col("__id").as("vec_id"), col("__cid").as("cluster"),
        r6(col("__dist")).as("dist"))
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

object Exp18 {
  def time(label: String, reps: Int = 3)(body: => Unit): Unit = {
    body
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
    println(f"[exp] $label%-44s ${ts.min}%8.3f s (min of $reps)")
  }
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sess = spark
    import sess.implicits._

    // parametrized markov squaring tail: cuts = set of levels to checkpoint
    def markov(cuts: Set[Int]): DataFrame = {
      val uw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seq0 = Tables.events(spark, d).select(col("user_id"), col("event_type"),
        row_number().over(uw).as("rn"))
      val firstp = seq0.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("rn")).as("prn"))
      val trunc = seq0.join(firstp, Seq("user_id"), "left")
        .filter(col("prn").isNull || col("rn") <= col("prn"))
        .select(col("user_id"), col("rn"),
          when(col("event_type") === "purchase", "__conv")
            .otherwise(col("event_type")).as("st"))
      val aug = trunc.select(col("user_id")).distinct()
        .select(col("user_id"), lit(0).as("rn"), lit("__start").as("st"))
        .unionByName(trunc)
      val edges = aug
        .withColumn("j", lead(col("st"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("rn"))))
        .filter(col("j").isNotNull)
        .groupBy(col("st").as("i"), col("j")).agg(count(lit(1)).as("c"))
      val p = edges
        .select(col("i"), col("j"), (col("c") * lit(1.0) /
          sum(col("c")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("i")))).as("pr"))
        .unionByName(Seq(("__conv", "__conv", 1.0)).toDF("i", "j", "pr"))
        .persist()
      val vars = p.select(col("i").as("rm"))
        .unionByName(p.select(col("j").as("rm"))).distinct()
        .filter(!col("rm").isin("__start", "__conv"))
        .unionByName(Seq("none").toDF("rm"))
      var m = p.crossJoin(broadcast(vars))
        .filter(col("i") =!= col("rm") && col("j") =!= col("rm"))
        .localCheckpoint()
      for (it <- 1 to 6) {
        val a = m.select(col("rm"), col("i"), col("j").as("k"), col("pr").as("pa"))
        val b = m.select(col("rm"), col("i").as("k"), col("j"), col("pr").as("pb"))
        val sq = a.join(b, Seq("rm", "k"))
          .groupBy(col("rm"), col("i"), col("j"))
          .agg(sum(col("pa") * col("pb")).as("pr"))
        m = if (cuts(it)) sq.localCheckpoint() else sq
      }
      val conv = m.filter(col("i") === "__start" && col("j") === "__conv")
        .select(col("rm"), col("pr"))
      val baseP = conv.filter(col("rm") === "none")
        .select(col("pr").as("p0"))
      val out = conv.filter(col("rm") =!= "none").crossJoin(broadcast(baseP))
        .select(col("rm").as("channel"),
          graft.functions.Portable.r6(
            (col("p0") - col("pr")) / col("p0")).as("removal_effect"))
        .orderBy(col("channel"))
      out
    }

    for (r <- 1 to 2) {
      time(s"markov cuts={2,4,6} r$r") { noop(markov(Set(2,4,6))); spark.catalog.clearCache() }
      time(s"markov cuts={3} r$r") { noop(markov(Set(3))); spark.catalog.clearCache() }
      time(s"markov cuts={} r$r") { noop(markov(Set.empty)); spark.catalog.clearCache() }
    }
    val x = markov(Set(2,4,6)).collect().mkString
    spark.catalog.clearCache()
    val y = markov(Set(3)).collect().mkString
    spark.catalog.clearCache()
    println("[exp] equal = " + (x == y))
    spark.stop()
  }
}

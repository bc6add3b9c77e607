package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable.r6
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

    def pmiOld(): DataFrame = {
      val toks = Par.widen(Tables.documents(spark, d))
        .select(Dedup.tokens(col("text")).as("__t"))
        .filter(size(col("__t")) >= 2)
      val pairs = toks.select(explode(transform(
          sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2")))).as("p"))
        .select(col("p.w1"), col("p.w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
      val n = pairs.agg(count(lit(1)).cast("double").as("n"))
      val big = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12")).filter(col("c12") >= 5)
      val u1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val u2 = pairs.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
      big.join(u1, "w1").join(u2, "w2").crossJoin(broadcast(n))
        .select(col("w1"), col("w2"), col("c12"),
          r6(log(col("c12").cast("double") * col("n") /
            (col("c1") * col("c2")))).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(50)
    }
    def pmiNew() = SparkEntry.queries("text_pmi_bigrams")(spark, d)

    for (r <- 1 to 2) {
      time(s"pmi OLD r$r") { noop(pmiOld()) }
      time(s"pmi NEW r$r") { noop(pmiNew()) }
    }
    println("[exp] pmi equal = " + (pmiOld().collect().mkString ==
      pmiNew().collect().mkString))
    spark.stop()
  }
}

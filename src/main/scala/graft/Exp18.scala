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

  // OLD pageRank inlined
  def oldPageRank(edges: DataFrame, iters: Int, scale: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val ewd = e.join(deg, Seq("src"))
      .repartition(spark.sparkContext.defaultParallelism, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = scale * 15 / 100
    var ranks = nodes.withColumn("rank", lit(scale))
    (1 to iters).foreach { _ =>
      val contribs = ewd
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("rank div __deg").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(__s, 0L)) div 100")).as("rank"))
    }
    ranks
  }

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

    // registered pagerank edges (from SparkEntry region)
    def prEdges(): DataFrame = Tables.events(spark, d)
      .select(col("user_id").as("src"),
        (lit(1000000L) + col("event_id") % 997).as("dst")).distinct()
    def prOld(): DataFrame = {
      oldPageRank(prEdges(), 3)
        .orderBy(desc("rank"), asc("node")).limit(100)
    }
    def prNew() = SparkEntry.queries("graph_pagerank")(spark, d)
    def coNew() = SparkEntry.queries("agg_cooccurrence")(spark, d)
    def coOld(): DataFrame = {
      // pre-r18 cooccurrence inline
      val df0 = Tables.documents(spark, d)
      val tok = df0.select(col("doc_id"), Dedup.tokens(col("text")).as("__t"))
        .select(col("doc_id"), explode(array_distinct(col("__t"))).as("token"))
      val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("n_docs"))
      val vocab = broadcast(dfreq
        .orderBy(col("n_docs").desc, col("token")).limit(50))
      val hits = tok.join(vocab, "token")
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("token"))).as("__v"))
      val pairArr = flatten(transform(col("__v"), (a, i) =>
        transform(slice(col("__v"), i + 2, lit(50)), b =>
          struct(a.as("token_a"), b.as("token_b")))))
      val pairs = hits
        .select(explode(pairArr).as("__pair"))
        .select(col("__pair.token_a"), col("__pair.token_b"))
        .groupBy(col("token_a"), col("token_b"))
        .agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= 2L)
      val n = df0.agg(count(lit(1)).cast("double").as("__n"))
      pairs
        .join(broadcast(vocab.select(col("token").as("token_a"),
          col("n_docs").as("__na"))), "token_a")
        .join(broadcast(vocab.select(col("token").as("token_b"),
          col("n_docs").as("__nb"))), "token_b")
        .crossJoin(broadcast(n))
        .select(col("token_a"), col("token_b"), col("n_both"),
          r6(log(col("n_both") * col("__n") / (col("__na") * col("__nb"))))
            .as("pmi"))
    }

    for (r <- 1 to 2) {
      time(s"pagerank OLD r$r") { noop(prOld()); spark.catalog.clearCache() }
      time(s"pagerank NEW r$r") { noop(prNew()); spark.catalog.clearCache() }
      time(s"cooccur OLD r$r") { noop(coOld()) }
      time(s"cooccur NEW r$r") { noop(coNew()) }
    }
    val pe = prOld().collect().mkString == prNew().collect().mkString
    spark.catalog.clearCache()
    val ce = coOld().orderBy("token_a","token_b").collect().mkString ==
      coNew().orderBy("token_a","token_b").collect().mkString
    println("[exp] pr equal = " + pe + " co equal = " + ce)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{Guards, RuntimeFilter}

/** Round-12 hardening: session-conf hygiene of the runtime Bloom
  * build, and the execution-time grain guard on the pairwise
  * statistics.
  */
class Round12OpsSpec extends SparkSpecBase {

  test("buildBloom restores the session bloom-filter conf ceilings") {
    val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val before = (spark.conf.get(itemsConf), spark.conf.get(bitsConf))
    // 8M expected items → 80M bits: above BOTH default ceilings
    // (4×10⁶ items / 2²⁶ bits), so the build must raise-then-restore
    val dim = spark.range(1000).toDF("k")
    val bf = RuntimeFilter.buildBloom(dim, col("k"), 8000000L)
    assert(bf.length > 0)
    assert((spark.conf.get(itemsConf), spark.conf.get(bitsConf)) === before,
      "bloom build leaked raised conf ceilings into the session")
  }

  test("bloomSemiJoin equals the plain semi join (oversized request)") {
    val fact = spark.range(0, 2000).toDF("k")
    val dim = spark.range(0, 2000, 7).toDF("dk")
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, col("k"), col("dk"),
      expectedItems = 8000000L).orderBy("k").collect().map(_.getLong(0))
    val want = fact.join(dim, col("k") === col("dk"), "left_semi")
      .orderBy("k").collect().map(_.getLong(0))
    assert(got.toSeq === want.toSeq)
  }

  test("grain guard passes in-bound groups unchanged") {
    val df = spark.range(100)
      .select((col("id") % 4).as("g"), col("id").as("v"))
    val guarded = Guards.assertGroupSizeBound(df, 25, "spec", col("g"))
    assert(guarded.count() === 100)
    assert(guarded.columns.toSeq === Seq("g", "v"))
  }

  test("grain guard raises on an oversized group") {
    val df = spark.range(100)
      .select((col("id") % 4).as("g"), col("id").as("v"))
    val e = intercept[Exception] {
      Guards.assertGroupSizeBound(df, 24, "spec", col("g")).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("pair-join grain exceeded")))
  }

  test("guarded pairwise queries still run at the day grain") {
    for (k <- Seq("win_mann_kendall", "agg_hodges_lehmann")) {
      assert(SparkEntry.queries(k)(spark, sf()).count() > 0, k)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import org.apache.spark.sql.graftnative.GraftNative

/** CollectListCapped — the bounded-buffer posting-list aggregate behind
  * dedup_containment_prefix. The contract under test: (1) for groups of
  * ≤ cap elements the result is multiset-identical to the builtin
  * `collect_list`; (2) an over-cap group evaluates to NULL (hard
  * exclusion, never a silently-truncated list) on the update path AND
  * on the partial-merge path; (3) a binding cap is surfaced by the
  * containment query's observe metric, so a capped run can't
  * masquerade as exact.
  */
class CappedCollectSpec extends SparkSpecBase {
  import spark.implicits._

  // groups g0..g9 with sizes 1..10, values deterministic per group
  private def grouped = spark.range(55).select(
    // triangular: row i belongs to the largest g with g*(g+1)/2 <= i
    floor((sqrt(col("id") * 8 + 1) - 1) / 2).cast("long").as("g"),
    concat(lit("v"), col("id")).as("v"))

  test("parity: equals collect_list for every under-cap group") {
    val got = grouped.groupBy("g")
      .agg(array_sort(GraftNative.collectListCapped(col("v"), 100)).as("xs"))
    val want = grouped.groupBy("g")
      .agg(array_sort(collect_list(col("v"))).as("xs"))
    assert(got.orderBy("g").collect().map(_.toString).toSeq ===
      want.orderBy("g").collect().map(_.toString).toSeq)
  }

  test("over-cap groups are NULL; cap-sized groups survive exactly") {
    val out = grouped.groupBy("g")
      .agg(GraftNative.collectListCapped(col("v"), 5).as("xs"),
        count(lit(1)).as("n"))
      .collect()
    for (r <- out) {
      val n = r.getAs[Long]("n")
      val xs = r.getAs[scala.collection.Seq[String]]("xs")
      if (n > 5) assert(xs == null, s"group size $n must overflow")
      else assert(xs != null && xs.size == n.toInt,
        s"group size $n must collect exactly, got $xs")
    }
  }

  test("overflow holds across partial-aggregation merges and the " +
      "sort-based fallback") {
    // one hot group spread over many input partitions: each partial
    // buffer is under-cap, so overflow MUST be decided at merge. Also
    // run with the object-hash fallback forced to the sort-based path.
    val hot = spark.range(200).repartition(8)
      .select(lit("hot").as("g"), col("id").cast("string").as("v"))
      .union(Seq(("cold", "x"), ("cold", "y")).toDF("g", "v"))
    def run() = hot.groupBy("g")
      .agg(GraftNative.collectListCapped(col("v"), 50).as("xs"))
      .collect().map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]]("xs")).toMap
    val base = run()
    assert(base("hot") == null, "merged 200 > cap 50 must be null")
    assert(base("cold").sorted == Seq("x", "y"))
    val prev = spark.conf.getOption(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1")
    try assert(run() === base, "sort-based fallback must agree")
    finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None => spark.conf.unset(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
  }

  test("nulls are skipped like collect_list, not collected or counted " +
      "toward the cap") {
    val df = Seq(("a", Some("x")), ("a", None), ("a", Some("y")),
      ("b", None)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(array_sort(GraftNative.collectListCapped(col("v"), 2)).as("xs"))
      .collect().map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]]("xs")).toMap
    assert(out("a") == Seq("x", "y"),
      "two non-null values fit cap 2 even with a null between them")
    assert(out("b") == Seq.empty[String],
      "all-null group collects empty, like collect_list")
  }

  // 30 boilerplate docs (their shared shingles have df ≈ 30) plus one
  // genuine duplicate pair (df = 2 shingles — always under cap)
  private def capCorpus = {
    val boiler = "end of page footer"
    val dup = "the quick brown fox jumps over the lazy dog tonight"
    ((1L to 30L).map(i =>
      (i, s"unique$i token$i body$i word$i $boiler")) ++
      Seq((100L, dup), (101L, dup))).toDF("doc_id", "text")
  }

  test("a binding cap is SURFACED by the containment observe metric " +
      "(non-empty result: the observed stage survives AQE)") {
    def run(maxPosting: Int): (Set[(Long, Long)], Long) = {
      val q = Dedup.containmentPairsExact(
        capCorpus, col("doc_id"), col("text"), threshold = 0.9,
        maxPosting = maxPosting)
      val pairs = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val obs = q.queryExecution.observedMetrics.collect {
        case (name, row) if name.startsWith("containment_capped_shingles") =>
          row.getAs[Long]("capped_shingles")
      }
      assert(obs.size == 1, s"exactly one cap observation, got $obs")
      (pairs, obs.head)
    }
    val (pairsCapped, nCapped) = run(10)
    assert(pairsCapped == Set((100L, 101L)),
      "the genuine duplicate survives the cap")
    assert(nCapped > 0,
      "boilerplate shingles with df=30 must be reported as capped at 10")
    val (pairsFree, nFree) = run(1000)
    assert(nFree == 0L,
      "no shingle caps at 1000 on this corpus — metric must read zero")
    assert(pairsFree.contains((100L, 101L)))
  }

  test("observe metric is best-effort under AQE empty-collapse; the " +
      "cap audit is the guaranteed path") {
    // all-boilerplate corpus + tight cap → EMPTY result: AQE replaces
    // the executed stages with EmptyRelationExec and the observation
    // is collected from the FINAL plan, so it can vanish. This pins
    // the documented caveat — if Spark ever starts preserving metrics
    // across empty-collapse, this test flags the doc for update.
    val boiler = (1L to 30L).map(i =>
      (i, s"unique$i token$i body$i word$i end of page footer"))
      .toDF("doc_id", "text")
    val q = Dedup.containmentPairsExact(
      boiler, col("doc_id"), col("text"), threshold = 0.2, maxPosting = 10)
    assert(q.collect().isEmpty)
    assert(q.queryExecution.observedMetrics.isEmpty,
      "documented caveat: empty-collapse drops the observation — if " +
        "this ever fails, update Dedup.containmentPairsExact's doc")
    // the audit query answers regardless of the main query's result
    val audit = Dedup.containmentCapAudit(
      boiler, col("doc_id"), col("text"), maxPosting = 10).collect()(0)
    assert(audit.getAs[Long]("capped_shingles") > 0)
    assert(audit.getAs[Long]("max_df") == 30L,
      "every doc posts the boilerplate shingle")
    assert(audit.getAs[Long]("excluded_postings") >= 30L)
    val clean = Dedup.containmentCapAudit(
      boiler, col("doc_id"), col("text"), maxPosting = 1000).collect()(0)
    assert(clean.getAs[Long]("capped_shingles") == 0L,
      "audit reads zero when the cap does not bind")
  }

  test("the observe metric and the cap audit AGREE on a planted " +
      "over-cap corpus (the two surfacing paths count the same thing)") {
    val q = Dedup.containmentPairsExact(
      capCorpus, col("doc_id"), col("text"), threshold = 0.9,
      maxPosting = 10)
    assert(q.collect().nonEmpty, "non-empty result keeps the observed " +
      "stage alive under AQE so the comparison is apples-to-apples")
    val observed = q.queryExecution.observedMetrics.collectFirst {
      case (name, row) if name.startsWith("containment_capped_shingles") =>
        row.getAs[Long]("capped_shingles")
    }.get
    val audited = Dedup.containmentCapAudit(
      capCorpus, col("doc_id"), col("text"), maxPosting = 10)
      .head().getAs[Long]("capped_shingles")
    assert(observed == audited && observed > 0L,
      s"inline metric ($observed) and guaranteed audit ($audited) must " +
        "report the same binding-cap count")
  }

  test("failOnCappedShingles: refuses an approximate result at " +
      "execution (in-pass guard, r19); passes through when the cap " +
      "does not bind") {
    // the guard fires inside the single posting pass (raise_error on an
    // over-cap posting list), so the throw happens when the query RUNS,
    // wrapped by Spark in the job-failure exception — no second audit
    // pass is paid for the proof
    val e = intercept[Throwable] {
      Dedup.containmentPairsExact(capCorpus, col("doc_id"), col("text"),
        threshold = 0.9, maxPosting = 10, failOnCappedShingles = true)
        .collect()
    }
    assert(chainMessages(e).contains("maxPosting=10"),
      s"guard must name the binding cap, got: ${chainMessages(e)}")
    val ok = Dedup.containmentPairsExact(capCorpus, col("doc_id"),
      col("text"), threshold = 0.9, maxPosting = 1000,
      failOnCappedShingles = true)
    assert(ok.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 101L)), "guarded under-cap run returns the exact pairs")
  }

  test("the guarded form runs NO eager job at construction (the r19 " +
      "fold — guard rides the main plan), and matches the unguarded " +
      "result under the cap") {
    // the old guarded form ran containmentCapAudit as a SEPARATE Spark
    // job at DataFrame-construction time (a second full shingle pass);
    // the r19 fold moves the guard into the posting pass itself, so
    // construction must be job-free
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    val guarded =
      try {
        val g = Dedup.containmentPairsExact(capCorpus, col("doc_id"),
          col("text"), threshold = 0.9, maxPosting = 1000,
          failOnCappedShingles = true)
        org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
        assert(jobs == 0,
          s"guarded construction must run no Spark job (the old eager " +
            s"audit did), ran $jobs")
        g
      } finally spark.sparkContext.removeSparkListener(l)
    val unguarded = Dedup.containmentPairsExact(capCorpus, col("doc_id"),
      col("text"), threshold = 0.9, maxPosting = 1000)
    assert(guarded.collect().map(_.toString).sorted.toSeq ==
      unguarded.collect().map(_.toString).sorted.toSeq,
      "guard must be invisible in the result when the cap holds")
  }

  test("the REGISTERED dedup_containment_prefix query runs with the " +
      "guard ON (its green correctness row is a proven-exact row)") {
    // VERDICT r15 task 7: the driver corpus is under-cap, so the
    // registered query passing proves nothing about the guard unless
    // the guard is actually wired in. Planting a corpus whose df
    // distribution exceeds the registration's maxPosting=1000 and
    // watching the REGISTERED fn throw the audit exception proves the
    // harness path is the guarded form, not the silent one.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_guard_corpus").toString
    try {
      (1L to 1100L).toDF("doc_id")
        .select(col("doc_id"),
          concat(lit("unique"), col("doc_id"),
            lit(" the same boilerplate tail every doc shares"))
            .as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val e = intercept[Throwable] {
        SparkEntry.queries("dedup_containment_prefix")(spark, dir).collect()
      }
      assert(chainMessages(e).contains("maxPosting=1000"),
        s"registered query must surface the binding cap, got: " +
          chainMessages(e))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}

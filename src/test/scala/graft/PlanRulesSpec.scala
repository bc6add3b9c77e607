package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftNative.FloatDotProduct

import graft.ops.Similarity
import graft.plans.FuseFloatDot

/** The SparkSessionExtensions optimizer rule: the composable
  * zip_with+aggregate dot product must be rewritten to the native
  * codegen'd FloatDotProduct — same values, fused plan — and arrays
  * whose elements are nullable must be left untouched (the two forms
  * disagree on null elements).
  *
  * Inputs are built over `spark.range` rather than local Seqs: a
  * LocalRelation projection is constant-folded away by the optimizer,
  * leaving no expression tree to assert on.
  */
class PlanRulesSpec extends SparkSpecBase {
  import spark.implicits._

  // a = [id+1, id+2, id+3], b = [id+2, id+4, id+6] as non-null floats
  private def vecs = spark.range(2).select(
    col("id"),
    transform(sequence(lit(1L), lit(3L)),
      i => (i + col("id")).cast("float")).as("a"),
    transform(sequence(lit(1L), lit(3L)),
      i => (i * 2 + col("id")).cast("float")).as("b"))

  // search the WHOLE plan tree — root-only .expressions would let the
  // negative assertions pass vacuously if the projection sits deeper
  private def optimizedHasNativeDot(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[FloatDotProduct])))

  test("FuseFloatDot rewrites the composable form and preserves values") {
    FuseFloatDot.install(spark)
    try {
      val composable = vecs.select(
        Similarity.dotComposable($"a", $"b").as("dot"))
      assert(optimizedHasNativeDot(composable),
        "composable dot should be fused to FloatDotProduct")
      val viaNative = vecs.select(Similarity.dot($"a", $"b").as("dot"))
      assert(composable.as[Double].collect().toSeq ==
        viaNative.as[Double].collect().toSeq)
      // id=0: 1*2+2*4+3*6 = 28; id=1: 2*3+3*5+4*7 = 49
      assert(composable.orderBy("dot").as[Double].collect().toSeq ==
        Seq(28.0, 49.0))
    } finally FuseFloatDot.uninstall(spark)
  }

  test("FuseFloatDot leaves nullable-element arrays untouched") {
    FuseFloatDot.install(spark)
    try {
      // when() makes the element nullable -> containsNull = true
      val nullable = spark.range(2).select(
        transform(sequence(lit(1L), lit(3L)),
          i => when(i > col("id"), i.cast("float"))).as("a"),
        transform(sequence(lit(1L), lit(3L)),
          i => i.cast("float")).as("b"))
      val q = nullable.select(aggregate(
        zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("dot"))
      assert(!optimizedHasNativeDot(q),
        "nullable elements must not fuse — null semantics differ")
      // composable null-propagation semantics preserved: id=1 row has a
      // null element -> null dot; id=0 row is fully defined -> 1+4+9=14
      val got = q.collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSet
      assert(got == Set(Some(14.0), None))
    } finally FuseFloatDot.uninstall(spark)
  }

  test("rule is inert after uninstall") {
    val q = vecs.select(Similarity.dotComposable($"a", $"b").as("dot"))
    assert(!optimizedHasNativeDot(q))
    assert(q.orderBy("dot").as[Double].collect().toSeq == Seq(28.0, 49.0))
  }

  test("bucketed table aggregation on the bucket key plans no shuffle") {
    val tmp = Scratch.dir("graft_bucket_spec")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_spec_t")
    spark.range(1000)
      .select(col("id"), (col("id") % 37).as("k"),
        (col("id") * 2).cast("double").as("v"))
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$tmp/t").mode("overwrite")
      .saveAsTable("graft_bucket_spec_t")
    val agg = spark.table("graft_bucket_spec_t")
      .groupBy(col("k")).agg(sum(col("v")).as("total"))
    val rows = agg.collect()
    assert(rows.length == 37)
    // after execution the adaptive plan is final; a bucketed scan
    // already provides hash distribution on k, so no Exchange may appear
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed-key aggregation must be shuffle-free, got:\n$plan")
    assert(plan.contains("Bucketed: true"),
      "scan must actually use the bucketed layout")
  }

  test("co-bucketed merge join plans no shuffle on either side") {
    val tmp = Scratch.dir("graft_cobucket_spec")
    spark.sql("DROP TABLE IF EXISTS graft_cob_a")
    spark.sql("DROP TABLE IF EXISTS graft_cob_b")
    spark.range(500).select(col("id").as("k"), (col("id") * 3).as("va"))
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$tmp/a").mode("overwrite").saveAsTable("graft_cob_a")
    spark.range(200).select(col("id").as("k2"), (col("id") + 7).as("vb"))
      .write.bucketBy(4, "k2").sortBy("k2")
      .option("path", s"$tmp/b").mode("overwrite").saveAsTable("graft_cob_b")
    val j = spark.table("graft_cob_a").hint("merge")
      .join(spark.table("graft_cob_b"), col("k") === col("k2"))
      .select(col("k"), col("va"), col("vb"))
    // collect() (not count(), which builds a DIFFERENT QueryExecution)
    // so the inspected plan below is the adaptive FINAL plan of the
    // execution that actually ran
    assert(j.collect().length == 200)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(!plan.contains("Exchange"),
      s"co-bucketed merge join must be shuffle-free, got:\n$plan")
  }

  test("ohlc plans as one aggregation shuffle, no window sort") {
    val ev = Tables.events(spark, sf())
    val df = graft.ops.TimeSeries.ohlc(ev, col("event_type"),
      date_trunc("hour", col("ts")), col("ts"), col("value"),
      col("event_id"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // a windowed first/last formulation would add a Window node and a
    // second sort-for-window; the min_by/max_by form is agg-only
    assert(!plan.contains("Window"), s"ohlc must not window, got:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"ohlc must shuffle once, got $exchanges:\n$plan")
  }

  test("histogram broadcasts its stats — no data-sized join shuffle") {
    val ev = Tables.events(spark, sf())
    val df = graft.ops.TimeSeries.equiWidthHistogram(
      ev, col("event_type"), col("value"), 20)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats must attach via broadcast, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"histogram must never shuffle the fact side for the join:\n$plan")
  }

  test("mixture sampling is a pure pushed-down filter — zero shuffles") {
    val docs = Tables.documents(spark, sf())
    val df = graft.ops.Sampling.mixtureSample(docs, col("doc_id"),
      col("source"), Map("src0" -> 900), 100)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sampling must be a map-only filter, got:\n$plan")
  }

  test("funnel stage joins broadcast the per-user tables") {
    val ev = Tables.events(spark, sf())
    val df = graft.ops.EventAnalytics.funnelStages(ev, col("user_id"),
      col("ts"), col("event_type"), Seq("view", "click", "purchase"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the per-user stage tables are aggregate output — a sort-merge join
    // would shuffle the event scan once per funnel step
    assert(!plan.contains("SortMergeJoin"),
      s"funnel must broadcast its per-user stage tables, got:\n$plan")
  }

  test("bm25 never explodes tokens and ends in a top-k, not a global sort") {
    val docs = Tables.documents(spark, sf())
    val df = graft.ops.TextOps.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("hash", "join"), topK = 10)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"tf must come from size(filter()), not an explode, got:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered, got:\n$plan")
  }

  test("edit-distance keeps the Levenshtein inside the join condition") {
    val docs = Tables.documents(spark, sf())
    val df = graft.ops.Dedup.editDistancePairs(docs, col("doc_id"),
      col("text"), prefixLen = 12, maxDist = 20)
    assert(df.count() > 0)
    // a post-join Filter on the computed dist column gets pushed back
    // into the join where it runs per bucket candidate before the cheap
    // guards and twice per comparison — the distance test must stay a
    // single last join conjunct (measured 8x at sf0.1)
    val optimized = df.queryExecution.optimizedPlan
    val filtersWithLev = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.toLowerCase.contains("levenshtein") => f
    }
    assert(filtersWithLev.isEmpty,
      s"dist must be a join conjunct, not a Filter:\n$optimized")
    val joinsWithLev = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(
            _.toString.toLowerCase.contains("levenshtein")) => j
    }
    assert(joinsWithLev.nonEmpty,
      s"expected the Levenshtein in the join condition:\n$optimized")
  }

  test("custom as-of operator: plans AsOfJoinExec, equals the composition") {
    import graft.ops.AsOf
    import graft.plans.NativeAsOf
    // the joinPrior fixture: <= tie, latest-prior pick, no-match nulls
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L),
      (4L, "w", 10L)).toDF("id", "k", "t")
    val right = Seq(("u", 10L, "a"), ("u", 15L, "b"), ("v", 1L, "x"))
      .toDF("k", "rt", "payload")
    val native = NativeAsOf.joinPrior(left, right, Seq("k"), "t", "rt",
      Seq("payload"))
    val got = native.select(col("id"), col("payload")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None,
      4L -> None))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"),
      s"expected the custom exec in the plan:\n$plan")
    // row-for-row equal to the union-window composition on real data
    val e = Tables.events(spark, sf())
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
    val a = NativeAsOf.joinPrior(clicks, views, Seq("user_id"), "ts", "ts",
      Seq("v")).select("event_id", "v")
    val b = AsOf.joinPrior(clicks, views, Seq("user_id"), col("ts"),
      col("ts"), Seq("v")).select("event_id", "v")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("custom as-of operator: non-nullable payload still nulls unmatched rows") {
    import graft.plans.NativeAsOf
    // tuple-derived Long columns are nullable=false — the projection must
    // widen payload nullability or an unmatched row's null slot reads as 0
    val left = Seq((1L, "u", 10L), (2L, "z", 10L)).toDF("id", "k", "t")
    val right = Seq(("u", 5L, 42L)).toDF("k", "rt", "pay")
    assert(!right.schema("pay").nullable, "fixture must be non-nullable")
    val got = NativeAsOf.joinPrior(left, right, Seq("k"), "t", "rt", Seq("pay"))
      .select(col("id"), col("pay")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(1L -> Some(42L), 2L -> None),
      s"unmatched non-nullable payload must be NULL, not 0: $got")
  }

  test("custom as-of operator: skewed key (~50% of rows) equals composition") {
    import graft.ops.AsOf
    import graft.plans.NativeAsOf
    // worst case for the O(1)-state claim: one key holds half the data,
    // so a single partition's merge frontier sees ~n/2 rows on each side
    val n = 20000L
    val left = spark.range(n).select(
      when($"id" % 2 === 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 97))
        .as("k"),
      ($"id" * 3 % 10000).as("t"), $"id".as("lid"))
    val right = spark.range(n / 2).select(
      when($"id" % 2 === 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 97))
        .as("k"),
      ($"id" * 7 % 10000).as("rt"), $"id".as("rid"))
      // joinPrior contract: right unique per (key, time) — dedup first so
      // both implementations face the same well-formed input
      .groupBy($"k", $"rt").agg(max($"rid").as("rid"))
    val a = NativeAsOf.joinPrior(left, right, Seq("k"), "t", "rt", Seq("rid"))
      .select($"lid", $"rid")
    val b = AsOf.joinPrior(left, right, Seq("k"), col("t"), col("rt"),
      Seq("rid")).select($"lid", $"rid")
    assert(a.count() == n)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("counterTotalsMerged: one data-sized shuffle, hash-agg reuses it") {
    val df = SparkEntry.queries("agg_counter_merge")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // exchange 1 shuffles raw rows for the (key, day) window; the day
    // aggregate must ride that partitioning (project-to-attributes-first
    // keeps the alias match); exchange 2 carries only day partials into
    // the week window — a third exchange or a SortAggregate means the
    // reuse regressed to the two-stacked-pass shape
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"expected 2 exchanges (data-sized window + day-partials), got $exchanges:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"day rollup must hash-aggregate, not sort-aggregate:\n$plan")
  }

  test("interval union rides ONE keyed window exchange") {
    val df = SparkEntry.queries("agg_interval_coverage")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"gaps-and-islands must be one keyed window shuffle, got $exchanges:\n$plan")
  }

  test("topPaths bounds candidates with TakeOrdered before ranking") {
    val df = SparkEntry.queries("agg_top_paths")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // a global Sort over every distinct path would be the scale smell;
    // the k-bounding must plan as TakeOrderedAndProject
    assert(plan.contains("TakeOrdered"),
      s"top-k must plan as TakeOrderedAndProject:\n$plan")
  }

  test("predicate pushdown and column pruning reach the parquet scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // filter_eq_dim: both equality predicates land in the scan's
    // PushedFilters (row groups whose stats exclude R/F never
    // decompress), and the scan reads 5 of lineitem's 16 columns
    val f = SparkEntry.queries("filter_eq_dim")(spark, sf())
    val fScans = f.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(fScans.nonEmpty, "expected a FileSourceScanExec")
    val pushed = fScans.head.metadata("PushedFilters")
    assert(pushed.contains("EqualTo(l_returnflag,R)") &&
      pushed.contains("EqualTo(l_linestatus,F)"),
      s"filter must be pushed to the scan, got: $pushed")
    assert(fScans.head.output.map(_.name).toSet ===
      Set("l_orderkey", "l_linenumber", "l_quantity",
        "l_returnflag", "l_linestatus"),
      "scan must read only the referenced columns")
    // project_columns: a 3-column projection reads exactly 3 columns
    val p = SparkEntry.queries("project_columns")(spark, sf())
    val pScans = p.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(pScans.nonEmpty, "expected a FileSourceScanExec")
    assert(pScans.head.output.map(_.name).toSet ===
      Set("c_custkey", "c_name", "c_acctbal"),
      "a 3-column projection must prune the scan to those 3 columns")
  }

  test("time_bucket is a pure projection — zero exchanges, pushdown-safe") {
    val df = SparkEntry.queries("f_time_bucket_width")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"an anchored bucket must not shuffle:\n$plan")
  }

  test("star-schema rollup broadcasts every dim — fact side never shuffles") {
    val df = SparkEntry.queries("join_star_broadcast")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj == 3, s"expected 3 broadcast joins, got $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the fact side must never shuffle for a join:\n$plan")
  }

  test("joinNearest is join-free: one union-window exchange, no Join node") {
    val left = spark.range(100).select(($"id" % 7).cast("string").as("k"),
      $"id".as("t"), $"id".as("lid"))
    val right = spark.range(50).select(($"id" % 7).cast("string").as("k"),
      ($"id" * 2).as("rt"), $"id".as("rid"))
    val df = graft.ops.AsOf.joinNearest(left, right, Seq("k"),
      col("t"), col("rt"), Seq("rid"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // nearest-in-time must come from the sorted union (both directions,
    // one window), never a per-key join blow-up
    assert(!plan.contains("Join"), s"joinNearest must not join, got:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"one window shuffle expected, got $exchanges:\n$plan")
  }

  test("rolling corr: cumsum-difference plan, equal to the sliding frame") {
    val df = SparkEntry.queries("win_rolling_corr")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // the 50-row Pearson must ride O(1)/row cumulative sums + lag(·, 50),
    // never a sliding frame (Spark re-evaluates ALL frame rows × all six
    // aggregates per output row — the 30 s sf1 regression this replaced)
    assert(!plan.contains("-49"),
      s"sliding 49-PRECEDING frame crept back into the plan:\n$plan")
    // value equivalence against the direct sliding-frame formula on the
    // same integer-cents feed (exact in either accumulation order)
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"ts", $"event_id")
    val f = ord.rowsBetween(-49, 0)
    val base = Tables.events(spark, sf())
      .select($"event_id", $"event_type", $"ts",
        round($"value" * 100, 0).cast("long").as("x"))
      .withColumn("y", lag($"x", 1).over(ord))
      .filter($"y".isNotNull)
    val (n, sx, sy) = (count(lit(1)).over(f).cast("double"),
      sum($"x").over(f).cast("double"), sum($"y").over(f).cast("double"))
    val (sxy, sxx, syy) = (sum($"x" * $"y").over(f).cast("double"),
      sum($"x" * $"x").over(f).cast("double"),
      sum($"y" * $"y").over(f).cast("double"))
    val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    val ref = base.select($"event_id",
      when(den > 0, round((n * sxy - sx * sy) / sqrt(den), 6)).as("rc"))
    val joined = df.join(ref, "event_id")
    assert(joined.count() > 0)
    assert(joined.filter(!($"roll_corr" <=> $"rc")).isEmpty,
      "cumsum-difference corr diverged from the sliding-frame reference")
  }

  test("rolling zscore: growing-frame plan, one keyed exchange, no sliding frame") {
    val df = SparkEntry.queries("win_rolling_zscore")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the trailing-24 S/SS/n must ride cumulatives + lag(·, 24), never a
    // sliding 23-PRECEDING frame (O(k)/row re-evaluation — the same
    // regression class win_rolling_corr had at sf1)
    assert(!plan.contains("-23"),
      s"sliding 23-PRECEDING frame crept into the zscore plan:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"zscore must be one keyed window shuffle, got $exchanges:\n$plan")
  }

  test("cusum: closed-form windows on one keyed exchange, no sliding frame") {
    val df = SparkEntry.queries("win_cusum")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // cumsum + running-min are both unbounded-preceding growing frames
    // over the same (key, ts, tie) sort as the per-key mean window
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"cusum windows all partition by the same key — expected 1 exchange, got $exchanges:\n$plan")
  }

  test("interval overlap: banded per-row expression — no Join node at all") {
    val df = SparkEntry.queries("join_interval_overlap")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the daily window attaches by BANDING islands to days (bounded
    // explode), so a range/cartesian join on intervals must be absent
    assert(!plan.contains("Join"),
      s"interval overlap must be join-free (banding + expression), got:\n$plan")
  }

  test("anti join: probe side reduced to distinct keys and broadcast") {
    val df = SparkEntry.queries("join_anti")(spark, sf())
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"expected a left anti join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"distinct keys must broadcast — the fact payload never shuffles:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"anti join regressed to a co-shuffle:\n$plan")
  }

  test("decay score: anchor day attaches via broadcast, events never shuffle") {
    val df = SparkEntry.queries("f_exp_decay_score")(spark, sf())
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the scalar anchor must attach via broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"events must not shuffle for the anchor scalar:\n$plan")
  }

  test("k-means assignment broadcasts centroids — vectors never shuffle") {
    val q = Tables.embeddings(spark, sf()).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(100.0))).as("qv"))
    val df = graft.ml.KMeans.assignIterations(q, col("vec_id"), col("qv"),
      k = 4, stride = 37, iters = 1)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids must attach via broadcast, got:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the vector side must never shuffle for the join, got:\n$plan")
  }

  test("hotColdJoin routes the hot slice through a broadcast branch") {
    val fact = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_partkey"))
    val dim = Tables.part(spark, sf())
      .select(col("p_partkey").as("l_partkey"), col("p_retailprice"))
    val df = graft.ops.Skew.hotColdJoin(fact, dim, "l_partkey",
      hotKeys = 8)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Union"),
      s"hot and cold branches must reassemble via union:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the hot branch must be a broadcast join:\n$plan")
    // the hot-set selection is a bounded top-k, never a global sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"hot keys must come from a per-partition top-k:\n$plan")
  }

  test("deterministicShuffle plans no single-partition exchange") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val df = graft.ops.Sampling.deterministicShuffle(docs, col("doc_id"),
      "pos")
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the bucket-offsets window runs over a 256-row aggregate (its
    // SinglePartition exchange is bounded by design); the DATA path
    // must never range-partition for a global sort
    assert(!plan.contains("rangepartitioning"),
      s"the permutation must never globally sort the data:\n$plan")
  }

  test("adjacentPairStats ends in a bounded top-k, not a global sort") {
    val df = graft.ops.TextOps.adjacentPairStats(
      Tables.documents(spark, sf()), col("text"), k = 20)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject:\n$plan")
  }

  // ---- pipelined pair-verify convention (r16 rewrite, pinned r17) ----
  // The r11 lesson — never attach array payloads to a materialized pair
  // stream — was violated by the one operator predating it and silently
  // copied into phash. These pins make the shape unregressable: the
  // verify expression must run inside the band self-join's stage (so no
  // Exchange anywhere carries TWO payload-array columns — the only
  // place both sides' arrays coexist is pipelined join output), and the
  // distinct must see only threshold-surviving rows.

  /** Static physical plan with AQE off: the shape rule is about the
    * compile-time plan, and AdaptiveSparkPlanExec hides its tree from
    * collect() until execution. */
  private def staticPlan(mk: => org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def assertPairVerifyShape(
      plan: org.apache.spark.sql.execution.SparkPlan,
      optimized: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      thresholdMarks: Seq[String]): Unit = {
    import org.apache.spark.sql.types.ArrayType
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.nonEmpty, "expected a shuffling plan")
    exchanges.foreach { e =>
      val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.size <= 1,
        s"an Exchange carries ${arrays.size} array payload columns " +
          s"(${arrays.map(_.name).mkString(", ")}) — the pair stream " +
          "with both payloads must stay pipelined inside the join stage")
    }
    // distinct (an Aggregate grouping on the output columns) must sit
    // ABOVE the threshold verify: below the aggregate the threshold
    // appears either as a pushed Filter or — the strongest form, what
    // the optimizer actually produces — as a conjunct of the band
    // self-join's own condition, so the distinct shuffle sees only
    // surviving near-dups
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join}
    val aggs = optimized.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, s"expected the distinct Aggregate:\n$optimized")
    assert(aggs.exists(_.child.exists {
      case f: Filter => thresholdMarks.exists( // alias may be substituted
        f.condition.toString.contains)         // when the filter pushes
      case j: Join => j.condition.exists(c =>
        thresholdMarks.exists(c.toString.contains))
      case _ => false
    }), s"threshold verify (${thresholdMarks.mkString("|")}) must sit " +
      s"BELOW the distinct, not above it:\n$optimized")
  }

  test("cosine near-dup pairs keep the pipelined pair-verify shape") {
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val planted = e.unionByName(e.withColumn("id", col("id") + 1000000L))
    def df = graft.ops.Similarity.cosineNearDupPairs(planted, 0.999)
    assertPairVerifyShape(staticPlan(df), df.queryExecution.optimizedPlan,
      thresholdMarks = Seq("0.999"))
  }

  test("dHash64 is window-free — probe pairs decode in-row") {
    val payload = graft.ops.Multimodal.asPayload(
      Tables.documents(spark, sf()), col("doc_id"), col("text"))
    val df = graft.ops.Multimodal.dHash64(payload)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the r17 rewrite decodes probe i and i+1 in the same row: a Window
    // node here means the lead(p)-over-(media_id, i) form crept back,
    // re-introducing the 65·n-row shuffle+sort (6 GB of spill at sf10)
    assert(!plan.contains("Window"),
      s"dHash64 must not window over the probe stream:\n$plan")
  }

  test("phash near-dup pairs keep the pipelined pair-verify shape") {
    val payload = graft.ops.Multimodal.asPayload(
      Tables.documents(spark, sf()), col("doc_id"), col("text"))
    // unguarded form: the plan pin targets the library pair-join shape
    // itself, without the guarded default's eager-audit cache in the way
    def df = graft.ops.Multimodal.phashNearDupPairs(payload, maxHamming = 3,
      failOnCappedBuckets = false)
    assertPairVerifyShape(staticPlan(df), df.queryExecution.optimizedPlan,
      thresholdMarks = Seq("hamming", "bit_count"))
  }

  test("simhash near-dup pairs keep the pipelined pair-verify shape") {
    val sims = graft.ops.Dedup.simhash(
      Tables.documents(spark, sf()), col("doc_id"), col("text"))
    def df = graft.ops.Dedup.simhashPairs(sims, maxHamming = 3,
      failOnCappedBuckets = false) // unguarded: pin the bare join shape
    assertPairVerifyShape(staticPlan(df), df.queryExecution.optimizedPlan,
      thresholdMarks = Seq("hamming", "bit_count"))
  }

  test("SQL names reach the native expressions (pure-SQL surface)") {
    org.apache.spark.sql.graftnative.GraftNative
      .registerSqlFunctions(spark)
    val dot = spark.sql(
      """SELECT graft_float_dot(
           array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
           array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""")
      .head().getDouble(0)
    assert(dot === 11.0)
    // md5_base28 matches the portable Column formulation bit-for-bit
    val row = spark.sql(
      """SELECT graft_md5_base28(array('a', 'b')) AS h,
                graft_minhash_signature(
                  graft_md5_base28(array('a', 'b')), 4) AS sig""").head()
    val viaColumns = spark.range(1)
      .select(graft.functions.PortableHash
        .md5Long(org.apache.spark.sql.functions.lit("a"), 7).as("ha"),
        graft.functions.PortableHash
          .md5Long(org.apache.spark.sql.functions.lit("b"), 7).as("hb"))
      .head()
    assert(row.getSeq[Long](0) === Seq(viaColumns.getLong(0),
      viaColumns.getLong(1)))
    assert(row.getSeq[Long](1).length === 4)
  }
}

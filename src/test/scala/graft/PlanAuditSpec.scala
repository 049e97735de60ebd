package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit — the automated form of the
  * per-round scale-killer sweep. Every `SparkEntry.queries` entry is
  * PLANNED (not executed) at sf0.001 and checked:
  *
  *  1. `CartesianProduct` appears in NO query's physical plan, ever.
  *     (Current state: zero across all 224 — a data×data cartesian is
  *     unbounded at 100 TB and there is no adjudicated exception.)
  *  2. Every non-equi logical `Join` (the shapes that plan as
  *     `BroadcastNestedLoopJoin`) must carry a side whose
  *     `maxRows` proves it bounded (≤ 4096 rows — ungrouped
  *     aggregates, literal probe frames, limits). An equi-key must be
  *     a TOP-LEVEL CONJUNCT ([[PlanChecks.hasEquiKeys]]) — an
  *     `EqualTo` under `Or`/`Not` does not make a join hash-joinable.
  *  3. Queries where the bounded side is bounded by CONSTRUCTION but
  *     invisible to `maxRows` (a grouped aggregate over a bounded key
  *     domain — k-means centroids, PQ codebooks, literal query
  *     frames) are allowlisted BY NAME with the reason; anything new
  *     that plans a nest-loop join with no provable bound fails the
  *     suite instead of shipping.
  *  4. Every `Window`/`WindowGroupLimit` with an EMPTY (or
  *     all-foldable) partitionSpec — a single-task global sort, the
  *     other scale-killer class — must either have a `maxRows`-bounded
  *     child or be allowlisted by name with the bounded-domain reason
  *     (calendar days, value buckets, spark_partition_id offset
  *     frames from the two-phase `Analytics.globalRunning`
  *     decomposition — aggregate domains, never corpus rows).
  *  5. No query's pre-AQE physical plan scans EVERY column of a wide
  *     (>4 col) canonical corpus table ([[PlanChecks.fullWidthScans]])
  *     unless allowlisted with the reason the query genuinely consumes
  *     the full record (survivor export, whole-row fingerprinting). A
  *     missing projection is invisible to row-count reasoning but at
  *     100 TB it ships every byte of `text` through a scan that needed
  *     two columns — column pruning is the audit's third class.
  *
  * All three classes traverse through scalar-subquery plans AND
  * cached subplans (`InMemoryRelation`/`InMemoryTableScanExec`): a
  * cache is built by the first query that runs it, so a cartesian,
  * global window, or full-width scan hiding inside one is that
  * query's scale cost — round 10 only descended for the scan class
  * (the judged asymmetry); the walk is now shared.
  * `graft.PlanScan` (Test/runMain) prints the adjudication table the
  * two allowlists were derived from; predicates live in
  * [[PlanChecks]], shared with the scan so the test and the table
  * can never disagree.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val boundCap = 4096L
  private val widthCap = 4

  /** Non-equi joins whose bounded side is a grouped aggregate over a
    * key domain that is bounded by construction (maxRows can't see
    * it). Each entry names the bounded side. */
  private val boundedByConstruction: Map[String, String] = Map(
    "q115_quantized_ann" ->
      ("centroid attach (assign + probe): deterministic 1/250 subset " +
        "standing in for fixed-k sampled centroids at scale (q41 doc)"),
    "q144_semantic_dedup_increment" ->
      "centroid attach: fitCentroids(k = 6) table",
    "q162_ivf_pq_serve" ->
      ("centroid attach (assign + probe): 1/250 subset standing in for " +
        "fixed-k sampled centroids; PQ codebook is 16 codes x 8 subspaces"),
    "q188_hll_intersection" ->
      "ta < tb self-pair over the distinct event-type domain (5 values)",
    "q196_cluster_purity" ->
      "centroid attach (fit iterations + assign): fitCentroids(k = 4)",
    "q212_hybrid_fusion" ->
      ("5-vector literal query frame (vec_id between 1 and 5) broadcast " +
        "against one corpus pass (bruteForceTopK self-match exclusion)"),
    "q25_ann_bruteforce" ->
      ("8-vector literal query frame (vec_id < 8) broadcast against the " +
        "streaming corpus (bruteForceTopK self-match exclusion)"),
    "q41_ann_ivf" ->
      ("centroid attach (assign + probe): deterministic 1/250 subset " +
        "standing in for fixed-k sampled centroids at scale (in-source doc)"),
    "q55_kmeans_fit" ->
      "centroid attach: fitCentroids(k = 4) fit iterations",
    "q63_sampled_fit" ->
      "sampled-fit centroid attach: fitCentroids(k = 4) on a hash sample",
    // round 11: the shared traversal now descends into CACHED
    // subplans, surfacing the same centroid-attach shape inside each
    // query's persisted assignment/pair stage (the cache hid it from
    // round 10's walk). Identical bound to the q41/q115 entries: the
    // broadcast side is a deterministic 1/100-250 subset standing in
    // for fixed-k sampled centroids at scale.
    "q102_triangles" ->
      "centroid attach inside the cached similarity-pair subplan",
    "q134_ivf_index_probe" ->
      "centroid attach (probe) inside the cached index subplan",
    "q137_semantic_dedup" ->
      "centroid attach inside the cached assignment subplan",
    "q138_ivf_index_append" ->
      "centroid attach (append assign) inside the cached index subplan",
    "q145_semantic_retention_sweep" ->
      "centroid attach inside the cached assignment subplan",
    "q147_semantic_dedup_multiprobe" ->
      "centroid attach ×2 (assign + probe) inside the cached subplan",
    "q167_clustering_coeff" ->
      "centroid attach inside the cached similarity-pair subplan",
    "q182_label_propagation" ->
      "centroid attach inside the cached similarity-pair subplan",
    "q54_embed_neardup" ->
      "centroid attach inside the cached assignment subplan")

  /** Empty-partitionSpec windows whose frame is bounded by
    * construction but invisible to maxRows. Each entry names the
    * bounded DOMAIN the window runs over — aggregate frames only,
    * never corpus rows. "pid offset frame" = the ≤ shuffle-partitions
    * offset window of the two-phase `Analytics.globalRunning`
    * decomposition (the q207 prefix-sum pattern). */
  private val boundedWindowDomain: Map[String, String] = Map(
    "q173_funnel_latency" ->
      "two-phase percentile ranks: pid offset frame (≤ shuffle partitions)",
    "q176_rfm_segments" ->
      "two-phase ntile ×3 (R/F/M): pid offset frames (≤ shuffle partitions)",
    "q177_abc_analysis" ->
      "two-phase cumulative revenue: pid offset frame (≤ shuffle partitions)",
    "q184_skyline" ->
      "frontier max over the per-PRICE aggregate — price value domain",
    "q190_greedy_coverage" ->
      "cumulative gain over the greedy-round frame (5 iterations)",
    "q193_churn_hazard" ->
      "at-risk tail sum over the tenure-week aggregate (calendar-bounded)",
    "q194_daily_audience" ->
      "cumulative new users over the per-DAY aggregate (calendar-bounded)",
    "q200_corpus_scorecard" ->
      ("exact p50 over the token-count VALUE domain (distinct per-doc " +
        "token counts, bounded by max doc length)"),
    "q207_peak_concurrency" ->
      "day-offset prefix sum over the per-DAY aggregate (canonical form)",
    "q209_incident_impact" ->
      ("p95 threshold rank over the 10-minute error-bin aggregate " +
        "(calendar-bounded)"),
    "q34_value_histogram" ->
      ("grand-total share over the 50-unit value-bucket aggregate " +
        "(value domain)"),
    "q39_running_revenue" ->
      "running totals over the per-DAY aggregate (calendar-bounded)",
    "q59_split_assign" ->
      "share-of-total over the 3-row split aggregate",
    "q64_shard_assign" ->
      "two-phase corpus ntile: pid offset frame (≤ shuffle partitions)",
    "q98_mixture_weights" ->
      "mixture shares over the per-SOURCE aggregate (source domain)",
    // round 11 (cached-subplan traversal): the state count inside the
    // persisted Markov states frame — a window over the per-TYPE
    // transition-total aggregate, |event types| rows (5 here), the
    // same aggregate-domain class as q98's source-domain entry
    "q183_markov_stationary" ->
      "state count over the per-TYPE transition aggregate (type domain)")

  /** Queries that scan a wide canonical table FULL-WIDTH because they
    * genuinely consume the whole record. Each entry names the reason
    * every column is load-bearing. (PlanScan adjudication: these are
    * the only 2 full-width wide-table scans in the 224-query catalog.) */
  private val fullRecordScans: Map[String, String] = Map(
    "q215_constraint_suite" ->
      ("the declarative suite profiles EVERY documents column — " +
        "Completeness(text), UniqueRatio(doc_id), bounds(n_chars), " +
        "Match/InSet(lang) — grouped by source; full width IS the " +
        "projection, and the suite compiles to one aggregate pass"),
    "q219_suite_drift" ->
      ("suggest profiles text/doc_id/n_chars/lang on the baseline " +
        "half and the suggested suite re-evaluates them on the next " +
        "half, grouped by source — every column load-bearing"))

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without scale-killer joins or global windows") {
      GraftTestSpark.withCaches {
        val qe = fn(spark, dir).queryExecution
        val carts = PlanChecks.cartesians(qe.executedPlan)
        assert(carts.isEmpty,
          s"$name plans a CartesianProduct — unbounded at scale, no " +
            s"exceptions:\n  ${carts.mkString("\n  ")}")
        val unbounded =
          PlanChecks.unboundedNestLoops(qe.optimizedPlan, boundCap)
        if (!boundedByConstruction.contains(name))
          assert(unbounded.isEmpty,
            s"$name plans ${unbounded.size} nest-loop join(s) with no " +
              "provably bounded side — verify the bound, then allowlist " +
              "with the reason:\n  " + unbounded.mkString("\n  "))
        val gwin =
          PlanChecks.unboundedGlobalWindows(qe.optimizedPlan, boundCap)
        if (!boundedWindowDomain.contains(name))
          assert(gwin.isEmpty,
            s"$name plans ${gwin.size} empty-partitionSpec window(s) over " +
              "a frame maxRows can't bound — a single-task global sort " +
              "at scale; decompose two-phase (Analytics.globalRunning) " +
              "or allowlist with the bounded-domain reason:\n  " +
              gwin.mkString("\n  "))
        val scans = PlanChecks.fullWidthScans(qe.executedPlan, widthCap)
        if (!fullRecordScans.contains(name))
          assert(scans.isEmpty,
            s"$name scans ${scans.size} wide corpus table(s) FULL-WIDTH " +
              "— a missing projection ships every column at 100 TB; " +
              "select the needed columns or allowlist with the reason " +
              "the whole record is consumed:\n" +
              scans.map { case (t, w) => s"  $t (all $w columns)" }
                .mkString("\n"))
      }
    }
  }

  // -- the audit's own teeth: injected counterexamples must be caught

  private def docs() = spark.read.parquet(s"$dir/documents.parquet")

  test("audit catches a disjunctive (OR) equi-condition as non-equi") {
    val a = docs().select(col("doc_id").as("x"), col("n_chars").as("y"))
    val b = docs().select(col("doc_id").as("x2"), col("n_chars").as("y2"))
    // EqualTo exists in the tree — but only under Or, so Spark plans
    // a nested-loop join; the audit must NOT count it as equi-keyed
    // (the round-9 helper matched EqualTo anywhere and missed this)
    val j = a.join(b, a("x") === b("x2") || a("y") === b("y2"))
    val plan = j.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val joins = plan.collect { case jn: Join => jn }
    assert(joins.nonEmpty && joins.forall(!PlanChecks.hasEquiKeys(_)))
    assert(PlanChecks.unboundedNestLoops(plan, boundCap).nonEmpty,
      "OR-of-equalities join must be flagged as an unbounded nest loop")
  }

  test("audit accepts a top-level equi conjunct with a range residual") {
    val a = docs().select(col("doc_id").as("x"), col("n_chars").as("y"))
    val b = docs().select(col("doc_id").as("x2"), col("n_chars").as("y2"))
    val j = a.join(b, a("x") === b("x2") && a("y") > b("y2"))
    assert(PlanChecks.unboundedNestLoops(
      j.queryExecution.optimizedPlan, boundCap).isEmpty,
      "equi conjunct + residual is hash-joinable — must not be flagged")
  }

  test("audit catches a NOT(=) condition as non-equi") {
    val a = docs().select(col("doc_id").as("x"))
    val b = docs().select(col("doc_id").as("x2"))
    val j = a.join(b, a("x") =!= b("x2"))
    assert(PlanChecks.unboundedNestLoops(
      j.queryExecution.optimizedPlan, boundCap).nonEmpty,
      "NOT(a=b) join (EqualTo under Not) must be flagged")
  }

  test("audit catches an empty-partitionSpec window over a data frame") {
    val w = docs().withColumn("rn",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(PlanChecks.unboundedGlobalWindows(
      w.queryExecution.optimizedPlan, boundCap).nonEmpty,
      "global row_number over a parquet scan must be flagged")
  }

  test("audit catches a foldable partitionBy(lit) window as global") {
    val w = docs().withColumn("n",
      count(lit(1)).over(Window.partitionBy(lit(1))))
    assert(PlanChecks.unboundedGlobalWindows(
      w.queryExecution.optimizedPlan, boundCap).nonEmpty,
      "partitionBy(lit(1)) is one global partition — must be flagged")
  }

  test("audit accepts a global window over a maxRows-bounded frame") {
    val w = docs().limit(100).withColumn("rn",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(PlanChecks.unboundedGlobalWindows(
      w.queryExecution.optimizedPlan, boundCap).isEmpty,
      "a ≤4096-row frame (limit) is not a scale risk")
  }

  test("audit catches a full-width scan of a wide corpus table") {
    // a grouped count never needed `text` — the classic missing
    // projection; select(*) keeps every column alive into the scan
    val q = docs().groupBy(col("lang")).agg(count(lit(1)).as("n"),
      max(length(col("text"))).as("m"), max(col("doc_id")).as("d"),
      max(col("n_chars")).as("c"), max(col("source")).as("s"))
    val scans =
      PlanChecks.fullWidthScans(q.queryExecution.executedPlan, widthCap)
    assert(scans.nonEmpty && scans.head._1 == "documents.parquet",
      "an all-columns documents scan must be flagged")
  }

  test("audit accepts a pruned scan of the same table") {
    val q = docs().groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(PlanChecks.fullWidthScans(
      q.queryExecution.executedPlan, widthCap).isEmpty,
      "a 1-column read of documents is pruned — must not be flagged")
  }

  test("audit exempts tables at or below the width cap") {
    // exercise the WIDTH predicate itself on an audited table: the
    // same full-width documents scan is flagged at the audit's cap
    // (documents is 5 > 4 wide) and exempt once the cap covers it
    // (5 > 5 is false) — narrow tables are additionally outside
    // auditedTables, but that name filter must not be the only thing
    // standing between a width regression and a green suite
    val q = docs().groupBy(col("lang")).agg(count(lit(1)).as("n"),
      max(length(col("text"))).as("m"), max(col("doc_id")).as("d"),
      max(col("n_chars")).as("c"), max(col("source")).as("s"))
    val plan = q.queryExecution.executedPlan
    assert(PlanChecks.fullWidthScans(plan, widthCap).nonEmpty,
      "5-wide documents read whole must be flagged at cap 4")
    assert(PlanChecks.fullWidthScans(plan, 5).isEmpty,
      "the same scan is exempt once the cap covers its width")
    // and tables outside the canonical audited set never flag at all
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nq = emb.select(col("vec_id"), col("embedding"), col("label"))
      .where(col("label") >= 0)
    assert(PlanChecks.fullWidthScans(
      nq.queryExecution.executedPlan, 0).isEmpty,
      "embeddings is not an audited corpus table — exempt by name")
  }

  test("window audit traverses scalar subqueries") {
    // a data-sized global window INSIDE a scalar subquery: round 10's
    // plan.collect stopped at the expression boundary and passed this
    docs().createOrReplaceTempView("pas_docs_w")
    val q = spark.sql(
      """SELECT lang, count(*) AS n FROM pas_docs_w
        |WHERE doc_id <= (SELECT max(rn) FROM (
        |  SELECT row_number() OVER (ORDER BY doc_id) AS rn
        |  FROM pas_docs_w) t WHERE rn % 7 = 0)
        |GROUP BY lang""".stripMargin)
    assert(PlanChecks.unboundedGlobalWindows(
      q.queryExecution.optimizedPlan, boundCap).nonEmpty,
      "a global row_number inside a scalar subquery must be flagged")
  }

  test("audit traverses cached subplans for all three classes") {
    // scale-killers hidden behind a tracked persist: the consumer's
    // optimized plan shows only an InMemoryRelation leaf (and the
    // physical plan an InMemoryTableScanExec), so round 10's
    // collect/toString checks saw none of these
    val a = docs().select(col("doc_id").as("x"), col("text").as("tx"))
    val b = docs().select(col("doc_id").as("x2"))
    // broadcast off while the cache is PLANNED (cachedPlan is fixed at
    // persist time): at sf0.001 the cross would otherwise plan as a
    // BroadcastNestedLoopJoin, not the CartesianProduct under test
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcKey)
    try {
      spark.conf.set(bcKey, "-1")
      val cachedCart = graft.operators.Caches.persistTracked(
        a.crossJoin(b))
      val consumer = cachedCart.groupBy(col("x")).count()
      assert(PlanChecks.cartesians(
        consumer.queryExecution.executedPlan).nonEmpty,
        "a CartesianProduct inside a cached subplan must be flagged")
      assert(PlanChecks.unboundedNestLoops(
        consumer.queryExecution.optimizedPlan, boundCap).nonEmpty,
        "a cached cartesian is also an unbounded nest loop")

      val cachedWin = graft.operators.Caches.persistTracked(
        docs().withColumn("rn",
          row_number().over(Window.orderBy(col("doc_id")))))
      val winConsumer = cachedWin.where(col("rn") > 10)
        .groupBy(col("lang")).count()
      assert(PlanChecks.unboundedGlobalWindows(
        winConsumer.queryExecution.optimizedPlan, boundCap).nonEmpty,
        "a global window inside a cached subplan must be flagged")

      // and the identity set dedupes: one cache consumed TWICE via a
      // self-join reports its full-width scan once, not per scan node
      val cachedScan = graft.operators.Caches.persistTracked(
        docs().groupBy(col("lang")).agg(count(lit(1)).as("n"),
          max(length(col("text"))).as("m"), max(col("doc_id")).as("d"),
          max(col("n_chars")).as("c"), max(col("source")).as("s")))
      val twice = cachedScan.select(col("lang"), col("n")).join(
        cachedScan.select(col("lang").as("l2"), col("m")),
        col("lang") === col("l2"))
      val scans = PlanChecks.fullWidthScans(
        twice.queryExecution.executedPlan, widthCap)
      assert(scans.nonEmpty,
        "the cached full-width documents scan must be flagged")
      assert(scans.size === 1,
        s"one cached scan reached via two InMemoryTableScans must " +
          s"report once, got $scans")
    } finally {
      spark.conf.set(bcKey, prevBc)
      graft.operators.Caches.releaseAll()
    }
  }

  test("scan audit traverses planned subqueries and AQE wrappers") {
    // scalar subquery over a wide table, full width: the subquery's
    // scan must be found even though it lives behind a PlanExpression
    // (and, under AQE, behind an AdaptiveSparkPlanExec leaf)
    docs().createOrReplaceTempView("pas_docs")
    val q = spark.sql(
      """SELECT lang, count(*) AS n FROM pas_docs
        |WHERE n_chars > (SELECT min(n_chars + doc_id) FROM pas_docs d2
        |                 WHERE d2.text IS NOT NULL AND d2.source <> 'x'
        |                 AND d2.lang <> 'qq')
        |GROUP BY lang""".stripMargin)
    val scans =
      PlanChecks.fullWidthScans(q.queryExecution.executedPlan, widthCap)
    assert(scans.exists(_._1 == "documents.parquet"),
      "a full-width scan inside a scalar subquery must be flagged")
  }
}

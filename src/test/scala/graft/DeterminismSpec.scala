package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle contract requires bit-stable results under ANY
  * partitioning (the driver and the engine will not shuffle the same
  * way twice). Re-run representative queries under different shuffle
  * parallelism and require identical collected output — this is what
  * the integer-cents / string-timestamp / total-order rules buy.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val probes = Seq(
    "q01_pricing_summary",  // cents-sum aggregation
    "q15_top_users_pct",    // window rank + pct
    "q22_jaccard_pairs",    // self-join pipeline
    "q25_ann_bruteforce",   // float math, rounded pre-rank
    "q39_running_revenue",  // running frames
    "q48_location_clean",   // dual cleaner pipelines
    "q54_embed_neardup",    // bucketed pair mining, native cosine
    "q55_kmeans_fit",       // iterative fit, fixed-point mean
    "q66_repetition_quality", // fixed-point fractions over exploded bigrams
    "q69_pack_shards",      // per-bucket running-sum packing
    "q71_dedup_clusters",   // iterative fixpoint labels
    "q74_asof_exec",        // custom physical merge operator
    "q76_asof_broadcast",   // broadcast array lookup
    "q85_survivor_merge",   // clusters joined back + merged sources
    "q95_weighted_sample",  // hash-threshold inclusion (no RNG)
    "q96_topp_select",      // cumulative window cutoff
    "q97_quantize_profile", // fixed-point per-element float error
    "q100_cooccur_lift",    // materialized basket self-join, long lift
    "q110_pipeline_clusters", // fixpoint labels over materialized pairs
    "q113_pipeline_pagerank", // integer pagerank over materialized pairs
    "q114_hll_merge",         // register-max merge, fixed-point estimate
    "q115_quantized_ann",     // integer-dot gate + float rerank
    "q116_incremental_pairs", // existing ∪ delta must equal full mine
    "q117_cluster_split",     // cluster-keyed md5 split + leakage count
    "q118_embed_pipeline",    // CC over materialized embedding pairs
    "q119_lm_quality",        // fixed-point mean bigram probability
    "q120_pair_source_matrix", // canonical source-pair rollup
    "q121_repeated_spans",    // floor-division basis points, exact sums
    "q123_retention_sweep",   // keep-lowest-id drops per threshold
    "q124_training_order",    // hash-order interleave head
    "q125_quota_sample",      // fixed-point quality quota fill
    "q126_histogram_quantiles", // integer-rank bin interpolation
    "q127_modality_agreement", // pair-table full-outer flag sums
    "q128_forget_cascade",    // CC labels + deletion flag sums
    "q129_oov_rate",          // deterministic top-256 vocab cut
    "q215_constraint_suite",  // exact-long ratio metrics, one division
    "q218_expectations",      // row-tag routing matrix, integer sums
    "q219_suite_drift",       // driver-derived thresholds, exact longs
    "q220_approx_unique_monitor", // register-max merge + LC branch
    "q221_generalize_to_k",   // per-step class stats, chosen window
    "q222_distribution_drift", // fixed-point PSI, exact bin counts
    "q223_quantile_bound")     // integer-rank bin choice, edge literal

  probes.foreach { name =>
    test(s"$name is partition-invariant") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val a = SparkEntry.queries(name)(spark, dir).collect().toSeq
      graft.operators.Caches.releaseAll()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = SparkEntry.queries(name)(spark, dir).collect().toSeq
      graft.operators.Caches.releaseAll()
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a === b)
    }
  }
}

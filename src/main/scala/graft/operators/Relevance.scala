package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Domain-relevance scoring by hashed-bigram odds voting — the
  * integer-exact core of importance-resampling data selection (DSIR,
  * Xie et al. 2023: score documents by how much more likely their
  * hashed n-gram features are under a small TARGET corpus than under
  * the RAW pool, then keep the top). The published estimator sums
  * log-probability ratios; floating-point logs are not portable across
  * engines, so this variant casts each feature's evidence as an exact
  * integer VOTE via cross-multiplication:
  *
  *    vote(b) = sign( tcnt(b)·rtotal − rcnt(b)·ttotal )
  *
  * i.e. +1 when feature bucket b has higher relative frequency in the
  * target than in the raw pool, −1 when lower — the sign of the log
  * ratio, computed without the log. A document's score is the sum of
  * its bigram occurrences' votes: monotone in the direction DSIR
  * ranks, deterministic to the bit, oracle-replayable in pure SQL.
  *
  * Scale shape: the bigram stream aggregates into a FIXED 256-bucket
  * frequency table per side (map-side combine; the shuffle is
  * O(partitions×256), vocabulary-independent). The vote table is 256
  * rows — broadcast-joined onto the raw-pool bigram stream, then one
  * doc_id-keyed aggregation. Nothing corpus-sized crosses the wire
  * except the doc-keyed score rollup.
  */
object Relevance {

  val Buckets = 256

  /** Hashed-bigram bucket stream: (doc_id, b) one row per adjacent
    * token pair, b = first two hex chars of md5("f|" + bigram). */
  private def bigramBuckets(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), explode(shingles(col("tk"), 2)).as("bg"))
      .select(col("doc_id"),
        conv(substring(md5(concat_ws("|", lit("f"), col("bg"))), 1, 2),
          16, 10).cast("int").as("b"))

  /** Score every document in `raw` by target-likeness votes. Returns
    * (doc_id, score) — callers join back for payload columns and
    * rank. `target` and `raw` must be disjoint doc sets. */
  def oddsVotes(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tb = bigramBuckets(target, idCol, textCol)
    val rb = bigramBuckets(raw, idCol, textCol)
    val tcnt = tb.groupBy(col("b")).agg(count(lit(1)).as("tcnt"))
    val rcnt = rb.groupBy(col("b")).agg(count(lit(1)).as("rcnt"))
    // 256-row vote table; outer join covers buckets seen on one side
    // only. Totals ride as scalar columns via a single-row broadcast
    // (the established scalar-attach shape — no driver round-trip).
    val ttotal = tb.agg(count(lit(1)).as("ttotal"))
    val rtotal = rb.agg(count(lit(1)).as("rtotal"))
    val votes = tcnt.join(rcnt, Seq("b"), "full")
      .crossJoin(broadcast(ttotal)).crossJoin(broadcast(rtotal))
      .select(col("b"),
        signum(coalesce(col("tcnt"), lit(0L)) * col("rtotal")
          - coalesce(col("rcnt"), lit(0L)) * col("ttotal"))
          .cast("long").as("vote"))
    rb.join(broadcast(votes), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("vote")).as("score"))
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.storage.StorageLevel

import graft.expressions.TextKernels

/** Exact jaccard-threshold join via a shingle inverted index — the
  * distributed shape of [[graft.operators.Dedup.jaccardPairs]] applied
  * to two arbitrary row streams inside the planner (q22 operates on an
  * id + text table; this exec carries whole rows and needs no id
  * column).
  *
  * Four keyed stages, no O(n·m) anywhere:
  *
  *  1. index: each side's rows get a synthetic (partition, ordinal)
  *     rowId; the indexed RDDs are persisted (MEMORY_AND_DISK) because
  *     they are consumed twice — postings now, row payloads at
  *     join-back — and a recomputation between those two uses could
  *     reorder rows under a shuffling child, silently remapping ids
  *     (the classic zipWithIndex hazard). ContextCleaner unpersists
  *     them when the RDDs are garbage-collected after the job.
  *  2. postings: (shingleKey → (rowId, setSize)) — 64-bit xxhash64
  *     keys and two scalars per posting, never the shingle string and
  *     never the row (the same slim-shuffle contract as q22).
  *  3. pair counts: cogroup postings by shingle key; a pair sharing k
  *     shingles meets in exactly k buckets, so counting bucket
  *     co-occurrences per (lId, rId) IS the exact intersection size.
  *     jaccard = shared / (na + nb − shared), filter ≥ threshold —
  *     identical integer arithmetic to
  *     [[graft.expressions.TextKernels.jaccardSim]], so the boundary
  *     double compares equal and the rewrite is semantics-preserving.
  *  4. join-back: the (small) qualifying pair set joins each indexed
  *     side by rowId to emit the joined rows.
  *
  * There is deliberately NO stop-shingle df cap here: a cap drops true
  * pairs, and this exec implements the user's literal predicate. A hot
  * shingle in f docs costs f² pair-count rows — the honest price of
  * the declared semantics (the capped, approximate mining path stays
  * on the operator API: Dedup.jaccardPairs / minhashLshPairs).
  *
  * 100 TB shape: every stage shuffles on a key (shingle hash, pair id,
  * rowId); rows ship through exactly two shuffles (index → join-back),
  * postings are 24-byte records, and the pair-count frame is bounded
  * by co-occurrence, not by |L|×|R|.
  */
case class JaccardInvertedJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftText: Expression, rightText: Expression,
    n: Int, threshold: Double) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): JaccardInvertedJoinExec =
    copy(left = newLeft, right = newRight)

  /** Rows with a synthetic id unique within this exec's side:
    * (partitionId << 33) | ordinal. 33 bits of ordinal per partition;
    * a partition crossing 2^33 rows would collide ids — at the
    * 128 MiB-split sizing the engine uses, partitions are orders of
    * magnitude below that. */
  private def indexed(child: SparkPlan): RDD[(Long, UnsafeRow)] =
    child.execute().mapPartitionsWithIndex { (pid, iter) =>
      var i = 0L
      iter.map { row =>
        val id = (pid.toLong << 33) | i
        i += 1
        (id, row.asInstanceOf[UnsafeRow].copy())
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)

  private def postings(idx: RDD[(Long, UnsafeRow)], textE: Expression,
      attrs: Seq[Attribute], shingleN: Int): RDD[(Long, (Long, Int))] =
    idx.mapPartitions { iter =>
      val proj = UnsafeProjection.create(Seq(textE), attrs)
      iter.flatMap { case (id, row) =>
        val projected = proj(row)
        if (projected.isNullAt(0)) Iterator.empty // null text: predicate null
        else {
          val keys = TextKernels.shingleHashKeys(
            projected.getUTF8String(0), shingleN)
          val sz = keys.length
          keys.iterator.map(k => (k, (id, sz)))
        }
      }
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val t = threshold
    val shingleN = n
    val outAttrs = output
    val lOut = left.output
    val rOut = right.output
    val lTextE = leftText
    val rTextE = rightText
    val nPart = conf.numShufflePartitions

    val lIdx = indexed(left)
    val rIdx = indexed(right)

    val qualifying: RDD[(Long, Long)] =
      postings(lIdx, lTextE, lOut, shingleN)
        .cogroup(postings(rIdx, rTextE, rOut, shingleN), nPart)
        .flatMap { case (_, (ls, rs)) =>
          if (ls.isEmpty || rs.isEmpty) Iterator.empty
          else {
            val la = ls.toArray
            rs.iterator.flatMap { case (rid, nb) =>
              la.iterator.map { case (lid, na) => ((lid, rid, na, nb), 1) }
            }
          }
        }
        .reduceByKey(_ + _, nPart)
        .flatMap { case ((lid, rid, na, nb), shared) =>
          if (shared.toDouble / (na + nb - shared) >= t)
            Iterator((lid, rid))
          else Iterator.empty
        }

    qualifying
      .join(lIdx, nPart)
      .map { case (_, (rid, lRow)) => (rid, lRow) }
      .join(rIdx, nPart)
      .mapPartitions { iter =>
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        iter.map { case (_, (lRow, rRow)) => proj(joined(lRow, rRow)) }
      }
  }
}

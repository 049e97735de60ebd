package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the explicit form of Spark's own
  * runtime row-level filtering (`InjectRuntimeFilter`), exposed as an
  * operator so a pipeline can prune a huge fact scan against a small
  * filtered dimension BEFORE the shuffle.
  *
  * Shape (the 100 TB consideration): the sketch is built by a
  * distributed [[BloomFilterAggregate]] over the small side (executors
  * each build partial sketches; merge is a bitwise OR), and only the
  * finished ~`numBits/8`-byte sketch lands on the driver — a sketch
  * exchange, same cost class as a broadcast variable, NOT a data
  * collect. It then ships to the big side as a foldable Literal, so
  * `might_contain(xxhash64(key))` stays inside whole-stage codegen and
  * drops non-matching fact rows at the scan — shuffle volume falls to
  * O(matching + false-positive rows) instead of O(all rows).
  *
  * False positives are removed by the exact join that follows, so
  * results are identical to the unpruned join (which is what the q61
  * oracle checks).
  */
object Bloom {

  /** Distributed bloom-sketch build over `small.key` (xxhash64'd, the
    * same keying Spark's runtime filters use). */
  def bloomOf(small: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(col(key)))), expectedItems)
        .toAggregateExpression())
    small.agg(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a built sketch. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Exact left-semi join of `big` against `small`'s key set, with the
    * big-side scan pre-pruned by a bloom sketch of the small side.
    * Result == plain `big SEMI JOIN small` (false positives die in the
    * exact join); the sketch just keeps non-matching rows out of the
    * shuffle. */
  def bloomPrunedSemiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, expectedItems: Long): DataFrame = {
    val sketch = bloomOf(small, smallKey, expectedItems)
    big.where(mightContain(sketch, col(bigKey)))
      .join(small.select(col(smallKey)).distinct(),
        col(bigKey) === col(smallKey), "left_semi")
  }
}

package graft.streaming

import java.util
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 streaming source that honors the KAFKA OPTION
  * CONTRACT (`subscribe`, `startingOffsets`, `maxOffsetsPerTrigger`)
  * and emits Kafka-schema rows (key/value binary, topic, partition,
  * offset, timestamp, timestampType) from an in-JVM topic registry —
  * so [[KafkaSource.stream]]'s full `readStream.format(...).option
  * (...).load()` builder chain executes end-to-end in tests even
  * though the real connector jar is not in the image (S1's one
  * untestable step; reference: `streaming/job2.py:128-142`).
  *
  * Deliberately NOT a Kafka reimplementation: one partition per
  * topic, offsets are positions in the publish order, and the
  * registry is JVM-global (tests and local[*] executors share it;
  * partitions snapshot their record slice at planning time on the
  * driver, so readers stay correct in any deployment).
  *
  * Option semantics mirrored from the connector:
  *  - `subscribe`: comma-separated topic list;
  *  - `startingOffsets`: `earliest` reads the topic from position 0,
  *    `latest` (the reference's default) starts at the publish head
  *    at stream start — pre-published records are skipped;
  *  - `maxOffsetsPerTrigger`: cap on TOTAL records per micro-batch,
  *    distributed across topics in topic order (admission control —
  *    the same back-pressure contract the real source implements).
  */
class GraftKafkaTestSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka-test"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftKafkaTestSource.KafkaSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftKafkaTestTable(
      new CaseInsensitiveStringMap(properties))
}

object GraftKafkaTestSource {
  /** The Kafka source's row shape, verbatim. */
  val KafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** (key, value, timestampMicros) per record, per topic. */
  private val topics =
    TrieMap.empty[String, ArrayBuffer[(Array[Byte], Array[Byte], Long)]]

  /** Test harness API: append one record to a topic. */
  def publish(topic: String, value: Array[Byte],
      key: Array[Byte] = null,
      timestampMicros: Long = 0L): Unit = {
    val buf = topics.getOrElseUpdate(topic, ArrayBuffer.empty)
    buf.synchronized { buf += ((key, value, timestampMicros)) }
  }

  def clear(): Unit = topics.clear()

  private[streaming] def size(topic: String): Long =
    topics.get(topic).map(b => b.synchronized(b.length.toLong)).getOrElse(0L)

  private[streaming] def slice(topic: String, from: Long, until: Long)
      : Array[(Array[Byte], Array[Byte], Long)] =
    topics.get(topic)
      .map(b => b.synchronized(
        b.slice(from.toInt, until.toInt).toArray))
      .getOrElse(Array.empty)
}

private[streaming] class GraftKafkaTestTable(
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {

  override def name(): String = "graft-kafka-test"
  override def schema(): StructType = GraftKafkaTestSource.KafkaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = GraftKafkaTestSource.KafkaSchema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = new GraftKafkaTestStream(options)
      override def toBatch: Batch =
        throw new UnsupportedOperationException(
          "graft-kafka-test is a streaming-only source")
    }
}

/** Per-topic position offsets, JSON as sorted {"topic":pos,...} —
  * the same shape the Kafka source logs. */
private[streaming] case class TopicOffsets(pos: Map[String, Long])
    extends Offset {
  override def json(): String =
    pos.toSeq.sortBy(_._1)
      .map { case (t, p) => s""""${t}":$p""" }
      .mkString("{", ",", "}")
}

private[streaming] class GraftKafkaTestStream(
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val subscribed: Seq[String] = {
    val s = options.get("subscribe")
    require(s != null && s.nonEmpty,
      "graft-kafka-test requires the 'subscribe' option (topic list)")
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.sorted
  }
  private val startingOffsets: String = {
    val v = Option(options.get("startingOffsets")).getOrElse("latest")
    require(v == "earliest" || v == "latest",
      s"startingOffsets must be earliest|latest, got $v")
    v
  }
  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)

  private def head: Map[String, Long] =
    subscribed.map(t => t -> GraftKafkaTestSource.size(t)).toMap

  // Trigger.AvailableNow: pin the end target at prepare time; the
  // stream then drains to exactly this snapshot (in maxPerTrigger
  // slices) and stops, regardless of concurrent publishes
  @volatile private var availableNowTarget: Option[Map[String, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(head)

  override def initialOffset(): Offset =
    TopicOffsets(
      if (startingOffsets == "earliest") subscribed.map(_ -> 0L).toMap
      else head)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control path")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[TopicOffsets].pos
    val target = availableNowTarget.getOrElse(head)
    val capTotal = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        r.maxRows()
      case _ => Long.MaxValue
    }
    // distribute the row budget across topics in (sorted) topic order
    var budget = capTotal
    val end = subscribed.map { t =>
      val f = from.getOrElse(t, 0L)
      val avail = math.max(0L, target.getOrElse(t, f) - f)
      val take = math.min(avail, budget)
      budget -= take
      t -> (f + take)
    }.toMap
    TopicOffsets(end)
  }

  override def reportLatestOffset(): Offset = TopicOffsets(head)

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val it = node.fields()
    var m = Map.empty[String, Long]
    while (it.hasNext) {
      val e = it.next()
      m += (e.getKey -> e.getValue.asLong())
    }
    TopicOffsets(m)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val f = start.asInstanceOf[TopicOffsets].pos
    val u = end.asInstanceOf[TopicOffsets].pos
    subscribed.zipWithIndex.flatMap { case (t, i) =>
      val from = f.getOrElse(t, 0L)
      val until = u.getOrElse(t, from)
      if (until <= from) None
      else Some(GraftKafkaTestPartition(t, i, from,
        GraftKafkaTestSource.slice(t, from, until)): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftKafkaTestReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The record slice snapshots on the DRIVER at planning time and
  * ships inside the partition — readers never touch the registry. */
private[streaming] case class GraftKafkaTestPartition(
    topic: String, partitionId: Int, baseOffset: Long,
    records: Array[(Array[Byte], Array[Byte], Long)]) extends InputPartition

private[streaming] object GraftKafkaTestReaderFactory
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[GraftKafkaTestPartition]
      private var i = -1
      override def next(): Boolean = { i += 1; i < part.records.length }
      override def get(): InternalRow = {
        val (k, v, ts) = part.records(i)
        new GenericInternalRow(Array[Any](
          k, v, UTF8String.fromString(part.topic), part.partitionId,
          part.baseOffset + i, ts, 0))
      }
      override def close(): Unit = ()
    }
}

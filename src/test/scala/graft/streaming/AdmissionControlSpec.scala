package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property pin for the DSv2 source's admission control —
  * the topic-order budget split in
  * [[GraftKafkaTestStream.latestOffset]] that [[KafkaSource.stream]]'s
  * `maxOffsetsPerTrigger` contract relies on. The unit is driven
  * directly (offset in, offset out — no Spark query), so the property
  * can sweep hundreds of random (topic count, sizes, cap) regimes.
  *
  * Pinned contract, for every regime:
  *  - per-batch admitted total ≤ cap (the cap is REAL, never best-effort);
  *  - per-batch admitted total = min(cap, remaining) (maximal — the
  *    source never under-admits while data is available);
  *  - offsets are monotone and never overshoot the published head;
  *  - the stream DRAINS in exactly ceil(total/cap) batches — which is
  *    also the no-starvation proof: topic-order splitting always
  *    finishes earlier topics, freeing budget for later ones;
  *  - records published MID-drain are admitted under the same bound
  *    (eventual drain of a moving head).
  */
class AdmissionControlSpec extends AnyFunSuite {

  private def stream(topics: Seq[String], cap: Long): GraftKafkaTestStream =
    new GraftKafkaTestStream(new CaseInsensitiveStringMap(Map(
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> cap.toString).asJava))

  private def pos(o: org.apache.spark.sql.connector.read.streaming.Offset)
      : Map[String, Long] = o.asInstanceOf[TopicOffsets].pos

  private def publish(topic: String, n: Int): Unit =
    (0 until n).foreach(i =>
      GraftKafkaTestSource.publish(topic, s"r$i".getBytes("UTF-8")))

  test("admission-control property: random topic counts, sizes and caps " +
      "⇒ every batch ≤ cap and maximal, no starvation, drain in exactly " +
      "ceil(total/cap) batches") {
    import org.scalacheck.Gen
    val regime = for {
      nTopics <- Gen.chooseNum(1, 6)
      sizes <- Gen.listOfN(nTopics, Gen.chooseNum(0, 40))
      cap <- Gen.chooseNum(1L, 25L)
    } yield (sizes, cap)
    def sample(): (List[Int], Long) =
      Iterator.continually(regime.sample).flatten.next()

    for (trial <- 1 to 200) {
      val (sizes, cap) = sample()
      val topics = sizes.indices.map(i => s"acprop-$trial-t$i")
      topics.zip(sizes).foreach { case (t, n) => publish(t, n) }
      val s = stream(topics, cap)
      val limit = s.getDefaultReadLimit
      val total = sizes.map(_.toLong).sum
      val head = topics.zip(sizes.map(_.toLong)).toMap

      var cur = pos(s.initialOffset())
      assert(cur.values.forall(_ == 0L), "earliest starts at 0")
      var batches = 0
      var drained = false
      while (!drained && batches <= sizes.sum + 2) {
        val next = pos(s.latestOffset(TopicOffsets(cur), limit))
        val admitted = topics.map(t =>
          next.getOrElse(t, 0L) - cur.getOrElse(t, 0L)).sum
        val remaining = topics.map(t =>
          head(t) - cur.getOrElse(t, 0L)).sum
        assert(admitted <= cap, s"trial $trial: batch over cap " +
          s"($admitted > $cap, sizes=$sizes)")
        assert(admitted == math.min(cap, remaining),
          s"trial $trial: non-maximal batch ($admitted of " +
            s"min($cap, $remaining), sizes=$sizes)")
        topics.foreach { t =>
          assert(next.getOrElse(t, 0L) >= cur.getOrElse(t, 0L),
            s"trial $trial: offset regressed on $t")
          assert(next.getOrElse(t, 0L) <= head(t),
            s"trial $trial: overshot head on $t")
        }
        if (admitted == 0) drained = true
        else { cur = next; batches += 1 }
      }
      assert(drained, s"trial $trial: did not drain (sizes=$sizes cap=$cap)")
      assert(cur == head, s"trial $trial: drained offsets != head")
      val expectBatches =
        if (total == 0) 0 else ((total + cap - 1) / cap).toInt
      assert(batches == expectBatches,
        s"trial $trial: $batches batches, expected $expectBatches " +
          s"(total=$total cap=$cap)")
    }
  }

  test("admission control under a moving head: mid-drain publishes are " +
      "admitted under the same cap and the stream still drains") {
    import org.scalacheck.Gen
    def sample(): (List[Int], Long, Int) =
      Iterator.continually((for {
        n <- Gen.chooseNum(1, 4)
        sizes <- Gen.listOfN(n, Gen.chooseNum(1, 20))
        cap <- Gen.chooseNum(1L, 7L)
        extra <- Gen.chooseNum(1, 15)
      } yield (sizes, cap, extra)).sample).flatten.next()

    for (trial <- 1 to 50) {
      val (sizes, cap, extra) = sample()
      val topics = sizes.indices.map(i => s"acmove-$trial-t$i")
      topics.zip(sizes).foreach { case (t, n) => publish(t, n) }
      val s = stream(topics, cap)
      val limit = s.getDefaultReadLimit
      var cur = pos(s.initialOffset())
      var batches = 0
      var injected = false
      var drainedAt = -1
      while (drainedAt < 0 && batches <= (sizes.sum + extra) + 4) {
        if (!injected && batches >= 1) {
          // land new records on the LAST topic after the first batch
          publish(topics.last, extra)
          injected = true
        }
        val next = pos(s.latestOffset(TopicOffsets(cur), limit))
        val admitted = topics.map(t =>
          next.getOrElse(t, 0L) - cur.getOrElse(t, 0L)).sum
        assert(admitted <= cap, s"trial $trial: over cap mid-drain")
        if (admitted == 0) { if (injected) drainedAt = batches }
        else { cur = next; batches += 1 }
      }
      assert(drainedAt >= 0, s"trial $trial: never drained moving head")
      val finalHead = topics.map(t =>
        t -> GraftKafkaTestSource.size(t)).toMap
      assert(cur == finalHead,
        s"trial $trial: drained offsets != final head")
    }
  }
}

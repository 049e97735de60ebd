package graft

/** Scratch enumerator for PlanAuditSpec adjudication: prints, for
  * each catalog query, (a) every logical nest-loop join without a
  * provably bounded side, (b) every empty-partitionSpec window over a
  * frame `maxRows` can't bound, and (c) every full-width scan of a
  * wide (>4 col) table — the three allowlists in [[PlanAuditSpec]]
  * were derived from this table. Predicates shared via [[PlanChecks]].
  * `sbt "Test/runMain graft.PlanScan"`. */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = GraftTestSpark.spark
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        val carts = PlanChecks.cartesians(qe.executedPlan)
        val unbounded = PlanChecks.unboundedNestLoops(qe.optimizedPlan, 4096)
        val gwin = PlanChecks.unboundedGlobalWindows(qe.optimizedPlan, 4096)
        val scans = PlanChecks.fullWidthScans(qe.executedPlan, 4)
        if (carts.nonEmpty || unbounded.nonEmpty || gwin.nonEmpty ||
            scans.nonEmpty) {
          println(s"PLANSCAN $name cart=${carts.nonEmpty} " +
            s"unboundedNest=${unbounded.size} globalWin=${gwin.size} " +
            s"fullScans=${scans.size}" +
            (if (unbounded.nonEmpty) " :: " + unbounded.mkString(" | ")
            else "") +
            (if (gwin.nonEmpty) " :: win " + gwin.mkString(" | ")
            else "") +
            (if (scans.nonEmpty)
              " :: scan " + scans.map { case (t, w) => s"[$t width=$w]" }
                .mkString(" | ")
            else ""))
        }
      } catch {
        case e: Throwable => println(s"PLANSCAN $name ERROR ${e.getMessage}")
      } finally graft.operators.Caches.releaseAll()
    }
    println("PLANSCAN done")
  }
}

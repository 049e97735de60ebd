package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Scratch enumerator for PlanAuditSpec adjudication: prints, for each
  * catalog query whose physical plan contains a nest-loop join shape,
  * whether every logical nest-loop join has a provably bounded side
  * (maxRows). `sbt "Test/runMain graft.PlanScan"`. */
object PlanScan {
  private def refsBoth(j: Join, a: Expression, b: Expression): Boolean =
    (a.references.subsetOf(j.left.outputSet) &&
      b.references.subsetOf(j.right.outputSet)) ||
    (a.references.subsetOf(j.right.outputSet) &&
      b.references.subsetOf(j.left.outputSet))

  private def hasEquiKeys(j: Join): Boolean = j.condition.exists(_.exists {
    case EqualTo(a, b) => refsBoth(j, a, b)
    case EqualNullSafe(a, b) => refsBoth(j, a, b)
    case _ => false
  })

  def main(args: Array[String]): Unit = {
    val spark = GraftTestSpark.spark
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        val plan = qe.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart || bnlj) {
          val nest = qe.optimizedPlan.collect {
            case j: Join if !hasEquiKeys(j) => j
          }
          val unbounded = nest.filterNot(j =>
            j.left.maxRows.exists(_ <= 4096) ||
              j.right.maxRows.exists(_ <= 4096))
          println(s"PLANSCAN $name cart=$cart bnlj=$bnlj " +
            s"nestloops=${nest.size} unbounded=${unbounded.size}" +
            (if (unbounded.nonEmpty)
              " :: " + unbounded.map(j =>
                s"[L.maxRows=${j.left.maxRows} R.maxRows=${j.right.maxRows} " +
                  s"cond=${j.condition}]").mkString(" | ")
            else ""))
        }
      } catch {
        case e: Throwable => println(s"PLANSCAN $name ERROR ${e.getMessage}")
      }
    }
    println("PLANSCAN done")
  }
}

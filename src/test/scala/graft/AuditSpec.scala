package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanAudit

/** Plan-shape regression gate over EVERY query: no CartesianProduct
  * anywhere, and BroadcastNestedLoopJoin only where a constant-size
  * broadcast side makes it the intended shape (`intendedNonEqui`). */
class AuditSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("no query plans a cartesian or unintended nested-loop join") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val a = PlanAudit.of(fn(SparkSpec.spark, sf))
        (if (a.cartesian) Seq(s"$name: CartesianProduct") else Nil) ++
          (if (a.bnlj && !PlanAudit.intendedNonEqui(name))
            Seq(s"$name: unintended BroadcastNestedLoopJoin") else Nil)
    }
    assert(violations.isEmpty, violations.mkString("; "))
  }
}

package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.tools.PlanAudit

/** Asserting physical-plan gate (round-4 verdict item 6): the headline
  * queries' plans must stay free of CartesianProduct, non-allowlisted
  * BroadcastNestedLoopJoin / Window operators, and full-width `documents`
  * scans. A regression here fails `sbt test` instead of waiting for a
  * human to eyeball `ExplainPlans` output.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  PlanAudit.audited.foreach { name =>
    test(s"plan audit: $name") {
      val a = PlanAudit.audit(spark, dir, name)
      assert(a.violations.isEmpty,
        s"$name plan violations: ${a.violations.mkString("; ")}\n${a.plan}")
    }
  }

  test("allowlists refer to audited queries only") {
    val stray = (PlanAudit.windowAllowed ++ PlanAudit.bnljAllowed)
      .diff(PlanAudit.audited.toSet)
    assert(stray.isEmpty, s"allowlist entries not under audit: $stray")
  }
}

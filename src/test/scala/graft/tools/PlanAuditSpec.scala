package graft.tools

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Executable physical-plan contract: every `-- expect:` in
  * docs/PLAN_AUDIT_r*.txt runs here as a static assert over the query's
  * `executedPlan` string, so a plan regression (lost broadcast, new
  * shuffle, window that stopped pruning map-side, payload bytes crossing
  * an exchange) fails `sbt test` instead of needing a human diff of the
  * audit dump. The checks live next to the audited queries in
  * [[PlanAudit.audits]]; this suite only drives them.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val sf = "/root/testdata/sf0.01"

  PlanAudit.audits.foreach { a =>
    test(s"plan contract: ${a.name}") {
      val plan = a.build(spark, sf).queryExecution.executedPlan.toString
      val errs = a.check(plan)
      assert(errs.isEmpty,
        s"\n${a.name} plan regressed [expect: ${a.expectation}]:\n" +
          errs.mkString("  - ", "\n  - ", "") + s"\n--- plan ---\n$plan")
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection front-end over [[PlanAudit]]: prints
  * PushedFilters / ReadSchema pruning / broadcast joins / whole-stage
  * codegen spans for the headline queries, then exits nonzero if any
  * plan violates the audit rules (the same rules `PlanAuditSpec`
  * enforces inside `sbt test`).
  * Run: sbt "Test/runMain graft.tools.ExplainPlans"
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val audits = PlanAudit.auditAll(spark, dir)
    for (a <- audits) {
      println(s"\n===== ${a.name} =====")
      println(a.plan)
      a.violations.foreach(v => println(s"VIOLATION[${a.name}]: $v"))
    }
    val bad = audits.filter(_.violations.nonEmpty)
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"plan audit FAILED for: ${bad.map(_.name).mkString(", ")}")
      sys.exit(1)
    }
    println(s"\nplan audit clean: ${audits.size} queries")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs on sf0.001 and yields rows; every
  * oracle key refers to a real query. The value-level check against
  * DuckDB is the driver's job (graft.Verify + oracle_sql.json).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val missing = Queries.oracle.keySet.diff(Queries.all.keySet)
    assert(missing.isEmpty, s"oracle entries without query impl: $missing")
  }

  Queries.all.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows on sf0.001") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns clusters") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("jaccard_sorted is callable from SQL after registration") {
    // the spark-submit path injects via spark.sql.extensions; on a live
    // session the same builder registers directly
    new GraftExtensions() // the extension class itself must instantiate
    GraftExtensions.register(spark)
    import spark.implicits._
    val j = spark.sql(
      "SELECT jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12) // |{2,3}| / |{1,2,3,4}|
    val empty = spark.sql(
      "SELECT jaccard_sorted(array(1L), CAST(array() AS array<bigint>)) AS j")
      .as[Double].head()
    assert(empty === 0.0)
    // wrong arity fails at analysis, not at runtime
    intercept[Exception](spark.sql("SELECT jaccard_sorted(array(1L))").collect())
  }
}

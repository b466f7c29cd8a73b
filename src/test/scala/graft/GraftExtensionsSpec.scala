package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers vec_dot at session build (withExtensions path)") {
    // the spark.sql.extensions STATIC conf is only read when the
    // SparkContext is first created, so in-JVM we exercise the same
    // class through the public builder.withExtensions hook
    val base = TestSession.spark // ensure shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val out = s2.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d""".stripMargin)
        .head().getDouble(0)
      assert(out == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

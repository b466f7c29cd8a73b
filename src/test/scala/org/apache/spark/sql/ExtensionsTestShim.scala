package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only accessor for the private[sql] extensions wiring, so the
  * extensions entry point can be verified without clearing the JVM's
  * global default session (which would race concurrent suites). */
object ExtensionsTestShim {
  def registerFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}

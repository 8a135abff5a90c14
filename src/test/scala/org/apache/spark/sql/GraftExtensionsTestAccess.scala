package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, SimpleFunctionRegistry}

/** Test-scope bridge: `SparkSessionExtensions.registerFunctions` is
  * `private[sql]`, but verifying that `GraftExtensions` actually lands its
  * function in a registry requires calling it.
  */
object GraftExtensionsTestAccess {
  def buildRegistry(ext: SparkSessionExtensions): FunctionRegistry =
    ext.registerFunctions(new SimpleFunctionRegistry)
}

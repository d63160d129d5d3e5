package graft

import org.apache.spark.sql.graft.FunctionRegistration

class GraftFunctionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    FunctionRegistration.registerGraftFunctions(spark)
    val got = spark.sql(
      """SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                 array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(got === 11.0)
  }

  test("graft_dot mixes float and double arrays") {
    FunctionRegistration.registerGraftFunctions(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(cast(2.0 as float)), array(cast(5.0 as double))) AS d")
      .head().getDouble(0)
    assert(got === 10.0)
  }
}

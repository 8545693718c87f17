package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The custom expressions exposed at the SQL surface (E29 extension seam). */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions applies cleanly to a fresh SparkSessionExtensions") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("float_dot / simhash64 / minhash_sigs callable from spark.sql") {
    // same builders GraftExtensions injects, registered on the shared session
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("float_dot",
      es => graft.functions.FloatDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => graft.functions.SimHash64(es(0)), "built-in")
    val dot = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql("SELECT simhash64(array(CAST(5 AS BIGINT))) AS s").head().getLong(0)
    assert(sh == 5L) // single hash: simhash of one element is the element's bit pattern
  }
}

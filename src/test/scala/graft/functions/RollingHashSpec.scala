package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def ref(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 31 + cp) % 1000000007L)
    h
  }

  test("matches the codepoint reference, incl. unicode and empty") {
    val inputs = Seq("abc", "", "héllo ☃", "the quick brown fox", "😀 emoji")
    GraftFunctions.register(spark)
    val got = inputs.toDF("t")
      .select(col("t"), GraftFunctions.rollingHash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s => assert(got(s) == ref(s), s"mismatch for '$s'"))
  }

  test("compute() static path agrees with the SQL expression path") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_rolling_hash('abc')").collect()(0).getLong(0)
    assert(viaSql == RollingHash.compute(UTF8String.fromString("abc")))
    assert(viaSql == 96354L)
  }

  test("extensions class injects both functions at session build") {
    // fresh session over the shared context (NOT stopped afterwards —
    // that would kill the context for every other suite in this JVM)
    val s2 = graft.GraftSessions.withExtensions(spark)
    val r = s2.sql(
      "SELECT graft_rolling_hash('abc') h, graft_dot(array(1d,2d), array(3d,4d)) d")
      .collect()(0)
    assert(r.getLong(0) == 96354L && r.getDouble(1) == 11.0)
  }
}

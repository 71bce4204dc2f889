package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scaled-long money sum ([[Num.lsum]]/[[Num.lsumD]]) must be a
  * drop-in for the decimal path on in-contract inputs: bit-identical
  * results, order/partitioning-independent. */
class ScaledLongSumSpec extends SparkSpec {

  private lazy val li = Tables(spark, sfDir, "lineitem")
    .select(col("l_returnflag"), col("l_extendedprice"))

  test("lsumD equals dsumD bit-for-bit on corpus money columns") {
    def agg(e: org.apache.spark.sql.Column) =
      li.groupBy(col("l_returnflag")).agg(e.as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dec = agg(Num.dsumD(col("l_extendedprice")))
    val scl = agg(Num.lsumD(col("l_extendedprice")))
    assert(dec.keySet == scl.keySet)
    dec.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(scl(k)),
        s"group $k: decimal=$v scaled-long=${scl(k)}")
    }
  }

  test("scaled-long sum is partitioning-independent (exact integer addition)") {
    def total(parts: Int) =
      li.repartition(parts).agg(Num.lsumD(col("l_extendedprice")).as("s"))
        .collect().head.getDouble(0)
    val one = total(1)
    assert(Seq(7, 32).forall(p =>
      java.lang.Double.doubleToLongBits(total(p)) ==
        java.lang.Double.doubleToLongBits(one)))
  }

  test("rounding guard: 2-dp values offset by double noise still sum exactly") {
    import spark.implicits._
    // values like 0.07 have no exact double form; x*100 lands at
    // 7.000000000000001-style doubles — round() must snap them
    val vals = (1 to 10000).map(i => (i % 5).toString -> (i % 997) / 100.0)
    val df = vals.toDF("k", "x")
    val got = df.groupBy(col("k")).agg(Num.lsum(col("x")).as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = vals.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(v => math.round(v._2 * 100)).sum
    }
    assert(got == want)
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SaltedJoinSpec extends SparkSpec {

  test("salted join is bag-identical to the plain join, any salt count") {
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val customer = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_name"))

    val plain = events.join(customer, Seq("user_id"))
      .select("event_id", "user_id", "c_name", "value")

    Seq(1, 3, 16).foreach { salts =>
      val salted = SaltedJoin.inner(events, customer, Seq("user_id"), salts)
        .select("event_id", "user_id", "c_name", "value")
      // bag equality: exceptAll in both directions is empty
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"mismatch at salts=$salts")
    }
  }

  test("null join keys never match (inner-join semantics preserved)") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(10L)), (2L, Option.empty[Long]), (3L, Option(10L)),
      (4L, Option.empty[Long])).toDF("event_id", "user_id")
    val right = Seq((10L, "x")).toDF("user_id", "c_name")
    val joined = SaltedJoin.inner(left, right, Seq("user_id"), 4)
    assert(joined.count() == 2)
    assert(joined.filter(col("user_id").isNull).count() == 0)
  }

  test("approx_percentile tracks the exact percentile within accuracy bound") {
    val li = Tables(spark, sfDir, "lineitem")
    val r = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx"))
      .collect()(0)
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact <= 0.02,
      s"approx median $approx vs exact $exact")
  }
}

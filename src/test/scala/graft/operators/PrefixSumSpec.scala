package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}
import graft.core.Tables

/** The distributed prefix sum must be BIT-IDENTICAL to the serial
  * single-partition window — and must never plan one. */
class PrefixSumSpec extends SparkSpec {

  private lazy val toks = Tables(spark, sfDir, "documents")
    .select(col("doc_id"),
      regexp_count(col("text"), lit("\\S+")).cast("long").as("n_tok"))

  test("cumsum equals the single-partition window, over several partition counts") {
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val serial = toks.withColumn("cum", sum(col("n_tok")).over(w))
    Seq(1, 3, 8, 32).foreach { p =>
      val dist = PrefixSum.cumsum(toks, "doc_id", "n_tok", "cum", p)
      assert(dist.exceptAll(serial).isEmpty && serial.exceptAll(dist).isEmpty,
        s"prefix sum diverged from the serial window at partitions=$p")
    }
  }

  test("the operator (and d39 on top of it) never plans a SinglePartition window") {
    val df = Registry.byName("d39_sequence_packing").build(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"global packing must not serialize through one task:\n$p")
  }
}

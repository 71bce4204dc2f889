package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfcOf(s: String): String = {
    GraftFunctions.register(spark)
    Seq(s).toDF("t").select(GraftFunctions.nfc(col("t"))).collect().head.getString(0)
  }

  test("composes combining marks to precomposed codepoints") {
    assert(nfcOf("é") == "é") // e + ´ → é
    assert(nfcOf("Å") == "Å") // A + ring → Å
  }

  test("idempotent and identity on already-normalized text") {
    assert(nfcOf("é") == "é")
    assert(nfcOf("plain ascii stays put") == "plain ascii stays put")
    assert(nfcOf(nfcOf("über")) == nfcOf("über"))
  }

  test("decomposed and precomposed spellings dedup to one key after NFC") {
    GraftFunctions.register(spark)
    val docs = Seq((1L, "café menu"), (2L, "café menu")).toDF("doc_id", "text")
    val n = docs.groupBy(GraftFunctions.nfc(col("text"))).count().count()
    assert(n == 1, "NFC must unify the equal-rendering spellings")
  }

  test("stays inside whole-stage codegen") {
    // a file-backed scan: a local relation would constant-fold the
    // projection away before any codegen span exists
    GraftFunctions.register(spark)
    val plan = graft.core.Tables(spark, sfDir, "documents")
      .select(GraftFunctions.nfc(col("text")))
      .queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen stage marker in the simple render
    assert(plan.contains("*(1) Project [graft_nfc"), plan)
  }
}

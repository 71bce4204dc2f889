package graft.etl

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private val clock = Timestamp.from(Instant.parse("2026-01-01T00:00:00Z"))

  private lazy val (inRoot, outRoot, result) = {
    val in = Files.createTempDirectory("graft_etl_in").toString
    val out = Files.createTempDirectory("graft_etl_out").toString
    FixtureGen.write(in, nAtms = 50, nTx = 10000, seed = 42L, clock = clock)
    val r = Pipeline.run(spark, in, out, clock)
    (in, out, r)
  }

  test("pipeline requires and consumes the _READY trigger") {
    result // force run
    assert(!Files.exists(Paths.get(inRoot, "_READY")), "_READY must be consumed")
    assert(Files.exists(Paths.get(outRoot, "_SUCCESS")))
    val err = intercept[IllegalArgumentException] {
      Pipeline.run(spark, inRoot, outRoot, clock)
    }
    assert(err.getMessage.contains("_READY"))
  }

  test("rule breakdown matches the injected error rates (single observe pass)") {
    val s = result.stats
    assert(s.totalRows == 10000)
    // injected: 1% null FK, 1% future, 2% negative, 10% non-EXITOSA;
    // seeded draws land within ±40% of expectation
    def within(rule: String, expected: Double): Unit = {
      val r = s.discardRate(rule)
      assert(r > expected * 0.6 && r < expected * 1.4,
        s"$rule rate $r not near $expected")
    }
    within("id_atm_not_null", 0.01)
    within("fecha_not_future", 0.01)
    within("monto_positive", 0.02)
    within("status_transaccion_allowed", 0.10)
    // overlaps mean: kept >= total - sum(violations), kept < total
    assert(s.kept < s.totalRows)
    assert(s.kept >= s.totalRows - s.violationsByRule.values.sum)
  }

  test("silver is partitioned by fecha_dia and carries exact decimal money") {
    val dirs = new java.io.File(result.silverPath).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("fecha_dia=")))
    val silver = spark.read.parquet(result.silverPath)
    val montoType = silver.schema("monto").dataType
    assert(montoType == org.apache.spark.sql.types.DecimalType(18, 2))
  }

  test("validation gates hold post-clean") {
    val v = result.validation
    assert(v.fkComplete, "no null FKs may survive the clean")
    assert(v.allMontosValid, "montos_invalidos must be 0")
    assert(v.distinctAtms <= 50)
    assert(v.minMonto.compareTo(java.math.BigDecimal.ZERO) > 0)
  }

  test("gold daily balance: flujo_neto = depositos - retiros, exactly") {
    val db = spark.read.parquet(result.goldPaths("gold_daily_balance"))
    val bad = db.filter(
      col("flujo_neto_dia") =!= col("total_depositos") - col("total_retiros")).count()
    assert(bad == 0)
    // every silver row lands in exactly one (atm, day) bucket
    val n = db.agg(sum(col("n_transacciones"))).collect()(0).getLong(0)
    assert(n == result.stats.kept)
  }

  test("gold dim is one current row per ATM") {
    val dim = spark.read.parquet(result.goldPaths("gold_dim_atms"))
    assert(dim.count() == dim.select("id_atm").distinct().count())
    assert(dim.count() <= 50)
  }

  test("gold ranking is ordered by money moved desc") {
    val ranking = spark.read.parquet(result.goldPaths("gold_atm_ranking"))
      .select(col("dinero_total_movido").cast("double")).collect().map(_.getDouble(0))
    assert(ranking.toSeq == ranking.sortBy(-_).toSeq)
  }

  test("top-ATMs and daily-summary validation queries run over silver") {
    val silver = spark.read.parquet(result.silverPath)
    assert(Validation.topAtms(silver).count() == 5)
    val daily = Validation.dailySummary(silver)
    assert(daily.count() == result.validation.distinctDays)
  }

  test("QA fallback: silver parquet preferred, raw re-derivation identical") {
    result // force run
    val (fromSilver, src1) =
      Validation.fromSilverOrRaw(spark, result.silverPath, inRoot, clock)
    assert(src1 == "processed")
    assert(fromSilver == result.validation)

    // delete silver → the fallback must re-derive from raw CSVs and
    // produce the IDENTICAL typed report (same rules, same clock)
    val gone = Files.createTempDirectory("graft_qa_missing").toString + "/nope"
    val (fromRaw, src2) = Validation.fromSilverOrRaw(spark, gone, inRoot, clock)
    assert(src2 == "raw")
    assert(fromRaw == result.validation,
      s"fallback report must match the processed one:\n$fromRaw\nvs\n${result.validation}")
  }

  test("rerun with a fresh _READY is idempotent (dynamic partition overwrite)") {
    result // force first run
    val before = spark.read.parquet(result.silverPath).count()
    Files.write(Paths.get(inRoot, "_READY"), Array.emptyByteArray)
    val r2 = Pipeline.run(spark, inRoot, outRoot, clock)
    val after = spark.read.parquet(r2.silverPath).count()
    assert(after == before, "rerunning the same batch must not duplicate rows")
  }
}

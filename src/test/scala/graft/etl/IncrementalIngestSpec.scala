package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp
import java.time.Instant

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Two-batch fixture: the incremental AvailableNow pipeline must land
  * exactly the batch pipeline's Silver rows, each pass reading only the
  * new files. */
class IncrementalIngestSpec extends SparkSpec {

  private val clock = Timestamp.from(Instant.parse("2026-01-01T00:00:00Z"))

  test("AvailableNow two-batch ingestion equals the batch pipeline silver") {
    val fixture = Files.createTempDirectory("graft_inc_fixture").toString
    FixtureGen.write(fixture, nAtms = 25, nTx = 4000, seed = 11L, clock = clock)

    // split the generated fact CSV into two batch files (header in both)
    val factFile = new java.io.File(s"$fixture/fact_transactions")
      .listFiles().filter(_.getName.endsWith(".csv")).head.toPath
    val lines = Files.readAllLines(factFile).asScala.toSeq
    val (header, rows) = (lines.head, lines.tail)
    val (b1, b2) = rows.splitAt(rows.size / 2)

    val watched = Files.createTempDirectory("graft_inc_watch").toString
    val out = Files.createTempDirectory("graft_inc_out").toString + "/silver"
    val ckpt = Files.createTempDirectory("graft_inc_ckpt").toString
    val dimDir = s"$fixture/dim_atms"

    def drop(name: String, batch: Seq[String]): Unit =
      Files.write(Paths.get(watched, name), (header +: batch).asJava)

    // expected clean-row counts per batch via the batch-path rules
    // (numInputRows can't be asserted exactly: the rule filter pushes
    // down into the CSV scan, so the source reports post-filter rows)
    val dims = CleanTransactions.readDims(spark, dimDir)
    def cleanCount(batchDir: String): Long =
      CleanTransactions.run(
        CleanTransactions.readFacts(spark, batchDir), dims, clock)._1.count()

    // batch 1 arrives
    drop("facts_b1.csv", b1)
    val read1 = IncrementalIngest.ingestOnce(spark, watched, dimDir, out, ckpt, clock)
    assert(read1 > 0, "pass 1 must ingest batch 1")
    val after1 = spark.read.parquet(out).count()
    val stage1 = Files.createTempDirectory("graft_inc_b1").toString
    Files.copy(Paths.get(watched, "facts_b1.csv"),
      Paths.get(stage1, "facts_b1.csv"), StandardCopyOption.REPLACE_EXISTING)
    assert(after1 == cleanCount(stage1), "pass 1 silver = clean rows of batch 1 only")

    // nothing new → zero rows read, sink unchanged
    val readIdle = IncrementalIngest.ingestOnce(spark, watched, dimDir, out, ckpt, clock)
    assert(readIdle == 0L, "idle pass must read nothing")
    assert(spark.read.parquet(out).count() == after1)

    // batch 2 arrives — only the new file is read
    drop("facts_b2.csv", b2)
    val read2 = IncrementalIngest.ingestOnce(spark, watched, dimDir, out, ckpt, clock)
    assert(read2 > 0, "pass 2 must ingest batch 2")

    // final Silver ≡ the batch pipeline's clean output over the full fixture
    val facts = CleanTransactions.readFacts(spark, s"$fixture/fact_transactions")
    val (batchSilver, _) = CleanTransactions.run(facts, dims, clock)
    val streamed = spark.read.parquet(out)
      .select(batchSilver.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(streamed.count() == batchSilver.count())
    assert(streamed.except(batchSilver).isEmpty && batchSilver.except(streamed).isEmpty,
      "incremental silver diverges from the batch pipeline")
    // day-partitioned layout
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_"))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("fecha_dia=")))
  }
}

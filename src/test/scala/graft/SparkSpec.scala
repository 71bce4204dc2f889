package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps
  * total test wall-clock dominated by the queries, not session startup). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object GraftSessions {
  /** A session with graft.GraftExtensions over the SAME SparkContext.
    * `getOrCreate` alone would return the already-running default session
    * (ignoring the extensions conf), so clear default/active first and
    * restore the shared session as default afterwards. */
  def withExtensions(shared: SparkSession): SparkSession = synchronized {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master(shared.sparkContext.master)
      // conf-string extensions (`spark.sql.extensions=graft.GraftExtensions`)
      // only load when the builder creates the FIRST session of the JVM;
      // over an existing context the programmatic form applies them
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

package graft

import org.apache.spark.sql.SparkSession

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


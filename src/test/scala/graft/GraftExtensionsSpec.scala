package graft

import org.apache.spark.sql.SparkSession

/** The config-only installation path: a session built with
  * `withExtensions(new GraftExtensions)` exposes the custom functions
  * to pure SQL with no programmatic registration. */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions install the graft_* functions for SQL users") {
    // force the shared context to build a NEW session with extensions
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT graft_fingerprint64('hello') AS fp,
                  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
                  graft_hyperplane_sig(array(1.0D, 2.0D), 8) AS sig""").head()
      assert(r.getLong(0) != 0L)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(r.getLong(2) >= 0L && r.getLong(2) < 256L)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

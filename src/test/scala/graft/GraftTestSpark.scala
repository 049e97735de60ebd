package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object GraftTestSpark {
  /** Create a temp dir REGISTERED for JVM-exit deletion — every spec
    * temp dir (sources, sinks, checkpoints) goes through here so test
    * runs don't accrete directories under java.io.tmpdir. */
  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    graft.operators.TempDirs.deleteRecursivelyOnExit(d.toFile)
    d.toString
  }

  /** Run a test body that persists tracked frames / reliable
    * checkpoints, guaranteeing Caches.releaseAll() even when an
    * assertion fails mid-body — otherwise the failed test's cached
    * frames bleed memory into every later test in the shared session. */
  def withCaches[A](body: => A): A =
    try body finally graft.operators.Caches.releaseAll()

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", tmpDir("graftwh"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs cosine_sim and chunk_text for SQL") {
    // a separate session in the same JVM, configured purely via extensions
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val c = spark.sql("SELECT cosine_sim(array(1.0F,0.0F), array(1.0F,0.0F)) AS c").head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      val n = spark.sql(
        "SELECT c.* FROM (SELECT 'word word word' AS t) LATERAL VIEW chunk_text(t, 8, 2) c"
      ).count()
      assert(n > 1)
    } finally {
      // do not stop(): the session context is shared with other suites
      SparkSession.clearActiveSession()
    }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

class ExtProbeSpec extends SparkSpec {
  test("probe: does getOrCreate apply spark.sql.extensions?") {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    try {
      info(s"same session as prev: ${s2 eq prev}")
      info(s"parser class: ${s2.sessionState.sqlParser.getClass.getName}")
      info(s"ext conf: ${s2.conf.getOption("spark.sql.extensions")}")
      val m = GraftDdl.parse(
        "CREATE INDEX items_idx ON items USING ivfflat (embedding vector_cosine_ops) WITH (lists = 16)",
        s2.sessionState.sqlParser)
      info(s"GraftDdl.parse: $m")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}

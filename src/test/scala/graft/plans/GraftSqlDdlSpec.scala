package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{cosine_distance, vector_lit}
import graft.operators.IndexQueries

/** End-to-end pgvector DDL lifecycle through `spark.sql`: CREATE INDEX →
  * transparent rewrite → SET ivfflat.probes → DROP INDEX. Runs in its own
  * SparkSession (parsers bind at session construction) sharing the suite's
  * SparkContext. */
class GraftSqlDdlSpec extends SparkSpec {

  private val tablePath = s"$Sf0001/embeddings.parquet"

  private def withExtensionSession(f: SparkSession => Unit): Unit = {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    try f(s2)
    finally {
      AnnIndexRegistry.unregister(tablePath)
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("CREATE INDEX DDL builds + registers; probes SET steers recall; DROP restores exact") {
    withExtensionSession { s2 =>
      s2.read.parquet(tablePath).createOrReplaceTempView("items")
      val q = s2.table("items").filter(col("vec_id") === 0)
        .head().getAs[collection.Seq[Float]]("embedding").toArray

      def topK = s2.table("items")
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10)

      val exact = topK.collect().map(_.getLong(0)).toSeq

      s2.sql("CREATE INDEX items_idx ON items " +
        s"USING ivfflat (embedding vector_cosine_ops) WITH (lists = ${IndexQueries.Lists})")
      val plan = topK.queryExecution.executedPlan.toString
      assert(plan.contains("list_id"), s"expected index scan after CREATE INDEX:\n$plan")
      assert(!plan.contains("embeddings.parquet"))
      // default probes = 1: the query's own list is probed → self at rank 1
      assert(topK.collect().head.getLong(0) === 0L)

      // pgvector session knob: probes = lists degrades to exact
      s2.sql(s"SET ivfflat.probes = ${IndexQueries.Lists}")
      assert(topK.collect().map(_.getLong(0)).toSeq === exact,
        "probe-all through the DDL-built index must equal exact search")
      s2.sql("RESET ivfflat.probes")

      // duplicate name errors; IF NOT EXISTS is a no-op
      val err = intercept[Exception] {
        s2.sql("CREATE INDEX items_idx ON items " +
          "USING ivfflat (embedding vector_cosine_ops) WITH (lists = 4)")
      }
      assert(err.getMessage.contains("already exists"))
      s2.sql("CREATE INDEX IF NOT EXISTS items_idx ON items " +
        "USING ivfflat (embedding vector_cosine_ops) WITH (lists = 4)")

      // the same statement pgvector documents for SQL-only access works too
      graft.functions.registerAll(s2)
      val viaSql = s2.sql(
        s"""SELECT vec_id FROM items
           |ORDER BY cosine_distance(embedding,
           |  CAST(array(${q.mkString(",")}) AS ARRAY<FLOAT>)), vec_id
           |LIMIT 10""".stripMargin)
      assert(viaSql.queryExecution.executedPlan.toString.contains("list_id"),
        "SQL-spelled kNN must also rewrite")

      s2.sql("DROP INDEX items_idx")
      val planAfter = topK.queryExecution.executedPlan.toString
      assert(planAfter.contains("embeddings.parquet"),
        s"DROP INDEX must restore the exact scan:\n$planAfter")
      assert(topK.collect().map(_.getLong(0)).toSeq === exact)
    }
  }

  test("USING hnsw is rejected with guidance; unrelated SQL parses through") {
    withExtensionSession { s2 =>
      s2.read.parquet(tablePath).createOrReplaceTempView("items2")
      val err = intercept[Exception] {
        s2.sql("CREATE INDEX ON items2 USING hnsw (embedding vector_cosine_ops)")
      }
      assert(err.getMessage.contains("hnsw"))
      // the delegating path stays intact
      assert(s2.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
      assert(s2.sql("SELECT count(*) FROM items2").head().getLong(0) === 500L)
    }
  }
}

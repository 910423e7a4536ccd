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
    // NOT .config("spark.sql.extensions", …): that key is read from the
    // SparkContext's STATIC conf, which this suite's shared context has
    // already frozen — the extension would silently never install.
    // builder.withExtensions applies at session construction regardless.
    val s2 = SparkSession.builder()
      .withExtensions(e => new GraftExtensions()(e))
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

  test("two indexes on one table coexist; DROP of one keeps the other's rewrite") {
    withExtensionSession { s2 =>
      s2.read.parquet(tablePath).createOrReplaceTempView("items3")
      val q = s2.table("items3").filter(col("vec_id") === 0)
        .head().getAs[collection.Seq[Float]]("embedding").toArray

      def cosTopK = s2.table("items3")
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10)
      def l2TopK = s2.table("items3")
        .orderBy(graft.functions.l2_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10)

      s2.sql("CREATE INDEX items3_cos ON items3 " +
        s"USING ivfflat (embedding vector_cosine_ops) WITH (lists = ${IndexQueries.Lists})")
      s2.sql("CREATE INDEX items3_l2 ON items3 " +
        s"USING ivfflat (embedding vector_l2_ops) WITH (lists = ${IndexQueries.Lists})")

      // each sort picks ITS opclass index — both rewrites live concurrently
      assert(cosTopK.queryExecution.executedPlan.toString.contains("list_id"))
      assert(l2TopK.queryExecution.executedPlan.toString.contains("list_id"))

      // dropping the cosine index must not disable the l2 index (pgvector
      // multi-index semantics; a path-keyed registry used to kill both)
      s2.sql("DROP INDEX items3_cos")
      val cosPlan = cosTopK.queryExecution.executedPlan.toString
      assert(cosPlan.contains("embeddings.parquet"),
        s"dropped cosine index must restore the exact scan:\n$cosPlan")
      val l2Plan = l2TopK.queryExecution.executedPlan.toString
      assert(l2Plan.contains("list_id"),
        s"l2 index must survive DROP of the cosine index:\n$l2Plan")
      s2.sql("DROP INDEX items3_l2")
      assert(l2TopK.queryExecution.executedPlan.toString.contains("embeddings.parquet"))
    }
  }

  test("USING hnsw builds + registers an NSW graph; explicit search serves it; DROP removes") {
    withExtensionSession { s2 =>
      s2.read.parquet(tablePath).createOrReplaceTempView("items2")
      val q = s2.table("items2").filter(col("vec_id") === 0)
        .head().getAs[collection.Seq[Float]]("embedding").toArray
      val exact = s2.table("items2")
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10).collect().map(_.getLong(0)).toSeq

      // m/ef_construction are pgvector's hnsw options — accepted (ignored
      // with a warning); shards is the engine's real knob
      s2.sql("CREATE INDEX items2_hnsw ON items2 " +
        "USING hnsw (embedding vector_cosine_ops) WITH (m = 16, shards = 2)")
      val idx = AnnIndexRegistry.hnswIndexFor(tablePath, Some("embedding"))
      assert(idx.isDefined, "CREATE INDEX USING hnsw must register the graph")

      // transparent hnsw rewrite: the plan-time beam search injects its
      // candidate ids as an `vec_id IN (…)` filter over the base relation
      // (no full scan re-rank), and the result equals the explicit API's
      def topK = s2.table("items2")
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10)
      val plan = topK.queryExecution.optimizedPlan.toString
      assert(plan.contains(" IN (") || plan.contains("INSET"),
        s"expected candidate-id filter after CREATE INDEX USING hnsw:\n$plan")
      val viaSql = topK.collect().map(_.getLong(0)).toSeq
      val viaApi = graft.index.NswIndex.search(s2, idx.get, q, 10)
        .collect().map(_.getLong(0)).toSeq
      assert(viaSql === viaApi, "transparent path must serve the graph probe")
      val recall = viaSql.toSet.intersect(exact.toSet).size / 10.0
      info(f"hnsw transparent-rewrite recall@10: $recall%.1f")
      assert(recall >= 0.8, s"recall@10 through the rewrite was $recall")

      // pgvector's `SET hnsw.ef_search` steers the transparent probe: a
      // corpus-wide beam makes the graph search exact
      s2.sql("SET hnsw.ef_search = 500")
      assert(topK.collect().map(_.getLong(0)).toSeq === exact,
        "ef_search = corpus through the transparent path must equal exact")

      // predicate kNN routes through the adaptive-ef filtered graph search
      // (searchFiltered); at full beam it equals the exact filtered top-k
      def filteredTopK = s2.table("items2")
        .filter(col("vec_id") % 2 === 0)
        .orderBy(cosine_distance(col("embedding"), vector_lit(q)), col("vec_id"))
        .limit(10)
      val fPlan = filteredTopK.queryExecution.optimizedPlan.toString
      assert(fPlan.contains(" IN (") || fPlan.contains("INSET"),
        s"filtered hnsw kNN must carry the candidate-id filter:\n$fPlan")
      // exact reference computed driver-side — any Spark read of the
      // registered path would itself be rewritten onto the graph
      def cosDist(a: collection.Seq[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < b.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val exactFiltered = s2.read.parquet(tablePath)
        .select("vec_id", "embedding").collect()
        .filter(_.getLong(0) % 2 == 0)
        .map(r => (r.getLong(0), cosDist(r.getAs[collection.Seq[Float]](1), q)))
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
      assert(filteredTopK.collect().map(_.getLong(0)).toSeq === exactFiltered,
        "full-beam filtered graph search through SQL must equal exact filtered top-k")
      s2.conf.unset("hnsw.ef_search")

      // full-beam search ≡ exact over the DDL-built graph (ef = corpus)
      val viaGraph = graft.index.NswIndex
        .search(s2, idx.get, q, 10, ef = 500)
        .collect().map(_.getLong(0)).toSeq
      assert(viaGraph === exact,
        "full-beam NSW search over the DDL-built graph must equal exact")

      s2.sql("DROP INDEX items2_hnsw")
      assert(AnnIndexRegistry.hnswIndexFor(tablePath, Some("embedding")).isEmpty,
        "DROP INDEX must unregister the hnsw entry")
      val planAfterDrop = topK.queryExecution.optimizedPlan.toString
      assert(!planAfterDrop.contains(" IN (") && !planAfterDrop.contains("INSET"),
        s"DROP INDEX must restore the exact scan:\n$planAfterDrop")

      // a non-cosine hnsw opclass is rejected with engine guidance (assert
      // on text only the custom path emits, not 'hnsw' which the native
      // parser's error would echo from the SQL)
      val err = intercept[Exception] {
        s2.sql("CREATE INDEX ON items2 USING hnsw (embedding vector_l2_ops)")
      }
      assert(err.getMessage.contains("vector_cosine_ops only"),
        s"expected cosine-only guidance, got: ${err.getMessage}")
    }
  }

  test("unknown / non-positive storage options are rejected like Postgres") {
    withExtensionSession { s2 =>
      s2.read.parquet(tablePath).createOrReplaceTempView("items5")
      // a typo'd option must not silently build with defaults
      val typo = intercept[Exception] {
        s2.sql("CREATE INDEX ON items5 USING ivfflat " +
          "(embedding vector_cosine_ops) WITH (list = 100)")
      }
      assert(typo.getMessage.contains("unrecognized ivfflat storage option"),
        s"got: ${typo.getMessage}")
      val zero = intercept[Exception] {
        s2.sql("CREATE INDEX ON items5 USING hnsw " +
          "(embedding vector_cosine_ops) WITH (shards = 0)")
      }
      assert(zero.getMessage.contains("must be positive"),
        s"got: ${zero.getMessage}")
    }
  }

  test("unrelated SQL parses through; DROP INDEX IF EXISTS no-ops") {
    withExtensionSession { s2 =>
      s2.read.parquet(tablePath).createOrReplaceTempView("items4")
      assert(s2.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
      assert(s2.sql("SELECT count(*) FROM items4").head().getLong(0) === 500L)
      // DROP INDEX IF EXISTS <unknown> no-ops like Postgres
      s2.sql("DROP INDEX IF EXISTS never_created_idx")
      // without IF EXISTS an unknown name still errors (delegate parser)
      intercept[Exception] { s2.sql("DROP INDEX never_created_idx") }
    }
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Port of the reference's integration suite (FIXTURES.md §1.1/§3):
  * insert round-trip, copy count, partitioned two-append behavior. */
class DocumentStoreSpec extends SparkSpec {
  import spark.implicits._
  implicit def s: SparkSession = spark

  private def tmp(p: String) = graft.util.TempDirs.create(p).resolve("t").toString

  // the reference's dim-3 fixtures (tests/test_pg.py:55, 76-81)
  private def fixture = Seq(
    ("Hello world", Array(0.1f, 0.2f, 0.3f)),
    ("Sentence A", Array(0.5f, 0.6f, 0.7f)),
  ).toDF("text", "embedding")

  test("insert round-trips text + embedding shape (test_pg_insert port)") {
    val cfg = TableConfig(tmp("ins"))
    val n = DocumentStore.insert(fixture, cfg)
    assert(n === 2)
    val back = DocumentStore.read(cfg)
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("id", "text", "embedding"))
    val row = back.filter(col("text") === "Hello world").head()
    assert(row.getAs[Seq[Float]]("embedding").toArray === Array(0.1f, 0.2f, 0.3f))
    // ids unique (SERIAL contract: unique, gaps allowed)
    assert(back.select("id").distinct().count() === 2)
  }

  test("insert validates the {text, embedding} contract") {
    val bad = Seq((1, "x")).toDF("id", "text")
    val ex = intercept[IllegalArgumentException] {
      DocumentStore.insert(bad, TableConfig(tmp("bad")))
    }
    assert(ex.getMessage.contains("embedding"))
  }

  test("copy bulk-loads from a frame and from a parquet path (test_pg_copy port)") {
    val cfg = TableConfig(tmp("cp"))
    assert(DocumentStore.copy(Left(fixture), cfg) === 2)
    assert(DocumentStore.read(cfg).count() === 2)
    // path input dispatch
    val src = tmp("cpsrc")
    fixture.write.parquet(src)
    assert(DocumentStore.copy(Right(src), cfg) === 2)
    assert(DocumentStore.read(cfg).count() === 4)
    // extra columns are allowed and dropped by the hard-coded projection
    val extra = fixture.withColumn("junk", lit(1))
    DocumentStore.copy(Left(extra), cfg)
    assert(DocumentStore.read(cfg).columns.toSet === Set("id", "text", "embedding"))
  }

  test("copy rejects a frame without required columns") {
    intercept[IllegalArgumentException] {
      DocumentStore.copy(Left(Seq(1).toDF("x")), TableConfig(tmp("cpbad")))
    }
  }

  test("readCorpus loads orc, json and csv corpora interchangeably with parquet") {
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text", "lang")
    val j = tmp("jsonsrc"); val c = tmp("csvsrc"); val o = tmp("orcsrc")
    docs.write.json(j)
    docs.write.option("header", "true").csv(c)
    docs.write.orc(o)
    val fromJson = DocumentStore.readCorpus(j, "json")
    val fromCsv = DocumentStore.readCorpus(c, "csv")
    val fromOrc = DocumentStore.readCorpus(o, "orc")
    assert(fromJson.count() === 500L && fromCsv.count() === 500L && fromOrc.count() === 500L)
    assert(fromJson.columns.toSet === Set("doc_id", "text", "lang"))
    assert(fromOrc.columns.toSet === Set("doc_id", "text", "lang"))
    // same embed pipeline runs over any source format
    val embedded = graft.embed.HashingSentenceEmbedder(16).embedFrame(fromJson)
    assert(embedded.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("embedding"))).head().getInt(0) === 16)
    intercept[IllegalArgumentException](DocumentStore.readCorpus("/x", "orc2"))
  }

  test("two partitioned appends → two generation_date partitions, both readable (moto port)") {
    val path = tmp("part")
    DocumentStore.saveToParquetPartitioned(
      fixture.withColumn("generation_date", lit("2026-01-01")), path)
    DocumentStore.saveToParquetPartitioned(
      fixture.withColumn("generation_date", lit("2026-01-02")), path)
    val back = spark.read.parquet(path)
    assert(back.count() === 4)
    assert(back.select("generation_date").distinct().count() === 2)
    // partition pruning works (scale contract)
    val plan = back.filter(col("generation_date") === "2026-01-01")
      .queryExecution.executedPlan.toString
    assert(back.filter(col("generation_date") === "2026-01-01").count() === 2)
    assert(!plan.contains("2026-01-02"))
  }

  test("compact merges micro-batch file debris, preserves rows, swaps atomically") {
    val path = tmp("compact")
    // 200 rows landed 10-per-file: the post-streaming debris shape
    spark.range(200)
      .select(col("id"), concat(lit("doc "), col("id")).as("text"))
      .repartition(1)
      .write.option("maxRecordsPerFile", 10).parquet(path)
    val before = spark.read.parquet(path)
      .collect().map(_.toSeq).toSet
    val (nBefore, nAfter) = DocumentStore.compact(path, targetFileBytes = 1L << 30)
    assert(nBefore >= 20, s"expected fragmented input, got $nBefore files")
    assert(nAfter === 1, s"1 GB target must compact to one file, got $nAfter")
    val after = spark.read.parquet(path).collect().map(_.toSeq).toSet
    assert(after === before, "compaction must preserve row content exactly")
    // no staging/old debris left behind
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("_compact_") || n.contains("_old_")),
      s"leftover dirs: ${parent.mkString(",")}")
  }
}

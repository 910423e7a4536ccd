package graft

import graft.functions.registerAll

class CatalogOpsSpec extends SparkSpec {

  test("typed Document façade reconstructs the reference entity") {
    val ds = Document.dataset(spark, Sf0001)
    val docs = ds.collect()
    assert(docs.length === 500)
    assert(docs.forall(_.embedding.length === 64))
    val d0 = docs.find(_.id == 0L).get
    assert(d0.text.nonEmpty)
  }

  test("relationSize/prettySize report on-disk bytes (pg_size_pretty analog)") {
    val sz = CatalogOps.relationSize(spark, s"$Sf0001/documents.parquet")
    assert(sz > 1000L)
    assert(CatalogOps.prettySize(512) === "512 bytes")
    assert(CatalogOps.prettySize(2048) === "2.0 kB")
    assert(CatalogOps.prettySize(3 * 1024 * 1024) === "3.0 MB")
  }

  test("installedExtensions reports vector after registration") {
    registerAll(spark)
    assert(CatalogOps.installedExtensions(spark) === Seq("vector"))
  }
}

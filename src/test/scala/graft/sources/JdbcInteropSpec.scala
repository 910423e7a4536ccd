package graft.sources

import graft.SparkSpec

class JdbcInteropSpec extends SparkSpec {
  import spark.implicits._

  test("config builds the reference's URL/options incl. sslmode and batchsize") {
    val cfg = JdbcConfig(host = "db.example", sslRequired = true, batchSize = 250)
    assert(cfg.url === "jdbc:postgresql://db.example:5432/postgres?sslmode=require")
    assert(cfg.writerOptions("batchsize") === "250")
    assert(cfg.writerOptions("dbtable") === "public.documents")
  }

  test("IAM token provider hook wins over static password (M8 contract)") {
    var minted = 0
    val cfg = JdbcConfig(host = "h",
      tokenProvider = Some(() => { minted += 1; s"token-$minted" }),
      password = Some("static"))
    assert(cfg.resolvePassword() === "token-1")
    assert(cfg.resolvePassword() === "token-2") // short-lived: minted per call
    assert(JdbcConfig(host = "h", password = Some("p")).resolvePassword() === "p")
    intercept[IllegalArgumentException](JdbcConfig(host = "h").resolvePassword())
  }

  test("toPgRows serializes vectors to pgvector text literals") {
    val df = Seq(("hello", Array(0.5f, 1.0f))).toDF("text", "embedding")
    val row = JdbcInterop.toPgRows(df).head()
    assert(row.getString(0) === "hello")
    assert(row.getString(1) === "[0.5,1.0]")
    intercept[IllegalArgumentException](JdbcInterop.toPgRows(Seq(1).toDF("x")))
  }
}

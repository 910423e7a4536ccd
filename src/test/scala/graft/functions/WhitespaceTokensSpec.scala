package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[WhitespaceTokens]] must be BYTE-EXACT with the builtin
  * `split(trim(c), "\\s+")` it replaced (Java `String.split("\\s+", -1)`
  * semantics): ~20 oracle-gated queries hash its token stream. */
class WhitespaceTokensSpec extends SparkSpec {

  private def viaBuiltin = split(trim(col("text")), "\\s+")
  private def viaScanner = TextFunctions.tokens(col("text"))

  private def assertParity(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("text")
    val rows = df.select(col("text"), viaBuiltin.as("b"), viaScanner.as("s")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch on ${r.getString(0).take(80).replace("\n", "\\n")}: " +
          s"builtin=${r.getSeq[String](1)} scanner=${r.getSeq[String](2)}")
    }
  }

  test("edge cases match String.split(\\s+, -1) semantics exactly") {
    assertParity(Seq(
      "", " ", "  ", "\t", "\n", "\f", "\r", "",
      "a", " a", "a ", " a ", "\ta", "a\t", "\ta\t",
      "a b", "a  b", "a\tb", "a\nb", "a\r\nb", "a \t\n b",
      "\t\n\f\r", "x\t\n\f\ry",
      "ünïcödé tökens",
      "汉字 分词\t混合",
      "emoji 🚀\ttest",
      "a b", // NBSP is NOT Java-regex \s: must stay one token
      "a b", // line separator is NOT \s either
      "ab", // vertical tab IS \s
      "trailing run \t\r\n", "\nleading run a"))
  }

  test("fixture corpus token streams are identical") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val diff = docs.select(viaBuiltin.as("b"), viaScanner.as("s"))
      .filter(not(col("b") === col("s")))
      .count()
    assert(diff == 0L, s"$diff fixture documents tokenized differently")
  }
}

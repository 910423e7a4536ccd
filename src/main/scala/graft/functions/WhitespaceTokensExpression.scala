package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ws_tokens(s)`: byte-exact replacement for `split(s, "\\s+")` (Java
  * `String.split("\\s+", -1)`) — the engine's whitespace tokenizer
  * ([[TextFunctions.tokens]]), which sits on the hottest per-row path of
  * every text operator (tf/df aggs, shingle dedup, LM scoring, BPE).
  *
  * Exists because Spark's `StringSplit` evaluates through
  * `UTF8String.split` → `toString()` → `String.split(regex, -1)`: a full
  * UTF-16 decode of the document, a `Pattern.compile` of `\s+` and a
  * regex `Matcher` PER ROW (verified against the 4.1.2 bytecode —
  * `String.split`'s single-char fast path does not apply to `\s+`), plus a
  * re-encode of every token. This expression scans the UTF8String's bytes
  * directly: Java-regex `\s` is exactly `[ \t\n\x0B\f\r]`, all ASCII, and
  * no multi-byte UTF-8 sequence contains bytes < 0x80, so a byte scan
  * splits at precisely the positions the regex does.
  *
  * Exact `String.split(.., -1)` semantics, spec-pinned against the builtin
  * in WhitespaceTokensSpec (including on the fixture corpus):
  *  - "" → [""] (one empty token);
  *  - a leading separator run yields one leading "" token;
  *  - a trailing separator run yields one trailing "" token (limit −1
  *    keeps trailing empties);
  *  - separator runs are maximal (`\s+`), so no interior empties.
  *
  * The DuckDB oracles mirror `string_split_regex(trim(x), '\s+')` — the
  * token STREAM contract is unchanged, only the evaluation engine.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {
  override def prettyName: String = "ws_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WhitespaceTokens.build(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WhitespaceTokens.build($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WhitespaceTokens {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Shared by interpreted eval and generated code. ONE byte copy per row
    * (`getBytes`), then zero-copy `fromBytes` slices per token — versus the
    * builtin's full UTF-16 decode + per-token re-encode. Byte offsets are
    * used throughout (UTF8String.substring is CHARACTER-indexed — not it). */
  def build(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array[AnyRef](UTF8String.EMPTY_UTF8))
    val out = new java.util.ArrayList[AnyRef](16)
    var tokenStart = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        // maximal separator run [i, j)
        var j = i + 1
        while (j < n && isWs(bytes(j))) j += 1
        // "" when the run leads the input (String.split parity)
        out.add(UTF8String.fromBytes(bytes, tokenStart, i - tokenStart))
        tokenStart = j
        i = j
      } else i += 1
    }
    // the final token; "" when the input ends in a separator run (Java
    // split with limit -1 keeps trailing empties)
    out.add(UTF8String.fromBytes(bytes, tokenStart, n - tokenStart))
    new GenericArrayData(out.toArray)
  }
}

package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-derived string hash, codegen'd: the top 15 hex digits of
  * `md5(s)` parsed as an unsigned integer — numerically identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` (and to the DuckDB oracle twin
  * `CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)`,
  * [[graft.OracleSql.md5Long]]) but computed straight from the digest bytes:
  * the top 60 bits of the 128-bit digest are the big-endian first 8 bytes
  * shifted right by 4. Skipping the 32-char hex rendering, the substring and
  * conv's base-16 string parse makes this ~3× cheaper per call — it is the
  * per-shingle/per-token inner loop of the MinHash/SimHash dedup family
  * (operators/Dedup.scala), where the reference-side cost actually lives.
  */
case class Md5Long(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(s: Any): Any = Md5Long.hash(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object Md5Long {
  // MessageDigest is stateful; one instance per executor thread
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top64 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top64 >>> 4 // top 60 bits = first 15 hex digits, unsigned
  }
}

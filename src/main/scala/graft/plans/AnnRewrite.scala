package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, IntegerLiteral, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, typedLit}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{cosine_distance, CosineDistance}

/** Transparent ANN rewrite — the engine-side analog of Postgres' planner
  * swapping `ORDER BY embedding <=> q LIMIT k` for an ivfflat index scan
  * once `CREATE INDEX` has run (SURVEY.md §3.3 step 3, §4.2).
  *
  * Opt-in per table (like the index DDL): register a parquet table path →
  * IVF index via [[AnnIndexRegistry.register]]; the optimizer rule then
  * rewrites matching plans
  * {{{ GlobalLimit(k, LocalLimit(k, Sort(cosine_distance(vecCol, LIT) ASC …, relation))) }}}
  * so the sort/limit run over ONLY the `nprobe` nearest list partitions of
  * the index dataset (partition-pruned scan) instead of the full table.
  * Results become approximate — exactly pgvector's documented index
  * semantics; unregistered tables are untouched.
  *
  * Enable with `Graft.enable(spark)` (runtime, experimental methods) or by
  * configuring `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object AnnIndexRegistry {
  final case class Entry(indexPath: String, nprobe: Int)
  private val byPath = new ConcurrentHashMap[String, Entry]()
  // memoized centroid rankings: (indexPath, nprobe, query hash) → list ids
  // keyed by the FULL query vector (content equality — a 32-bit hash key
  // would silently serve another query's lists on collision); invalidated
  // whenever an index path is re-registered (possible rebuild).
  private val probeMemo =
    new ConcurrentHashMap[(String, Int, collection.immutable.ArraySeq[Float]), Seq[Int]]()

  private def norm(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  def register(tablePath: String, indexPath: String, nprobe: Int): Unit = {
    byPath.put(norm(tablePath), Entry(indexPath, nprobe))
    probeMemo.keySet.removeIf(_._1 == indexPath)
  }

  def unregister(tablePath: String): Unit = byPath.remove(norm(tablePath))

  def lookup(paths: Seq[String]): Option[Entry] =
    paths.map(norm).flatMap(p => Option(byPath.get(p))).headOption

  def probedLists(spark: SparkSession, entry: Entry, q: Array[Float]): Seq[Int] =
    probeMemo.computeIfAbsent(
      (entry.indexPath, entry.nprobe,
        collection.immutable.ArraySeq.unsafeWrapArray(q.clone())), { _ =>
      spark.read.parquet(s"${entry.indexPath}/centroids")
        .select(col("list_id"), cosine_distance(col("centroid"), typedLit(q)).as("d"))
        .orderBy(col("d"), col("list_id"))
        .limit(entry.nprobe)
        .collect().map(_.getInt(0)).toSeq
    })
}

case class AnnRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def queryVector(e: CosineDistance): Option[(Attribute, Array[Float])] =
    (e.left, e.right) match {
      case (a: Attribute, Literal(v: ArrayData, ArrayType(FloatType, _))) =>
        Some((a, v.toFloatArray))
      case (Literal(v: ArrayData, ArrayType(FloatType, _)), a: Attribute) =>
        Some((a, v.toFloatArray))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(IntegerLiteral(_),
        ll @ LocalLimit(IntegerLiteral(_),
        srt @ Sort(SortOrder(d: CosineDistance, Ascending, _, _) +: _, true,
        rel: LogicalRelation, _))) =>
      val rewritten = for {
        (vecAttr, q) <- queryVector(d)
        fsRel <- rel.relation match {
          case r: HadoopFsRelation => Some(r); case _ => None
        }
        entry <- AnnIndexRegistry.lookup(
          fsRel.location.rootPaths.map(_.toString).toSeq)
      } yield {
        val lists = AnnIndexRegistry.probedLists(spark, entry, q)
        val idxPlan = spark.read.parquet(s"${entry.indexPath}/lists")
          .filter(col("list_id").isin(lists: _*))
          .queryExecution.analyzed
        val byName = idxPlan.output.map(a => a.name -> a).toMap
        // substitute the scan, preserving the original attribute ids the
        // enclosing Sort/Limit still reference
        val aligned = Project(rel.output.map { o =>
          Alias(byName(o.name), o.name)(exprId = o.exprId)
        }, idxPlan)
        gl.copy(child = ll.copy(child = srt.copy(child = aligned)))
      }
      rewritten.getOrElse(gl)
  }
}

/** `spark.sql.extensions` entry point: functions + ANN rewrite. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_distance"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineDistance].getName, "cosine_distance"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineDistance(es(0), es(1))))
    e.injectOptimizerRule(session => AnnRewriteRule(session))
  }
}

/** Runtime enablement for an existing session. */
object Graft {
  def enable(spark: SparkSession): Unit = {
    graft.functions.registerAll(spark)
    val already = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[AnnRewriteRule])
    if (!already) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnRewriteRule(spark)
    }
  }
}

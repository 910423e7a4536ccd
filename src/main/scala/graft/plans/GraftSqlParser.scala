package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.index.IvfIndex

/** pgvector DDL surface for `spark.sql(...)` — the statement a reference
  * user actually types (/root/reference/README.md:185):
  *
  * {{{
  *   CREATE INDEX [IF NOT EXISTS] [name] ON tbl
  *     USING ivfflat (col vector_cosine_ops) WITH (lists = 100);
  *   SET ivfflat.probes = 10;   -- plain Spark SET, read by the rewrite
  *   DROP INDEX name;
  * }}}
  *
  * The parser intercepts exactly this shape (regex on the normalized
  * statement), builds the IVF index for the view's backing parquet path,
  * and registers it with [[AnnIndexRegistry]] so `ORDER BY <distance>
  * LIMIT k` queries against the table transparently swap to the pruned
  * index scan — the full pgvector index lifecycle without leaving SQL.
  * Everything else delegates to Spark's parser unchanged.
  *
  * `USING hnsw (col vector_cosine_ops) [WITH (shards = n)]` builds the
  * sharded NSW graph ([[graft.index.NswIndex]] — the reference advertises
  * HNSW as a pgvector capability, /root/reference/README.md:40) and
  * registers it with kind = "hnsw"; DROP INDEX routes the same way.
  * `ORDER BY <=> LIMIT k` over an hnsw-registered table rewrites
  * transparently too (closing the round-3 divergence): the beam search
  * runs at plan time and its candidate ids re-enter as an id filter —
  * see [[AnnRewriteRule.hnswRewrite]]; `SET hnsw.ef_search = n` steers
  * it, mirroring `ivfflat.probes`. Predicate kNN routes through the
  * adaptive-ef filtered graph search the same way. pgvector's `m` /
  * `ef_construction` storage options are accepted and ignored with a
  * warning (graph constants are fixed engine-side); `shards` — the knob
  * that actually governs this layout — is honored.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftDdl.parse(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftDdl {

  private val Create = Pattern.compile(
    """(?is)\s*CREATE\s+INDEX\s+(IF\s+NOT\s+EXISTS\s+)?(\w+\s+)?ON\s+(\w+)\s+""" +
      """USING\s+(\w+)\s*\(\s*(\w+)\s+(vector_\w+_ops)\s*\)""" +
      """(?:\s*WITH\s*\(\s*([^)]*)\))?\s*;?\s*""")

  private val Drop = Pattern.compile("""(?is)\s*DROP\s+INDEX\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""")

  private val opclassMetric = Map(
    "vector_cosine_ops" -> "cosine",
    "vector_l2_ops" -> "l2",
    "vector_ip_ops" -> "ip")

  /** Storage options each access method accepts (Postgres rejects
    * unrecognized reloptions rather than silently defaulting — a typo'd
    * `list = 100` must not quietly build with DefaultLists). */
  private val knownOptions: Map[String, Set[String]] = Map(
    "ivfflat" -> Set("lists"),
    "hnsw" -> Set("m", "ef_construction", "shards"))

  /** `lists = 100, m = 16` → Map("lists" -> 100, "m" -> 16); a malformed
    * body, an option the method doesn't recognize, or a non-positive
    * value is a user error worth failing loudly, like Postgres. */
  private def parseOptions(method: String, body: String): Map[String, Int] =
    body.trim match {
      case "" => Map.empty
      case b => b.split(",").map { kv =>
        kv.split("=") match {
          case Array(k, v) if v.trim.matches("\\d+") =>
            val key = k.trim.toLowerCase
            if (!knownOptions(method).contains(key))
              throw new IllegalArgumentException(
                s"unrecognized $method storage option '$key' " +
                  s"(known: ${knownOptions(method).toSeq.sorted.mkString(", ")})")
            val value = v.trim.toInt
            if (value <= 0) throw new IllegalArgumentException(
              s"$method storage option '$key' must be positive, got $value")
            key -> value
          case _ => throw new IllegalArgumentException(
            s"malformed index storage option '${kv.trim}' (expect key = int)")
        }
      }.toMap
    }

  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    val c = Create.matcher(sqlText)
    if (c.matches()) {
      val method = c.group(4).toLowerCase
      if (method != "ivfflat" && method != "hnsw")
        return None // not ours — let Spark reject it
      val opclass = c.group(6).toLowerCase
      val metric = opclassMetric.getOrElse(opclass,
        throw new IllegalArgumentException(
          s"unknown operator class $opclass (${opclassMetric.keys.mkString("|")})"))
      if (method == "hnsw" && metric != "cosine")
        throw new IllegalArgumentException(
          s"USING hnsw supports vector_cosine_ops only in this engine " +
            s"(the NSW graph builds under cosine distance); got $opclass")
      val table = c.group(3)
      Some(CreateVectorIndexCommand(
        indexName = Option(c.group(2)).map(_.trim).getOrElse(s"${table}_${c.group(5)}_idx"),
        tableName = table,
        colName = c.group(5),
        method = method,
        metric = metric,
        options = parseOptions(method, Option(c.group(7)).getOrElse("")),
        ifNotExists = c.group(1) != null))
    } else {
      val d = Drop.matcher(sqlText)
      if (d.matches() && VectorIndexCatalog.contains(d.group(2))) {
        Some(DropVectorIndexCommand(d.group(2)))
      } else if (d.matches() && d.group(1) != null) {
        // DROP INDEX IF EXISTS <unknown> is a no-op in Postgres; without
        // this the delegate parser rejects the statement outright
        Some(NoopCommand)
      } else None // unknown index name: let Spark's DROP INDEX path handle it
    }
  }
}

/** name → registered (tablePath, indexPath), for DROP INDEX. */
object VectorIndexCatalog {
  private val byName = new ConcurrentHashMap[String, (String, String)]()
  def put(name: String, tablePath: String, indexPath: String): Unit =
    byName.put(name, (tablePath, indexPath))
  def contains(name: String): Boolean = byName.containsKey(name)
  def remove(name: String): Option[(String, String)] = Option(byName.remove(name))
  /** (name, tablePath, indexPath) rows — catalog export. */
  def all: Seq[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    byName.asScala.toSeq.map { case (n, (t, i)) => (n, t, i) }
  }
}

case class CreateVectorIndexCommand(
    indexName: String, tableName: String, colName: String, method: String,
    metric: String, options: Map[String, Int], ifNotExists: Boolean)
  extends LeafRunnableCommand with org.apache.spark.internal.Logging {

  override def run(session: SparkSession): Seq[Row] = {
    if (VectorIndexCatalog.contains(indexName)) {
      if (ifNotExists) return Seq.empty
      throw new IllegalArgumentException(s"index $indexName already exists")
    }
    val df = session.table(tableName)
    val path = df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.head.toString
    }.getOrElse(throw new IllegalArgumentException(
      s"CREATE INDEX: $tableName is not a file-backed table — the ANN " +
        "rewrite substitutes file scans, so only parquet-backed views are indexable"))
    require(df.columns.contains(colName),
      s"CREATE INDEX: $tableName has no column $colName")
    val baseDir = session.conf.getOption("graft.index.location")
      .getOrElse(System.getProperty("java.io.tmpdir") + "/graft_indexes")
    val indexPath = s"$baseDir/${tableName}_${colName}_${method}_$metric"
    // the catalog is the source of truth within this driver; a leftover
    // directory from a previous run is stale — clear it before rebuilding
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(session.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    // first-writer wins, like IF NOT EXISTS; rebuild = DROP then CREATE
    method match {
      case "ivfflat" =>
        IvfIndex.build(df, indexPath, idCol = df.columns.head, vecCol = colName,
          lists = options.getOrElse("lists", IvfIndex.DefaultLists),
          metric = metric)
        // pgvector defaults probes to 1; `SET ivfflat.probes = n` overrides
        // at plan time (AnnRewriteRule reads the session conf)
        AnnIndexRegistry.register(path, indexPath, nprobe = 1,
          column = Some(colName))
      case "hnsw" =>
        options.keys.filter(k => k == "m" || k == "ef_construction").foreach(k =>
          logWarning(s"hnsw storage option '$k' accepted but ignored: graph " +
            "build constants are fixed engine-side (NswIndex.M/EfConstruction)"))
        val shards = options.getOrElse("shards",
          math.max(1, math.ceil(df.count().toDouble /
            graft.index.NswIndex.RowsPerShardTarget).toInt))
        graft.index.NswIndex.build(df, indexPath, shards = shards,
          idCol = df.columns.head, vecCol = colName)
        // kind = "hnsw": never picked up by the transparent rewrite;
        // served through NswIndex.search via AnnIndexRegistry.hnswIndexFor
        AnnIndexRegistry.register(path, indexPath, nprobe = 0,
          column = Some(colName), kind = "hnsw")
    }
    VectorIndexCatalog.put(indexName, path, indexPath)
    Seq.empty
  }
}

case object NoopCommand extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = Seq.empty
}

case class DropVectorIndexCommand(indexName: String) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    // unregister ONLY this index's entry: pgvector allows several indexes
    // per table, and dropping one must not disable the others' rewrites
    VectorIndexCatalog.remove(indexName).foreach { case (tablePath, indexPath) =>
      AnnIndexRegistry.unregister(tablePath, indexPath)
    }
    Seq.empty
  }
}

package graft.index

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Timing.timeIt

/** Sharded navigable-small-world (NSW) graph index — the engine's analog of
  * the reference's advertised HNSW capability (/root/reference/README.md:40;
  * its only actual DDL is ivfflat, README.md:185).
  *
  * WHY NOT LITERAL HNSW: the hierarchy in HNSW exists to give a single
  * machine a log-routing entry point into one giant graph. A Spark batch
  * engine already has a better lever for that first hop — partitioning.
  * So the honest Spark-first design is: hash-shard the vectors, build an
  * independent layer-0 NSW graph per shard (greedy insert, bidirectional
  * M-edges, degree-capped), and serve a query by beam-searching every shard
  * in parallel and merging the per-shard top-k. Search cost per shard is
  * O(ef·M·d·hops) — sublinear in shard size — and the merge carries k rows
  * per shard, so total work scales with |shards|·ef·M·d, not with n.
  *
  * Trade-off vs [[IvfIndex]] (both kept, like pgvector's two index types):
  * IVF prunes the DATA READ (only nprobe lists scanned) but ranks against
  * every member of the probed lists; NSW touches every shard but computes
  * sublinearly within each. At 100 TB: IVF for selective batch probes over
  * cold data, sharded NSW for high-recall serving where shard graphs stay
  * memory-resident. Shards must be sized so one shard's graph fits an
  * executor (`rowsPerShard` guidance below) — the per-shard build/search
  * runs in `flatMapGroups` over exactly one shard's rows.
  *
  * Determinism (the property every gate leans on): shard assignment is
  * `pmod(vec_id, shards)`, insertion order is vec_id order within a shard,
  * every candidate ordering ties on (dist ASC, id ASC), and the search
  * entry point is the first inserted node — so build and search are
  * bit-reproducible across runs; pinned in NswIndexSpec.
  */
object NswIndex extends org.apache.spark.internal.Logging {

  /** Bidirectional edges added per insert. */
  val M = 8
  /** Degree cap after which a node's neighbor list is pruned to closest. */
  val MaxDegree = 16
  /** Beam width during construction. */
  val EfConstruction = 64
  /** Default beam width during search. */
  val EfSearch = 64

  /** ~rows per shard to keep a shard's vectors + adjacency well inside one
    * executor's memory at dim ≤ 1k (float vectors + int adjacency ≈
    * rowsPerShard·(4·dim + 8·MaxDegree) bytes ≈ 1.1 GiB at 256k×1k-dim). */
  val RowsPerShardTarget = 256 * 1024

  final case class Node(shard_id: Int, vec_id: Long, embedding: Array[Float])
  final case class GraphRow(shard_id: Int, vec_id: Long,
                            embedding: Array[Float], neighbors: Array[Long])

  private[index] def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy beam search over a local graph (standard NSW descent): expand
    * the closest frontier node, keep the best `ef` seen; stop when the
    * frontier can no longer improve the worst retained result. Orders on
    * (dist ASC, idx tie) for determinism. Returns (dist, localIdx) pairs
    * sorted ascending, at most `ef`. */
  private def beamSearch(q: Array[Float], vecs: mutable.ArrayBuffer[Array[Float]],
                         adj: mutable.ArrayBuffer[mutable.ArrayBuffer[Int]],
                         entry: Int, ef: Int): mutable.ArrayBuffer[(Double, Int)] = {
    // min-frontier: closest first; results: worst-first (max-heap) for O(1) trim
    val byDistAsc = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    val frontier = mutable.PriorityQueue.empty[(Double, Int)](byDistAsc.reverse)
    val results = mutable.PriorityQueue.empty[(Double, Int)](byDistAsc)
    val visited = new java.util.BitSet(vecs.length)
    val d0 = cosDist(q, vecs(entry))
    frontier.enqueue((d0, entry)); results.enqueue((d0, entry)); visited.set(entry)
    while (frontier.nonEmpty) {
      val (cd, c) = frontier.dequeue()
      if (results.size == ef && byDistAsc.gt((cd, c), results.head)) {
        frontier.clear() // frontier is sorted: nothing left can improve
      } else {
        val ns = adj(c); var i = 0
        while (i < ns.length) {
          val nb = ns(i)
          if (!visited.get(nb)) {
            visited.set(nb)
            val d = cosDist(q, vecs(nb))
            if (results.size < ef || byDistAsc.lt((d, nb), results.head)) {
              frontier.enqueue((d, nb)); results.enqueue((d, nb))
              if (results.size > ef) results.dequeue()
            }
          }
          i += 1
        }
      }
    }
    val out = mutable.ArrayBuffer.from(results)
    out.sortInPlace()(byDistAsc)
    out
  }

  /** Greedy-insert nodes `startIdx until vecs.length` into the graph over
    * nodes `0 until startIdx` (adjacency mutated in place). The shared core
    * of [[build]] (startIdx = 1) and [[append]] (startIdx = |existing|). */
  private def insertNodes(vecs: mutable.ArrayBuffer[Array[Float]],
                          adj: mutable.ArrayBuffer[mutable.ArrayBuffer[Int]],
                          startIdx: Int): Unit = {
    val byDistAsc = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    var i = math.max(startIdx, 1)
    while (i < vecs.length) {
      // search the graph built so far (nodes 0..i-1) for i's M nearest
      val found = beamSearch(vecs(i), vecs, adj, entry = 0, ef = EfConstruction)
        .iterator.filter(_._2 < i).take(M)
      found.foreach { case (_, j) =>
        adj(i) += j
        adj(j) += i
        if (adj(j).length > MaxDegree) {
          // prune j's list to the MaxDegree closest (dist to j, id tie)
          val pruned = adj(j).map(x => (cosDist(vecs(j), vecs(x)), x))
            .sorted(byDistAsc).take(MaxDegree).map(_._2)
          adj(j) = pruned
        }
      }
      i += 1
    }
  }

  /** Build one shard's NSW graph from its nodes (sorted by vec_id for
    * deterministic insertion order). */
  private def buildShard(shard: Int, nodes: Array[Node]): Iterator[GraphRow] = {
    val sorted = nodes.sortBy(_.vec_id)
    val vecs = mutable.ArrayBuffer.from(sorted.map(_.embedding))
    val adj = mutable.ArrayBuffer.fill(sorted.length)(mutable.ArrayBuffer.empty[Int])
    insertNodes(vecs, adj, startIdx = 1)
    sorted.iterator.zipWithIndex.map { case (n, idx) =>
      GraphRow(shard, n.vec_id, n.embedding,
        adj(idx).iterator.map(x => sorted(x).vec_id).toArray.sorted)
    }
  }

  /** Load a shard's stored rows into (ids, vecs, adj) local form. Rows are
    * re-sorted by vec_id — the stored insertion order — so local indices
    * are reproducible. */
  private def loadShard(rows: Array[GraphRow])
      : (Array[Long], mutable.ArrayBuffer[Array[Float]],
         mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]) = {
    val sorted = rows.sortBy(_.vec_id)
    val ids = sorted.map(_.vec_id)
    val idToIdx = ids.iterator.zipWithIndex.toMap
    val vecs = mutable.ArrayBuffer.from(sorted.map(_.embedding))
    val adj = mutable.ArrayBuffer.from(sorted.map(
      _.neighbors.iterator.map(idToIdx).to(mutable.ArrayBuffer)))
    (ids, vecs, adj)
  }

  /** Build the sharded graph at `indexPath/graph` (Hive-partitioned on
    * shard_id). Returns (rows, shards). */
  def build(embeddings: DataFrame, indexPath: String, shards: Int,
            idCol: String = "vec_id", vecCol: String = "embedding"): (Long, Int) =
    timeIt("nsw_build") {
      val spark = embeddings.sparkSession
      import spark.implicits._
      val nodes = embeddings
        .select(pmod(col(idCol), lit(shards)).cast("int").as("shard_id"),
          col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
        .as[Node]
      nodes.groupByKey(_.shard_id)
        .flatMapGroups((shard, it) => buildShard(shard, it.toArray))
        .toDF()
        .write.mode("overwrite").partitionBy("shard_id")
        .parquet(s"$indexPath/graph")
      // shard-count sidecar: append must assign new vectors with the SAME
      // modulus or cross-shard edges/lookups break
      Seq(Tuple1(shards)).toDF("shards")
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
      val n = spark.read.parquet(s"$indexPath/graph").count()
      (n, shards)
    }

  private def readGraph(spark: SparkSession, indexPath: String) = {
    import spark.implicits._
    spark.read.parquet(s"$indexPath/graph")
      .select(col("shard_id").cast("int").as("shard_id"), col("vec_id"),
        col("embedding"), col("neighbors"))
      .as[GraphRow]
  }

  /** Insert new vectors into the existing graph — the engine's analog of
    * pgvector inserting rows into an already-built index. New nodes join
    * their `pmod` shard and are greedy-inserted AFTER the existing nodes
    * (in vec_id order), so existing topology is extended, not rebuilt; a
    * shard that receives its first vectors is built fresh. The updated
    * graph is staged to `graph_new` and atomically swapped (can't overwrite
    * a path Spark is reading). Caller must not reuse existing vec_ids.
    * Returns the new total row count. */
  def append(spark: SparkSession, indexPath: String, newVectors: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): Long =
    timeIt("nsw_append") {
      import spark.implicits._
      val shards = spark.read.parquet(s"$indexPath/meta").head().getInt(0)
      val incoming = newVectors
        .select(pmod(col(idCol), lit(shards)).cast("int").as("shard_id"),
          col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
        .as[Node]
      val updated = readGraph(spark, indexPath).groupByKey(_.shard_id)
        .cogroup(incoming.groupByKey(_.shard_id)) { (shard, oldIt, newIt) =>
          val oldRows = oldIt.toArray
          val add = newIt.toArray
          if (add.isEmpty) oldRows.iterator
          else if (oldRows.isEmpty) buildShard(shard, add)
          else {
            val (ids, vecs, adj) = loadShard(oldRows)
            val sortedAdd = add.sortBy(_.vec_id)
            val start = vecs.length
            sortedAdd.foreach { n =>
              vecs += n.embedding
              adj += mutable.ArrayBuffer.empty[Int]
            }
            insertNodes(vecs, adj, startIdx = start)
            val allIds = ids ++ sortedAdd.map(_.vec_id)
            allIds.iterator.zipWithIndex.map { case (id, idx) =>
              GraphRow(shard, id, vecs(idx),
                adj(idx).iterator.map(allIds).toArray.sorted)
            }
          }
        }
      // stash→publish swap (FsOps.swapDir): the old delete-then-rename left
      // the graph ABSENT for the whole rename (and destroyed on a failed
      // one) — the swap narrows that to two metadata ops with rollback
      val conf = spark.sessionState.newHadoopConf()
      graft.util.FsOps.swapDir(conf,
        new org.apache.hadoop.fs.Path(s"$indexPath/graph")) { (_, staging) =>
        updated.toDF()
          .write.mode("overwrite").partitionBy("shard_id").parquet(staging)
      }
      spark.read.parquet(s"$indexPath/graph").count()
    }

  /** pgvector's `SET hnsw.ef_search = n` analog: the session conf
    * overrides [[EfSearch]] when the caller doesn't pass ef explicitly
    * (mirrors the `ivfflat.probes` conf the transparent rewrite honors).
    * Non-positive/garbage values are ignored with a warning, like the
    * rewrite's probes handling. */
  private def efDefault(spark: SparkSession): Int =
    spark.conf.getOption("hnsw.ef_search") match {
      case Some(p) => p.trim.toIntOption.filter(_ > 0).getOrElse {
        logWarning(s"ignoring non-positive-integer hnsw.ef_search value '$p'; " +
          s"using default $EfSearch")
        EfSearch
      }
      case None => EfSearch
    }

  /** Approximate top-k for one query: beam-search every shard in parallel
    * (entry = the shard's first inserted node = min vec_id), merge the
    * per-shard top-k globally — TakeOrderedAndProject over |shards|·k rows.
    * `ef <= 0` (the default) resolves through `hnsw.ef_search` /
    * [[EfSearch]]. */
  def search(spark: SparkSession, indexPath: String, q: Array[Float],
             k: Int, ef: Int = -1): DataFrame = {
    val ef0 = if (ef > 0) ef else efDefault(spark)
    import spark.implicits._
    readGraph(spark, indexPath).groupByKey(_.shard_id)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val (ids, vecs, adj) = loadShard(rows)
          beamSearch(q, vecs, adj, entry = 0, ef = math.max(ef0, k))
            .iterator.take(k).map { case (d, idx) => (ids(idx), d) }
        }
      }
      .toDF("vec_id", "dist")
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Per-shard beam-search candidates: like [[search]] but keeps `perShard`
    * rows per shard instead of k — the raw-candidate feed for filtered
    * search, where post-filtering needs a deeper pool than k. */
  private def candidates(spark: SparkSession, indexPath: String,
                         q: Array[Float], ef: Int, perShard: Int): DataFrame = {
    import spark.implicits._
    readGraph(spark, indexPath).groupByKey(_.shard_id)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val (ids, vecs, adj) = loadShard(rows)
          beamSearch(q, vecs, adj, entry = 0, ef = ef)
            .iterator.take(perShard).map { case (d, idx) => (ids(idx), d) }
        }
      }
      .toDF("vec_id", "dist")
  }

  /** Filtered graph search — the NSW counterpart of pgvector 0.8's
    * iterative index scans ([[graft.index.IvfIndex.filteredKnn]] is the
    * IVF one): a graph probe takes no predicate, so a selective filter
    * starves a fixed-ef search below k. Standard graph-ANN answer is
    * post-filter with ADAPTIVE ef: beam-search every shard with beam ef,
    * keep candidates that survive `predicate` (checked against `attrs`,
    * the table carrying the filter columns, joined on `idCol`), and if
    * fewer than k survive, double ef and re-search — capped at the graph
    * size, where beam search degrades to a full (exact) shard scan, so
    * the loop always terminates with every survivor found. Approximate
    * like all graph probes (recall-gated in NswIndexSpec, no oracle);
    * each round's candidate set is |shards|·ef rows — small until the
    * exhaustive cap, where it approaches the corpus, so the join strategy
    * is left to AQE rather than a broadcast hint. */
  def searchFiltered(spark: SparkSession, indexPath: String, q: Array[Float],
                     k: Int, attrs: DataFrame, predicate: Column,
                     idCol: String = "vec_id", ef: Int = -1): DataFrame = {
    val keep = attrs.filter(predicate)
      .select(col(idCol).cast("long").as("vec_id"))
    // full-exploration cap: one metadata-cheap count, after which a beam
    // of that width visits an entire shard (shard size ≤ total rows)
    import spark.implicits._
    lazy val total = spark.read.parquet(s"$indexPath/graph").count()
    // ef <= 0 (the default) resolves through `SET hnsw.ef_search`/EfSearch
    var curEf = math.max(if (ef > 0) ef else efDefault(spark), k)
    var out: Seq[(Long, Double)] = Seq.empty
    var done = k <= 0
    while (!done) {
      // NO broadcast hint: at full expansion (curEf = graph size) the
      // candidate frame is corpus-sized — let AQE pick the join strategy.
      // The k result rows are collected per round (the stop test needs
      // them) and the final round returns as a local frame, so the widest
      // beam search never re-runs on the caller's action.
      out = candidates(spark, indexPath, q, curEf, perShard = curEf)
        .join(keep, "vec_id")
        .orderBy(col("dist"), col("vec_id"))
        .limit(k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // a round that already explored whole shards (curEf ≥ total) found
      // every survivor there is — return it even when short of k
      if (out.length >= k || curEf >= total) done = true
      else curEf = math.min(total, curEf.toLong * 2).toInt
    }
    out.toDF("vec_id", "dist")
  }

  /** Batch search: many queries in one distributed pass — every shard
    * beam-searches the whole (broadcast) query batch, then per-query
    * two-phase top-k merges the ≤ k·|shards| candidate rows per query
    * ([[graft.functions.top_k_by_distance]] — no per-query window
    * shuffle). The query batch is collected driver-side and broadcast:
    * it is the small serving-batch side (mirrors probeMany collecting
    * probed list ids), NOT the indexed data — enforced at
    * [[graft.index.IvfIndex.MaxServingBatch]]; a corpus-sized ANN
    * self-join belongs on the IVF path ([[IvfIndex.searchMany]] /
    * knn_graph_ivf), whose stages are fully distributed. */
  def searchMany(spark: SparkSession, indexPath: String, queries: DataFrame,
                 qidCol: String, qvecCol: String, k: Int,
                 ef: Int = EfSearch): DataFrame = {
    IvfIndex.requireServingBatch(queries, "NswIndex.searchMany",
      "the shard-broadcast design is serving-only — route corpus-sized " +
        "query frames through IvfIndex.searchMany or the knn_graph_ivf " +
        "path, or chunk the batch (startNswServing does)")
    searchManyUnguarded(spark, indexPath, queries, qidCol, qvecCol, k, ef)
  }

  /** [[searchMany]] without the serving-batch pre-count — for callers
    * that already bounded the frame themselves (startNswServing's chunk
    * loop counts once and splits; re-counting every chunk would re-scan
    * the batch per chunk). */
  private[graft] def searchManyUnguarded(
      spark: SparkSession, indexPath: String, queries: DataFrame,
      qidCol: String, qvecCol: String, k: Int, ef: Int): DataFrame = {
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(qidCol).cast("long"), col(qvecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qs)
    val effEf = math.max(ef, k)
    readGraph(spark, indexPath).groupByKey(_.shard_id)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val (ids, vecs, adj) = loadShard(rows)
          bc.value.iterator.flatMap { case (qid, qv) =>
            beamSearch(qv, vecs, adj, entry = 0, ef = effEf)
              .iterator.take(k).map { case (d, idx) => (qid, ids(idx), d) }
          }
        }
      }
      .toDF("qid", "vec_id", "dist")
      .groupBy("qid")
      .agg(graft.functions.top_k_by_distance(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("vec_id"), col("s.dist").as("dist"))
  }
}

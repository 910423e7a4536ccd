package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Timing.timeIt

/** IVF-PQ — the composite the other two quantization/partition levers build
  * toward, and the canonical layout for billion-scale ANN (FAISS' IVFPQ):
  *
  *  - a COARSE quantizer (KMeans lists, as [[IvfIndex]]) makes the scan
  *    selective: a probe reads `nprobe` of `lists` Hive partitions;
  *  - RESIDUAL product quantization (as [[PqIndex]], but over `u − c(u)`,
  *    the vector minus its list centroid) makes the rows tiny. On a
  *    CLUSTERABLE corpus residuals concentrate near 0, so the same
  *    codebook budget quantizes them far better than raw vectors — this
  *    is why IVFPQ encodes residuals (pinned on a clustered fixture in
  *    IvfPqIndexSpec). On unclusterable (near-uniform) data the residual
  *    advantage vanishes — but the coarse stage still buys partition
  *    pruning, and re-rank recovers recall either way;
  *  - at query time each probed list gets its own ADC lookup table for
  *    `‖(u(q) − c_list)_s − cent_{s,c}‖²` (driver-side, nprobe·m·codes
  *    doubles — index metadata), and every scanned row costs m lookups.
  *
  * All vectors are L2-normalized first, so cosine distance = ‖u(q) − x‖²/2
  * and the whole pipeline can work in plain L2 (residuals don't preserve
  * angles, norms do compose). Answers depend on KMeans structure → recall-
  * gated (IvfPqIndexSpec) like the other index probes; the build's
  * exactly-once cardinality contract is oracle-checkable.
  */
object IvfPqIndex {

  val Seed = 42L

  final case class ListCode(list_id: Int, vec_id: Long, codes: Array[Byte])

  /** Build at `indexPath`: `coarse` (list_id, centroid array<double>),
    * `codebook` (sub, code, centroid array<double>) over residuals, and
    * `codes` (vec_id, codes) in the bucketed lists layout
    * ([[IvfIndex.MaxListDirs]] — ≤ 512 directories, list_id-sorted rows). */
  def build(embeddings: DataFrame, indexPath: String,
            lists: Int, m: Int = PqIndex.DefaultM, codes: Int = PqIndex.DefaultCodes,
            idCol: String = "vec_id", vecCol: String = "embedding",
            rotate: Boolean = false): Long =
    timeIt("ivfpq_build") {
      val spark = embeddings.sparkSession
      import spark.implicits._
      val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
      val subDim = dim / m
      // norm projected per ROW (inlining the norm into the transform lambda
      // would re-run it per element — O(d²); same fix as PqIndex.build)
      val normSq = graft.functions.inner_product(col(vecCol), col(vecCol))
      val unit = embeddings
        .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("_v"),
          sqrt(normSq).as("_nrm"))
        .select(col("vec_id"),
          transform(col("_v"), x => x.cast("double") / col("_nrm")).as("u"))
        .persist()
      // OPQ-style rotation (PqIndex.rotationMatrix): the ENTIRE pipeline —
      // coarse quantizer, residuals, codebooks, probes — runs in rotated
      // space; orthogonality preserves L2, so probe semantics are unchanged
      val rotPath = new org.apache.hadoop.fs.Path(s"$indexPath/rotation")
      val rotFs = rotPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (rotFs.exists(rotPath)) rotFs.delete(rotPath, true)
      val unit0 = unit
      val unitR = if (!rotate) unit0 else {
        val rot = PqIndex.rotationMatrix(dim, Seed)
        rot.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
          .toDF("i", "row")
          .coalesce(1).write.mode("overwrite").parquet(rotPath.toString)
        val bcR = spark.sparkContext.broadcast(rot)
        unit0.as[(Long, Array[Double])]
          .map { case (id, u) => (id, PqIndex.applyRotation(bcR.value, u)) }
          .toDF("vec_id", "u")
          .persist()
      }
      // coarse quantizer: Euclidean KMeans on the unit sphere (residuals
      // live in L2 space, so assignment must be L2-consistent)
      val coarseModel = new KMeans()
        .setK(lists).setSeed(Seed)
        .setFeaturesCol("fv").setPredictionCol("list_id")
        .fit(unitR.select(array_to_vector(col("u")).as("fv")))
      val coarse = coarseModel.clusterCenters.map(_.toArray)
      spark.createDataFrame(coarse.zipWithIndex.map { case (c, i) => (i, c) }.toIndexedSeq)
        .toDF("list_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/coarse")
      val bcCoarse = spark.sparkContext.broadcast(coarse)
      // residuals, computed once and reused for training + encoding
      val residuals = unitR.as[(Long, Array[Double])]
        .map { case (id, u) =>
          var best = 0; var bestD = Double.MaxValue
          val cs = bcCoarse.value
          var l = 0
          while (l < cs.length) {
            var d = 0.0; var j = 0
            while (j < u.length) { val t = u(j) - cs(l)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = l }
            l += 1
          }
          val r = new Array[Double](u.length)
          var j = 0
          while (j < u.length) { r(j) = u(j) - cs(best)(j); j += 1 }
          (best, id, r)
        }
        .toDF("list_id", "vec_id", "r")
        .persist()
      val codebook = (0 until m).flatMap { s =>
        val sliced = residuals.select(
          array_to_vector(slice(col("r"), s * subDim + 1, subDim)).as("fv"))
        val model = new KMeans()
          .setK(codes).setSeed(Seed + 1 + s)
          .setFeaturesCol("fv").setPredictionCol("c")
          .fit(sliced)
        model.clusterCenters.zipWithIndex.map { case (c, i) => (s, i, c.toArray) }
      }
      codebook.toDF("sub", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/codebook")
      val cb: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
        codebook.filter(_._1 == s).sortBy(_._2).map(_._3).toArray
      }
      val bcCb = spark.sparkContext.broadcast(cb)
      val coded = residuals.as[(Int, Long, Array[Double])]
        .map { case (list, id, r) =>
          val out = new Array[Byte](m)
          var s = 0
          while (s < m) {
            val cents = bcCb.value(s)
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < cents.length) {
              var d = 0.0; var j = 0
              while (j < subDim) { val t = r(s * subDim + j) - cents(c)(j); d += t * t; j += 1 }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            out(s) = best.toByte
            s += 1
          }
          ListCode(list, id, out)
        }
      // bucketed lists layout (see IvfIndex.MaxListDirs): ≤ 512 code
      // directories regardless of the coarse list count
      IvfIndex.writeLists(coded.toDF(), s"$indexPath/codes", "overwrite")
      residuals.unpersist(); unitR.unpersist(); unit0.unpersist()
      spark.read.parquet(s"$indexPath/codes").count()
    }

  /** Probe: rank coarse centroids by L2 to u(q), scan ONLY the `nprobe`
    * nearest list partitions (explicit `isin` filter → directory pruning),
    * score rows against the reconstruction x̂ = c_list + r̂ with the same
    * normalized-cosine form the raw-PQ search uses —
    * `1 − dot(u(q), x̂)/‖x̂‖` — via per-list LUTs:
    * dot decomposes as dot(u(q), c_list) + Σₛ dot(u(q)ₛ, centₛ,c) and
    * ‖x̂‖² as Σₛ ‖(c_list)ₛ + centₛ,c‖² (normalizing x̂ matters: the
    * unnormalized L2 form carries a (‖x̂‖²−1)/2 per-row bias). */
  def probe(spark: SparkSession, indexPath: String, q: Array[Float],
            k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val coarse = spark.read.parquet(s"$indexPath/coarse")
      .collect().map(r => r.getInt(0) -> r.getAs[collection.Seq[Double]](1).toArray).toMap
    val cbRows = spark.read.parquet(s"$indexPath/codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getAs[collection.Seq[Double]](2).toArray))
    val m = cbRows.iterator.map(_._1).max + 1
    val nCodes = cbRows.iterator.map(_._2).max + 1
    val subDim = cbRows.head._3.length
    val qu0 = {
      var n = 0.0; q.foreach(x => n += x.toDouble * x)
      val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
      q.map(_.toDouble * inv)
    }
    // rotated index → rotate the query into the same space (orthogonal ⇒ L2 preserved)
    val qu = PqIndex.loadRotation(spark, indexPath)
      .map(PqIndex.applyRotation(_, qu0)).getOrElse(qu0)
    val probed = coarse.toSeq
      .map { case (l, c) =>
        var d = 0.0; var j = 0
        while (j < qu.length) { val t = qu(j) - c(j); d += t * t; j += 1 }
        (d, l)
      }
      .sorted.take(nprobe).map(_._2)
    // shared dot LUT: dot(u(q)_s, cent_{s,c})
    val dotLut = Array.ofDim[Double](m, nCodes)
    cbRows.foreach { case (s, code, cent) =>
      var d = 0.0; var j = 0
      while (j < subDim) { d += qu(s * subDim + j) * cent(j); j += 1 }
      dotLut(s)(code) = d
    }
    // per-probed-list: constant dot(u(q), c_l) and norm LUT ‖(c_l)_s + cent‖²
    val listConst: Map[Int, Double] = probed.map { l =>
      val c = coarse(l)
      var d = 0.0; var j = 0
      while (j < qu.length) { d += qu(j) * c(j); j += 1 }
      l -> d
    }.toMap
    val nrmLuts: Map[Int, Array[Array[Double]]] = probed.map { l =>
      val c = coarse(l)
      val lut = Array.ofDim[Double](m, nCodes)
      cbRows.foreach { case (s, code, cent) =>
        var nn = 0.0; var j = 0
        while (j < subDim) { val t = c(s * subDim + j) + cent(j); nn += t * t; j += 1 }
        lut(s)(code) = nn
      }
      l -> lut
    }.toMap
    val bcDot = spark.sparkContext.broadcast(dotLut)
    val bcConst = spark.sparkContext.broadcast(listConst)
    val bcNrm = spark.sparkContext.broadcast(nrmLuts)
    IvfIndex.pruneLists(spark.read.parquet(s"$indexPath/codes"), probed)
      .select(col("list_id").cast("int").as("list_id"), col("vec_id"), col("codes"))
      .as[ListCode]
      .map { e =>
        val nrm = bcNrm.value(e.list_id)
        var dot = bcConst.value(e.list_id)
        var nn = 0.0
        var s = 0
        while (s < e.codes.length) {
          val c = e.codes(s) & 0xff
          dot += bcDot.value(s)(c); nn += nrm(s)(c); s += 1
        }
        val dist = if (nn == 0.0) 1.0 else 1.0 - dot / math.sqrt(nn)
        (e.vec_id, dist)
      }
      .toDF("vec_id", "dist")
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Serving batches [[probeMany]] accepts before failing over to
    * [[searchMany]] (the LUT build is per-query driver work — right for
    * serving micro-batches, a driver hazard for corpus-sized frames).
    * One bound across the index family ([[IvfIndex.MaxServingBatch]]). */
  val MaxServingBatch: Int = IvfIndex.MaxServingBatch

  /** Batch probe: many queries in one distributed pass — the IVFPQ analog
    * of [[IvfIndex.probeMany]] / [[NswIndex.searchMany]]. Per query the
    * driver ranks coarse centroids and builds the per-probed-list LUTs
    * (|queries|·nprobe·m·codes doubles — the broadcast is serving-batch
    * metadata, not data); the scan reads the UNION of all probed list
    * partitions once, scores each row for every query that probed its
    * list, and merges per query with the bounded-heap top-k aggregate.
    *
    * SERVING-BATCH contract: the query frame is collected to the driver,
    * so it must be a serving batch (≤ [[MaxServingBatch]] rows — enforced
    * BEFORE the collect, with guidance), never a corpus-sized relation;
    * a corpus-sized batch (e.g. an IVFPQ self-join) belongs on
    * [[searchMany]], whose assignment/scoring stages are fully
    * distributed. One row per qid (the [[IvfIndex.searchMany]] rule). */
  def probeMany(spark: SparkSession, indexPath: String, queries: DataFrame,
                qidCol: String, qvecCol: String, k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    IvfIndex.requireServingBatch(queries, "probeMany",
      "the per-query driver LUT build is for serving batches — route " +
        "corpus-sized query frames through searchMany (distributed " +
        "assignment + list_id equi-join)")
    val coarse = spark.read.parquet(s"$indexPath/coarse")
      .collect().map(r => r.getInt(0) -> r.getAs[collection.Seq[Double]](1).toArray).toMap
    val cbRows = spark.read.parquet(s"$indexPath/codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getAs[collection.Seq[Double]](2).toArray))
    val m = cbRows.iterator.map(_._1).max + 1
    val nCodes = cbRows.iterator.map(_._2).max + 1
    val subDim = cbRows.head._3.length
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(qidCol).cast("long"), col(qvecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val rotation = PqIndex.loadRotation(spark, indexPath)
    // per (list, qid): (constDot, norm LUT); dot LUT is per qid only
    val perQuery: Array[(Long, Array[Double], Seq[Int], Array[Array[Double]])] =
      qs.map { case (qid, q) =>
        var n = 0.0; q.foreach(x => n += x.toDouble * x)
        val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
        val qu0 = q.map(_.toDouble * inv)
        val qu = rotation.map(PqIndex.applyRotation(_, qu0)).getOrElse(qu0)
        val probed = coarse.toSeq.map { case (l, c) =>
          var d = 0.0; var j = 0
          while (j < qu.length) { val t = qu(j) - c(j); d += t * t; j += 1 }
          (d, l)
        }.sorted.take(nprobe).map(_._2)
        val dotLut = Array.ofDim[Double](m, nCodes)
        cbRows.foreach { case (s, code, cent) =>
          var d = 0.0; var j = 0
          while (j < subDim) { d += qu(s * subDim + j) * cent(j); j += 1 }
          dotLut(s)(code) = d
        }
        (qid, qu, probed, dotLut)
      }
    // list → queries probing it, with (constDot, normLut) per pair
    val byList: Map[Int, Seq[(Long, Double, Array[Array[Double]], Array[Array[Double]])]] =
      perQuery.flatMap { case (qid, qu, probed, dotLut) =>
        probed.map { l =>
          val c = coarse(l)
          var cd = 0.0; var j = 0
          while (j < qu.length) { cd += qu(j) * c(j); j += 1 }
          val nrmLut = Array.ofDim[Double](m, nCodes)
          cbRows.foreach { case (s, code, cent) =>
            var nn = 0.0; var jj = 0
            while (jj < subDim) { val t = c(s * subDim + jj) + cent(jj); nn += t * t; jj += 1 }
            nrmLut(s)(code) = nn
          }
          l -> (qid, cd, dotLut, nrmLut)
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val listIds = byList.keys.toIndexedSeq
    val bc = spark.sparkContext.broadcast(byList)
    IvfIndex.pruneLists(spark.read.parquet(s"$indexPath/codes"), listIds)
      .select(col("list_id").cast("int").as("list_id"), col("vec_id"), col("codes"))
      .as[ListCode]
      .flatMap { e =>
        bc.value(e.list_id).iterator.map { case (qid, cd, dotLut, nrmLut) =>
          var dot = cd; var nn = 0.0; var s = 0
          while (s < e.codes.length) {
            val c = e.codes(s) & 0xff
            dot += dotLut(s)(c); nn += nrmLut(s)(c); s += 1
          }
          (qid, e.vec_id, if (nn == 0.0) 1.0 else 1.0 - dot / math.sqrt(nn))
        }
      }
      .toDF("qid", "vec_id", "dist")
      .groupBy("qid")
      .agg(graft.functions.top_k_by_distance(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("vec_id"), col("s.dist").as("dist"))
  }

  /** Fully DISTRIBUTED batch search — the corpus-sized twin of
    * [[probeMany]] (broadcast codebooks + ONE list_id equi-join), for
    * query frames that are data, not serving batches (an IVFPQ kNN
    * self-graph, a bulk re-embedding backfill): nothing query-frame-sized
    * ever touches the driver.
    *
    *  1. assignment is a map-only flatMap over the query frame — each row
    *     normalizes/rotates its vector and ranks the BROADCAST coarse
    *     centroids locally (|lists|·d doubles of index metadata), emitting
    *     its `nprobe` (qid, qu, list_id) probe rows;
    *  2. scoring is ONE equi-join of the codes dataset against the probe
    *     rows on list_id (shuffle-partitioned both sides — AQE handles a
    *     hot list), each joined pair priced with EXACTLY [[probeMany]]'s
    *     factored ADC arithmetic (per-subspace dot/norm partial sums in
    *     the same order, so results are bit-identical — spec-pinned);
    *  3. the per-query top-k is the bounded-heap aggregate (≤
    *     k·|partitions| shuffle rows per query).
    *
    * Cost trade-off vs [[probeMany]]: each joined pair pays O(d) multiply
    * work (the subspace dots are recomputed per row) instead of O(m) LUT
    * lookups — the price of having no per-query driver state. For
    * serving-sized batches the LUT path wins; past [[MaxServingBatch]]
    * queries, only this form scales.
    *
    * Stage 1 ranks ALL coarse centroids per query (n·lists flops) — fine
    * at the serving-style coarse counts IVFPQ is built with here, but a
    * corpus-proportional `lists` would reproduce the quadratic the dense
    * family measured at its 100× point; the escalation recipe is
    * [[IvfIndex.assignProbesHierarchical]] (two-level coarse quantizer),
    * to be applied here when a PQ deployment sizes lists with the
    * corpus. */
  def searchMany(spark: SparkSession, indexPath: String, queries: DataFrame,
                 qidCol: String, qvecCol: String, k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val coarseArr: Array[Array[Double]] = {
      val rows = spark.read.parquet(s"$indexPath/coarse")
        .collect().map(r => r.getInt(0) -> r.getAs[collection.Seq[Double]](1).toArray)
      val out = new Array[Array[Double]](rows.map(_._1).max + 1)
      rows.foreach { case (l, c) => out(l) = c }
      out
    }
    val cbRows = spark.read.parquet(s"$indexPath/codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getAs[collection.Seq[Double]](2).toArray))
    val m = cbRows.iterator.map(_._1).max + 1
    val cb: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      cbRows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    val subDim = cb(0)(0).length
    val bcCoarse = spark.sparkContext.broadcast(coarseArr)
    val bcCb = spark.sparkContext.broadcast(cb)
    val bcRot = spark.sparkContext.broadcast(PqIndex.loadRotation(spark, indexPath))
    val assigned = queries.select(col(qidCol).cast("long"), col(qvecCol))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, q) =>
        var n = 0.0; q.foreach(x => n += x.toDouble * x)
        val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
        val qu0 = q.map(_.toDouble * inv)
        val qu = bcRot.value.map(PqIndex.applyRotation(_, qu0)).getOrElse(qu0)
        val cs = bcCoarse.value
        val ranked = Array.tabulate(cs.length) { l =>
          val c = cs(l)
          var d = 0.0; var j = 0
          while (j < qu.length) { val t = qu(j) - c(j); d += t * t; j += 1 }
          (d, l)
        }.sorted.take(nprobe) // same (dist, list) ranking as probe/probeMany
        ranked.iterator.map { case (_, l) =>
          val c = cs(l)
          var cd = 0.0; var j = 0
          while (j < qu.length) { cd += qu(j) * c(j); j += 1 }
          (qid, qu, l, cd)
        }
      }
      .toDF("qid", "qu", "list_id", "cd")
    spark.read.parquet(s"$indexPath/codes")
      .select(col("list_id").cast("int").as("list_id"), col("vec_id"), col("codes"))
      .join(assigned, Seq("list_id"))
      .select(col("qid"), col("vec_id"), col("list_id"), col("codes"),
        col("qu"), col("cd"))
      .as[(Long, Long, Int, Array[Byte], Array[Double], Double)]
      .map { case (qid, vid, listId, codes, qu, cd) =>
        // probeMany's factored ADC arithmetic, op for op: the per-subspace
        // partial sums below are the values its LUTs cache, accumulated in
        // the same s-order into the same two accumulators — so dist is
        // bit-identical across the two forms (spec-pinned)
        val cbv = bcCb.value
        val cl = bcCoarse.value(listId)
        var dot = cd
        var nn = 0.0
        var s = 0
        while (s < codes.length) {
          val cent = cbv(s)(codes(s) & 0xff)
          var d = 0.0
          var j = 0
          while (j < subDim) { d += qu(s * subDim + j) * cent(j); j += 1 }
          var n2 = 0.0
          j = 0
          while (j < subDim) { val t = cl(s * subDim + j) + cent(j); n2 += t * t; j += 1 }
          dot += d
          nn += n2
          s += 1
        }
        (qid, vid, if (nn == 0.0) 1.0 else 1.0 - dot / math.sqrt(nn))
      }
      .toDF("qid", "vec_id", "dist")
      .groupBy("qid")
      .agg(graft.functions.top_k_by_distance(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("vec_id"), col("s.dist").as("dist"))
  }

  /** Probe + exact re-rank over the overfetched candidates (the production
    * chain: prune partitions → ADC over codes → full-precision re-rank of
    * overfetch·k rows). */
  def probeRerank(spark: SparkSession, indexPath: String, base: DataFrame,
                  q: Array[Float], k: Int, nprobe: Int, overfetch: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{cosine_distance, vector_lit}
    val candIds = probe(spark, indexPath, q, k * overfetch, nprobe)
      .select("vec_id").collect().map(_.getLong(0)).toIndexedSeq
    base.filter(col(idCol).isin(candIds: _*))
      .select(col(idCol).cast("long").as("vec_id"),
        cosine_distance(col(vecCol), vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Filtered IVF-PQ search — completing the filtered-ANN family
    * ([[IvfIndex.filteredKnn]] exact, [[NswIndex.searchFiltered]] graph):
    * a predicate starves a fixed probe below k two ways here, so BOTH
    * knobs expand — `nprobe` ×2 (capped at the list count) widens which
    * partitions the ADC scan reads, `overfetch` ×2 deepens the candidate
    * pool within them — until k rows survive. Terminal state: every list
    * probed AND the probe returned fewer candidates than requested (the
    * pool IS the whole probed population) ⇒ post-filter is complete, the
    * result is exact, loop ends even with < k survivors. Candidates join
    * the base table by broadcast id-list (never an isin literal chain —
    * at full expansion that would be corpus-sized). Approximate before the
    * terminal state, like every PQ probe → recall-gated in spec. */
  /** EXACT twin of [[probeRerank]]: probe EVERY list with a pool covering
    * the whole code set, so the exact re-rank over the full candidate pool
    * IS the exact top-k — oracle-checkable (brute-force cosine in SQL),
    * hard evidence the coarse-probe + ADC plumbing surfaces the right ids.
    * Candidates join the base table by broadcast id-frame (an `isin`
    * literal chain would be corpus-sized at full expansion). A
    * verification query: production probes stay nprobe/overfetch-bounded
    * ([[probeRerank]]). */
  def probeRerankAll(spark: SparkSession, indexPath: String, base: DataFrame,
                     q: Array[Float], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{cosine_distance, vector_lit}
    val lists = spark.read.parquet(s"$indexPath/coarse").count().toInt
    val nCodes = spark.read.parquet(s"$indexPath/codes").count()
    val pool = math.min(nCodes, Int.MaxValue.toLong).toInt
    val cands = probe(spark, indexPath, q, pool, lists)
      .select(col("vec_id").as("_cand_id"))
    base.join(broadcast(cands), col(idCol).cast("long") === col("_cand_id"), "left_semi")
      .select(col(idCol).cast("long").as("vec_id"),
        cosine_distance(col(vecCol), vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  def probeRerankFiltered(spark: SparkSession, indexPath: String, base: DataFrame,
                          q: Array[Float], k: Int,
                          predicate: org.apache.spark.sql.Column,
                          nprobe: Int = 4, overfetch: Int = 4,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{cosine_distance, vector_lit}
    import spark.implicits._
    val lists = spark.read.parquet(s"$indexPath/coarse").count().toInt
    var np = math.min(math.max(1, nprobe), lists)
    var of = math.max(1, overfetch)
    // overfetch doubles unboundedly under a never-satisfiable predicate;
    // clamp so k*of can never overflow Int to a negative limit, and treat
    // a full-width probe whose pool stopped growing as terminal (drained)
    val maxOf = math.max(1, Int.MaxValue / math.max(1, k))
    var prevPool = -1
    // the k result rows are COLLECTED each round (they drive the stop
    // test anyway) and the final round's rows are returned as a local
    // frame — returning the lazy plan would re-run the whole probe+rerank
    // on the caller's action
    var out: Seq[(Long, Double)] = Seq.empty
    var done = k <= 0
    while (!done) {
      val cands = probe(spark, indexPath, q, k * of, np)
        .select("vec_id").collect().map(_.getLong(0)).toIndexedSeq
      out = base.filter(predicate)
        .join(broadcast(cands.toDF("_cand_id")),
          col(idCol).cast("long") === col("_cand_id"), "left_semi")
        .select(col(idCol).cast("long").as("vec_id"),
          cosine_distance(col(vecCol), vector_lit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val poolExhausted = cands.length < k * of // probed lists fully drained
      val drained = np >= lists &&
        (poolExhausted || of >= maxOf || cands.length == prevPool)
      if (out.length >= k || drained) done = true
      else {
        if (np < lists) np = math.min(lists, np * 2)
        if (!poolExhausted) of = math.min(maxOf, of * 2)
      }
      prevPool = cands.length
    }
    out.toDF("vec_id", "dist")
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Method: one untimed warm-up execution per query (absorbs JVM/JIT,
  * whole-stage-codegen compilation and parquet footer reads — one-time
  * session costs that would otherwise dwarf the ~sub-second steady-state
  * query times at local scale), then the best of 3 timed runs — noise on
  * an otherwise-idle machine only ever ADDS time (GC, scheduling), so the
  * min is the stable estimator and a third sample halves the odds of two
  * noisy draws; `total` is the sum of per-query times.
  *
  * Durability: besides the stdout lines (whose log tail the driver
  * truncates), the COMPLETE per-query map is written as pretty-printed
  * JSON to `bench/bench_<sf>.json` in the repo so cross-round per-query
  * comparison survives in git (override dir: SPARK_GRAFT_BENCH_OUT).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.tuneSession(spark)

    // O(n²) reference-parity forms: oracle anchors whose COMPUTE is
    // quadratic by documented design (each has a timed linear/sampled/
    // bucketed scale twin). Above the row threshold they are SKIPPED —
    // listed in the JSON with the reason, never silently dropped — so the
    // bench scales to sf≥1 corpora without the anchors dominating the
    // wall clock. CORRECTNESS is untouched: Verify still runs them at
    // sf0.01. Threshold: max(documents, embeddings) rows, default 10k
    // (sf0.1 stays fully timed; a 10× corpus trips it), overridable via
    // SPARK_GRAFT_MAX_QUADRATIC_ROWS.
    // dedup_embedding is exact but its candidate-pruning bound is
    // data-dependent: on un-clusterable corpora it degrades to the full
    // candidate join (measured 80× at 10× data) — skip it with the
    // anchors, and with it every query COMPOSING it (dedup_clusters /
    // dedup_clusters_star run CC over dedupEmbedding's pair set, so they
    // pay the same blowup); its probe-bounded twin dedup_embedding_ivf
    // stays timed, as does semantic_clusters_ivf (composes knn_graph_ivf)
    val quadratic = Set(
      "avg_pairwise_sim", "sim_histogram", "knn_graph", "semantic_clusters",
      "dedup_embedding", "dedup_clusters", "dedup_clusters_star")
    val maxQuadRows =
      sys.env.getOrElse("SPARK_GRAFT_MAX_QUADRATIC_ROWS", "10000").toLong
    val corpusRows = math.max(
      spark.read.parquet(s"$sfDir/documents.parquet").count(),
      spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    val skipQuadratic = corpusRows > maxQuadRows
    val skipped: Seq[(String, String)] =
      if (!skipQuadratic) Nil
      else quadratic.toSeq.sorted.map(q => q ->
        s"quadratic parity form: $corpusRows corpus rows > $maxQuadRows (scale twin stays timed)")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => skipQuadratic && quadratic(q._1))

    // A failing query must FAIL the bench (exit 1), not be "timed" as
    // near-zero and silently improve the total: collect per-query errors,
    // emit them in the JSON, and exit non-zero if any query broke.
    var errors = Map.empty[String, String]

    // Per-query shuffle + spill + peak-memory accounting (see
    // ShuffleAccounting: plan-property bytes, the drift-immune half of
    // the evidence; spill bytes name memory-pressure regressions that
    // sec+shuffle_mb alone can't distinguish from box noise).
    val shuffle = new graft.util.ShuffleAccounting(spark.sparkContext)

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        if (!errors.contains(name)) {
          errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        }
      }

    // Warm-up: run each query once, untimed. This includes the one-off
    // index BUILDS (IVF/NSW/PQ/IVFPQ), which allocate heavily; drain the
    // resulting GC/ContextCleaner debt before timing starts — otherwise a
    // full-GC storm can land mid-measurement and charge 10× to whichever
    // query it happens to hit (observed: a 2 s query "timed" at 23 s).
    queries.foreach { case (name, fn) => runOnce(name, fn) }
    System.gc(); Thread.sleep(2000)

    case class QRes(name: String, sec: Double, shuffleBytes: Long,
                    spillBytes: Long, peakBytes: Long)
    val results = queries.filterNot(q => errors.contains(q._1)).map { case (name, fn) =>
      var shuffleBytes = 0L
      var spillBytes = 0L
      var peakBytes = 0L
      val times = (1 to 3).map { _ =>
        System.gc() // steady-state: GC debt from prior queries stays untimed
        val (s0, m0, d0) = shuffle.snapshotAll()
        shuffle.resetPeak()
        val t0 = System.nanoTime()
        runOnce(name, fn)
        val dt = (System.nanoTime() - t0) / 1e9
        // bus drain stays OUTSIDE the timer
        val (s1, m1, d1) = shuffle.snapshotAll()
        shuffleBytes = s1 - s0
        spillBytes = (m1 - m0) + (d1 - d0)
        peakBytes = shuffle.peakSinceReset()
        dt
      }
      QRes(name, times.min, shuffleBytes, spillBytes, peakBytes)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // Keep the ONE JSON line compact (~3 KB, not ~6 KB): millisecond
    // precision per query and shuffle entries only where ≥ 0.05 MB —
    // the consumer captures a bounded tail of the build log, and a line
    // longer than that window arrives truncated and unparseable.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def f2mb(b: Long): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(b / 1e6))
    val qs = results.map(r => jstr(r.name) + ":" + f3(r.sec))
      .mkString("{", ",", "}")
    val sh = results.filter(_.shuffleBytes >= 50000L)
      .map(r => jstr(r.name) + ":" + f2mb(r.shuffleBytes))
      .mkString("{", ",", "}")
    // spill is EXCEPTIONAL at fixture scale — the sparse map stays tiny,
    // and any entry here is itself the signal (a plan whose partitions
    // stopped fitting execution memory)
    val sp = results.filter(_.spillBytes >= 50000L)
      .map(r => jstr(r.name) + ":" + f2mb(r.spillBytes))
      .mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val skp = skipped
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_.sec).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"shuffle_mb":$sh,"spill_mb":$sp,"errors":$errs,"skipped":$skp,"sf":"$sfDir"}""")
    // Durability: the consumer keeps only a bounded tail of the build log,
    // and the full line above has been observed to arrive truncated at the
    // HEAD of that window. Emit a second, much smaller summary line LAST —
    // totals plus the 15 slowest queries — so the expensive tail and the
    // grand total always survive whatever prefix the log tail cuts off.
    // Committed artifact: the FULL per-query map, pretty-printed one query
    // per line (sorted, so git diffs align across rounds). The stdout log
    // tail truncates; this file is the durable cross-round record.
    try {
      val outDir = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench"))
      java.nio.file.Files.createDirectories(outDir)
      val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
      val lines = new StringBuilder
      lines.append("{\n")
      lines.append(s"""  "sf": ${jstr(sfDir)},\n""")
      lines.append(s"""  "total_s": ${f3(total)},\n""")
      lines.append(s"""  "n": ${results.size},\n""")
      lines.append(s"""  "n_errors": ${errors.size},\n""")
      lines.append("  \"queries\": {\n")
      lines.append(results.map { r =>
        s"""    ${jstr(r.name)}: {"sec": ${f3(r.sec)}, "shuffle_mb": ${
          f2mb(r.shuffleBytes)}, "spill_mb": ${f2mb(r.spillBytes)
          }, "peak_mem_mb": ${f2mb(r.peakBytes)}}"""
      }.mkString(",\n"))
      lines.append("\n  },\n")
      lines.append(s"""  "errors": $errs,\n""")
      lines.append(s"""  "skipped": $skp\n""")
      lines.append("}\n")
      java.nio.file.Files.write(outDir.resolve(s"bench_$sfName.json"),
        lines.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
    }
    // The LAST stdout line is the driver-contract one —
    // {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…} — kept
    // under ~700 chars (queries = the 15 slowest) so it survives WHOLE in
    // a bounded log tail: the full per-query line above is ~5 KB and has
    // only ever reached the consumer truncated (BENCH_r01–r13 all record
    // parsed:null), which is why this line now carries the contract shape
    // rather than an ad-hoc "summary" record.
    val slowest = results.sortBy(-_.sec).take(15)
      .map(r => jstr(r.name) + ":" + f3(r.sec))
      .mkString("{", ",", "}")
    val contractLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$slowest,"n":${results.size},"n_errors":${errors.size},"sf":${jstr(sfDir)}}"""
    println(contractLine)
    // sbt decorates BOTH streams — stdout gets "[info] ", and r15's
    // captured tail shows the stderr copy arriving as "[error] {...}", so
    // the r14 "stderr passes through unprefixed" theory is DISPROVEN
    // (fifteen consecutive parsed:null). The durable machine-readable
    // copy is therefore a FILE: bench/contract.json carries the bare
    // contract line, and bench/bench_<sf>.json (above) is the artifact of
    // record with the full per-query map — see README "Benchmarks".
    try {
      val outDir = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench"))
      java.nio.file.Files.write(outDir.resolve("contract.json"),
        (contractLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] contract write failed: ${e.getMessage}")
    }
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}

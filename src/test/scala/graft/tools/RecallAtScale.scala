// Recall@k of knn_graph_ivf vs brute-force exact, on a SCALE corpus, as
// a function of the probe count — the measurement behind probesFor():
//   SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.RecallAtScale /tmp/graft_scale/x1000 4,8,16 bench/recall_sf100.json"
// Mirrors BenchScale's recall block (same 32-node deterministic sample)
// so numbers line up with the committed scale artifacts. The optional
// third arg commits the probes × recall × wall table as a JSON sidecar —
// the calibration evidence behind probesFor's divisor (VERDICT r15 #6).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object RecallAtScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x1000"
    val probesList = (if (args.length > 1) args(1) else "4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    import graft.functions.{cosine_distance, top_k_by_distance}

    val k = graft.operators.SimilarityQueries.KnnGraphK
    val e = graft.Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val sampleIds = e.select("vec_id")
      .filter(pmod(xxhash64(col("vec_id")), lit(211L)) === 0L)
      .orderBy("vec_id").limit(32)
      .collect().map(_.getLong(0)).toIndexedSeq
    val q = e.filter(col("vec_id").isin(sampleIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .groupBy("qid")
      .agg(top_k_by_distance(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), explode(col("top.vec_id")).as("nbr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    println(s"[recall] exact reference built over ${exact.size} sampled nodes")

    val rows = probesList.map { p =>
      val t0 = System.nanoTime()
      val approx = graft.operators.SimilarityQueries
        .knnGraphIvf(spark, sfDir, probes = p)
        .filter(col("vec_id").isin(sampleIds: _*))
        .select("vec_id", "nbr")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      val per = exact.toSeq.map { case (qid, ex) =>
        approx.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      val r = if (per.isEmpty) 0.0 else per.sum / per.size
      println(f"[recall] probes=$p%-3d recall@$k $r%.4f  full-graph wall ${dt}%7.2f s")
      (p, r, dt)
    }
    args.drop(2).headOption.foreach { out =>
      val nLists = graft.operators.IndexQueries.listCount(
        spark, graft.operators.IndexQueries.indexFor(spark, sfDir))
      val auto = graft.operators.SimilarityQueries.probesFor(nLists.toLong)
      def f4(v: Double) =
        String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
      val body = rows.map { case (p, r, dt) =>
        s"""    {"probes": $p, "recall_at_$k": ${f4(r)}, "full_graph_wall_s": ${f4(dt)}}"""
      }.mkString(",\n")
      val json =
        s"""{
  "corpus": "$sfDir",
  "n_lists": $nLists,
  "probes_for_auto": $auto,
  "sample_nodes": ${exact.size},
  "points": [
$body
  ]
}
"""
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(out).toAbsolutePath.getParent)
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[recall] wrote $out")
    }
    spark.stop()
  }
}

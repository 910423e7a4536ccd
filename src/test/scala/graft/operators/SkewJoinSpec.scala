package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew evidence for the IVF-bucketed candidate equi-join — the
  * knnGraphIvf scaladoc's "hot lists are AQE skew-join territory" claim,
  * demonstrated instead of asserted: a corpus with one dominant cluster
  * concentrates most of the corpus in ONE list, the list_id join's
  * shuffle partition for that list dwarfs the median, and Spark's AQE
  * skew-join rule (OptimizeSkewedJoin) must SPLIT it — same results,
  * parallel execution — rather than serializing the whole hot list
  * through one task. Row identity between the skew-split plan and the
  * plain plan is pinned bit-exactly.
  *
  * Thresholds are lowered to make the fixture's ~hundreds-of-KB hot
  * partition count as skewed (production defaults are 256 MB / factor 5
  * — the same rule at the sizes a real hot list has); broadcast is
  * disabled because a fixture-sized lists table would otherwise
  * broadcast and no shuffle partition would exist to split.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  /** One dominant cluster: `hot` identical unit vectors on axis 0 (ties
    * assign them ALL to one list — centroid duplicates resolve to the
    * first), plus a spread tail on distinct axes. */
  private lazy val skewDir: String = {
    val dir = graft.util.TempDirs.create("graft_skew_fix").toString
    val dim = 16
    val hot = 1600
    val tail = 400
    val rows = (0 until hot).map { i =>
      (i.toLong, Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.0f), 0)
    } ++ (0 until tail).map { i =>
      val axis = 1 + (i % (dim - 1))
      val v = Array.tabulate(dim)(d => if (d == axis) 1.0f else 0.0f)
      v(0) = (i % 5).toFloat / 100f // slight spread so tail lists differ
      ((hot + i).toLong, v, 1)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(8).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("hot-list candidate join: AQE splits the skewed partition; rows identical to the plain plan") {
    // the fixture must actually be skewed: one list holds ≥ half the corpus
    val idx = IndexQueries.indexFor(spark, skewDir)
    val skew = graft.index.IvfIndex.listSkew(spark, idx).head()
    assert(skew.getAs[Long]("max_list") >= 1000L,
      s"fixture not skewed: max list ${skew.getAs[Long]("max_list")}")

    def run(): (Seq[(Long, Long, Long, Double)], String) = {
      val df = SimilarityQueries.knnGraphIvf(spark, skewDir, probes = 2)
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      (rows, df.queryExecution.executedPlan.toString)
    }

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    val (skewRows, skewPlan) =
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        run()
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    assert(skewPlan.contains("skew=true"),
      s"AQE skew-join split must fire on the hot list_id partition:\n$skewPlan")

    // plain plan (default thresholds: no skew handling at fixture sizes)
    val (plainRows, _) = run()
    assert(skewRows.nonEmpty && skewRows === plainRows,
      "skew-split execution must return bit-identical rows")
  }
}

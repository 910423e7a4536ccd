package graft

import org.apache.spark.sql.SparkSession

/** Console demo mirroring the reference's demo transcript
  * (/root/reference/demo/similarity_search_demo.py; expected output at
  * demo/README.md:41-85): count → listing → ILIKE search → CTE-seeded
  * similarity search → self-similarity sanity → average pairwise
  * similarity. Run: `sbt "runMain graft.Demo [sfDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.tuneSession(spark)
    graft.functions.registerAll(spark)

    import graft.operators.ReferenceQueries._

    println(s"=== graft demo on $sfDir ===")
    println(s"extensions installed: ${CatalogOps.installedExtensions(spark).mkString(", ")}")
    val n = countDocs(spark, sfDir).head().getLong(0)
    println(s"document count: $n")

    println("\nfirst documents:")
    listDocs(spark, sfDir).show(3, truncate = 40)

    println(s"documents matching ILIKE '%merge slow%':")
    ilikeFilter(spark, sfDir).show(3)

    println(s"similarity search seeded by ILIKE '${SeedPattern}' (top 5):")
    knnCteSeed(spark, sfDir).show(truncate = false)

    val selfOk = selfSim(spark, sfDir)
      .filter(org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.col("self_sim") - 1.0) > 1e-9)
      .count() == 0
    println(s"self-similarity = 1.0 for every document: $selfOk")

    val avg = avgPairwiseSim(spark, sfDir).head().getDouble(0)
    println(f"average pairwise similarity: $avg%.6f")

    println(s"\ntable size: ${CatalogOps.prettySize(
      CatalogOps.relationSize(spark, s"$sfDir/documents.parquet"))}")
    spark.stop()
  }
}

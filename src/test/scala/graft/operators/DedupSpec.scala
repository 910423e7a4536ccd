package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("dedup_exact audit shape and invariants") {
    val r = Dedup.dedupExact(spark, Sf0001).head()
    val (rows, distinct, dupGroups) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(rows === 500L)
    assert(distinct <= rows && distinct > 0)
    assert(dupGroups >= 0 && dupGroups <= distinct)
  }

  test("dedup_ngram finds planted near-dups, jaccard in (0,1]") {
    val rows = Dedup.dedupNgram(spark, Sf0001).collect()
    assert(rows.nonEmpty, "fixtures plant near-dup documents")
    assert(rows.forall(r => r.getDouble(2) >= Dedup.NgramThreshold && r.getDouble(2) <= 1.0))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dedup_embedding pairs are symmetric-free and above threshold") {
    val rows = Dedup.dedupEmbedding(spark, Sf0001).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= Dedup.EmbeddingThreshold))
  }

  test("dedup_minhash: precision 1.0 vs exact jaccard, high recall on strong dups") {
    val exact = Dedup.dedupNgram(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.dedupMinhash(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision: every LSH-verified pair is a true >=0.5 pair
    lsh.foreach { case (pair, j) =>
      assert(exact.contains(pair) && j >= Dedup.MinhashVerifyThreshold, s"false positive $pair")
    }
    // recall: strong duplicates (j >= 0.8) must all be found
    val strong = exact.filter(_._2 >= 0.8).keySet
    val missed = strong -- lsh.keySet
    assert(missed.isEmpty, s"LSH missed strong dups: $missed")
  }

  test("dropNearDuplicates removes pair 'b' sides and exact dups, keeps the rest") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val pairs = Dedup.dedupNgram(spark, Sf0001)
    val cleaned = Dedup.dropNearDuplicates(docs, pairs)
    val dropped = pairs.select("b").distinct().collect().map(_.getLong(0)).toSet
    val keptIds = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(dropped).isEmpty, "no near-dup 'b' may survive")
    assert(cleaned.count() === docs.count() - dropped.size,
      "fixture texts are exact-unique, so only near-dups are removed")
    // every surviving pair representative ('a' side) is retained
    val reps = pairs.select("a").distinct().collect().map(_.getLong(0)).toSet -- dropped
    assert(reps.subsetOf(keptIds))
  }

  test("dedup_simhash: deterministic, bounded hamming, finds strong dups") {
    val r1 = Dedup.dedupSimhash(spark, Sf0001).collect()
    val r2 = Dedup.dedupSimhash(spark, Sf0001).collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq, "must be deterministic")
    assert(r1.forall(_.getLong(2) <= Dedup.SimhashMaxHamming))
  }
}

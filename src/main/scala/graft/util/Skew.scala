package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key equi-joins (builder brief: "skewed keys →
  * salting or AQE skew-join"). AQE handles sort-merge skew splits
  * automatically; explicit salting is the tool when one side has a few
  * pathological keys and the other side is small enough to replicate.
  *
  * `saltedEquiJoin(big, small, key, n)`: the big side gets a uniform salt
  * in [0, n); the small side is replicated n times with every salt value;
  * the join key becomes (key, salt), splitting each hot key's row group
  * across n reducers. Result is row-identical to the plain equi-join.
  */
object Skew {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salt: Int, joinType: String = "inner"): DataFrame =
    saltedEquiJoin(big, small, Seq(key), salt, joinType)

  /** Composite-key form — the bigram LM join's (w1, w2) shape. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     salt: Int, joinType: String): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // right/full outer would emit `salt` null-padded copies of every
    // unmatched small-side row (it is replicated before the join)
    val supported = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(supported.contains(joinType.toLowerCase.replace("_", "")) ||
        supported.contains(joinType.toLowerCase),
      s"saltedEquiJoin supports inner/left/left_semi join types, got '$joinType' " +
        "(unmatched replicated small-side rows would duplicate under right/full outer)")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig
      .join(replicatedSmall, keys :+ "_salt", joinType)
      .drop("_salt")
  }

  /** Top-n heavy hitters of a key column with their frequencies — the
    * diagnostic that decides whether salting is needed. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)

  /** Share of the hottest composite key in `df` — the probe that decides
    * whether [[saltedEquiJoin]] pays for itself: a single key always lands
    * on ONE reducer, so a key holding share s of the stream loads that
    * reducer s·parts× its fair share. Caller samples `df` first (the probe
    * must stay a fraction of the work it is insuring). Returns 0.0 on an
    * empty relation (no evidence → no salt). */
  def hotKeyShare(df: DataFrame, keys: Seq[String]): Double = {
    val top = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("mx"), sum(col("cnt")).as("tot"))
      .collect()(0)
    if (top.isNullAt(1) || top.getLong(1) == 0L) 0.0
    else top.getLong(0).toDouble / top.getLong(1).toDouble
  }
}

package graft.util

/** Exchange-width sizing from row counts — the round-14/15 closure of the
  * one generic scale failure this engine kept re-finding: "an exchange
  * whose width doesn't scale with its input". A shuffle planned at the
  * session width (32 on the bench box) is right for fixture-scale
  * relations and catastrophically wrong for a 10⁹-row pair stream — each
  * post-shuffle partition then holds tens of millions of rows, the
  * consuming hash aggregate / hash join falls back to sort-and-spill, and
  * the query goes super-linear exactly at the scale point the operator
  * exists for (measured: 80-177 GB of spill per query at 1000× data,
  * bench_sf100.json round 14).
  *
  * The fix is never "raise the session width" (the r13 session-wide raise
  * taxed every SMALL shuffle 12-40%, measured and reverted in r14): each
  * big-relation exchange gets an EXPLICIT width computed from that
  * relation's own row count, which the operators know exactly (pair
  * counts from a posting-size scan) or bound tightly (candidates =
  * probes · occupancy · n). Partition targets keep a post-shuffle
  * partition's rows in the tens-of-MB range — inside task execution
  * memory with the consumer's hash structures on top. */
object Exchanges {

  /** Ceiling on any computed width — matches every other wide start in
    * the engine (scheduler pressure past ~8k tasks/stage on the target
    * cluster shape outweighs smaller partitions). */
  val MaxParts = 8192L

  /** Width for an exchange whose input is `rows` rows of roughly
    * `rowsPerPartition`-sized batches: never below the session floor
    * (small inputs keep the session plan bit-for-bit), capped at
    * [[MaxParts]]. */
  def widthFor(rows: Long, floor: Int, rowsPerPartition: Long): Int = {
    require(rowsPerPartition > 0, s"rowsPerPartition must be > 0, got $rowsPerPartition")
    math.min(MaxParts,
      math.max(floor.toLong,
        (rows + rowsPerPartition - 1) / rowsPerPartition)).toInt
  }
}

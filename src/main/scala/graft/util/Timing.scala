package graft.util

import org.apache.spark.internal.Logging

/** `timeit` decorator analog (/root/reference/src/pgvector_db/utils.py:17-34):
  * logs wall time around any operation. Per-query engine metrics come from
  * the Spark UI/listeners; this is the library-level convenience. */
object Timing extends Logging {
  def timeIt[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally {
      val secs = (System.nanoTime() - t0) / 1e9
      logInfo(f"$name took $secs%.3f sec (${secs / 60}%.3f min)")
    }
  }
}

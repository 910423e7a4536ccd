package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Shared filesystem maintenance primitives — ONE implementation of the
  * rename-based two-phase swap and the parquet file count, used by every
  * compactor (DocumentStore / IvfIndex / Bm25Index). A rollback-path fix
  * belongs here, not in three copies. */
object FsOps {

  /** Replace the dataset at `live`: `rewrite(live, staging)` produces the
    * replacement, then stash → publish → delete, rolling the stash back if
    * the publish rename fails. Staging/stash siblings carry a random tag
    * so concurrent compactions of DIFFERENT datasets never collide.
    *
    * Honest guarantee: each rename is atomic but the PAIR is not — a
    * reader listing `live` in the instant between stash and publish can
    * still miss it, and one that planned its file list against the old
    * generation fails when the stash is deleted. The window is two
    * metadata ops (vs the full rewrite duration of the overwrite-in-place
    * this replaced); a manifest/pointer-file design would close it
    * entirely and is the upgrade path if maintenance ever runs against
    * latency-critical concurrent readers. */
  def swapDir(conf: Configuration, live: Path)
             (rewrite: (String, String) => Unit): Unit = {
    val fs = live.getFileSystem(conf)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(s"${live}_compact_$tag")
    rewrite(live.toString, staging.toString)
    if (!fs.exists(live)) { // first publish: nothing to stash
      if (!fs.rename(staging, live))
        throw new java.io.IOException(s"swapDir: could not publish $staging")
      return
    }
    val old = new Path(s"${live}_old_$tag")
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"swapDir: could not stash $live")
    if (!fs.rename(staging, live)) {
      fs.rename(old, live) // roll back
      throw new java.io.IOException(s"swapDir: could not publish $staging")
    }
    fs.delete(old, true)
  }

  /** True iff no path component of `p` below `base` is hidden by
    * Spark/Hadoop readers ('_' or '.' prefix — `_temporary`, `_SUCCESS`,
    * `.staging`): a file invisible to the reader must be invisible to
    * these checks too, or a crashed write's `_temporary` debris would
    * make an EMPTY dataset look committed. */
  private def visibleUnder(p: Path, base: Path): Boolean = {
    val baseUri = base.toUri.getPath
    var cur = p.getParent
    while (cur != null && cur.toUri.getPath != baseUri) {
      val n = cur.getName
      if (n.startsWith("_") || n.startsWith(".")) return false
      cur = cur.getParent
    }
    true
  }

  /** Recursive count of COMMITTED .parquet data files under `dir`
    * (reader-hidden directories excluded — see [[visibleUnder]]). */
  def countParquetFiles(conf: Configuration, dir: Path): Int = {
    val it = dir.getFileSystem(conf).listFiles(dir, true)
    var n = 0
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet") && visibleUnder(p, dir)) n += 1
    }
    n
  }

  /** True iff at least one COMMITTED .parquet data file exists under
    * `dir` — returns at the FIRST hit, so hot-path existence checks
    * (e.g. a per-query sidecar probe) don't pay a full recursive listing
    * of a many-thousand-file dataset the way [[countParquetFiles]]
    * (a maintenance statistic) does. Files under reader-hidden
    * directories (`_temporary` debris from a crashed write) don't
    * count — the reader won't see them either. */
  def hasParquetFile(conf: Configuration, dir: Path): Boolean = {
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return false
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet") && visibleUnder(p, dir)) return true
    }
    false
  }
}

/** Deferred reclamation of superseded sidecar directories, PER cache key:
  * deleting a stale sidecar inline would fail any query still scanning it,
  * and a single shared tombstone queue lets corpus B's rebuild delete the
  * sidecar corpus A's in-flight queries hold. Tombstones are keyed by the
  * cache key that superseded them and only reclaimed on a LATER rebuild of
  * the SAME key once a grace window has passed — so back-to-back rebuilds
  * (streaming maintenance) cannot delete a generation that racing queries
  * may still read. Bounded: at most #rebuilds-within-grace stale copies
  * per key, and rebuilds are corpus-mtime events, not query events. */
object StaleSidecars {

  /** Reclaim tombstones older than this on the key's next supersede. */
  val GraceMs: Long = 15 * 60 * 1000L

  private val pending =
    new java.util.concurrent.ConcurrentHashMap[String, List[(String, Long)]]()

  /** Tombstone `path` as superseded under `key`; reclaim any of `key`'s
    * earlier tombstones that have aged past [[GraceMs]]. */
  def supersede(conf: Configuration, key: String, path: String): Unit =
    supersede(conf, key, path, System.currentTimeMillis())

  private[graft] def supersede(conf: Configuration, key: String,
                               path: String, now: Long): Unit =
    pending.compute(key, (_, old) => {
      val (expired, kept) = Option(old).getOrElse(Nil)
        .partition(now - _._2 > GraceMs)
      expired.foreach { case (p, _) =>
        val hp = new Path(p)
        scala.util.Try(hp.getFileSystem(conf).delete(hp, true))
      }
      (path, now) :: kept
    })

  /** Test hook: pending tombstone paths for a key. */
  private[graft] def pendingFor(key: String): Seq[String] =
    Option(pending.get(key)).getOrElse(Nil).map(_._1)
}

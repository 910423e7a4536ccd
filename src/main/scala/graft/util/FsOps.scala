package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Shared filesystem maintenance primitives — ONE implementation of the
  * rename-based two-phase swap and the parquet file count, used by every
  * compactor (DocumentStore / IvfIndex / Bm25Index). A rollback-path fix
  * belongs here, not in three copies. */
object FsOps {

  /** Atomically replace the dataset at `live`: `rewrite(live, staging)`
    * produces the replacement, then stash → publish → delete, rolling the
    * stash back if the publish rename fails. Staging/stash siblings carry
    * a random tag so concurrent compactions of DIFFERENT datasets never
    * collide. */
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

  /** Recursive count of .parquet data files under `dir`. */
  def countParquetFiles(conf: Configuration, dir: Path): Int = {
    val it = dir.getFileSystem(conf).listFiles(dir, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}

package graft.util

import java.nio.file.{Files, Path}

/** JVM-lifetime temp directories with shutdown cleanup.
  *
  * The engine's per-session index sidecars (IVF/NSW/PQ lists, BM25
  * postings, scale corpora) live in `Files.createTempDirectory` paths that
  * are cached per JVM and were never deleted — across bench/test JVMs
  * that accumulates GBs of dead parquet in the system temp dir (measured:
  * ~30 GB after a round of runs, enough to fail a scale benchmark with
  * "No space left on device" from shuffle-file pressure alone). A single
  * shutdown hook deletes every registered root recursively; registration
  * is cheap and thread-safe. Index builders register their roots at
  * creation — the cached path stays valid for the JVM's whole life, which
  * is exactly the cache's scope (IndexQueries keys per sfDir per JVM). */
object TempDirs {

  private val roots = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(
    () => roots.forEach(deleteRecursively(_)), "graft-tempdir-cleanup"))

  /** Create a temp directory that is deleted (recursively) at JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    hook // install the shutdown hook once, on first use
    roots.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively(_))
        finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Exception => () } // best-effort: shutdown path
  }
}

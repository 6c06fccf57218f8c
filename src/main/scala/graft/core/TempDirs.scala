package graft.core

/** Temp directories for queries that exercise durable-index
  * lifecycles (q103–q106, the ScaleBench ingest entries). Each
  * invocation needs a FRESH directory — the queries are deterministic
  * only when they start from an empty index, so reusing a populated
  * one would change their results — which rules out a
  * one-dir-per-query cache. Instead every created dir is registered
  * here and swept recursively by a single JVM shutdown hook, so
  * repeated bench runs (15 queries × N runs) stop accumulating
  * orphaned parquet index directories under /tmp.
  */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => sweep(), "graft-tempdirs-sweep"))

  /** Create and register a fresh temp directory; returns its path. */
  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Recursively delete every registered dir (and its compaction
    * siblings, which live NEXT TO the registered path). Runs at JVM
    * exit; callable directly for tests and long-lived services.
    * Deletion failures are swallowed — a sweep must never mask the
    * real exit path.
    */
  private[graft] def sweep(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      Seq(p, p.resolveSibling(p.getFileName.toString + ".compact-old"),
        p.resolveSibling(p.getFileName.toString + ".compact-tmp")).foreach { root =>
        try {
          if (java.nio.file.Files.exists(root)) {
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(f => try java.nio.file.Files.deleteIfExists(f) catch { case _: Exception => () })
          }
        } catch { case _: Exception => () }
      }
      p = dirs.poll()
    }
  }
}

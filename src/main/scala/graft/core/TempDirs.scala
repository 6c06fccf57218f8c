package graft.core

/** The sibling artifacts a durable index keeps NEXT TO its directory
  * rather than inside it — single source for the suffixes so the
  * index lifecycle (graft.dedup.SeenIndex) and the temp-dir sweep
  * below can never drift apart on a rename:
  *
  *   - `.compact-old` / `.compact-tmp`: the crash-safe compaction's
  *     backup and staging directories.
  *   - `.epochs`: the exactly-once ingest ledger. A SIBLING (not an
  *     underscore dir inside the index) deliberately: compaction
  *     swaps the whole index directory, and a ledger living inside it
  *     would ride the swap into the backup and be deleted with it;
  *     next to the index it survives any compaction, and creating it
  *     never resurrects a missing index path (which would defeat the
  *     mid-compaction fail-loud guard).
  */
object IndexLayout {
  val CompactOld = ".compact-old"
  val CompactTmp = ".compact-tmp"
  val Ledger = ".epochs"
  /** The crash-state pair a mid-compaction check looks for. */
  val CompactSuffixes: Seq[String] = Seq(CompactOld, CompactTmp)
  val SiblingSuffixes: Seq[String] = CompactSuffixes :+ Ledger
}

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

  /** Recursively delete every registered dir (and its index sibling
    * artifacts, which live NEXT TO the registered path — see
    * [[IndexLayout]]). Runs at JVM exit; callable directly for tests
    * and long-lived services. Deletion failures are swallowed — a
    * sweep must never mask the real exit path.
    */
  private[graft] def sweep(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      val siblings = IndexLayout.SiblingSuffixes
        .map(s => p.resolveSibling(p.getFileName.toString + s))
      (p +: siblings).foreach { root =>
        try {
          if (java.nio.file.Files.exists(root)) {
            val walk = java.nio.file.Files.walk(root)
            try walk
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(f => try java.nio.file.Files.deleteIfExists(f) catch { case _: Exception => () })
            finally walk.close() // Files.walk holds open directory handles
          }
        } catch { case _: Exception => () }
      }
      p = dirs.poll()
    }
  }
}

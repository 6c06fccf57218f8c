package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the engine: all the configuration the
  * library depends on, in one place.
  *
  *  - shuffle partitions sized to the core count (never the 200
  *    default on a single node);
  *  - AQE on (runtime coalescing + skew-join splitting);
  *  - UTC session timezone (week/date semantics are tz-sensitive);
  *  - nanos-as-long parquet reads (the events fixture is TIMESTAMP
  *    NANOS, which Spark otherwise rejects);
  *  - 128m file split target so scan tasks stay balanced;
  *  - [[GraftExtensions]] injected (custom expressions in SQL).
  */
object GraftSession {

  def builder(master: String = "local[*]", cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE partition coalescing for CACHED plan fragments too (off by
      // default): the engine's hot paths persist small intermediates,
      // and without this every exchange downstream of a cache is
      // pinned at spark.sql.shuffle.partitions tasks regardless of
      // size — per-shuffle-file overhead dominates small stages, and
      // AQE keeps large data at large partition counts (guide §2).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.core

import org.apache.spark.sql.Dataset

/** CPU-parallelism repair for tiny-bytes/heavy-CPU plan fragments.
  *
  * AQE sizes partitions by BYTES, and a single small parquet split
  * reads as ONE task — so a stage whose cost is per-row CPU (media
  * encode/decode, 190-plane signature passes, quadratic band joins)
  * can end up serialized on one core while 31 idle (measured r19:
  * q90's decode stage was 1 task x 2-4 s; q30's band join one 2.5 s
  * task). `spreadIfNarrow` repartitions up to the cluster's core
  * count ONLY when the input is narrower than that — at real scale
  * inputs already carry >= cores partitions and this is the identity,
  * so no extra exchange is ever paid where parallelism is already
  * adequate (guide §2.5, input parallelism).
  */
object Parallelism {

  def spreadIfNarrow[T](ds: Dataset[T]): Dataset[T] = {
    // Shuffle-free plans only: a frame that already contains an
    // exchange is adaptive, and (a) AQE owns its partitioning there,
    // (b) `.rdd` on an adaptive plan EXECUTES the subtree to finalize
    // stages — a hidden job over a possibly expensive upstream
    // (measured r19: probing a decode+distinct frame ran the whole
    // decode once for the probe and again for the real query).
    val adaptive = ds.queryExecution.executedPlan
      .isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
    if (adaptive) return ds
    val target = ds.sparkSession.sparkContext.defaultParallelism
    // .rdd on a NON-adaptive plan only constructs the RDD (no job);
    // the partition count is the one the stage would actually run with
    if (ds.rdd.getNumPartitions < target) ds.repartition(target) else ds
  }
}

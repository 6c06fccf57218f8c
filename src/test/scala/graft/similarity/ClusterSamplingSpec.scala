package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class ClusterSamplingSpec extends SparkSpec {

  // 4 axis-aligned centroids in 4-dim; every test vector sits clearly
  // inside one cell (dominant coordinate), so assignments are exact.
  private val model = Ivf.Model(Array(
    Array(1f, 0f, 0f, 0f),
    Array(0f, 1f, 0f, 0f),
    Array(0f, 0f, 1f, 0f),
    Array(0f, 0f, 0f, 1f)))

  /** `perCell(c)` ids in cell c: dominant coordinate c, small
    * id-dependent noise elsewhere so vectors are distinct.
    */
  private def corpus(perCell: Seq[Int]): DataFrame = {
    import sqlImplicits._
    val rows = for {
      (n, c) <- perCell.zipWithIndex
      j <- 0 until n
    } yield {
      val id = (c * 1000 + j).toLong
      val v = Array.tabulate(4)(d => if (d == c) 10.0 else 0.1 * ((id + d) % 7))
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cap binds per cell: n_kept = min(n_total, cap), small cells kept whole") {
    val df = corpus(Seq(25, 3, 0, 12))
    val census = ClusterSampling.cellCensus(df, "embedding", "vec_id", model, perCellCap = 10, seed = 7)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(census == Map(0 -> ((25L, 10L)), 1 -> ((3L, 3L)), 3 -> ((12L, 10L))),
      s"census=$census")
    val kept = ClusterSampling.clusterBalancedSample(df, "embedding", "vec_id", model, 10, 7)
    assert(kept.count() == 23)
    assert(kept.columns.contains("cell"))
  }

  test("sample is deterministic across reruns and nested across caps") {
    val df = corpus(Seq(30, 20, 15, 25))
    def ids(cap: Long) = ClusterSampling
      .clusterBalancedSample(df, "embedding", "vec_id", model, cap, seed = 42)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val a = ids(8)
    val b = ids(8)
    assert(a == b, "same (cap, seed) must select the same rows")
    val wider = ids(16)
    assert(a.subsetOf(wider), "cap 8 sample must nest inside cap 16")
    // a different seed reorders within cells: same per-cell counts,
    // (almost surely) different membership
    val other = ClusterSampling
      .clusterBalancedSample(df, "embedding", "vec_id", model, 8, seed = 99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(other.size == a.size)
    assert(other != a, "distinct seeds selecting identical rows means the score ignores the seed")
  }

  test("degenerate vectors are dropped, never assigned") {
    import sqlImplicits._
    val good = corpus(Seq(4, 4, 4, 4))
    val bad = Seq(
      (9001L, Seq(0.0, 0.0, 0.0, 0.0)),          // zero norm
      (9002L, Seq(Double.NaN, 1.0, 0.0, 0.0)),   // NaN element
      (9003L, null.asInstanceOf[Seq[Double]]))   // whole-null vector
      .toDF("vec_id", "embedding")
    val kept = ClusterSampling
      .clusterBalancedSample(good.union(bad), "embedding", "vec_id", model, 100, 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == good.collect().map(_.getLong(0)).toSet)
    val census = ClusterSampling.cellCensus(
      good.union(bad), "embedding", "vec_id", model, 100, 0)
      .agg(org.apache.spark.sql.functions.sum("n_total")).collect()(0).getLong(0)
    assert(census == 16, "census totals must count only finite-norm vectors")
  }

  test("q94 plan: the cap is a partial WindowGroupLimit below the exchange") {
    val df = corpus(Seq(40, 40, 40, 40))
    val plan = ClusterSampling
      .clusterBalancedSample(df, "embedding", "vec_id", model, 5, 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"cap must push a partial per-partition limit below the shuffle:\n$plan")
  }
}

package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  // Three well-separated directions + jitter: clustered data is IVF's
  // home turf, so probing 1 cell of 3 must achieve perfect recall.
  private def clustered = {
    import sqlImplicits._
    val dirs = Seq(
      Array(1.0f, 0f, 0f, 0f), Array(0f, 1.0f, 0f, 0f), Array(0f, 0f, 1.0f, 0f))
    val rows = for {
      (d, c) <- dirs.zipWithIndex
      i <- 0 until 40
    } yield {
      val jitter = d.indices.map(j => d(j) + (((i * 7 + j * 13 + c * 29) % 10) - 5) * 0.01f).toArray
      ((c * 40 + i).toLong, jitter)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("deterministic training: same data -> same centroids") {
    val m1 = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val m2 = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("train excludes degenerate vectors with the same norm guard as index") {
    import sqlImplicits._
    // A null ELEMENT would NPE at unboxing, a NaN element would
    // silently poison every centroid, a zero-norm vector carries no
    // direction — all four degenerate shapes must never reach the
    // driver-side Lloyd loop, and the surviving model must equal the
    // clean-corpus model (the sample hash-order keys on the vector
    // bytes, so dropping garbage rows cannot reorder the clean ones).
    val poisoned = clustered.select(col("vec_id"), col("embedding")).union(Seq(
      (9001L, null: Array[java.lang.Float]),
      (9002L, Array[java.lang.Float](1.0f, null, 0f, 0f)),
      (9003L, Array[java.lang.Float](Float.NaN, 1f, 0f, 0f)),
      (9004L, Array[java.lang.Float](0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding"))
    val clean = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val got = Ivf.train(poisoned, "embedding", k = 3, iters = 5)
    assert(got.centroids.map(_.toSeq).toSeq == clean.centroids.map(_.toSeq).toSeq)
    assert(got.centroids.forall(_.forall(x => !x.isNaN)))
  }

  test("trainDistributed matches the driver fit when the corpus fits in the sample") {
    // Same init, same Lloyd updates — the only divergence is float
    // summation order (driver folds in sample order, executors merge
    // partial sums), so centroids agree to ~1e-6 and assignments agree
    // exactly on this well-separated fixture.
    val driver = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val dist = Ivf.trainDistributed(clustered, "embedding", k = 3, iters = 5)
    val maxDiff = driver.centroids.zip(dist.centroids).map { case (a, b) =>
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    }.max
    assert(maxDiff < 1e-6f, s"centroid drift $maxDiff exceeds float-rounding tolerance")
    val dCells = Ivf.index(clustered, "embedding", "vec_id", driver)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val xCells = Ivf.index(clustered, "embedding", "vec_id", dist)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dCells == xCells)
  }

  test("trainDistributed excludes degenerate vectors and stays finite") {
    import sqlImplicits._
    val poisoned = clustered.select(col("vec_id"), col("embedding")).union(Seq(
      (9001L, null: Array[java.lang.Float]),
      (9002L, Array[java.lang.Float](1.0f, null, 0f, 0f)),
      (9003L, Array[java.lang.Float](Float.NaN, 1f, 0f, 0f)),
      (9004L, Array[java.lang.Float](0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding"))
    val got = Ivf.trainDistributed(poisoned, "embedding", k = 3, iters = 3)
    assert(got.centroids.forall(_.forall(x => !x.isNaN)))
    val clean = Ivf.trainDistributed(clustered, "embedding", k = 3, iters = 3)
    assert(got.centroids.map(_.toSeq).toSeq == clean.centroids.map(_.toSeq).toSeq)
  }

  test("index assigns each natural cluster to a single cell") {
    val model = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val idx = Ivf.index(clustered, "embedding", "vec_id", model)
    // every group of 40 planted vectors lands in exactly one cell
    val spread = idx.withColumn("trueCluster", (col("vec_id") / 40).cast("int"))
      .groupBy("trueCluster").agg(countDistinct("cell").as("cells"))
      .agg(max("cells")).head().getLong(0)
    assert(spread == 1L)
  }

  test("nprobe=1 recall is perfect on clustered data and scans one cell") {
    val model = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val idx = Ivf.index(clustered, "embedding", "vec_id", model)
    val query = Array(0.98f, 0.05f, 0.02f, 0.0f) // near cluster 0
    val got = Ivf.topK(idx, "embedding", "vec_id", query, k = 10, model, nprobe = 1)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(got.length == 10)
    assert(got.forall(_ < 40), got.mkString(",")) // all from cluster 0
    // matches brute force exactly
    val brute = Similarity.cosineTopK(clustered, "embedding", query, 10, "vec_id")
      .collect().map(_.getAs[Long]("vec_id"))
    assert(got.toSeq == brute.toSeq)
  }

  test("nearestCells stays total on NaN vectors (zero-norm queries after normalization)") {
    import sqlImplicits._
    // A zero-norm query vector turns into all-NaN after x/norm(x)
    // normalization; NaN never wins a `>` comparison, so without the
    // fallback the probe selection would index -1. The fixed selection
    // must return nprobe DISTINCT cells deterministically, not throw.
    val model = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val nan = Seq((0L, Array(Float.NaN, Float.NaN, Float.NaN, Float.NaN)))
      .toDF("vec_id", "embedding")
    val cells = nan
      .select(NearestCells.nearestCells(col("embedding"), model.centroids, 2).as("cells"))
      .head().getSeq[Int](0)
    assert(cells.length == 2 && cells.toSet.size == 2, cells.toString)
    assert(cells == Seq(0, 1)) // first-untaken fallback => index order
  }

  test("nearestCells: a NaN centroid never out-ranks finite cells for a finite query") {
    import sqlImplicits._
    // One poisoned centroid (NaN element) with a finite query makes a
    // MIXED dots array. An unsanitized NaN incumbent never loses '>':
    // cell 0 would win the first slot and block the true nearest cell.
    // Post-sanitize (NaN -> -Inf) the finite cells rank first.
    val centroids = Array(
      Array(Float.NaN, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f),
      Array(1f, 0f, 0f, 0f))
    val q = Seq((0L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val cells = q
      .select(NearestCells.nearestCells(col("embedding"), centroids, 2).as("cells"))
      .head().getSeq[Int](0)
    assert(cells == Seq(2, 1), cells.toString) // NaN cell ranks last, not first
  }

  test("knnJoin with full probing equals per-query brute force") {
    val model = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val idx = Ivf.index(clustered, "embedding", "vec_id", model)
    val queries = clustered.limit(7).toDF("qid", "qvec")
    val got = Ivf.knnJoin(idx, "embedding", "vec_id", queries, "qvec", "qid", k = 5, model, nprobe = 3)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) => q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq }
    queries.collect().foreach { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      val brute = Similarity.cosineTopK(clustered, "embedding", qv, 5, "vec_id")
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      // set-compare: the two paths normalize at different points, so
      // float rounding may legally reorder near-ties within the set
      assert(got(qid).toSet == brute.toSet, s"qid=$qid got=${got(qid)} brute=$brute")
      assert(got(qid).head == qid, "a query's nearest neighbor is itself")
    }
  }

  test("knnJoin with nprobe=1 stays within the query's own cluster") {
    val model = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val idx = Ivf.index(clustered, "embedding", "vec_id", model)
    val queries = clustered.toDF("qid", "qvec")
    val joined = Ivf.knnJoin(idx, "embedding", "vec_id", queries, "qvec", "qid", k = 10, model, nprobe = 1)
    // every neighbor of a query from cluster c is itself from cluster c
    val crossCluster = joined
      .withColumn("qc", (col("qid") / 40).cast("int"))
      .withColumn("nc", (col("vec_id") / 40).cast("int"))
      .filter(col("qc") =!= col("nc"))
      .count()
    assert(crossCluster == 0L)
    assert(joined.groupBy("qid").count().agg(min("count")).head().getLong(0) == 10L)
  }

  test("bucketed index join probes without shuffling the index side") {
    val model = Ivf.train(clustered, "embedding", k = 3, iters = 5)
    val idx = Ivf.index(clustered, "embedding", "vec_id", model)
    Ivf.writeIndex(idx, "ivf_idx_test", buckets = 3)
    try {
      val bucketed = Ivf.readIndex(spark, "ivf_idx_test")
      val queries = clustered.limit(5).toDF("qid", "qvec")
      val joined = Ivf.knnJoin(bucketed, "embedding", "vec_id", queries, "qvec", "qid", k = 3, model, nprobe = 2)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      // results match the unbucketed index
      val plain = Ivf.knnJoin(idx, "embedding", "vec_id", queries, "qvec", "qid", k = 3, model, nprobe = 2)
      val a = joined.orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
      val b = plain.orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(a.toSeq == b.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_idx_test")
    }
  }

  test("appendToIndex grows a bucketed index without retraining; assignmentTightness falls on drift") {
    import sqlImplicits._
    val df = graft.sources.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val base = df.filter(col("vec_id") % 2 === 0)
    val batch = df.filter(col("vec_id") % 2 === 1)
    val model = Ivf.train(base, "embedding", k = 4, iters = 5)
    try {
      Ivf.writeIndex(Ivf.index(base, "embedding", "vec_id", model), "ivf_append_test", buckets = 2)
      Ivf.appendToIndex(batch, "embedding", "vec_id", model, "ivf_append_test", buckets = 2)
      val grown = Ivf.readIndex(spark, "ivf_append_test")
      // appended rows are indistinguishable from one-shot indexing
      val oneShot = Ivf.index(df, "embedding", "vec_id", model)
      assert(grown.count() == oneShot.count())
      val a = grown.select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val b = oneShot.select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(a == b)
      // drift statistic: the training corpus is tighter than noise
      val tight = Ivf.assignmentTightness(base, "embedding", model)
      assert(tight > 0 && tight <= 1.0 + 1e-9, s"tightness=$tight")
      val noise = (0 until 64).map { i =>
        (5000L + i, Seq.tabulate(base.select("embedding").head().getSeq[Float](0).length)(
          j => (((i * 31 + j * 17) % 13) - 6).toFloat))
      }.toDF("vec_id", "embedding")
      val loose = Ivf.assignmentTightness(noise, "embedding", model)
      assert(loose < tight, s"noise must assign more loosely: $loose vs $tight")
      // empty batch -> NaN, never a crash
      assert(Ivf.assignmentTightness(
        Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), "embedding", model).isNaN)
      // one poisoned row (Inf element -> Inf norm -> Inf/Inf = NaN
      // component) or a wrong-dim row must be EXCLUDED, not drag the
      // whole statistic to NaN / a truncated-dot skew (review r19)
      val dim = base.select("embedding").head().getSeq[Float](0).length
      val poisoned = base.select("vec_id", "embedding").unionByName(Seq(
        (9001L, Seq.fill(dim)(Float.PositiveInfinity)),
        (9002L, Seq.fill(dim + 3)(0.5f)),
        (9003L, Seq.fill(dim)(0f))).toDF("vec_id", "embedding"))
      val guarded = Ivf.assignmentTightness(poisoned, "embedding", model)
      assert(!guarded.isNaN && math.abs(guarded - tight) < 1e-12,
        s"degenerate rows must not move the statistic: $guarded vs $tight")
      // the Inf-norm guard also keeps poisoned rows OUT of the index
      // (a NaN-component row would NaN-dot above every real neighbor)
      assert(Ivf.index(poisoned, "embedding", "vec_id", model)
        .filter(col("vec_id") >= 9001L).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_append_test")
    }
  }

  test("works on the embeddings fixture (rows-only sanity)") {
    val df = graft.sources.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val model = Ivf.train(df, "embedding", k = 8, iters = 5)
    val idx = Ivf.index(df, "embedding", "vec_id", model)
    assert(idx.select(countDistinct("cell")).head().getLong(0) == 8)
    val q = df.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0).toArray
    val top = Ivf.topK(idx.filter(col("vec_id") =!= 0L), "embedding", "vec_id", q, 10, model, nprobe = 3)
    assert(top.count() == 10)
  }
}

package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  // Hand fixture in 4-d: one cell of near-parallel vectors (a dup
  // clique), one chain, one isolated vector. Unit-normalized up
  // front so decisions() sees its documented input contract.
  private def unitRows(rows: Seq[(Long, Int, Array[Double])]): DataFrame = {
    import sqlImplicits._
    rows.map { case (id, cell, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, cell, v.map(_ / n).toSeq)
    }.toDF("id", "cell", "u")
  }

  private def withRep(df: DataFrame, anchor: Map[Int, Array[Double]]): DataFrame = {
    import sqlImplicits._
    val a = anchor.toSeq.map { case (c, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (c, v.map(_ / n).toSeq)
    }.toDF("cell", "au")
    df.join(broadcast(a), Seq("cell"))
      .withColumn("rep_sim", Similarity.dot(col("u"), col("au")))
      .drop("au")
  }

  test("clique: keeps exactly the member farthest from the representative") {
    // cell 0 representative = x axis; three near-x vectors pairwise
    // above eps, ids 1,2,3 with increasing angle from x (decreasing
    // rep_sim) -> only id 3 (lowest rep_sim) survives.
    val rows = unitRows(Seq(
      (1L, 0, Array(1.0, 0.00, 0, 0)),
      (2L, 0, Array(1.0, 0.10, 0, 0)),
      (3L, 0, Array(1.0, 0.20, 0, 0)),
      (9L, 1, Array(0.0, 0.00, 1, 0)))) // lone vector, no partners
    val got = SemDedup.decisions(
      withRep(rows, Map(0 -> Array(1.0, 0, 0, 0), 1 -> Array(0.0, 0, 1, 0))),
      "u", "id", "cell", "rep_sim", eps = 0.9)
      .select("id", "n_dup_partners", "removed")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2, 1), (2L, 2, 1), (3L, 2, 0), (9L, 0, 0)))
  }

  test("chain: pair-local rule keeps the chain's least-typical member") {
    // angles 0 < a < b from x with eps catching only adjacent pairs:
    // 1~2 and 2~3 but not 1~3. rep_sims r1 > r2 > r3 -> 1 and 2 each
    // have a lower-ranked partner (removed), 3 survives.
    // planar angles 0, 20, 40 degrees: adjacent cos(20deg)=0.94 >= eps,
    // end-to-end cos(40deg)=0.77 < eps
    val rows = unitRows(Seq(
      (1L, 0, Array(1.0, 0.000, 0, 0)),
      (2L, 0, Array(1.0, 0.364, 0, 0)),
      (3L, 0, Array(1.0, 0.839, 0, 0))))
    val rep = withRep(rows, Map(0 -> Array(1.0, 0, 0, 0)))
    // sanity: eps separates adjacent from end-to-end similarity
    val eps = 0.9
    val d13 = rep.as("a").join(rep.as("b"),
      col("a.id") === 1L && col("b.id") === 3L)
      .select(Similarity.dot(col("a.u"), col("b.u"))).head().getDouble(0)
    assert(d13 < eps)
    val got = SemDedup.decisions(rep, "u", "id", "cell", "rep_sim", eps)
      .select("id", "removed").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((1L, 1), (2L, 1), (3L, 0)))
  }

  test("bit-equal duplicates: id tie-break keeps the lowest id") {
    val rows = unitRows(Seq(
      (5L, 0, Array(1.0, 0.3, 0, 0)),
      (7L, 0, Array(1.0, 0.3, 0, 0))))
    val got = SemDedup.decisions(
      withRep(rows, Map(0 -> Array(1.0, 0, 0, 0))),
      "u", "id", "cell", "rep_sim", eps = 0.99)
      .select("id", "removed").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((5L, 0), (7L, 1)))
  }

  test("cells partition the pair search: cross-cell dups are not seen") {
    val rows = unitRows(Seq(
      (1L, 0, Array(1.0, 0, 0, 0)),
      (2L, 1, Array(1.0, 0, 0, 0)))) // identical but different cells
    val got = SemDedup.decisions(
      withRep(rows, Map(0 -> Array(1.0, 0, 0, 0), 1 -> Array(1.0, 0, 0, 0))),
      "u", "id", "cell", "rep_sim", eps = 0.9)
      .agg(sum("n_dup_partners"), sum("removed")).head()
    assert((got.getLong(0), got.getLong(1)) == (0L, 0L))
  }

  // ---- production path (k-means cells) against exact all-pairs ----

  private def embeddings =
    graft.sources.Sources.embeddings(spark, "/root/testdata/sf0.001")

  /** Exact all-pairs dup-pair set at eps over the whole corpus (the
    * k=1 exhaustive reference), as unordered id pairs.
    */
  private def exactPairs(eps: Double): Set[(Long, Long)] = {
    val unit = embeddings
      .withColumn("__n", Similarity.norm(col("embedding")))
      .select(col("vec_id"), transform(col("embedding"), x => x / col("__n")).as("u"))
    val a = unit.select(col("vec_id").as("ia"), col("u").as("ua"))
    val b = unit.select(col("vec_id").as("ib"), col("u").as("ub"))
    a.join(b, col("ia") < col("ib"))
      .filter(Similarity.dot(col("ua"), col("ub")) >= eps)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("production path: removals are sound and cover most of the exact dup population") {
    val eps = 0.3
    val model = Ivf.train(embeddings, "embedding", k = 8, iters = 5)
    val dec = SemDedup.withDecisions(embeddings, "embedding", "vec_id", model, eps)
      .select("vec_id", "n_dup_partners", "removed")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val exact = exactPairs(eps)
    val inDup = exact.flatMap(p => Seq(p._1, p._2))

    // soundness: a within-cell partner is a genuine dup partner, so
    // every flagged row must appear in the exact dup population and
    // every removal implies a partner.
    val flagged = dec.filter(_._2 > 0).map(_._1).toSet
    assert(flagged.subsetOf(inDup))
    dec.foreach { case (_, nd, rm) => if (rm == 1) assert(nd > 0) }

    // every exact dup pair whose members share a cell is seen, and
    // each seen pair removes at least one member -> coverage equals
    // the co-location rate. Floor pinned from measurement (k-means
    // with k=8 co-locates well above it; near-parallel pairs land in
    // the same cell because the assignment is cosine-argmax).
    val removed = dec.filter(_._3 == 1).map(_._1).toSet
    val covered = exact.count(p => removed.contains(p._1) || removed.contains(p._2))
    val coverage = covered.toDouble / exact.size
    assert(exact.nonEmpty)
    assert(coverage >= 0.5, s"coverage $coverage over ${exact.size} exact pairs")

    // the rule never wipes a dup group: at least one member of every
    // within-cell dup pair survives, so the kept corpus still
    // represents every semantic group.
    val kept = dec.filter(_._3 == 0).map(_._1).toSet
    assert(inDup.exists(kept.contains))
  }

  test("k=1 production path equals the exhaustive pairwise semantics") {
    val eps = 0.3
    val one = Ivf.Model(Array(Array.fill(64)(0.1f)))
    val dec = SemDedup.withDecisions(embeddings, "embedding", "vec_id", one, eps)
      .select("vec_id", "n_dup_partners")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exact = exactPairs(eps)
    val counts = exact.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    dec.foreach { case (id, nd) => assert(nd == counts.getOrElse(id, 0), s"vec $id") }
  }

  test("withDecisions keeps every input row and column; degenerate vectors survive unremoved") {
    import sqlImplicits._
    val good = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq(
      (1L, "payload-1", good),
      (2L, "payload-2", good.map(_ * 3f)),          // parallel dup of 1
      (3L, "payload-3", Array.fill(8)(0f)),         // zero norm
      (4L, "payload-4", null: Array[Float])         // failed embedding
    ).toDF("vec_id", "text", "embedding")
    val model = graft.similarity.Ivf.train(df.filter(col("vec_id") <= 2L), "embedding", k = 1, iters = 2)
    val out = graft.similarity.SemDedup.withDecisions(df, "embedding", "vec_id", model, eps = 0.9)
    // original columns (incl. the untouched float embedding) ride through
    assert(out.columns.toSet ==
      Set("vec_id", "text", "embedding", "cell", "rep_sim", "n_dup_partners", "removed"))
    val rows = out.orderBy("vec_id").collect()
    assert(rows.length == 4, "every input row must come back")
    assert(rows.map(_.getAs[String]("text")).toSeq ==
      Seq("payload-1", "payload-2", "payload-3", "payload-4"))
    // the duplicate pair resolves: exactly one of 1/2 removed
    assert(rows.take(2).map(_.getAs[Int]("removed")).sum == 1)
    // degenerate rows are kept with no partners and a null cell
    Seq(2, 3).foreach { i =>
      assert(rows(i).getAs[Int]("removed") == 0)
      assert(rows(i).getAs[Int]("n_dup_partners") == 0)
      assert(rows(i).isNullAt(rows(i).fieldIndex("cell")))
    }
    // the kept corpus keeps its payload columns
    val kept = graft.similarity.SemDedup.semanticDedup(df, "embedding", "vec_id", model, eps = 0.9)
    assert(kept.columns.toSeq == df.columns.toSeq)
    assert(kept.count() == 3)
  }

  test("withDecisions rejects inputs already carrying a reserved decision column") {
    import sqlImplicits._
    // The decision columns join back onto the caller's full frame;
    // unguarded, a pre-existing `removed` column would surface as an
    // ambiguous duplicate and a confusing na.fill failure instead of
    // this named contract error.
    val good = Array.tabulate(8)(i => (i + 1).toFloat)
    val base = Seq((1L, good), (2L, good.map(_ * 2f))).toDF("vec_id", "embedding")
    val model = graft.similarity.Ivf.train(base, "embedding", k = 1, iters = 2)
    Seq("cell", "rep_sim", "n_dup_partners", "removed").foreach { c =>
      val poisoned = base.withColumn(c, lit(0))
      val e = intercept[IllegalArgumentException] {
        graft.similarity.SemDedup.withDecisions(poisoned, "embedding", "vec_id", model, eps = 0.9)
      }
      assert(e.getMessage.contains(c), e.getMessage)
    }
  }
}

package graft.similarity

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Product quantization — the compressed-vector leg of the ANN stack
  * (public literature: Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011). [[Ivf]] shrinks the
  * CANDIDATE SET (probe a few cells); PQ shrinks the VECTORS: split
  * each unit-normalized embedding into `m` subvectors, vector-
  * quantize every subspace against its own `ksub`-entry codebook,
  * and store one byte per subspace. A 64-dim float vector (256 bytes)
  * becomes an 8-byte code at m=8 — the difference between a 100 TB
  * embedding corpus whose scan is I/O-bound and a 3 TB code table
  * that fits the page cache of a modest cluster.
  *
  * Search is asymmetric distance computation (ADC): the query stays
  * exact; the driver precomputes the `m x ksub` table of
  * dot(query subvector, sub-centroid) once, and scoring a row is `m`
  * table lookups + adds — no float-vector arithmetic per row at all.
  * The scan is embarrassingly parallel (`mapPartitions` over the
  * code table, the table rides the closure: ~`m x ksub` floats), and
  * top-k resolves as `TakeOrderedAndProject` (each partition
  * forwards only its local top-k — no global sort, no full shuffle).
  *
  * Training mirrors [[Ivf.train]]'s conventions: a deterministic
  * driver-side sample (smallest `xxhash64(vec, seed)` rows via
  * `TakeOrderedAndProject`), unit normalization so ADC dots
  * approximate cosine, then independent L2 Lloyd's per subspace with
  * the same RNG-free evenly-spaced init. Degenerate vectors
  * (null / NaN / zero or INFINITE norm / wrong length) are excluded
  * everywhere by one shared guard (review r18: the original guard
  * passed Inf norms — x/Inf is NaN, which poisoned codebook entry 0
  * during training and scored garbage rows with plausible finite ADC
  * sums — and never checked length, so a wrong-dim row crashed the
  * executor loop or was silently mis-coded).
  */
object Pq {

  /** `codebooks(s)(c)` = sub-centroid `c` of subspace `s`, each of
    * length `dim / m`.
    */
  final case class Model(dim: Int, m: Int, ksub: Int, codebooks: Array[Array[Array[Float]]]) {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(ksub >= 1 && ksub <= 256, s"ksub=$ksub must fit one byte")
    def dsub: Int = dim / m
  }

  /** The ONE row guard every PQ entry point shares: finite positive
    * norm (Inf norm makes x/Inf = NaN — the training/scoring poison
    * documented in the header) and exact dimension (slice/index loops
    * assume it; VecDot/NearestCell tolerate mismatches, these tight
    * loops cannot).
    */
  private def usableVec(vecCol: String, dim: Int) = {
    val n = Similarity.norm(col(vecCol))
    n.isNotNull && n > 0 && !isnan(n) && n < lit(Double.PositiveInfinity) &&
      size(col(vecCol)) === dim
  }

  /** Deterministic driver-side unit-vector sample — the shared
    * sampling block of [[train]] and [[trainResidual]].
    */
  private def sampleUnitVectors(
      df: DataFrame, vecCol: String, dim: Int, sampleSize: Int, seed: Long): Array[Array[Double]] =
    df.select(col(vecCol))
      .filter(usableVec(vecCol, dim))
      .orderBy(xxhash64(col(vecCol), lit(seed)).asc)
      .limit(sampleSize)
      .collect().map { r =>
        val v = r.getSeq[Float](0).toArray.map(_.toDouble)
        val norm = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / norm)
      }

  /** One byte per subspace: argmin-L2 codeword of `target`'s each
    * subvector — the ONE coding loop [[encode]] (target = the unit
    * vector) and [[encodeIvf]] (target = the residual) share.
    */
  private def codeOf(target: Array[Double], pq: Model): Array[Byte] = {
    val dsub = pq.dsub
    val code = new Array[Byte](pq.m)
    var s = 0
    while (s < pq.m) {
      val cb = pq.codebooks(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        var dist = 0.0
        var i = 0
        while (i < dsub) { val t = target(s * dsub + i) - cb(c)(i); dist += t * t; i += 1 }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      code(s) = best.toByte
      s += 1
    }
    code
  }

  /** `table(s)(c) = dot(unit-query subvector s, sub-centroid c)` —
    * the ADC lookup table [[topK]] and [[topKIvf]] share, built once
    * on the driver from the ALREADY-normalized query.
    */
  private def adcTable(qu: Array[Double], pq: Model): Array[Array[Double]] = {
    val dsub = pq.dsub
    Array.tabulate(pq.m) { s =>
      Array.tabulate(pq.ksub) { c =>
        val cb = pq.codebooks(s)
        if (c >= cb.length) Double.NegativeInfinity
        else {
          var d = 0.0
          var i = 0
          while (i < dsub) { d += qu(s * dsub + i) * cb(c)(i); i += 1 }
          d
        }
      }
    }
  }

  /** `(id, score, rank)` tail shared by [[topK]]/[[topKIvf]]: top-k
    * by score desc (ties to the smaller id), ranked. The rank window
    * is global but runs over k ROWS (post-limit) — whitelisted in
    * PlanContractSpec's partition-less-window budget.
    */
  private def rankTail(scored: DataFrame, k: Int): DataFrame =
    scored
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("id").asc)))

  /** Fit `m` independent sub-quantizers on a deterministic sample.
    * `ksub <= 256` so a code is one byte per subspace.
    */
  def train(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 10,
      sampleSize: Int = 10000,
      seed: Long = 42L): Model = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(ksub >= 1 && ksub <= 256, s"ksub=$ksub must fit one byte")
    val sample = sampleUnitVectors(df, vecCol, dim, sampleSize, seed)
    require(sample.length >= ksub, s"sample ${sample.length} < ksub=$ksub")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { s =>
      val subs = sample.map(_.slice(s * dsub, (s + 1) * dsub))
      lloydL2(subs, ksub, iters).map(_.map(_.toFloat))
    }
    Model(dim, m, ksub, codebooks)
  }

  /** Plain L2 Lloyd's on driver-side points: evenly spaced init over
    * the points sorted by first coordinate (RNG-free, the [[Ivf]]
    * discipline), empty cells keep their previous centroid.
    */
  private def lloydL2(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    import scala.math.Ordering.Implicits.seqOrdering
    val d = points.head.length
    var centroids = points.sortBy(_.toSeq).zipWithIndex
      .collect { case (v, i) if i % math.max(points.length / k, 1) == 0 => v }
      .take(k)
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](d))
      val counts = new Array[Int](centroids.length)
      points.foreach { p =>
        val c = nearestL2(p, centroids)
        counts(c) += 1
        var i = 0
        while (i < d) { sums(c)(i) += p(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else { val o = new Array[Double](d); var i = 0; while (i < d) { o(i) = sums(c)(i) / counts(c); i += 1 }; o }
      }.toArray
      iter += 1
    }
    centroids
  }

  private def nearestL2(p: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cs.length) {
      var dist = 0.0
      var i = 0
      while (i < p.length) { val t = p(i) - cs(c)(i); dist += t * t; i += 1 }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  final case class CodeRow(id: Long, code: Array[Byte])

  /** `(id, cell, code)` — the IVF-PQ index row: which inverted list
    * the vector lives in, and the one-byte-per-subspace code of its
    * RESIDUAL against that cell's centroid.
    */
  final case class IvfCodeRow(id: Long, cell: Int, code: Array[Byte])

  /** Argmax dot(v, centroid), ties to the smallest index — the
    * driver-side twin of [[NearestCell]]'s assignment rule, so
    * training, encoding, and the column expression can never drift.
    */
  private def nearestCellDot(v: Array[Double], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { d += v(i) * cents(c)(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Fit PQ codebooks on RESIDUALS — the IVFADC composition (Jégou,
    * Douze, Schmid 2011 §IV): each sampled unit vector is assigned to
    * its nearest IVF centroid and the codebooks quantize
    * `unit − centroid` pooled across cells. Residuals are far more
    * concentrated than raw vectors (the centroid already explains the
    * cell's direction), so the same `m x ksub` budget spends its
    * precision on the part of the vector the cell does NOT explain —
    * the reason IVF-PQ recalls better than flat PQ at equal bytes.
    * Same deterministic sampling and RNG-free Lloyd's as [[train]].
    */
  def trainResidual(
      df: DataFrame,
      vecCol: String,
      ivf: Ivf.Model,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 10,
      sampleSize: Int = 10000,
      seed: Long = 42L): Model = {
    val dim = ivf.centroids.head.length
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(ksub >= 1 && ksub <= 256, s"ksub=$ksub must fit one byte")
    val sample = sampleUnitVectors(df, vecCol, dim, sampleSize, seed)
    require(sample.length >= ksub, s"sample ${sample.length} < ksub=$ksub")
    val residuals = sample.map { u =>
      val cell = nearestCellDot(u, ivf.centroids)
      val cent = ivf.centroids(cell)
      Array.tabulate(dim)(i => u(i) - cent(i))
    }
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { s =>
      val subs = residuals.map(_.slice(s * dsub, (s + 1) * dsub))
      lloydL2(subs, ksub, iters).map(_.map(_.toFloat))
    }
    Model(dim, m, ksub, codebooks)
  }

  /** Build the IVF-PQ index: `(id, cell, code)` with one byte per
    * subspace coding the residual against the row's cell centroid.
    * At scale this is THE persisted artifact — written bucketed (or
    * partitioned) by `cell`, a probe reads only its `nprobe` inverted
    * lists and each row it touches is `m` bytes, not `4*dim`.
    * Degenerate rows are dropped by the shared norm guard.
    */
  def encodeIvf(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      ivf: Ivf.Model,
      pq: Model): Dataset[IvfCodeRow] = {
    import df.sparkSession.implicits._
    require(pq.dim == ivf.centroids.head.length,
      s"pq dim ${pq.dim} != ivf dim ${ivf.centroids.head.length}")
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(usableVec("v", pq.dim))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        rows.map { case (id, vf) =>
          val v = vf.map(_.toDouble)
          val norm = math.sqrt(v.map(x => x * x).sum)
          val u = v.map(_ / norm)
          val cell = nearestCellDot(u, ivf.centroids)
          val cent = ivf.centroids(cell)
          val residual = Array.tabulate(pq.dim)(i => u(i) - cent(i))
          IvfCodeRow(id, cell, codeOf(residual, pq))
        }
      }
  }

  /** IVFADC top-k: probe the query's `nprobe` nearest cells only.
    * Approximate cosine of a row in cell `c` decomposes as
    * `dot(q, centroid_c) + sum_s table(s)(code_s)` — one per-cell
    * constant plus `m` lookups in the residual ADC table, both built
    * once on the driver. The `cell isin probed` filter is a plain
    * pushable predicate: against a cell-bucketed/partitioned index it
    * prunes (k - nprobe)/k of the SCAN, which is where the at-scale
    * win lives (the flat [[topK]] must still read every code).
    * Output: `(id, score, rank)`, ties to the smaller id.
    */
  def topKIvf(
      encoded: Dataset[IvfCodeRow],
      pq: Model,
      ivf: Ivf.Model,
      query: Array[Double],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    import encoded.sparkSession.implicits._
    require(query.length == pq.dim, s"query dim ${query.length} != model dim ${pq.dim}")
    // a mismatched model pair would crash the cellConst loop (ivf dim
    // smaller) or silently probe the WRONG cells (ivf dim larger —
    // truncated dots, recall collapse with no error); encodeIvf
    // cross-checks the pair, the query path must too (review r18)
    require(ivf.centroids.head.length == pq.dim,
      s"ivf dim ${ivf.centroids.head.length} != pq dim ${pq.dim} — mismatched model pair")
    require(nprobe >= 1, s"nprobe=$nprobe must be >= 1 (0 would silently return no rows)")
    val qn = math.sqrt(query.map(x => x * x).sum)
    require(qn > 0 && !qn.isNaN, "query vector must have positive finite norm")
    val qu = query.map(_ / qn)
    val cellConst: Array[Double] = ivf.centroids.map { cent =>
      var d = 0.0
      var i = 0
      while (i < qu.length) { d += qu(i) * cent(i); i += 1 }
      d
    }
    val probed: Array[Int] = cellConst.indices
      .sortBy(c => (-cellConst(c), c))
      .take(math.min(nprobe, ivf.k))
      .toArray
    val table = adcTable(qu, pq)
    val scored = encoded
      .filter(col("cell").isin(probed.map(Integer.valueOf).toIndexedSeq: _*))
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.cell < 0 || r.cell >= cellConst.length)
            throw new IllegalArgumentException(
              s"encoded row cell ${r.cell} out of range for ivf.k=${cellConst.length}: " +
                "the index was built against a different IVF model")
          // a code encoded under a different pq.m would either die
          // with a bare ArrayIndexOutOfBounds (shorter) or silently
          // ignore trailing bytes and mis-score (longer) — same
          // mismatched-model-pair class as the cell check above
          if (r.code.length != table.length)
            throw new IllegalArgumentException(
              s"encoded row code length ${r.code.length} != pq.m=${table.length}: " +
                "the index was built against a different PQ model")
          var sc = cellConst(r.cell)
          var s = 0
          while (s < table.length) { sc += table(s)(r.code(s) & 0xff); s += 1 }
          Scored(r.id, sc)
        }
      }
      .toDF("id", "score")
    rankTail(scored, k)
  }

  /** Persist the IVF-PQ index PARTITIONED by cell — the at-scale
    * layout the probe path assumes: each inverted list is its own
    * parquet directory, so [[topKIvf]]'s `cell isin probed` predicate
    * becomes a PARTITION filter and a probe at nprobe of k cells
    * READS nprobe/k of the index (directories never opened), on top
    * of each touched row being `m` bytes. With k sized so a cell is
    * a few files, this is the layout a 100 TB corpus serves
    * interactive ANN from.
    */
  def writeIndex(encoded: Dataset[IvfCodeRow], path: String): Unit =
    encoded.toDF().write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Append a NEW batch to an existing [[writeIndex]] layout without
    * retraining or re-encoding the corpus — the daily-ingest
    * maintenance path. The batch is encoded against the SAME frozen
    * (ivf, pq) model pair the index was built with (cells and codes
    * are pure functions of the models, so appended rows are
    * indistinguishable from original ones to every probe API) and
    * lands as new files under the SAME `cell=<n>` partition
    * directories — cost scales with the BATCH, never the index
    * (ScaleBench `pq_append_vs_index` pins the flat term). Ids must
    * stay unique across appends (caller's contract, as everywhere in
    * this module); recall against new rows is full (they are encoded
    * exactly), while codebook fit for a DRIFTED distribution degrades
    * gradually — watch [[driftCheck]] and retrain when it fires.
    */
  def appendToIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      ivf: Ivf.Model,
      pq: Model,
      path: String): Unit =
    encodeIvf(df, vecCol, idCol, ivf, pq)
      .toDF().write.mode("append").partitionBy("cell").parquet(path)

  /** Mean squared reconstruction error of the IVF-PQ coder over
    * `df`'s usable rows: `E[ ||u - (centroid_cell + decode(code))||² ]`
    * with `u` the unit vector. ONE distributed aggregation (encode +
    * decode + squared error per row, map-side-combined avg); returns
    * NaN on zero usable rows. This is the drift statistic for a
    * frozen model pair: as the incoming distribution walks away from
    * the training-time one, residuals stop matching the codebooks and
    * the error rises — compare against the training-time baseline
    * with [[driftCheck]].
    */
  def quantizationError(
      df: DataFrame, vecCol: String, ivf: Ivf.Model, pq: Model): Double = {
    val (sumErr, usable, _) = quantizationErrorStat(df, vecCol, ivf, pq)
    if (usable == 0) Double.NaN else sumErr / usable
  }

  /** `(sum of squared reconstruction errors, usable rows, total rows)`
    * in ONE distributed aggregation — the usable/total split is what
    * lets [[driftCheck]] tell "empty batch" (never fires) from "every
    * row unusable" (a pipeline break — fails loud).
    */
  private def quantizationErrorStat(
      df: DataFrame, vecCol: String, ivf: Ivf.Model, pq: Model): (Double, Long, Long) = {
    import df.sparkSession.implicits._
    require(pq.dim == ivf.centroids.head.length,
      s"pq dim ${pq.dim} != ivf dim ${ivf.centroids.head.length}")
    val errs = df.select(col(vecCol).as("_1"), usableVec(vecCol, pq.dim).as("_2"))
      .as[(Array[Float], Boolean)]
      .mapPartitions { rows =>
        rows.map { case (vf, usable) =>
          if (!usable) (0.0, 0L)
          else {
            val v = vf.map(_.toDouble)
            val norm = math.sqrt(v.map(x => x * x).sum)
            val u = v.map(_ / norm)
            val cell = nearestCellDot(u, ivf.centroids)
            val cent = ivf.centroids(cell)
            val residual = Array.tabulate(pq.dim)(i => u(i) - cent(i))
            val code = codeOf(residual, pq)
            var err = 0.0
            val dsub = pq.dsub
            var s = 0
            while (s < pq.m) {
              val cw = pq.codebooks(s)(code(s) & 0xff)
              var i = 0
              while (i < dsub) {
                val d = residual(s * dsub + i) - cw(i)
                err += d * d
                i += 1
              }
              s += 1
            }
            (err, 1L)
          }
        }
      }
      .toDF("err", "u")
    val r = errs.agg(sum("err"), sum("u"), count(lit(1))).collect()(0)
    if (r.isNullAt(2) || r.getLong(2) == 0L) (0.0, 0L, 0L)
    else (if (r.isNullAt(0)) 0.0 else r.getDouble(0),
      if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2))
  }

  /** One drift verdict for a frozen model pair: `current` is the
    * batch's [[quantizationError]], `baseline` the training-time one
    * (capture it right after train with the SAME function over the
    * training corpus or a held-out slice), `ratio = current /
    * baseline`, and `retrainDue` fires when the ratio crosses
    * `factor`. An empty batch (NaN current) never fires; a NON-empty
    * batch whose rows are ALL unusable fails loud in [[driftCheck]].
    */
  final case class DriftStat(
      baseline: Double, current: Double, ratio: Double, retrainDue: Boolean)

  /** Evaluate [[DriftStat]] for a batch against a frozen model pair.
    * `factor` defaults to 1.5 — at 1.5× the training-time quantization
    * error, ADC scores have visibly decayed and a retrain+re-encode
    * window should be scheduled.
    */
  def driftCheck(
      df: DataFrame, vecCol: String, ivf: Ivf.Model, pq: Model,
      baseline: Double, factor: Double = 1.5): DriftStat = {
    require(baseline > 0 && !baseline.isNaN && !baseline.isInfinite,
      s"baseline=$baseline must be a positive finite training-time quantizationError")
    require(factor > 1.0, s"factor=$factor must be > 1 (1.0 would fire on noise)")
    val (sumErr, usable, total) = quantizationErrorStat(df, vecCol, ivf, pq)
    // the most drastic drift of all is invisible to the error average:
    // a batch whose EVERY row fails usableVec (the embedding provider
    // changed dimension, or upstream started emitting nulls/zeros)
    // would yield NaN here while appendToIndex silently appends zero
    // rows for the same batch — the monitor must scream, not shrug
    // (review r19)
    require(total == 0 || usable > 0,
      s"driftCheck: all $total rows are unusable for dim=${pq.dim} " +
        "(null/zero/non-finite norm or wrong dimension) — this is a pipeline " +
        "break (e.g. the embedding dimension changed), not drift; " +
        "appendToIndex/quantizationError silently no-op on such a batch")
    val current = if (usable == 0) Double.NaN else sumErr / usable
    val ratio = current / baseline
    DriftStat(baseline, current, ratio, retrainDue = !current.isNaN && ratio > factor)
  }

  /** Persist the trained PQ model as a small parquet table — the
    * artifact a daily-ingest pipeline loads to [[appendToIndex]]
    * without retraining. One row per (subspace, codeword); dim/m/ksub
    * ride every row (a handful of codewords — control-plane size).
    */
  def writeModel(spark: org.apache.spark.sql.SparkSession, pq: Model, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      s <- pq.codebooks.indices
      c <- pq.codebooks(s).indices
    } yield (pq.dim, pq.m, pq.ksub, s, c, pq.codebooks(s)(c).toSeq)
    rows.toDF("dim", "m", "ksub", "subspace", "codeword", "values")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeModel]] artifact. Fails loud on an empty or torn
    * layout (a model is never legitimately empty).
    */
  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    // explicit schema: an empty/missing layout must hit the loud
    // require below, not schema inference's AnalysisException
    val rows = spark.read
      .schema("dim INT, m INT, ksub INT, subspace INT, codeword INT, values ARRAY<FLOAT>")
      .parquet(path)
      .select("dim", "m", "ksub", "subspace", "codeword", "values")
      .collect()
    require(rows.nonEmpty, s"no PQ model rows at $path")
    val dim = rows.head.getInt(0); val m = rows.head.getInt(1); val ksub = rows.head.getInt(2)
    val codebooks = Array.tabulate(m) { s =>
      rows.filter(_.getInt(3) == s).sortBy(_.getInt(4))
        .map(_.getSeq[Float](5).toArray)
    }
    require(codebooks.forall(_.nonEmpty), s"torn PQ model at $path: a subspace has no codewords")
    Model(dim, m, ksub, codebooks)
  }

  /** Read back a [[writeIndex]] layout. The partition column comes
    * back typed by directory inference; it is cast and re-ordered to
    * the [[IvfCodeRow]] shape so every probe API accepts the result.
    */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): Dataset[IvfCodeRow] = {
    import spark.implicits._
    // explicit schema (partition column included): an index whose
    // every input row was degenerate writes only _SUCCESS, and schema
    // INFERENCE would throw on the empty layout instead of returning
    // the empty Dataset the round-trip contract promises (review r18)
    spark.read.schema("id LONG, code BINARY, cell INT").parquet(path)
      .select(col("id").cast("long").as("id"), col("cell").cast("int").as("cell"), col("code"))
      .as[IvfCodeRow]
  }

  /** IVFADC shortlist, exact rerank — [[topKRerank]]'s composition
    * with the probed scan: only `nprobe/k` of the code table is read
    * for the shortlist, then `k * expand` raw vectors are re-read by
    * a bounded `isin` and reranked by TRUE cosine. The production
    * big-corpus search shape. Output: `(id, cosine, rank)`.
    */
  def topKIvfRerank(
      encoded: Dataset[IvfCodeRow],
      pq: Model,
      ivf: Ivf.Model,
      raw: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Double],
      k: Int,
      nprobe: Int = 2,
      expand: Int = 10): DataFrame = {
    require(expand >= 1, s"expand=$expand must be >= 1")
    val shortlist: Array[Long] = topKIvf(encoded, pq, ivf, query, k * expand, nprobe)
      .collect().map(_.getLong(0))
    rerankExact(raw, vecCol, idCol, query, k, shortlist)
  }

  /** Encode the corpus: `(id, code)` with one byte per subspace —
    * the table a 100 TB deployment persists (and scans) instead of
    * the raw vectors. Vectors are unit-normalized before
    * sub-quantization (ADC dots then approximate cosine); degenerate
    * rows are dropped by the shared guard.
    */
  def encode(df: DataFrame, vecCol: String, idCol: String, model: Model): Dataset[CodeRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(usableVec("v", model.dim))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        rows.map { case (id, vf) =>
          val v = vf.map(_.toDouble)
          val norm = math.sqrt(v.map(x => x * x).sum)
          // normalize ONCE (the old loop divided each element ksub
          // times inside the innermost codeword scan)
          val u = v.map(_ / norm)
          CodeRow(id, codeOf(u, model))
        }
      }
  }

  final case class Scored(id: Long, score: Double)

  /** ADC top-k: approximate cosine neighbors of one query vector
    * over the encoded corpus. The `m x ksub` lookup table is built
    * once on the driver; each row costs `m` lookups; the k winners
    * resolve as `TakeOrderedAndProject`. Output:
    * `(id, score, rank)`, rank 1..k by approximate cosine desc, ties
    * to the smaller id (deterministic).
    */
  def topK(
      encoded: Dataset[CodeRow],
      model: Model,
      query: Array[Double],
      k: Int): DataFrame = {
    import encoded.sparkSession.implicits._
    require(query.length == model.dim, s"query dim ${query.length} != model dim ${model.dim}")
    val qn = math.sqrt(query.map(x => x * x).sum)
    require(qn > 0 && !qn.isNaN, "query vector must have positive finite norm")
    val table = adcTable(query.map(_ / qn), model)
    val scored = encoded
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.code.length != table.length)
            throw new IllegalArgumentException(
              s"encoded row code length ${r.code.length} != pq.m=${table.length}: " +
                "the index was built against a different PQ model")
          var sc = 0.0
          var s = 0
          while (s < table.length) { sc += table(s)(r.code(s) & 0xff); s += 1 }
          Scored(r.id, sc)
        }
      }
      .toDF("id", "score")
    rankTail(scored, k)
  }

  /** The production search shape: ADC SHORTLIST, exact RERANK. The
    * code-table scan ([[topK]]) over-fetches `k * expand` candidates
    * — cheap, it is the same m-lookup scan — then exactly `k *
    * expand` raw vectors are re-read by an `isin` filter the engine
    * pushes to the vector table's scan (a bounded id list, never a
    * join against the full corpus) and reranked by TRUE cosine.
    * Quantization error then only costs recall when a true neighbor
    * falls outside the whole shortlist, not when codes merely
    * reorder the head — recall@k at expand=10 is typically near the
    * shortlist's ceiling. Output: `(id, cosine, rank)`, rank 1..k by
    * exact cosine desc, ties to the smaller id.
    */
  def topKRerank(
      encoded: Dataset[CodeRow],
      model: Model,
      raw: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Double],
      k: Int,
      expand: Int = 10): DataFrame = {
    require(expand >= 1, s"expand=$expand must be >= 1")
    val shortlist: Array[Long] = topK(encoded, model, query, k * expand)
      .collect().map(_.getLong(0))
    rerankExact(raw, vecCol, idCol, query, k, shortlist)
  }

  /** Exact-cosine rerank of a bounded shortlist: the id list rides an
    * `isin` the engine pushes to the vector table's scan — never a
    * join against the full corpus.
    */
  private def rerankExact(
      raw: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Double],
      k: Int,
      shortlist: Array[Long]): DataFrame = {
    val qf = query.map(_.toFloat)
    raw
      .filter(col(idCol).isin(shortlist.toIndexedSeq: _*))
      .withColumn("cosine", Similarity.cosine(col(vecCol), Similarity.vecLit(qf)))
      .filter(!isnan(col("cosine")))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).cast("long").as("id"), col("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cosine").desc, col("id").asc)))
  }
}

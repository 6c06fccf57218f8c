package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSpec {

  private def corpus() = {
    import sqlImplicits._
    Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "newest newest newest newest"),
      (4L, "widest widest widest"),
      (5L, ""),
      (6L, "  "),
      (7L, "low lower lowest")).toDF("doc_id", "text")
  }

  test("vocab ids: base alphabet sorted first, merge products in training order, no gaps") {
    val m = BpeTokenizer.fit(corpus(), "text", numMerges = 10)
    val chars = "lowernstdi".toSeq.map(_.toString).sorted
    // base = sorted distinct corpus chars, then </w>, then merges
    assert(m.inverse.take(chars.length).toSeq == chars)
    assert(m.inverse(chars.length) == BpeStats.EndOfWord)
    assert(m.inverse.length == m.vocab.size)
    assert(m.inverse.zipWithIndex.forall { case (s, i) => m.vocab(s) == i })
    // every merge product is in vocab
    m.merges.foreach { case (l, r) => assert(m.vocab.contains(l + r)) }
  }

  test("round trip: decode(encode(x)) equals single-spaced x for every doc") {
    val df = corpus()
    val m = BpeTokenizer.fit(df, "text", numMerges = 6)
    val enc = BpeTokenizer.encode(df, "text", "doc_id", m)
    val dec = BpeTokenizer.decode(enc, "token_ids", m)
      .join(df, "doc_id")
      .withColumn("expected",
        concat_ws(" ", filter(split(col("text"), " "), w => length(w) > 0)))
    assert(dec.filter(col("decoded_text") =!= col("expected")).count() == 0)
    // empty/all-separator docs keep an empty id array, not a dropped row
    val empty = enc.filter(col("doc_id").isin(5L, 6L)).collect()
    assert(empty.length == 2 && empty.forall(_.getAs[Long]("n_bpe_tokens") == 0L))
  }

  test("encode agrees with subtokenCounts and compresses as merges grow") {
    val df = corpus().filter(length(trim(col("text"))) > 0)
    val merges = BpeStats.trainMerges(BpeStats.cappedVocab(df, "text", 100), 8)
    val m = BpeTokenizer.fit(df, "text", numMerges = 8)
    assert(m.merges == merges.map(_._1), "fit must train the same merges as BpeStats")
    val enc = BpeTokenizer.encode(df, "text", "doc_id", m)
    val sub = BpeStats.subtokenCounts(df, "text", "doc_id", merges)
    assert(enc.join(sub, "doc_id").filter(col("n_bpe_tokens") =!= col("n_subtokens")).count() == 0,
      "encode token counts must equal the counting-only path")
    // more merges => never more tokens, and strictly fewer here
    val enc0 = BpeTokenizer.encode(df, "text", "doc_id", BpeTokenizer.fit(df, "text", 0))
    val joined = enc.join(enc0.withColumnRenamed("n_bpe_tokens", "n0"), "doc_id")
    assert(joined.filter(col("n_bpe_tokens") > col("n0")).count() == 0)
    assert(joined.filter(col("n_bpe_tokens") < col("n0")).count() > 0)
    // zero-merge encoding is chars + one end-marker per word
    val chk = enc0.join(df, "doc_id")
      .withColumn("nw", size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long"))
      .withColumn("nc", col("nw") + length(regexp_replace(col("text"), " ", "")).cast("long"))
    assert(chk.filter(col("n_bpe_tokens") =!= col("nc")).count() == 0)
  }

  test("token order preserves word order: a reversed doc encodes to the reversed word blocks") {
    import sqlImplicits._
    val df = Seq((1L, "ab cd"), (2L, "cd ab")).toDF("doc_id", "text")
    val m = BpeTokenizer.fit(df, "text", numMerges = 0)
    val rows = BpeTokenizer.encode(df, "text", "doc_id", m)
      .orderBy("doc_id").collect()
    val ids1 = rows(0).getSeq[Int](rows(0).fieldIndex("token_ids"))
    val ids2 = rows(1).getSeq[Int](rows(1).fieldIndex("token_ids"))
    assert(ids1 != ids2, "different word order must encode differently")
    // each doc = two 3-symbol word blocks; swapping docs swaps blocks
    assert(ids1.take(3) == ids2.drop(3) && ids1.drop(3) == ids2.take(3))
  }

  test("deterministic across partitioning") {
    val df = corpus()
    val m = BpeTokenizer.fit(df, "text", numMerges = 5)
    def ids(d: org.apache.spark.sql.DataFrame) =
      BpeTokenizer.encode(d, "text", "doc_id", m)
        .select("doc_id", "token_ids").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(ids(df) == ids(df.repartition(13)))
  }

  test("save/load round-trips the model exactly and the loaded model encodes identically") {
    val df = corpus()
    val m = BpeTokenizer.fit(df, "text", numMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    try {
      BpeTokenizer.save(spark, m, dir)
      val loaded = BpeTokenizer.load(spark, dir)
      assert(loaded.merges == m.merges)
      assert(loaded.vocab == m.vocab)
      assert(loaded.inverse.toSeq == m.inverse.toSeq)
      val a = BpeTokenizer.encode(df, "text", "doc_id", m)
        .select("doc_id", "token_ids").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      val b = BpeTokenizer.encode(df, "text", "doc_id", loaded)
        .select("doc_id", "token_ids").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      assert(a == b)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("a word containing the literal end-of-word marker is rejected, not silently corrupted") {
    import sqlImplicits._
    // base alphabet covers every char of the dirty doc, so the ONLY
    // violation is the in-band marker itself
    val clean = Seq((1L, "see tag < / w >")).toDF("doc_id", "text")
    val m = BpeTokenizer.fit(clean, "text", numMerges = 0)
    val dirty = Seq((1L, s"see ${BpeStats.EndOfWord} tag")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      BpeTokenizer.encode(dirty, "text", "doc_id", m).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("end-of-word marker")), e.toString)
  }

  test("supplementary-plane text: fit and segmentation share the code-point grain") {
    import sqlImplicits._
    // U+1F600 (😀) is two UTF-16 code units; a code-unit segmenter
    // would emit lone surrogates that fit's code-point base alphabet
    // never contains, throwing a spurious "corpus drifted since fit"
    // on the very corpus fit ran on
    val df = Seq((1L, "hi 😀"), (2L, "😀😀 ok")).toDF("doc_id", "text")
    val m = BpeTokenizer.fit(df, "text", numMerges = 3)
    assert(m.vocab.contains("😀"), "the emoji must be ONE base symbol")
    assert(!m.vocab.contains("\uD83D"), "no lone surrogate in the vocab")
    // counting, encoding and chunking all run the segmenter — none may throw
    val counts = BpeTokenizer.countsFromModel(df, "text", "doc_id", m)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ > 0L))
    val enc = BpeTokenizer.encode(df, "text", "doc_id", m)
    val dec = BpeTokenizer.decode(enc, "token_ids", m).orderBy("doc_id").collect()
    assert(dec(0).getAs[String]("decoded_text") == "hi 😀")
    assert(dec(1).getAs[String]("decoded_text") == "😀😀 ok")
    // zero-merge segmentation of the emoji word: one char + end marker
    assert(BpeStats.segmentWord("😀", Map.empty) ==
      Seq("😀", BpeStats.EndOfWord))
  }

  test("a null id is one key like any other: its count/ids join back null-safely, never 0-stamped") {
    import sqlImplicits._
    val m = BpeTokenizer.fit(Seq((1L, "aa bb")).toDF("doc_id", "text"), "text", numMerges = 0)
    val df = Seq((Some(1L), "aa bb"), (None, "aa"), (Some(2L), "  ")).toDF("doc_id", "text")
    // a plain equi-join back would stamp the null-id doc 0 tokens
    val counts = BpeTokenizer.countsFromModel(df, "text", "doc_id", m)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1)).toMap
    assert(counts == Map(Some(1L) -> 6L, None -> 3L, Some(2L) -> 0L))
    val enc = BpeTokenizer.encode(df, "text", "doc_id", m)
      .filter(col("doc_id").isNull).head()
    assert(enc.getAs[Long]("n_bpe_tokens") == 3L)
  }

  test("tail words outside the capped training vocab still encode (base alphabet covers them)") {
    import sqlImplicits._
    // 'zq' appears once and the cap of 2 keeps only the frequent words;
    // its chars must still be in the base alphabet
    val df = Seq((1L, "aa aa aa"), (2L, "bb bb"), (3L, "zq")).toDF("doc_id", "text")
    val m = BpeTokenizer.fit(df, "text", numMerges = 4, maxVocab = 2)
    val enc = BpeTokenizer.encode(df, "text", "doc_id", m)
    assert(enc.filter(col("doc_id") === 3L).head().getAs[Long]("n_bpe_tokens") == 3L)
    val dec = BpeTokenizer.decode(enc, "token_ids", m)
    assert(dec.filter(col("doc_id") === 3L).head().getAs[String]("decoded_text") == "zq")
  }
}

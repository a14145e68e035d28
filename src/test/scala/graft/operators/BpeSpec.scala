package graft.operators

import graft.SparkSpec

/** Gates Bpe.train against an independent in-memory reference
  * implementation (the textbook vocab-dict algorithm) — merge-for-merge
  * including weighted frequencies and greedy left-to-right rewrite
  * semantics on repeated symbols. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook reference: Map[spaced-word, count], full rescan per round. */
  private def referenceBpe(words: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.map(_.toLowerCase)
      .groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toVector -> g.size.toLong }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (i < k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a + " " + b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          out += ((a, b, c))
          vocab = vocab.map { case (syms, wc) =>
            val m = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                m += a + b; j += 2
              } else { m += syms(j); j += 1 }
            }
            m.result() -> wc
          }.groupMapReduce(_._1)(_._2)(_ + _)
          i += 1
        case _ => done = true
      }
    }
    out.result()
  }

  private val corpus = Seq(
    "low low low low low", "lower lower newest newest",
    "newest newest newest newest", "widest widest widest", "new new newer")

  test("train matches the reference merge-for-merge with frequencies") {
    val docs = corpus.toDF("text")
    val got = Bpe.train(docs, "text", 12)
      .map(m => (m.left, m.right, m.freq))
    val want = referenceBpe(corpus.flatMap(_.split(" ")), 12)
    assert(got === want)
    // sanity: merges actually chain into multi-char symbols
    assert(got.exists { case (a, b, _) => (a + b).length >= 4 })
  }

  test("batched rounds ≡ sequential rounds, in fewer driver trips") {
    val docs = corpus.toDF("text")
    val (seqM, seqRounds) =
      Bpe.trainWithStats(docs, "text", 12, maxBatch = 1, localVocabThreshold = 0)
    val (batM, batRounds) =
      Bpe.trainWithStats(docs, "text", 12, maxBatch = 8, localVocabThreshold = 0)
    assert(batM === seqM, "batched training must reproduce the sequential merge list")
    assert(seqRounds >= 12, s"sequential should pay one trip per merge, got $seqRounds")
    assert(batRounds < seqRounds,
      s"batching should cut driver round-trips: $batRounds vs $seqRounds")
    // real-corpus equivalence too (100 docs, 20 merges, minFreq 1)
    val real = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val (sm, sr) = Bpe.trainWithStats(real, "text", 20, minFreq = 1L,
      maxBatch = 1, localVocabThreshold = 0)
    val (bm, br) = Bpe.trainWithStats(real, "text", 20, minFreq = 1L,
      maxBatch = 8, localVocabThreshold = 0)
    assert(bm === sm)
    assert(br < sr, s"expected fewer rounds on the real corpus: $br vs $sr")
  }

  test("in-memory fast path ≡ distributed rounds, in ONE cluster job") {
    val docs = corpus.toDF("text")
    val (distM, _) =
      Bpe.trainWithStats(docs, "text", 12, maxBatch = 1, localVocabThreshold = 0)
    val (locM, locRounds) = Bpe.trainWithStats(docs, "text", 12)
    assert(locM === distM,
      "the collected-vocab trainer must reproduce the distributed merge list")
    assert(locRounds == 1, s"local path should cost one job, got $locRounds")
    // real corpus, deeper merge list (where incremental index updates
    // and the TreeSet tie-break actually get exercised)
    val real = spark.read.parquet(s"$sf0001/documents.parquet").limit(200)
    val (dm, _) = Bpe.trainWithStats(real, "text", 60, minFreq = 1L,
      maxBatch = 1, localVocabThreshold = 0)
    val (lm, _) = Bpe.trainWithStats(real, "text", 60, minFreq = 1L)
    assert(lm === dm)
  }

  test("greedy left-to-right on repeated symbols: 'a a a' merges once") {
    val docs = Seq("aaa aaa baa").toDF("text")
    val merges = Bpe.train(docs, "text", 1, minFreq = 1L)
    // counting sees ("a","a") at both offsets of "a a a", but the merge
    // rewrite is non-overlapping left-to-right: "aa" + trailing "a"
    assert(merges.map(m => (m.left, m.right)) === Seq(("a", "a")))
    assert(Bpe.encodeWord("aaa", merges) === Seq("aa", "a"))
    assert(Bpe.encodeWord("baa", merges) === Seq("b", "aa"))
  }

  test("encodeWord replays the learned merges") {
    val docs = corpus.toDF("text")
    val merges = Bpe.train(docs, "text", 12)
    val enc = Bpe.encodeWord("newest", merges)
    assert(enc.mkString === "newest")
    assert(enc.length < "newest".length)
  }

  test("distributed encoder ≡ order-replay reference on real documents") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val merges = Bpe.train(docs, "text", 20, minFreq = 1L)
    val got = docs.select(col("doc_id"), Bpe.encode(col("text"), merges).as("sw"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val want = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> toks.flatMap(Bpe.encodeWord(_, merges)).toSeq
    }.toMap
    assert(got.size == want.size && got.nonEmpty)
    got.foreach { case (id, sw) =>
      assert(want(id) == sw, s"doc $id: $sw vs ${want(id)}")
    }
    // merges actually compress: fewer subwords than characters
    val chars = want.values.map(_.map(_.length).sum).sum
    val subs = want.values.map(_.size).sum
    assert(subs < chars)
  }
}

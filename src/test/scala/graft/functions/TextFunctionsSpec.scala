package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import TextFunctions._

/** Parity anchors for the portable hash family: expected values are the
  * independent scalar computation (same math the DuckDB oracle runs). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def refTokenHash(t: String): Long =
    t.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)

  test("native tokens ≡ HOF chain on real documents and unicode edges") {
    val docs = graft.core.Tables(spark, sf0001, "documents")
      .select(col("text"))
      .unionAll(Seq("", "  ", "Tab\there\nand  SPACE", "Çå Ü x",
        "one").toDF("text"))
    val diff = docs.select(tokens(col("text")).as("a"),
        tokensHof(col("text")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0, "native tokens diverged from the HOF mirror")
  }

  test("native shingles ≡ HOF chain on real documents (3- and 16-gram, incl. short + NULL docs)") {
    // NULL text: the HOF's when() yields [] (NULL >= n is null →
    // otherwise) — the native form coalesces to match
    val docs = graft.core.Tables(spark, sf0001, "documents")
      .select(col("text"))
      .unionAll(Seq("", "one", "two tokens", "a b c").toDF("text"))
      .unionAll(Seq(Tuple1(null: String)).toDF("text"))
    for (n <- Seq(3, 16)) {
      val diff = docs.select(
          shinglesFromHashes(tokenHashes(col("text")), n).as("a"),
          shinglesFromHashesHof(tokenHashes(col("text")), n).as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(diff == 0, s"native $n-gram shingles diverged from the HOF mirror")
    }
  }

  test("native docFingerprint ≡ HOF fold on real documents") {
    val docs = graft.core.Tables(spark, sf0001, "documents")
      .select(col("text")).unionAll(Seq("", "one token").toDF("text"))
    val diff = docs.select(docFingerprint(col("text")).as("a"),
        docFingerprintHof(col("text")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0, "native fingerprint diverged from the HOF mirror")
  }

  test("tokenHash matches the scalar fold") {
    val got = Seq("hello", "a", "spark")
      .toDF("t").select(tokenHash(col("t"))).as[Long].collect()
    assert(got.sameElements(Array(refTokenHash("hello"), refTokenHash("a"),
      refTokenHash("spark"))))
    assert(refTokenHash("hello") == 99162322L)
  }

  test("native token_hashes ≡ interpreted HOF form on edge cases") {
    val samples = Seq(
      "hello world", "  Key  AGG row ", "", "   ", "one",
      "MIXED Case Tokens here", "tabs\tand\nnewlines\rsplit",
      "punct, stays! in-token 123 4.5")
    val df = samples.toDF("t")
    val native = df.select(tokenHashes(col("t"))).as[Seq[Long]].collect()
    val hof = df.select(tokenHashesHof(col("t"))).as[Seq[Long]].collect()
    samples.indices.foreach(i =>
      assert(native(i) == hof(i), s"'${samples(i)}': ${native(i)} vs ${hof(i)}"))
  }

  test("native fused shingle_minhash ≡ staged shingles + minhashSigFold") {
    val samples = Seq("a b c d e f g", "one two three", "a b", "", "x y z")
    val df = samples.toDF("t").select(tokenHashes(col("t")).as("th"))
    val native = df.select(TextHashExprs.shingle_minhash(col("th"), 3, 8))
      .as[Seq[Option[Long]]].collect()
    val staged = df.select(
      minhashSigFold(shinglesFromHashes(col("th"), 3), 8))
      .as[Seq[Option[Long]]].collect()
    samples.indices.foreach(i =>
      assert(native(i) == staged(i), s"'${samples(i)}': ${native(i)} vs ${staged(i)}"))
  }

  test("native simhash ≡ per-bit HOF fold") {
    val samples = Seq("the quick brown fox", "a", "", "many words to hash here now")
    val df = samples.toDF("t").select(tokenHashes(col("t")).as("th"))
    val native = df.select(simhash(col("th"), 24)).as[Long].collect()
    val hof = df.select(simhashHof(col("th"), 24)).as[Long].collect()
    assert(native.sameElements(hof))
  }

  test("fused text_profile ≡ HOF token metrics") {
    val samples = Seq(
      "the quick brown fox", "", "   ", "one", "THE the The",
      "el la de y que", "tabs\tand\nnewlines", "punct, counts! here")
    val df = samples.toDF("t")
      .select(col("t"), tokens(col("t")).as("tk"),
        TextProfileExprs.text_profile(col("t")).as("p"))
    val rows = df.select(
      size(col("tk")).cast("long"), col("p.n_tok"),
      subwordCountT(col("tk")), col("p.n_subword"),
      meanTokenLenT(col("tk")),
      col("p.sum_tok_len").cast("double") /
        greatest(col("p.n_tok"), lit(1L)).cast("double"),
      stopwordRatio(col("tk"), stopwords("en")),
      element_at(col("p.sw_hits"), TextProfileOps.langs.indexOf("en") + 1).cast("double") /
        greatest(col("p.n_tok"), lit(1L)).cast("double")).collect()
    rows.zip(samples).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"n_tok '$s'")
      assert(r.getLong(2) == r.getLong(3), s"n_subword '$s'")
      assert(r.getDouble(4) == r.getDouble(5), s"mean_len '$s'")
      assert(r.getDouble(6) == r.getDouble(7), s"sw_ratio '$s'")
    }
  }

  test("tokens lowercase and drop empties") {
    val got = Seq("  Key  AGG row ").toDF("t")
      .select(tokens(col("t"))).as[Seq[String]].collect().head
    assert(got == Seq("key", "agg", "row"))
  }

  test("shingleHashes yields size-n windows and empty when too short") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(size(shingleHashes(col("t"), 3))).as[Int].collect()
    assert(got.sameElements(Array(2, 0)))
  }

  test("minhash signature is deterministic and element-wise minimal") {
    val df = Seq("key agg row scan slow fast").toDF("t")
    val sig = df.select(minhashSig(tokenHashes(col("t")), 4)).as[Seq[Long]].collect().head
    val hashes = "key agg row scan slow fast".split(" ").map(refTokenHash)
    val want = (0 until 4).map(i => hashes.map(h => (h * hashA(i) + hashB(i)) % P).min)
    assert(sig == want)
  }

  test("minhashSigFold equals the k-pass minhashSig") {
    val df = Seq("key agg row scan slow fast table value part",
      "batch window spark order data column agg join").toDF("t")
      .select(tokenHashes(col("t")).as("th"))
    val both = df.select(minhashSig(col("th"), 8).as("a"),
      minhashSigFold(col("th"), 8).as("b")).collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("simhash is stable and within bit budget") {
    val got = Seq("key agg row scan", "key agg row scan").toDF("t")
      .select(simhash(tokenHashes(col("t")))).as[Long].collect()
    assert(got(0) == got(1))
    assert(got(0) >= 0 && got(0) < (1L << 24))
  }

  test("langId picks the stopword-rich language") {
    val got = Seq("the cat is on the mat", "el gato es la casa y el perro", "zzz qqq")
      .toDF("t").select(langId(col("t"))).as[String].collect()
    assert(got(0) == "en")
    assert(got(1) == "es")
    assert(got(2) == "und")
  }

  test("quality score is in [0,1] and favors clean text") {
    val got = Seq("the quick brown fox jumps over the lazy dog and runs far away today quickly it is said that they do",
      "!!! ??? ,,, ...")
      .toDF("t").select(qualityScore(col("t"))).as[Double].collect()
    assert(got.forall(v => v >= 0.0 && v <= 1.0))
    assert(got(0) > got(1))
  }

  test("token and subword counts") {
    val r = Seq("alpha beta gamma!").toDF("t")
      .select(tokenCount(col("t")), subwordCount(col("t"))).collect().head
    assert(r.getLong(0) == 3L)
    // alpha(2) beta(1) gamma!(2) = 5 ceil(len/4) units
    assert(r.getLong(1) == 5L)
  }

  test("fused code_signals ≡ four-pass HOF mirror on documents and line edges") {
    val docs = graft.core.Tables(spark, sf0001, "documents")
      .select(lit(0L).as("doc_id"), col("text"))
      .unionAll(Seq("", "   ", "\n\n", "a\nb\nc", "trailing\n",
        "\t\n x", "  \r\n mixed", "long " + ("y" * 500),
        "汉字 CJK 行\n第二行").zipWithIndex
        .map { case (t, i) => (i + 1000L, t) }.toDF("doc_id", "text"))
    val a = graft.queries.TextQueries.codeSignals(docs)
    val b = graft.queries.TextQueries.codeSignalsHof(docs)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "native code_signals diverged from the HOF mirror")
  }
}

package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed BPE (byte-pair-encoding) tokenizer training.
  *
  * The classic trick that makes BPE tractable at corpus scale: merges
  * are learned over the frequency-weighted VOCABULARY (word → count),
  * never the raw corpus. The corpus is touched exactly once — one
  * word-count aggregation whose map-side partials soak the Zipf skew —
  * and every merge round after that runs over |vocab| rows (Zipf-
  * bounded: ~millions at 100 TB, constant across rounds).
  *
  * Per round: one weighted pair-count aggregation + a LIMIT-1 collect
  * of the winning pair (the merge table is inherently sequential and
  * tiny — this is the one driver-side loop every distributed BPE
  * trainer has), then a narrow regexp merge over the vocab. The vocab
  * is cached per round and the previous round unpersisted, so lineage
  * and storage stay O(1) across thousands of merges.
  *
  * Words are represented as space-joined symbol strings ("l o w");
  * a merge of pair "l o" rewrites left-to-right non-overlapping
  * occurrences to "lo" — java.util.regex scans left-to-right without
  * rescanning replaced text, which IS the greedy BPE merge order.
  */
object Bpe {

  /** Frequency-weighted vocabulary of `textCol`, each word symbolized
    * to space-joined characters: columns (sym, wc). */
  def charVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"), col("wc"))

  /** Adjacent symbol pairs of a spaced-symbol string column. */
  private def adjacentPairs(sym: Column): Column = {
    val s = split(sym, " ")
    val n = greatest(size(s) - 1, lit(0))
    zip_with(slice(s, lit(1), n), slice(s, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Weighted adjacent-pair counts over a (sym, wc) vocabulary:
    * columns (pair, freq). One explode + one hash aggregation. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("wc"), explode(adjacentPairs(col("sym"))).as("pair"))
      .groupBy("pair").agg(sum(col("wc")).cast(LongType).as("freq"))

  /** One learned merge: rank, the two symbols, and the weighted count
    * of the pair when it was merged. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Learn `numMerges` BPE merges over the corpus. Stops early when no
    * pair occurs at least `minFreq` times. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): Seq[Merge] = {
    // Lineage.cut per round, not cache(): a cache cuts execution but
    // the logical plan still nests every prior round, and per-round
    // plan analysis / plan-string generation grows without bound —
    // a real tokenizer trains thousands of merges.
    var v = graft.core.Lineage.cut(charVocab(docs, textCol))
    val merges = Seq.newBuilder[Merge]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val top = pairCounts(v)
        .orderBy(col("freq").desc, col("pair").asc).limit(1).collect()
      if (top.isEmpty || top(0).getLong(1) < minFreq) done = true
      else {
        val pair = top(0).getString(0)
        val freq = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += Merge(i, a, b, freq)
        val pat = "(?<=^| )" + Pattern.quote(a) + " " + Pattern.quote(b) +
          "(?=$| )"
        // Eager cut materializes the round, so at most two vocab
        // copies are ever resident; the superseded round's blocks are
        // released (the vocab row count never changes).
        val next = graft.core.Lineage.cut(v.withColumn("sym",
          regexp_replace(col("sym"), lit(pat),
            lit(Matcher.quoteReplacement(a + b)))))
        graft.core.Lineage.release(v)
        v = next
        i += 1
      }
    }
    graft.core.Lineage.release(v)
    merges.result()
  }

  /** Distributed corpus encoding with a learned merge list: text →
    * array of subword symbols, one codegen'd static call per row
    * (functions.BpeEncodeExpr). Rank-priority merging — repeatedly
    * merge the lowest-rank adjacent pair — which is the standard
    * encoder equivalence of applying merges in learned order
    * (BpeSpec pins it token-for-token against [[encodeWord]]). */
  def encode(text: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeExprs.bpe_encode(text,
      merges.map(m => (m.left, m.right)))

  /** Segment one word (plain string) with a learned merge list — the
    * driver-side encoder twin of [[train]], for spec-level checks. */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms = word.toLowerCase(java.util.Locale.ROOT).map(_.toString).toVector
    for (m <- merges) {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == m.left && syms(j + 1) == m.right) {
          out += m.left + m.right; j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }
}

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
    * pair occurs at least `minFreq` times.
    *
    * Batched driver rounds: each Spark round-trip fetches the top
    * `maxBatch + 1` ranked pairs and accepts the maximal PREFIX of the
    * ranking that is pairwise symbol-disjoint, trimmed to frequencies
    * strictly above the first excluded pair. That acceptance rule makes
    * the batch provably identical to `maxBatch = 1` sequential
    * training (pinned merge-for-merge in BpeSpec):
    *  - prefix + disjoint ⇒ every accepted pair's count is invariant
    *    under the earlier accepted merges (a merge only destroys/creates
    *    pairs sharing one of its symbols), so at sequential step k the
    *    count of p_k is still f_k, and every original pair ranked below
    *    keeps freq ≤ f_k (conflicting counts only decrease);
    *  - the strict-frequency trim ⇒ pairs CREATED by the batch (x·ab)
    *    can't outrank an accepted pair: a new pair's count is bounded
    *    by the destroyed pair (x,a) it came from, which conflicts with
    *    the batch and is therefore ranked past the prefix, freq ≤
    *    f_stop < f_k — ties included.
    * A 50k-merge vocabulary train thus needs ~50k/batch driver
    * round-trips instead of 50k (the probe shape in SCALE_r7). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L, maxBatch: Int = 16): Seq[Merge] =
    trainWithStats(docs, textCol, numMerges, minFreq, maxBatch)._1

  /** [[train]] plus the number of driver round-trips it took — the
    * batching win a scale probe can assert on. */
  def trainWithStats(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L, maxBatch: Int = 16): (Seq[Merge], Int) = {
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    // Lineage.cut per round, not cache(): a cache cuts execution but
    // the logical plan still nests every prior round, and per-round
    // plan analysis / plan-string generation grows without bound —
    // a real tokenizer trains thousands of merges.
    var v = graft.core.Lineage.cut(charVocab(docs, textCol))
    val merges = Seq.newBuilder[Merge]
    var rounds = 0
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val want = math.min(maxBatch, numMerges - i)
      val top = pairCounts(v)
        .orderBy(col("freq").desc, col("pair").asc).limit(want + 1).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      rounds += 1
      val eligible = top.takeWhile(_._2 >= minFreq)
      if (eligible.isEmpty) done = true
      else {
        // maximal pairwise-disjoint prefix of the ranking
        val used = scala.collection.mutable.Set.empty[String]
        var idx = 0
        var conflict = false
        while (idx < eligible.length && idx < want && !conflict) {
          val Array(a, b) = eligible(idx)._1.split(" ", 2)
          if (used(a) || used(b)) conflict = true
          else { used += a; used += b; idx += 1 }
        }
        // f_stop = count of the first pair NOT in the accepted prefix
        // (conflicting, rank-cut, or sub-minFreq trailing); new pairs
        // created by the batch are bounded by it. None ⇒ the ranking is
        // exhausted and no pair can be created (see Scaladoc).
        val fStop: Option[Long] =
          if (idx < top.length) Some(top(idx)._2) else None
        var keep = fStop match {
          case Some(fs) => eligible.take(idx).lastIndexWhere(_._2 > fs) + 1
          case None => idx
        }
        if (keep == 0) keep = 1 // p_1 is always the sequential choice
        val accepted = eligible.take(keep)
        accepted.foreach { case (pair, freq) =>
          val Array(a, b) = pair.split(" ", 2)
          merges += Merge(i, a, b, freq)
          i += 1
        }
        // ONE narrow rewrite pass for the whole batch: the replaces
        // chain on disjoint symbol sets, so order within the chain
        // can't change the result.
        val rewritten = accepted.foldLeft(col("sym")) { case (c, (pair, _)) =>
          val Array(a, b) = pair.split(" ", 2)
          val pat = "(?<=^| )" + Pattern.quote(a) + " " + Pattern.quote(b) +
            "(?=$| )"
          regexp_replace(c, lit(pat), lit(Matcher.quoteReplacement(a + b)))
        }
        // Eager cut materializes the round, so at most two vocab
        // copies are ever resident; the superseded round's blocks are
        // released (the vocab row count never changes).
        val next = graft.core.Lineage.cut(v.withColumn("sym", rewritten))
        graft.core.Lineage.release(v)
        v = next
      }
    }
    graft.core.Lineage.release(v)
    (merges.result(), rounds)
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

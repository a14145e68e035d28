package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hot-bucket guard for LSH candidate generation.
  *
  * A banded LSH self-join is quadratic *within* one bucket population:
  * on benign data buckets are small, but a degenerate corpus (a
  * boilerplate-heavy crawl sharing one minhash band key, a pile of
  * near-zero vectors hashing to the same sign pattern) makes a single
  * (band, bkey) bucket of n members emit n² candidate pairs — at
  * 100 TB that one skewed key stalls the whole join stage.
  *
  * The guard bounds the output without silently dropping anything:
  *  - buckets with ≤ maxBucket members keep exact all-pairs semantics
  *    (bit-identical to the unguarded join — the oracle-gated path);
  *  - larger buckets are salted into ⌈n/maxBucket⌉ hash-chunks and
  *    pair only within a chunk (output linear in n: ≤ n·maxBucket
  *    pairs), PLUS a connectivity star linking every member to the
  *    bucket's min-id representative, so a dedup clustering that
  *    walks candidate components still sees the whole bucket as one
  *    component and an ANN probe still gets ~maxBucket candidates.
  *
  * Degraded buckets are observable via [[oversized]] (count, rep per
  * hot bucket) — callers log them; nothing is capped silently.
  */
object BucketGuard {

  /** Default threshold: all-pairs within a 4k bucket is 8M pairs —
    * large but shuffle-able; beyond that the guard kicks in. Gate-scale
    * test data never comes close, so the oracle-gated queries keep
    * exact LSH semantics. */
  val DefaultMaxBucket = 4096

  /** Bounded candidate pairs from a bucketed frame `bands` with
    * columns (`id`, band, bkey).
    *
    * `directed = false` emits each unordered pair once as
    * (`a` < `b`); `directed = true` emits both orientations
    * (`a` != `b`) — the shape ANN probing wants. Output is
    * `.distinct()`-deduped bare id pairs either way, so multi-band
    * collisions verify once downstream.
    */
  def boundedPairs(bands: DataFrame, id: String, outA: String, outB: String,
      maxBucket: Int = DefaultMaxBucket, directed: Boolean = false): DataFrame = {
    // Hot-bucket detection joins back only the OVERSIZED buckets — on a
    // benign corpus that set is empty, so the left join is a broadcast
    // of nothing and the benign path costs one map-side partial
    // aggregation (the count shuffle carries (band,bkey) partials, not
    // the band rows). The earlier shape joined the full counts table
    // onto every band row: a second full shuffle of the band set, ~2×
    // on the 10× ANN probe. Unhinted join on purpose: AQE broadcasts
    // the (near-)empty hot set at runtime, and degrades gracefully to
    // a shuffle join if a pathological corpus makes it huge.
    val hot = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("__n"), min(col(id)).as("__rep"))
      .filter(col("__n") > maxBucket)
    val tagged = bands.join(hot, Seq("band", "bkey"), "left")
    val chunks = ceil(col("__n").cast(LongType) / lit(maxBucket.toLong)).cast(LongType)
    val salted = tagged.withColumn("__salt",
      when(col("__n").isNull, lit(0L))
        .otherwise(pmod(xxhash64(col(id)), chunks)))
    val l = salted.as("l"); val r = salted.as("r")
    val cmp: Column =
      if (directed) col(s"l.$id") =!= col(s"r.$id") else col(s"l.$id") < col(s"r.$id")
    val within = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.__salt") === col("r.__salt") && cmp)
      .select(col(s"l.$id").as(outA), col(s"r.$id").as(outB))
    // connectivity star for degraded buckets: rep ↔ every member, so
    // chunking never splits a bucket's candidate component
    val starBase = tagged.filter(col("__n").isNotNull && col(id) =!= col("__rep"))
    val star =
      if (directed)
        starBase.select(col("__rep").as(outA), col(id).as(outB))
          .union(starBase.select(col(id).as(outA), col("__rep").as(outB)))
      else starBase.select(col("__rep").as(outA), col(id).as(outB))
    within.union(star).distinct()
  }

  /** Buckets the guard degraded: (band, bkey, n, rep) for every bucket
    * over `maxBucket`. Operational visibility — log/count this next to
    * any guarded run; an empty frame means exact semantics everywhere. */
  def oversized(bands: DataFrame, id: String, maxBucket: Int = DefaultMaxBucket): DataFrame =
    bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"), min(col(id)).as("rep"))
      .filter(col("n") > maxBucket)
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.queries.{OracleSql => O}

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH bucketing as the scale path (bucket first,
  * then brute-force only within buckets — turns the n² cross join
  * into a per-bucket join keyed by a 8-bit signature).
  *
  * All vector math is `zip_with`/`aggregate` column algebra with
  * explicit double casts and a fixed left-fold order, so the DuckDB
  * oracle (same fold via list_reduce) produces bit-identical doubles.
  */
object VectorQueries {

  /** Sequential left-fold sum of a double array column. */
  private def fold(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity with order-fixed folds and per-element double
    * casts (embedding elements are float32). */
  def cosine(a: Column, b: Column): Column = {
    val dot = fold(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))
    val na = fold(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)))
    val nb = fold(transform(b, x => x.cast(DoubleType) * x.cast(DoubleType)))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** DuckDB mirror of [[cosine]]. NB: DuckDB's lambda index parameter
    * is 1-based (Spark's is 0-based) and its list indexing is 1-based,
    * so `b[zi]` pairs element i with element i. */
  def cosineSql(a: String, b: String): String = {
    def d(e: String) = s"CAST($e AS DOUBLE)"
    val dot = O.dfold(s"list_transform($a, (zx, zi) -> ${d("zx")} * ${d(s"$b[zi]")})")
    val na = O.dfold(s"list_transform($a, nx -> ${d("nx")} * ${d("nx")})")
    val nb = O.dfold(s"list_transform($b, ny -> ${d("ny")} * ${d("ny")})")
    s"($dot / (sqrt($na) * sqrt($nb)))"
  }

  // ── random-hyperplane LSH ────────────────────────────────────────────
  /** Deterministic pseudo-random plane component for (plane j, dim i):
    * integer arithmetic both engines can replicate exactly. */
  private def planeVal(j: Int, i: Column): Column =
    (((lit(j * 64L) + i.cast(LongType)) * lit(2654435761L)) % lit(1000003L))
      .cast(DoubleType) / lit(1000003.0) - lit(0.5)

  private def planeValSql(j: Int, i: String): String =
    s"(CAST((($j * 64 + $i) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)"

  private val PLANES = 8

  /** Sign-bit bucket of a vector under PLANES fixed hyperplanes. */
  def lshBucket(v: Column): Column =
    (0 until PLANES).map { j =>
      val dot = fold(transform(v, (x, i) => x.cast(DoubleType) * planeVal(j, i)))
      when(dot > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(v: String): String =
    (0 until PLANES).map { j =>
      // DuckDB lambda index pi is 1-based; plane dims are 0-based.
      val dot = O.dfold(
        s"list_transform($v, (px, pi) -> CAST(px AS DOUBLE) * ${planeValSql(j, "(pi - 1)")})")
      s"(CASE WHEN $dot > 0.0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  val all: Seq[Q] = Seq(

    Q("v01_knn_brute",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        // broadcast the tiny QUERY side — the candidate side is the
        // 100 TB one; left alone Spark picked BuildRight(candidates)
        val sims = c.join(broadcast(q), col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            cosine(col("q_emb"), col("n_emb")).as("sim"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id").asc)
        sims.withColumn("rank", row_number().over(w).cast(LongType))
          .filter(col("rank") <= 10)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
              |c AS (SELECT vec_id AS n_id, embedding AS n_emb FROM embeddings),
              |sims AS (SELECT q_id, n_id, ${cosineSql("q_emb", "n_emb")} AS sim
              |         FROM q JOIN c ON q_id != n_id)
              |SELECT q_id, n_id, sim, rank FROM
              |(SELECT q_id, n_id, sim, CAST(row_number() OVER
              |   (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS BIGINT) AS rank
              | FROM sims) WHERE rank <= 10""".stripMargin),
      bench = true),

    Q("v02_lsh_buckets",
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"), lshBucket(col("embedding")).as("bucket")),
      Some(s"""SELECT vec_id, ${lshBucketSql("embedding")} AS bucket
              |FROM embeddings""".stripMargin)),

    Q("v03_ann_bucketed",
      (s, dir) => {
        // Scale path: join only within LSH buckets, then rank. At 100 TB
        // this is a shuffle keyed by (bucket), not an n² cross join.
        val e = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            lshBucket(col("embedding")).as("bucket"))
        val l = e.as("l")
        val r = e.as("r")
        val sims = l.join(r, col("l.bucket") === col("r.bucket") &&
            col("l.vec_id") =!= col("r.vec_id"))
          .select(col("l.vec_id").as("q_id"), col("r.vec_id").as("n_id"),
            cosine(col("l.embedding"), col("r.embedding")).as("sim"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id").asc)
        sims.withColumn("rank", row_number().over(w).cast(LongType))
          .filter(col("rank") <= 5)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket
              |          FROM embeddings)
              |SELECT q_id, n_id, sim, rank FROM
              |(SELECT l.vec_id AS q_id, r.vec_id AS n_id,
              |   ${cosineSql("l.embedding", "r.embedding")} AS sim,
              |   CAST(row_number() OVER (PARTITION BY l.vec_id
              |     ORDER BY ${cosineSql("l.embedding", "r.embedding")} DESC, r.vec_id ASC) AS BIGINT) AS rank
              | FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id != r.vec_id)
              |WHERE rank <= 5""".stripMargin))
  )
}

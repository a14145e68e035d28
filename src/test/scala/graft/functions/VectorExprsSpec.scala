package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.queries.VectorQueries

/** Bit-parity of the native vector expressions against the interpreted
  * HOF forms (which the DuckDB oracles mirror) — on the REAL embedding
  * data, exact double equality, not a tolerance. */
class VectorExprsSpec extends SparkSpec {

  test("native cosine ≡ HOF cosine bit-exactly on real embeddings") {
    val e = Tables(spark, sf0001, "embeddings").limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(500)
    val diff = pairs.select(
      VectorQueries.cosine(col("a"), col("b")).as("n"),
      VectorQueries.cosineHof(col("a"), col("b")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0, s"$diff pairs differ between native and HOF cosine")
  }

  test("ragged vector pairs are null in both native and HOF cosine") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    val r = df.select(
      VectorQueries.cosine(col("a"), col("b")).as("n"),
      VectorQueries.cosineHof(col("a"), col("b")).as("h")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1), s"ragged pair must be null: $r")
  }

  test("native lshBucket ≡ HOF lshBucket for banded offsets") {
    val e = Tables(spark, sf0001, "embeddings")
    (0 until 2).foreach { band =>
      val diff = e.select(
        VectorQueries.lshBucket(col("embedding"), 8, band * 8).as("n"),
        VectorQueries.lshBucketHof(col("embedding"), 8, band * 8).as("h"))
        .filter(col("n") =!= col("h")).count()
      assert(diff == 0, s"band $band: $diff buckets differ")
    }
  }
}

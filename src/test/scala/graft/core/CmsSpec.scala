package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CmsSpec extends SparkSpec {
  import spark.implicits._

  // skewed long corpus: key k appears k+1 times, k = 0..99 (5050 rows)
  private def skewed = spark.range(0, 100)
    .select(explode(sequence(lit(0), col("id"))).as("ord"), col("id").as("k"))
    .select(col("k"))

  test("never underestimates; overestimate bounded by eps·N") {
    val corpus = skewed
    val sketch = corpus.agg(Cms.agg(col("k")).as("cms"))
    val exact = corpus.groupBy("k").agg(count(lit(1)).as("n"))
    val checked = exact
      .withColumn("est", Cms.estimate(sketch, col("k")))
      .select(
        sum(when(col("est") < col("n"), 1L).otherwise(0L)).as("under"),
        // eps=0.001, N=5050 → bound ~5·depth margin; 3·eps·N ≈ 15
        sum(when(col("est") > col("n") + lit(16L), 1L).otherwise(0L)).as("over"))
      .head()
    assert(checked.getLong(0) === 0L, "CMS underestimated a key")
    assert(checked.getLong(1) === 0L, "CMS overestimate out of bounds")
  }

  test("string keys probe with the agg's own UTF-8 encoding") {
    val words = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val df = words.toDF("w")
    val sketch = df.agg(Cms.agg(col("w")).as("cms"))
    val got = df.distinct()
      .withColumn("est", Cms.estimate(sketch, col("w")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("alpha") >= 40L && got("alpha") <= 41L)
    assert(got("beta") >= 7L && got("beta") <= 8L)
    assert(got("gamma") >= 1L && got("gamma") <= 2L)
  }

  test("null items estimate null; absent keys stay near zero") {
    val df = skewed
    val sketch = df.agg(Cms.agg(col("k")).as("cms"))
    val r = spark.range(1).select(
      Cms.estimate(sketch, lit(null).cast("long")).as("e_null"),
      Cms.estimate(sketch, lit(123456L)).as("e_absent")).head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) <= 16L) // only collision mass
  }

  test("SQL surface: cms_agg + cms_estimate via scalar subquery") {
    graft.GraftSqlFunctions.register(spark)
    skewed.createOrReplaceTempView("cms_corpus")
    val est99 = spark.sql(
      """SELECT cms_estimate((SELECT cms_agg(k) FROM cms_corpus), 99L)"""
    ).head().getLong(0)
    assert(est99 >= 100L && est99 <= 116L, s"est99 = $est99")
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** v17's JL projection: the native expression must match the
  * interpreted HOF fold bit-exactly (the DuckDB oracle mirrors the
  * HOF), and the projection must actually behave like a JL map on the
  * real embeddings — pairwise squared distances preserved within a
  * loose distortion band, mean ratio near 1. Everything here is
  * deterministic (fixed data, fixed sign matrix), so the bounds are
  * stable, not flaky. */
class RandomProjectSpec extends SparkSpec {

  test("native random_project ≡ HOF fold bit-exactly on real embeddings") {
    val e = Tables(spark, sf0001, "embeddings")
    val diff = e.select(
      graft.functions.VectorExprs
        .random_project(col("embedding"), VectorQueries.RP_OUT).as("n"),
      VectorQueries.randomProjectHof(col("embedding")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0, s"$diff vectors differ between native and HOF projection")
  }

  test("pairwise distances survive 64→16 within JL distortion bounds") {
    val proj = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorExprs
          .random_project(col("embedding"), VectorQueries.RP_OUT).as("p"))
      .limit(40).cache()
    def d2(a: String, b: String) = aggregate(
      zip_with(col(a), col(b), (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val pairs = proj.select(col("vec_id").as("ai"), col("embedding").as("ae"),
        col("p").as("ap"))
      .crossJoin(proj.select(col("vec_id").as("bi"), col("embedding").as("be"),
        col("p").as("bp")))
      .filter(col("ai") < col("bi"))
      .select((d2("ap", "bp") / d2("ae", "be")).as("ratio"))
      .filter(col("ratio").isNotNull)
    // near-duplicate vectors make individual ratios unstable (tiny
    // denominators), so the JL claim is about the BULK: median near 1,
    // central 80% inside a k=16-sized distortion band, mean unbiased
    val q = pairs.stat.approxQuantile("ratio", Array(0.1, 0.5, 0.9), 0.0)
    val mean = pairs.agg(avg("ratio")).collect()(0).getDouble(0)
    assert(q(1) > 0.6 && q(1) < 1.6, s"median ratio ${q(1)} not ~1")
    assert(q(0) > 0.2 && q(2) < 2.5,
      s"central 80% distortion out of band: [${q(0)}, ${q(2)}]")
    assert(mean > 0.7 && mean < 1.4, s"mean ratio $mean not ~1")
  }
}

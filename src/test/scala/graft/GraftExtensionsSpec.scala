package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextHashExprs, VectorExprs}

/** SQL-function registration: the same native expressions the gated
  * queries use must be reachable from plain spark.sql, producing
  * bit-identical results to the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API bit-for-bit") {
    GraftSqlFunctions.register(spark)
    val docs = core.Tables(spark, sf0001, "documents").limit(50).cache()
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT doc_id,
        |  shingle_minhash(token_hashes(text), 3, 8) AS sig,
        |  simhash(token_hashes(text), 24) AS sh,
        |  text_profile(text) AS prof
        |FROM ext_docs""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      TextHashExprs.shingle_minhash(TextHashExprs.token_hashes(col("text")), 3, 8).as("sig"),
      TextHashExprs.simhash_native(TextHashExprs.token_hashes(col("text")), 24).as("sh"),
      graft.functions.TextProfileExprs.text_profile(col("text")).as("prof"))
    assert(viaSql.except(viaCol).isEmpty && viaCol.except(viaSql).isEmpty)

    val e = core.Tables(spark, sf0001, "embeddings").limit(20).cache()
    e.createOrReplaceTempView("ext_emb")
    val cosSql = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS c,
        |  lsh_bucket(embedding, 8, 0) AS b FROM ext_emb""".stripMargin)
    val cosCol = e.select(col("vec_id"),
      VectorExprs.cosine_native(col("embedding"), col("embedding")).as("c"),
      VectorExprs.lsh_bucket(col("embedding"), 8, 0).as("b"))
    assert(cosSql.except(cosCol).isEmpty && cosCol.except(cosSql).isEmpty)

    val ts = spark.sql("SELECT parse_any_ts('3/15/2016') AS t").collect().head
    assert(ts.get(0).toString.startsWith("2016-03-15"))
    docs.unpersist(); e.unpersist()
  }

  test("non-literal sizing arguments are rejected with a clear error") {
    GraftSqlFunctions.register(spark)
    // self-contained view: no ordering dependency on the previous test
    core.Tables(spark, sf0001, "documents").limit(5)
      .createOrReplaceTempView("ext_docs_nonlit")
    val e = intercept[Exception] {
      spark.sql("SELECT simhash(token_hashes('x'), doc_id) FROM ext_docs_nonlit").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")),
      e.getMessage)
  }

  test("extensions class injects the same function set") {
    // the injection list and the runtime list are the same `all` —
    // assert the class instantiates and covers every name
    val names = GraftSqlFunctions.all.map(_._1)
    assert(names.size == 13 && names.distinct.size == 13)
    new GraftExtensions() // constructible via spark.sql.extensions
  }
}

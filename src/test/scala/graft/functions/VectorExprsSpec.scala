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

  test("native dot ≡ HOF fold(zip_with) bit-exactly, incl. a double side") {
    val e = Tables(spark, sf0001, "embeddings").limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(500)
      .withColumn("bd", transform(col("b"), x => x.cast("double")))
    val diff = pairs.select(
      graft.functions.VectorExprs.dot_native(col("a"), col("b")).as("n"),
      graft.functions.VectorExprs.dot_native(col("a"), col("bd")).as("nd"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("h"))
      .filter(col("n") =!= col("h") || col("nd") =!= col("h")).count()
    assert(diff == 0, s"$diff pairs differ between native and HOF dot")
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

  test("native nearest_centroid ≡ HOF when-chain (offsets + tie order)") {
    val e = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dSub = 8
    // real codebook from the deterministic fit, on a middle subspace
    val centers = VectorQueries.kmeansFit(
      e.select(col("vec_id"),
        slice(col("embedding"), 2 * dSub + 1, dSub).as("embedding")), 16, 2)
    val diff = e.select(
      VectorExprs.nearest_centroid(col("embedding"), centers, dSub, 2 * dSub).as("n"),
      VectorQueries.assignCellExpr(
        slice(col("embedding"), 2 * dSub + 1, dSub), centers).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0, s"$diff assignments differ between native and HOF")
    // duplicated centroid: both must keep the smaller cell id
    val dup = Seq(0, 1).map(j => (j, centers.head._2))
    val ties = e.limit(20).select(
      VectorExprs.nearest_centroid(col("embedding"), dup, dSub, 2 * dSub).as("n"))
      .collect().map(_.getLong(0)).toSet
    assert(ties == Set(0L), s"tie must keep cell 0, got $ties")
  }

  test("native centroid_dist ≡ HOF sqDist fold for every code") {
    val e = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dSub = 8
    val centers = VectorQueries.kmeansFit(
      e.select(col("vec_id"),
        slice(col("embedding"), 1, dSub).as("embedding")), 16, 2)
    val hof = centers.map { case (j, c) =>
      VectorQueries.sqDistHof(slice(col("embedding"), 1, dSub), c).as(s"h$j")
    }
    val native = centers.map { case (j, _) =>
      VectorExprs.centroid_dist(col("embedding"), lit(j.toLong), centers, dSub, 0).as(s"n$j")
    }
    val bad = e.limit(100).select(hof ++ native: _*)
      .filter(centers.map { case (j, _) =>
        col(s"h$j") =!= col(s"n$j") }.reduce(_ || _)).count()
    assert(bad == 0, s"$bad rows have a native/HOF distance mismatch")
  }

  test("adc_direct ≡ pq_lut + adc_lut bit-exactly (the fused serving shape)") {
    // the serving panel broadcasts the float residual and the fused
    // ADC re-derives each candidate's distance straight off it — the
    // values must be the exact doubles the materialized-LUT
    // composition produced (same left folds, same s-order summation),
    // including sparse books (Lloyd drops) and the unknown-code
    // MaxValue contribution
    val e = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dim = 64; val m = 8; val dSub = dim / m
    val books = (0 until m).map { s =>
      VectorQueries.kmeansFit(
        e.select(col("vec_id"),
          slice(col("embedding"), s * dSub + 1, dSub).as("embedding")), 4, 2)
    }
    val k = books.map(_.size).max
    val rows = e.limit(100)
      .select(col("vec_id").cast("long").as("q_id"),
        col("embedding").as("qres"),
        array((0 until m).map(s =>
          pmod(col("vec_id") + lit(s), lit(k)).cast("byte")): _*).as("pq"))
      .repartition(2)
    val diff = rows.select(
        VectorExprs.adc_lut(VectorExprs.pq_lut(col("qres"), books),
          col("pq"), books).as("a"),
        VectorExprs.adc_direct(col("qres"), col("pq"), books).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0, s"$diff rows differ between lut-then-adc and adc_direct")
  }

  test("adc_direct ≡ pq_lut + adc_lut under adversarial books and codes (property)") {
    // the fused path must replicate the scan's EXACT match semantics,
    // not just the common case: the scan compares each stored byte
    // SIGNED against the book id, so ids past 127 match no byte,
    // negative ids match the byte that wraps to them, duplicate ids
    // resolve to the FIRST position, sparse padding (Long.MinValue)
    // never matches, and every unmatched code contributes MaxValue.
    // Random books across {-300‥300} with duplicates, codes across the
    // full byte range, signed residuals — raw-bit double equality.
    import org.scalacheck.Gen
    import spark.implicits._
    val genCase = for {
      m <- Gen.choose(1, 4)
      dSub <- Gen.choose(1, 4)
      books <- Gen.listOfN(m, for {
        ksz <- Gen.choose(1, 5)
        ids <- Gen.listOfN(ksz, Gen.frequency(
          3 -> Gen.choose(0, 15), 2 -> Gen.choose(100, 300),
          2 -> Gen.choose(-300, -1), 1 -> Gen.choose(16, 127)))
        vecs <- Gen.listOfN(ksz, Gen.listOfN(dSub, Gen.choose(-10.0, 10.0)))
      } yield ids.zip(vecs).map { case (i, v) => (i, v.toArray) })
      rows <- Gen.listOfN(8, for {
        qres <- Gen.listOfN(m * dSub, Gen.choose(-8.0, 8.0).map(_.toFloat))
        // half the codes are drawn to COLLIDE with a book id's wrapped
        // byte (that's where masked-vs-signed lookup semantics split);
        // the rest roam the full byte range for the unknown-code path
        codes <- Gen.sequence[List[Byte], Byte]((0 until m).toList.map(s =>
          Gen.oneOf(
            Gen.choose(-128, 127).map(_.toByte),
            Gen.oneOf(books(s)).map(e => (e._1 & 0xff).toByte))))
      } yield (qres, codes))
    } yield (books: Seq[Seq[(Int, Array[Double])]], rows)
    val params = Gen.Parameters.default
    val cases = Iterator.iterate(org.scalacheck.rng.Seed(4242L))(_.next)
      .map(seed => genCase.apply(params, seed))
      .flatten.take(25).toSeq
    cases.zipWithIndex.foreach { case ((books, rows), ci) =>
      val out = rows.toDF("qres", "pq").select(
        VectorExprs.adc_lut(VectorExprs.pq_lut(col("qres"), books),
          col("pq"), books).as("a"),
        VectorExprs.adc_direct(col("qres"), col("pq"), books).as("b"))
        .collect()
      out.zipWithIndex.foreach { case (r, ri) =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"case $ci row $ri: lut-then-adc ${r.getDouble(0)} vs " +
            s"adc_direct ${r.getDouble(1)} (books ids " +
            s"${books.map(_.map(_._1)).mkString(";")})")
      }
    }
  }
}

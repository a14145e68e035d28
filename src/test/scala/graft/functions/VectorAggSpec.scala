package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.core.{Det, Tables}

/** VecMeanAgg determinism pin: the native per-dimension decimal mean
  * must be BIT-IDENTICAL to the posexplode → groupBy(cell, pos) →
  * Det.davg shape every k-means oracle mirrors — the whole point of
  * the aggregate is removing the dim× row blow-up WITHOUT perturbing
  * a single low bit of the centers the repair gates hash on. */
class VectorAggSpec extends SparkSpec {

  private def explodedMeans(assigned: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), Double] =
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("cell"), col("pos").cast(LongType).as("pos"), col("x"))
      .groupBy(col("cell"), col("pos"))
      .agg(Det.davg(col("x")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("vec_mean ≡ posexplode + Det.davg bit-for-bit on the fixture") {
    val e = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val centers = graft.queries.VectorQueries.kmeansFit(e, 4, 2)
    val assigned = graft.queries.VectorQueries.kmeansAssign(e, centers)
    val viaAgg = graft.queries.VectorQueries.refreshedCenters(assigned)
    val viaExplode = explodedMeans(assigned)
    assert(viaAgg.nonEmpty)
    viaAgg.foreach { case (cell, center) =>
      center.zipWithIndex.foreach { case (c, pos) =>
        val ref = viaExplode((cell.toLong, pos.toLong))
        assert(java.lang.Double.doubleToRawLongBits(c) ==
          java.lang.Double.doubleToRawLongBits(ref),
          s"cell $cell pos $pos: $c != $ref (bit mismatch)")
      }
    }
    assert(viaAgg.map(_._1).toSet ==
      viaExplode.keys.map(_._1.toInt).toSet, "same cell set")
  }

  test("vec_mean survives partial aggregation and merge (repartitioned input)") {
    val e = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"), (col("vec_id") % 3).as("cell"))
    def means(parts: Int) = e.repartition(parts, col("vec_id"))
      .groupBy(col("cell"))
      .agg(VecMeanExprs.vec_mean(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val one = means(1)
    val many = means(17)
    assert(one.nonEmpty && one == many,
      "decimal sums are exact, so partition order/count must not matter")
  }

  test("vec_mean handles null arrays and adversarial floats") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.0f, Float.MinPositiveValue)), // subnormal rounds to 0 at scale 6
      (0L, Seq(-1.0f, 3.25f)),
      (1L, null.asInstanceOf[Seq[Float]])
    ).toDF("cell", "embedding")
    val out = df.groupBy(col("cell"))
      .agg(VecMeanExprs.vec_mean(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isEmpty, "all-null cell yields a null mean")
    assert(out(0L).isDefined)
  }
}

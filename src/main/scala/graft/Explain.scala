package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Plan inspector: prints the formatted physical plan of the named
  * queries (or the bench set) so scan pushdown, broadcast choices and
  * WholeStageCodegen spans can be audited per round. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Registry.benchQueries.map(_.name)
    names.foreach { n =>
      println(s"\n═══ $n ═══")
      Registry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

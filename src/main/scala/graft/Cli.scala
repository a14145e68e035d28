package graft

import org.apache.spark.sql.SparkSession

import graft.sql.{GraftSession, Parser}
import graft.sources.Sinks

/** CLI entry (reference main.go:149-168): run dialect queries against
  * CSV/parquet tables and print/save CSV results.
  *
  * Usage:
  *   runMain graft.Cli -c "select ... from table ..." [--dir DIR] [--save PATH]
  *   echo "select ..." | runMain graft.Cli [--dir DIR]
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var query: Option[String] = None
    var dir: Option[String] = None
    var save: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-c" => query = Some(args(i + 1)); i += 2
        case "--dir" => dir = Some(args(i + 1)); i += 2
        case "--save" => save = Some(args(i + 1)); i += 2
        case other => sys.error(s"unknown argument: $other")
      }
    }
    val q = query.getOrElse {
      // piped stdin (reference caps at 10k bytes, main.go:164)
      val buf = new Array[Char](10000)
      val n = Console.in.read(buf)
      if (n <= 0) sys.error("no query given (-c or stdin)") else new String(buf, 0, n)
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val session = new GraftSession(spark, dir)
    val statements = Parser.splitStatements(q)
    val results = statements.map(session.sql)
    save match {
      case Some(base) =>
        Sinks.savePaths(base, results.size).zip(results).foreach {
          case (p, df) => Sinks.saveCsv(df, p); System.err.println(s"saved $p")
        }
      case None =>
        results.foreach(Sinks.printCsv(_))
    }
    spark.stop()
  }
}

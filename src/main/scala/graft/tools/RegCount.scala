package graft.tools
object RegCount {
  def main(args: Array[String]): Unit = {
    val all = graft.queries.Registry.all
    println("ALLSIZE=" + all.size)
    println("DUPS=" + all.groupBy(_.name).filter(_._2.size > 1).keys.toSeq.sorted.mkString(","))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/regnames.txt"),
      all.map(_.name).sorted.mkString("\n"))
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Properties of the t34 chunker (TextQueries.docChunks) on
  * constructed token counts around every boundary: empty, below one
  * window, exactly one window, one over, exact second boundary, one
  * over it, and a long tail. */
class ChunkingSpec extends SparkSpec {

  private def docsOf(sizes: Seq[Int]) = {
    import spark.implicits._
    sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, (0 until n).map(j => s"w$j").mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("chunk ids are dense and windows tile with exact stride/overlap") {
    val sizes = Seq(0, 1, 63, 64, 65, 112, 113, 200)
    val out = TextQueries.docChunks(docsOf(sizes), 64, 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    // token-less doc emits nothing
    assert(!out.contains(0L))
    sizes.zipWithIndex.filter(_._1 > 0).foreach { case (n, i) =>
      val chunks = out(i.toLong).sortBy(_._2)
      val expected = if (n <= 64) 1 else 1 + ((n - 64) + 47) / 48
      assert(chunks.length == expected, s"doc of $n tokens: ${chunks.length} chunks")
      assert(chunks.map(_._2).toSeq == (0L until expected.toLong),
        "chunk ids must be dense from 0")
      chunks.foreach { case (_, c, text, len) =>
        val start = (c * 48).toInt
        val want = (start until math.min(start + 64, n)).map(j => s"w$j")
        assert(text == want.mkString(" "),
          s"doc $n chunk $c: window must start at $start")
        assert(len == want.length)
      }
      // every token is covered and the last chunk reaches the end
      val (_, lastC, _, lastLen) = chunks.last
      assert(lastC * 48 + lastLen == n, "last chunk must end at the last token")
    }
  }

  test("overlap 0 partitions the token sequence exactly") {
    val out = TextQueries.docChunks(docsOf(Seq(20)), 8, 0).collect()
      .sortBy(_.getLong(1))
    assert(out.map(_.getLong(3)).sum == 20, "disjoint chunks must sum to n")
    val reconstructed = out.map(_.getString(2)).mkString(" ")
    assert(reconstructed == (0 until 20).map(j => s"w$j").mkString(" "))
  }

  test("statement-surface windows (32/8) obey the same boundaries") {
    val out = TextQueries.docChunks(docsOf(Seq(33)), 32, 8).collect()
    // 33 tokens, stride 24: chunks at 0..31 and 24..32 → 2 chunks
    assert(out.length == 2)
    assert(out.map(_.getLong(3)).toSet == Set(32L, 9L))
  }
}

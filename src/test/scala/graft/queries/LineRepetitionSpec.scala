package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** t26's duplicate-line math can't fire on the gate corpus (no doc
  * repeats a line), so exercise it on a synthetic boilerplate page:
  * exact fractions, empty-line filtering, and the all-unique case. */
class LineRepetitionSpec extends SparkSpec {

  test("duplicate-line fractions are exact on a boilerplate page") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_linerep").toFile
    dir.deleteOnExit()
    // doc 0: nav bar line x3 (len 7), body lines unique (len 5 each),
    //        blank + spaces-only lines must be ignored
    // doc 1: all lines unique
    val docs = Seq(
      (0L, "nav bar\nbody1\n\nnav bar\n   \nbody2\nnav bar", "en", "s", 40L),
      (1L, "alpha\nbeta", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").toString)

    val got = Registry.queries("t26_line_repetition")(spark, dir.toString)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

    // doc 0: 5 non-empty lines, 3 distinct -> dup_line_frac = 2/5;
    // chars: nav bar 3*7=21 dup, body 5+5=10 unique -> 21/31
    assert(got(0) == ((0L, 5L, 2.0 / 5.0, 21.0 / 31.0)), got(0).toString)
    // doc 1: nothing repeats
    assert(got(1) == ((1L, 2L, 0.0, 0.0)), got(1).toString)
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** The curation pipeline as ONE composed DataFrame program — the
  * point of having every stage be a lazy query builder: quality
  * filter → canonical-dedup keep → benchmark decontamination → hash
  * split, over the same corpus, in a single plan Catalyst optimizes
  * end-to-end (shared scans, pushed filters — not four materialized
  * passes). The oracle composes the same stages' DuckDB SQL as CTEs,
  * so the gate checks the COMPOSITION, not just each stage alone.
  *
  * Corpus = doc_id ≥ 5 (0-4 are the stand-in benchmark set t09
  * guards against). A doc survives iff its quality score clears 0.5,
  * it is its dedup cluster's canonical keeper, and it shares no
  * 3-gram shingle with the benchmark; survivors get the reproducible
  * train/val/test hash split.
  */
object PipelineQueries {

  private def q(name: String): Q =
    (DedupQueries.all ++ TextQueries.all).find(_.name == name)
      .getOrElse(sys.error(s"pipeline stage $name missing"))

  val all: Seq[Q] = Seq(
    Q("p01_curation_pipeline",
      (s, dir) => {
        val quality = q("t02_quality").build(s, dir)
        val dedup = q("d07_dedup_clusters").build(s, dir)
        val contaminated = q("t09_decontam").build(s, dir)
          .filter(col("n_overlap") > 0).select(col("doc_id"))
        val split = q("t06_train_split").build(s, dir)
        Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
          .filter(col("doc_id") >= 5)
          .join(quality.filter(col("quality") > 0.5), "doc_id")
          .join(dedup.filter(col("keep") === 1).select(col("doc_id")), "doc_id")
          .join(contaminated, Seq("doc_id"), "left_anti")
          .join(split, "doc_id")
          .select(col("doc_id"), col("lang"), col("split"), col("quality"))
      },
      Some {
        def cte(name: String): String = q(name).oracle.get
        s"""WITH dedup AS (${cte("d07_dedup_clusters")}),
           |qual AS (${cte("t02_quality")}),
           |cont AS (${cte("t09_decontam")}),
           |spl AS (${cte("t06_train_split")})
           |SELECT d.doc_id, d.lang, spl.split, qual.quality
           |FROM documents d
           |JOIN qual ON d.doc_id = qual.doc_id
           |JOIN dedup ON d.doc_id = dedup.doc_id
           |JOIN spl ON d.doc_id = spl.doc_id
           |WHERE d.doc_id >= 5 AND qual.quality > 0.5 AND dedup.keep = 1
           |  AND d.doc_id NOT IN (SELECT doc_id FROM cont WHERE n_overlap > 0)""".stripMargin
      })
  )
}

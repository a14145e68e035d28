package graft.queries

import graft.core.Tables
import graft.operators.Multimodal
import graft.queries.{OracleSql => O}

/** Gate for the multimodal plumbing: documents → binary media records →
  * mapPartitions feature extraction. The fake decode is deterministic
  * arithmetic over the payload bytes, so DuckDB can mirror it from the
  * text column (ASCII payloads ⇒ byte fold ≡ char-code fold). */
object MultimodalQueries {
  val all: Seq[Q] = Seq(
    Q("m01_media_features",
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
        Multimodal.extractFeatures(media).toDF()
      },
      Some(s"""SELECT doc_id,
              |CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
              |CAST(strlen(text) AS BIGINT) AS byte_len,
              |strlen(text) % 640 + 1 AS width,
              |strlen(text) % 480 + 1 AS height,
              |CASE WHEN CAST(doc_id % 3 AS INTEGER) = 2 THEN strlen(text) % 30 + 1 ELSE 1 END AS n_frames,
              |${O.tokenHash("text")} AS checksum
              |FROM documents""".stripMargin))
  )
}

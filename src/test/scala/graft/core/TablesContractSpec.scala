package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types.TimestampType

/** Fixture-drift contract: the driver may regenerate /root/testdata
  * with a different parquet writer (round 5 silently moved events.ts
  * from ns-Long to µs TIMESTAMP_NTZ and reddened seven downstream
  * tests). This spec pins the POST-normalization schema contract so
  * the next drift reddens one named test instead.
  */
class TablesContractSpec extends SparkSpec {

  private val fixtureDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d, "events.parquet").exists())

  test("events.ts normalizes to TimestampType in every fixture dir") {
    assert(fixtureDirs.nonEmpty, "no fixture dirs found")
    fixtureDirs.foreach { dir =>
      val dt = Tables(spark, dir, "events").schema("ts").dataType
      assert(dt == TimestampType, s"$dir/events.parquet ts → $dt")
    }
  }

  test("streaming events source schema agrees with the batch read") {
    val dir = fixtureDirs.head
    val batch = Tables(spark, dir, "events").schema
    val stream = graft.streaming.StreamingOps.readEvents(spark, dir).schema
    assert(stream == batch, s"stream $stream != batch $batch")
  }

  test("core table columns present with stable types") {
    val dir = fixtureDirs.head
    val ev = Tables(spark, dir, "events").schema
    Seq("event_id", "ts", "user_id", "event_type", "value").foreach { c =>
      assert(ev.fieldNames.contains(c), s"events missing $c")
    }
    val docs = Tables(spark, dir, "documents").schema
    Seq("doc_id", "text").foreach { c =>
      assert(docs.fieldNames.contains(c), s"documents missing $c")
    }
  }
}

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

  test("relation cache: same-instance on hit, per-call rebuild when disabled") {
    val dir = fixtureDirs.head
    val a = Tables(spark, dir, "nation")
    val b = Tables(spark, dir, "nation")
    assert(a eq b, "unchanged path must serve the cached relation")
    spark.conf.set("spark.graft.relationCache.enabled", "false")
    try {
      val c = Tables(spark, dir, "nation")
      val d = Tables(spark, dir, "nation")
      assert(!(c eq d), "disabled cache must re-resolve per call")
      assert(c.count() == d.count() && c.count() == a.count())
    } finally spark.conf.unset("spark.graft.relationCache.enabled")
  }

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

  // Full post-normalization contract for EVERY fixture table (round-6
  // verdict #8): the exact (column, Spark type) list each gated query
  // family assumes. A driver-side parquet-writer change that the
  // Tables normalization doesn't absorb turns exactly one named row
  // red here, instead of reddening downstream oracle gates.
  private val contract: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      // the tpch date columns read NTZ and every gate normalizes in
      // its own expressions (UTC session tz ⇒ values agree); events.ts
      // alone is pre-normalized to TimestampType by Tables (streaming
      // needs a watermarkable column)
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  contract.toSeq.sortBy(_._1).foreach { case (table, want) =>
    test(s"$table fixture schema matches the post-normalization contract") {
      fixtureDirs.foreach { dir =>
        val got = Tables(spark, dir, table).schema
          .map(f => f.name -> f.dataType.simpleString)
        assert(got == want,
          s"$dir/$table.parquet drifted:\n  got  $got\n  want $want")
      }
    }
  }
}

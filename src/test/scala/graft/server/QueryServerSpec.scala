package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.sql.GraftSession

class QueryServerSpec extends SparkSpec {

  test("POST /query/ runs multi-statement dialect SQL and returns JSON") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query/"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"query":"select count(r_regionkey) as n from region; select top 2 n_name from nation order by n_name asc"}"""))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      val body = resp.body()
      assert(body.contains(""""Status":"ok""""), body)
      assert(body.contains(""""Colnames":["n"]"""), body)
      assert(body.contains(""""Vals":[["5"]]"""), body)          // count → float → "5"
      assert(body.contains(""""Numcols":1"""), body)
      // two entries for two statements
      assert(body.split("\"Query\":").length == 3, body)
    } finally server.stop()
  }

  test("bad query returns error status, not a crash") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query/"))
        .POST(HttpRequest.BodyPublishers.ofString("""{"query":"select r.nosuch from region r"}"""))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body().contains(""""Status":"error"""), resp.body())
    } finally server.stop()
  }

  test("GET /progress/ reports task counts after a query") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      val q = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query/"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"query":"select count(o_orderkey) as n from orders"}""")).build()
      client.send(q, HttpResponse.BodyHandlers.ofString())
      val p = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/progress/"))
        .GET().build()
      val first = client.send(p, HttpResponse.BodyHandlers.ofString())
      assert(first.statusCode() == 200)
      assert(first.body().contains(""""TasksTotal""""), first.body())
      // job-end events arrive on the async listener bus — poll until
      // the finished query's jobs drain rather than racing the bus
      val deadline = System.nanoTime() + 10L * 1000000000L
      var body = first.body()
      while (!body.contains(""""ActiveJobs":0""") && System.nanoTime() < deadline) {
        Thread.sleep(100)
        body = client.send(p, HttpResponse.BodyHandlers.ofString()).body()
      }
      assert(body.contains(""""ActiveJobs":0"""), body)
    } finally server.stop()
  }

  test("two in-flight queries genuinely overlap (per-request session, no single-flight)") {
    import org.apache.spark.sql.functions.{col, udf}
    // a query whose execution provably takes ≥800ms inside a task, so
    // two parallel POSTs must overlap unless the server single-flights
    val slow = udf { (x: Long) => Thread.sleep(800L); x }
    val proto = GraftSession(spark, sf0001)
      .register("slowtab", spark.range(1).repartition(1).select(slow(col("id")).as("v")))
    val server = new QueryServer(proto, port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      def post() = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query/"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"query":"select v from slowtab"}""")).build()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = (1 to 2).map(_ => Future(client.send(post(), HttpResponse.BodyHandlers.ofString()).body()))
      val bodies = Await.result(Future.sequence(fs), 60.seconds)
      bodies.foreach(b => assert(b.contains(""""Status":"ok""""), b))
      assert(server.maxObservedConcurrency >= 2,
        s"queries never overlapped (peak=${server.maxObservedConcurrency})")
    } finally server.stop()
  }

  test("GET /files/ lists directories and queryable files") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      val req = HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/files/?dir=$sf0001")).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      val body = resp.body()
      assert(body.contains(""""Status":"ok""""), body)
      assert(body.contains("region.parquet"), body)
      assert(body.contains(""""Parent":""""), body)
      // non-directory → error status, not a crash
      val bad = client.send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/files/?dir=/no/such/dir")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.body().contains("error"), bad.body())
    } finally server.stop()
  }

  test("concurrent queries stay correct (per-request registry isolation)") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      def post(q: String) = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query/"))
        .POST(HttpRequest.BodyPublishers.ofString(s"""{"query":"$q"}""")).build()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = (1 to 6).map { i =>
        val q = if (i % 2 == 0)
          "select count(r_regionkey) as n from region"
        else
          "select count(n_nationkey) as n from nation"
        Future(client.send(post(q), HttpResponse.BodyHandlers.ofString()).body())
      }
      val bodies = Await.result(Future.sequence(fs), 120.seconds)
      bodies.zipWithIndex.foreach { case (b, idx) =>
        assert(b.contains(""""Status":"ok""""), b)
        val want = if ((idx + 1) % 2 == 0) """"Vals":[["5"]]""" else """"Vals":[["25"]]"""
        assert(b.contains(want), s"request $idx: $b")
      }
    } finally server.stop()
  }

  test("browser row clip: wide result limits to 20000/ncols rows, Clipped set") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query/"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"query":"select * from lineitem"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      val body = resp.body()
      // lineitem sf0.001: ~6000 rows x 11 cols ⇒ showLimit 1818 < rows
      assert(body.contains(""""Clipped":true"""), body.take(300))
      assert(body.contains(""""ShowLimit":1818"""), body.take(300))
      assert(body.contains(""""Numrows":1818"""), body.take(300))
    } finally server.stop()
  }

  test("GET / serves the embedded console; unknown paths 404") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      val root = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(root.statusCode() == 200)
      assert(root.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      assert(root.body().contains("graft console"), root.body().take(200))
      assert(root.body().contains("/query/") && root.body().contains("/progress/"))
      assert(root.body().contains("sortBy"), "grid sort handler must be served")
      val missing = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/nope")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(missing.statusCode() == 404, missing.body())
    } finally server.stop()
  }

  test("POST /stop/ responds (cancellation path wired)") {
    val server = new QueryServer(GraftSession(spark, sf0001), port = 0)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/stop/"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.body().contains("cancelled"))
    } finally server.stop()
  }
}

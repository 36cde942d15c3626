package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

class CsvSourcesSpec extends SparkSpec {
  import spark.implicits._

  /** In-process server answering HEAD with the given Last-Modified header
    * (None = no header), counting probes — real sockets, zero egress.
    */
  private def withHeadServer(lastModified: () => Option[String],
      heads: java.util.concurrent.atomic.AtomicInteger = new java.util.concurrent.atomic.AtomicInteger)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ref.xlsx", (ex: HttpExchange) => {
      if (ex.getRequestMethod == "HEAD") heads.incrementAndGet()
      lastModified().foreach(v => ex.getResponseHeaders.set("Last-Modified", v))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/ref.xlsx")
    finally server.stop(0)
  }

  test("S6: stamp cache refetches only when the stamp changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache").toString
    var loads = 0
    def loadRef() = { loads += 1; Seq(("CISO", "x"), ("ERCO", "y")).toDF("code", "name") }

    val first = CsvSources.cachedByStamp(spark, dir, "Mon, 01 Jan 2026")(loadRef())
    assert(first.count() == 2 && loads == 1)
    // same stamp: served from the parquet cache, upstream not touched
    CsvSources.cachedByStamp(spark, dir, "Mon, 01 Jan 2026")(loadRef()).count()
    assert(loads == 1)
    // changed Last-Modified: refetch
    CsvSources.cachedByStamp(spark, dir, "Tue, 02 Jan 2026")(loadRef()).count()
    assert(loads == 2)
  }

  test("S6: HEAD probe reads the Last-Modified header off the wire") {
    withHeadServer(() => Some("Mon, 05 Jan 2026 10:00:00 GMT")) { url =>
      assert(CsvSources.lastModifiedStamp(url) == "Mon, 05 Jan 2026 10:00:00 GMT")
    }
    withHeadServer(() => None) { url =>
      assert(CsvSources.lastModifiedStamp(url) == "")
    }
  }

  test("S6 end-to-end: no re-read while upstream unchanged, refetch on header change") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_lm").toString
    var header = "Mon, 05 Jan 2026 10:00:00 GMT"
    val heads = new java.util.concurrent.atomic.AtomicInteger
    withHeadServer(() => Some(header), heads) { url =>
      var loads = 0
      def loadRef() = { loads += 1; Seq(("CISO", "x"), ("ERCO", "y")).toDF("code", "name") }
      assert(CsvSources.cachedByLastModified(spark, dir, url)(loadRef()).count() == 2)
      assert(loads == 1 && heads.get() == 1)
      // unchanged upstream: probe fires, load does not
      CsvSources.cachedByLastModified(spark, dir, url)(loadRef()).count()
      assert(loads == 1 && heads.get() == 2)
      // upstream publishes a new workbook: probe sees it, load refires
      header = "Tue, 06 Jan 2026 09:00:00 GMT"
      CsvSources.cachedByLastModified(spark, dir, url)(loadRef()).count()
      assert(loads == 2 && heads.get() == 3)
    }
  }

  test("S5+S6 production path: one probe guards both reference tables") {
    val fixture = getClass.getResource("/fixtures/eia930/reference.xlsx").getPath
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_ref").toString
    var header = "Mon, 05 Jan 2026 10:00:00 GMT"
    val gets = new java.util.concurrent.atomic.AtomicInteger
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ref.xlsx", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Last-Modified", header)
      if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(200, -1)
      else {
        gets.incrementAndGet()
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/ref.xlsx"
      val (ba, es) = CsvSources.referenceTablesFromUrl(spark, dir, url)
      assert(ba.count() == 4 && es.count() == 4)
      assert(gets.get() == 2, "first run downloads the workbook (once per sheet)")
      // unchanged upstream: both tables served from parquet, zero downloads
      val (ba2, es2) = CsvSources.referenceTablesFromUrl(spark, dir, url)
      assert(ba2.count() == 4 && es2.count() == 4)
      assert(gets.get() == 2)
      // upstream moved: workbook re-read
      header = "Tue, 06 Jan 2026 09:00:00 GMT"
      CsvSources.referenceTablesFromUrl(spark, dir, url)._1.count()
      assert(gets.get() == 4)
    } finally server.stop(0)
  }

  test("S6: a server with no Last-Modified gives no change signal — every run refetches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_nolm").toString
    withHeadServer(() => None) { url =>
      var loads = 0
      def loadRef() = { loads += 1; Seq(("CISO", "x")).toDF("code", "name") }
      CsvSources.cachedByLastModified(spark, dir, url)(loadRef()).count()
      CsvSources.cachedByLastModified(spark, dir, url)(loadRef()).count()
      assert(loads == 2, "staleness can't be ruled out without a header")
    }
  }
}

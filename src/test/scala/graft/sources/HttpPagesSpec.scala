package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** HttpPages against an in-process JDK HttpServer: real sockets, real
  * retries, zero egress.
  */
class HttpPagesSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private def withServer(handler: HttpExchange => Unit)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", (ex: HttpExchange) => { handler(ex); ex.close() })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/data")
    finally server.stop(0)
  }

  private def reply(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getQuery).flatMap(_.split("&")
      .map(_.split("=", 2)).collectFirst { case Array(k, v) if k == key => v })

  test("serves fixture pages by offset through the real pagination cycler") {
    val pagesDir = fixture("eia930/fuel")
    withServer { ex =>
      val off = queryParam(ex, "offset").get.toInt
      val p = java.nio.file.Paths.get(pagesDir, s"page${off / 12}.json")
      if (java.nio.file.Files.exists(p)) reply(ex, 200, java.nio.file.Files.readString(p))
      else reply(ex, 200, """{"response":{"data":[]}}""")
    } { url =>
      val src = new HttpPages(url, Map("api_key" -> "test"), pageSize = 12)
      val viaHttp = EnvelopeJson.fetchUntilEmpty(src, 12)
      val viaFiles = EnvelopeJson.fetchUntilEmpty(new EnvelopeJson.FixturePages(pagesDir, 12), 12)
      // same page bodies arrive over the wire as from disk (plus the served
      // empty terminator page the fixture signals by file absence)
      assert(viaHttp.init == viaFiles)
      assert(viaHttp.last.contains("\"data\":[]"))
    }
  }

  test("retries 5xx with exponential backoff, then succeeds") {
    val calls = new AtomicInteger(0)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    withServer { ex =>
      if (calls.incrementAndGet() <= 2) reply(ex, 503, "busy")
      else reply(ex, 200, """{"response":{"data":[{"period":"p"}]}}""")
    } { url =>
      val src = new HttpPages(url, Map.empty, retries = 5,
        backoffMillis = 200, sleeper = sleeps += _)
      val page = src.fetch(0)
      assert(page.exists(_.contains("period")))
      assert(calls.get() == 3)
      assert(sleeps.toSeq == Seq(200L, 400L)) // exponential, per failed attempt
    }
  }

  test("gives up after the retry budget with the offset in the error") {
    withServer(ex => reply(ex, 500, "down")) { url =>
      val src = new HttpPages(url, Map.empty, retries = 2,
        backoffMillis = 1, sleeper = _ => ())
      val e = intercept[RuntimeException](src.fetch(6000))
      assert(e.getMessage.contains("after 3 attempt(s)"))
      assert(e.getMessage.contains("offset 6000"))
    }
  }

  test("non-retryable status (404) throws immediately, no retries") {
    val calls = new AtomicInteger(0)
    withServer { ex => calls.incrementAndGet(); reply(ex, 404, "nope") } { url =>
      val src = new HttpPages(url, Map.empty, retries = 5, sleeper = _ => ())
      val e = intercept[RuntimeException](src.fetch(0))
      assert(e.getMessage.contains("HTTP 404") && calls.get() == 1)
    }
  }

  test("pagination params are offset/length plus the fixed param set") {
    val src = new HttpPages("http://x/data", Map("api_key" -> "k", "data[0]" -> "value"), pageSize = 5000)
    val q = src.pageUri(10000).getRawQuery
    assert(q.contains("offset=10000") && q.contains("length=5000"))
    assert(q.contains("api_key=k") && q.contains("data%5B0%5D=value"))
  }
}

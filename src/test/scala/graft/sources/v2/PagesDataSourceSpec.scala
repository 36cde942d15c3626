package graft.sources.v2

import graft.SparkSpec
import graft.sources.{EnvelopeJson, Schemas}
import graft.sources.EnvelopeJson.FixturePages
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.ExplainMode

class PagesDataSourceSpec extends SparkSpec {

  private def pagesDir: String =
    getClass.getResource("/fixtures/eia930/fuel").getPath

  private def readV2 = spark.read.format("graft-pages")
    .schema(Schemas.fuelTypeDataRow).load(pagesDir)

  test("one partition per page; rows equal the driver-side envelope parse") {
    val v2 = readV2
    assert(v2.rdd.getNumPartitions == 4) // 4 page files -> 4 parallel partitions
    val viaDriver = EnvelopeJson.parsePages(spark,
      EnvelopeJson.fetchUntilEmpty(new FixturePages(pagesDir, 12), 12),
      Schemas.fuelTypeDataRow)
    val a = v2.collect().map(_.toSeq).toSet
    val b = viaDriver.collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("http mode: plans one partition per page from response.total; executors fetch") {
    import java.util.concurrent.ConcurrentHashMap
    val hits = new ConcurrentHashMap[Int, Integer]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", { ex =>
      val off = ex.getRequestURI.getQuery.split("&").map(_.split("=", 2))
        .collectFirst { case Array("offset", v) => v.toInt }.get
      hits.merge(off, 1, (a, b) => a + b)
      val rows = (off until math.min(off + 2, 5))
        .map(i => s"""{"period":"p$i","value":"$i"}""").mkString(",")
      val body = s"""{"response":{"total":"5","data":[$rows]}}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data"
      val schema = new org.apache.spark.sql.types.StructType()
        .add("period", "string").add("value", "string")
      val df = spark.read.format("graft-pages").schema(schema)
        .option("url", url).option("pageSize", "2").option("param.api_key", "k")
        .load()
      assert(df.rdd.getNumPartitions == 3) // ceil(5/2) pages, fetched in parallel
      assert(df.collect().map(_.getString(0)).sorted.toSeq ==
        Seq("p0", "p1", "p2", "p3", "p4"))
      // the planning probe's body rides along in partition 0, so within one
      // query execution page 0 is fetched exactly once; the two actions above
      // (getNumPartitions, collect) are two executions -> at most two probes
      assert(hits.get(0) <= 2, s"offset 0 fetched ${hits.get(0)} times")
      assert(hits.get(2) == 1 && hits.get(4) == 1)
    } finally server.stop(0)
  }

  test("non-string schema fields fail fast with an actionable message") {
    val badSchema = new org.apache.spark.sql.types.StructType()
      .add("period", "string").add("value", "double")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-pages").schema(badSchema).load(pagesDir).collect()
    }
    assert(e.getMessage.contains("value: double"))
  }

  test("column pruning pushes into the source (reference's data[n] params)") {
    val pruned = readV2.select("period", "value")
    val plan = pruned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("pruned to [period,value]"), plan)
    assert(pruned.collect().forall(_.length == 2))
  }

  test("period filters push into the source and are enforced row-level") {
    import org.apache.spark.sql.functions.col
    val all = readV2.select("period").collect().map(_.getString(0)).sorted
    val cutoff = all(all.length / 2)

    val filtered = readV2.filter(col("period") >= cutoff)
    val plan = filtered.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the scan reports the pushed bound, and no residual Filter node remains
    assert(plan.contains(s"period >= $cutoff"), plan)
    assert(!plan.contains("Filter ("), plan)
    assert(filtered.select("period").collect().map(_.getString(0)).sorted.toSeq ==
      all.filter(_ >= cutoff).toSeq)

    // strict + upper-bound forms, and filtering on a non-selected column
    val strict = readV2.filter(col("period") > cutoff).select("value")
    assert(strict.count() == readV2.filter(col("period") > cutoff).count())
    val upper = readV2.filter(col("period") < cutoff)
    assert(upper.select("period").collect().map(_.getString(0)).sorted.toSeq ==
      all.filter(_ < cutoff).toSeq)
  }

  test("limit pushdown: fixture mode bounds reader output; http mode plans fewer pages") {
    import org.apache.spark.sql.functions.col
    // fixture mode: readers stop early, Spark applies the exact limit
    val limited = readV2.limit(3)
    val plan = limited.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("limit 3"), plan)
    assert(limited.count() == 3)
    // limit + filter composes (filter makes the page-cap unsafe, so the
    // limit only bounds per-reader output)
    assert(readV2.filter(col("period") > "").limit(2).count() == 2)

    // http mode: only the pages the limit needs are fetched
    val offsets = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", { ex =>
      val off = ex.getRequestURI.getQuery.split("&").map(_.split("=", 2))
        .collectFirst { case Array("offset", v) => v.toInt }.get
      offsets.add(off)
      val rows = (off until math.min(off + 2, 10))
        .map(i => s"""{"period":"p$i","value":"$i"}""").mkString(",")
      val body = s"""{"response":{"total":"10","data":[$rows]}}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data"
      val schema = new org.apache.spark.sql.types.StructType()
        .add("period", "string").add("value", "string")
      val df = spark.read.format("graft-pages").schema(schema)
        .option("url", url).option("pageSize", "2").load().limit(3)
      assert(df.count() == 3)
      // 10 rows = 5 pages, but limit 3 needs ceil(3/2) = 2 pages
      assert(offsets.asScala.toSet.subsetOf(Set(0, 2)),
        s"fetched offsets ${offsets.asScala.toSet} — limit did not cap page planning")
    } finally server.stop(0)
  }

  test("count(*) pushdown: answered by the probe's response.total, zero page fetches") {
    val offsets = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", { ex =>
      val off = ex.getRequestURI.getQuery.split("&").map(_.split("=", 2))
        .collectFirst { case Array("offset", v) => v.toInt }.get
      offsets.add(off)
      val rows = (off until math.min(off + 2, 9))
        .map(i => s"""{"period":"p$i","value":"$i"}""").mkString(",")
      val body = s"""{"response":{"total":"9","data":[$rows]}}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data"
      val schema = new org.apache.spark.sql.types.StructType()
        .add("period", "string").add("value", "string")
      val df = spark.read.format("graft-pages").schema(schema)
        .option("url", url).option("pageSize", "2").load()
      assert(df.count() == 9)
      // 9 rows would be 5 pages; a pushed count touches ONLY offset 0
      assert(offsets.asScala.toSet == Set(0),
        s"count fetched pages: ${offsets.asScala.toSet}")
      // filtered counts must NOT push (the reader drops rows): full answer
      offsets.clear()
      import org.apache.spark.sql.functions.col
      assert(df.filter(col("period") >= "p3").count() == 6)
    } finally server.stop(0)
  }

  test("http mode: pushed bounds become start/end request params") {
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", { ex =>
      queries.add(ex.getRequestURI.getQuery)
      // server honors start: rows p2..p4 when start=p2
      val q = ex.getRequestURI.getQuery
      val start = q.split("&").map(_.split("=", 2))
        .collectFirst { case Array("start", v) => v }.getOrElse("p0")
      val rows = (0 until 5).map(i => s"p$i").filter(_ >= start)
        .map(p => s"""{"period":"$p","value":"1"}""").mkString(",")
      val n = (0 until 5).count(i => s"p$i" >= start)
      val body = s"""{"response":{"total":"$n","data":[$rows]}}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      import org.apache.spark.sql.functions.col
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data"
      val schema = new org.apache.spark.sql.types.StructType()
        .add("period", "string").add("value", "string")
      val df = spark.read.format("graft-pages").schema(schema)
        .option("url", url).option("pageSize", "10").load()
        .filter(col("period") >= "p2")
      assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("p2", "p3", "p4"))
      assert(queries.asScala.forall(_.contains("start=p2")),
        s"start param missing in ${queries.asScala.toList}")
    } finally server.stop(0)
  }
}

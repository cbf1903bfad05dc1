package graft.ct

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the production HTTP entry source against a local stub CT log
  * (zero-egress): get-sth, get-entries, log-list fetch, and error retry in
  * Ingestor.runLoop. */
class CtHttpSourceSpec extends AnyFunSuite {

  private def withStub(f: (String, () => Int) => Unit): Unit = {
    val http = HttpServer.create(new InetSocketAddress(0), 0)
    var failures = 0
    val fail = new java.util.concurrent.atomic.AtomicInteger(0)
    http.createContext("/", ex => {
      val path = ex.getRequestURI.getPath
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val body: String = path match {
        case p if p.endsWith("/ct/v1/get-sth") =>
          if (fail.getAndDecrement() > 0) { failures += 1; null } // simulate outage
          else """{"tree_size": 3, "timestamp": 1700000000}"""
        case p if p.endsWith("/ct/v1/get-entries") =>
          val params = q.split("&").map(_.split("=")).map(a => a(0) -> a(1)).toMap
          val (s, e) = (params("start").toLong, params("end").toLong)
          val entries = (s to e)
            .map(_ => s"""{"leaf_input": "${Fixtures.leafB64()}", "extra_data": ""}""")
            .mkString("""{"entries": [""", ",", "]}")
          entries
        case _ => """{"operators": []}"""
      }
      if (body == null) { ex.sendResponseHeaders(503, -1); ex.close() }
      else {
        val b = body.getBytes(UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      }
    })
    http.start()
    try f(s"http://127.0.0.1:${http.getAddress.getPort}", () => { fail.set(2); failures })
    finally http.stop(0)
  }

  test("get-sth and get-entries parse the CT API responses") {
    withStub { (url, _) =>
      val src = new CtHttpSource()
      val log = LogList.CtLog("Stub Log", url, "usable")
      assert(src.treeSize(log) == 3L)
      val entries = src.fetchEntries(log, 0, 2)
      assert(entries.length == 3)
      assert(entries.map(_.entry_index) == Seq(0L, 1L, 2L))
      assert(entries.head.leaf_input == Fixtures.leafB64())
    }
  }

  test("log-list fetch serves from the daily disk cache within the TTL (S1)") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val http = HttpServer.create(new InetSocketAddress(0), 0)
    http.createContext("/", ex => {
      hits.incrementAndGet()
      val b = """{"operators": []}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    http.start()
    try {
      val url = s"http://127.0.0.1:${http.getAddress.getPort}/log_list.json"
      val cache = java.nio.file.Files.createTempDirectory("loglist")
        .resolve("cache").resolve("log_list.json")
      val src = new CtHttpSource()
      assert(src.fetchLogListCached(url, cache).contains("operators"))
      assert(hits.get() == 1)
      assert(src.fetchLogListCached(url, cache).contains("operators"))
      assert(hits.get() == 1) // second call within TTL: no network hit
      // age the cache past the TTL → refetch
      java.nio.file.Files.setLastModifiedTime(cache,
        java.nio.file.attribute.FileTime.from(
          java.time.Instant.now().minus(java.time.Duration.ofHours(25))))
      assert(src.fetchLogListCached(url, cache).contains("operators"))
      assert(hits.get() == 2)
    } finally http.stop(0)
  }

  test("ingest loop retries through transient source failures (S9)") {
    withStub { (url, makeFail) =>
      val spark = graft.SparkSpec.session
      val store = java.nio.file.Files.createTempDirectory("http-store").toString
      val offsets = new Ingestor.FileOffsets(
        java.nio.file.Files.createTempDirectory("http-off").toString)
      val log = LogList.CtLog("Stub Log", url, "frozen")
      makeFail() // next two get-sth calls 503
      val n = Ingestor.runLoop(spark, Seq(log), new CtHttpSource(), store, offsets,
        () => java.sql.Timestamp.valueOf("2024-01-15 00:00:00"),
        rounds = 4, pollMs = 10L, backoffMs = 10L, batchSize = 2)
      assert(n == 3L) // 1 cert × 3 domains after dedup, despite two failed rounds
      assert(CertStore.read(spark, store).count() == 3)
    }
  }
}

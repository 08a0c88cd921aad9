package graft.pipeline

import java.net.InetSocketAddress
import java.nio.file.Files
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** S1 mirror download against a local in-process HTTP server: UA
  * mandatory + forwarded, 200 fetch, 304 not-modified reuse. */
class DownloadSpec extends AnyFunSuite {

  private def withServer(body: (String, () => Seq[Map[String, String]]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var seen = List.empty[Map[String, String]]
    val payload = "feed-zip-bytes".getBytes("UTF-8")
    server.createContext("/gtfs.zip", (ex: HttpExchange) => {
      val headers = Map(
        "ua" -> Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse(""),
        "ims" -> Option(ex.getRequestHeaders.getFirst("If-Modified-Since")).getOrElse(""))
      seen ::= headers
      if (headers("ims").nonEmpty) { // mirror contract: nothing changed
        ex.sendResponseHeaders(304, -1)
      } else {
        ex.getResponseHeaders.set("Last-Modified", "Tue, 11 Jun 2024 10:00:00 GMT")
        ex.sendResponseHeaders(200, payload.length)
        ex.getResponseBody.write(payload)
      }
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/gtfs.zip",
      () => seen.reverse)
    finally server.stop(0)
  }

  test("requires a User-Agent (reference asserts it)") {
    intercept[IllegalArgumentException] {
      Download.download("http://example.invalid/x.zip",
        Files.createTempDirectory("dl").resolve("x.zip"), "")
    }
  }

  test("fetches with UA, then re-fetch is conditional and reuses on 304") {
    withServer { (url, requests) =>
      val dest = Files.createTempDirectory("dl").resolve("gtfs.zip")
      val r1 = Download.download(url, dest, "graft-test/1.0")
      assert(!r1.notModified && Files.readString(dest) == "feed-zip-bytes")
      // Last-Modified applied to the file mtime → conditional next time
      val r2 = Download.download(url, dest, "graft-test/1.0")
      assert(r2.notModified, "second fetch must be a 304 reuse")
      assert(Files.readString(dest) == "feed-zip-bytes")
      val reqs = requests()
      assert(reqs.forall(_("ua") == "graft-test/1.0"), s"UA missing: $reqs")
      assert(reqs(0)("ims").isEmpty && reqs(1)("ims").nonEmpty)
    }
  }

  test("file:// and plain paths copy locally (offline mode)") {
    val src = Files.createTempFile("feed", ".zip")
    Files.writeString(src, "local-bytes")
    val dest = Files.createTempDirectory("dl").resolve("gtfs.zip")
    val r = Download.download(src.toString, dest, "graft-test/1.0")
    assert(!r.notModified && Files.readString(dest) == "local-bytes")
  }
}

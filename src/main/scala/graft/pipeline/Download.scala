package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{Duration, Instant, ZoneOffset}

/** S1: mirror-style HTTP feed download (SURVEY.md §2.1 S1;
  * /root/reference/download.sh:17-29 `curl-mirror`, invoked at
  * import.js:93-110). Driver-side — a single file fetched before any
  * Spark job runs; never a Spark source.
  *
  * Reference semantics preserved:
  *  - a User-Agent is MANDATORY (asserted at import.js:80-81);
  *  - mirror behavior: if the target file already exists, the request
  *    is conditional (If-Modified-Since from the file's mtime, plus a
  *    stored ETag if present) and 304 keeps the existing bytes —
  *    `curl -z`'s contract;
  *  - downloads land in a temp file and are atomically renamed so a
  *    crashed download never leaves a torn zip for the digest step.
  */
object Download {

  final case class Result(path: Path, durationMs: Long, notModified: Boolean,
      bytes: Long)

  private val httpDate = DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)

  def download(url: String, dest: Path, userAgent: String,
      timeout: Duration = Duration.ofMinutes(2)): Result = {
    require(userAgent != null && userAgent.nonEmpty,
      "a User-Agent is required (reference: import.js:80-81)")
    val t0 = System.nanoTime()
    val uri = URI.create(url)
    uri.getScheme match {
      case "file" | null => // offline path: plain copy (tests, local feeds)
        val src = if (uri.getScheme == null) Path.of(url) else Path.of(uri)
        Files.createDirectories(dest.getParent)
        Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
        Result(dest, (System.nanoTime() - t0) / 1000000, notModified = false,
          Files.size(dest))
      case "http" | "https" =>
        val client = HttpClient.newBuilder()
          .followRedirects(HttpClient.Redirect.NORMAL)
          .connectTimeout(timeout).build()
        val etagFile = dest.resolveSibling(dest.getFileName.toString + ".etag")
        val b = HttpRequest.newBuilder(uri).timeout(timeout)
          .header("User-Agent", userAgent)
        if (Files.exists(dest)) {
          b.header("If-Modified-Since",
            httpDate.format(Files.getLastModifiedTime(dest).toInstant))
          if (Files.exists(etagFile))
            b.header("If-None-Match", Files.readString(etagFile).trim)
        }
        val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
        Files.createDirectories(dest.getParent)
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofFile(tmp))
        val ms = (System.nanoTime() - t0) / 1000000
        resp.statusCode() match {
          case 304 =>
            Files.deleteIfExists(tmp)
            Result(dest, ms, notModified = true, Files.size(dest))
          case 200 =>
            Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
            resp.headers().firstValue("ETag").ifPresent(e =>
              Files.writeString(etagFile, e))
            resp.headers().firstValue("Last-Modified").ifPresent { lm =>
              try Files.setLastModifiedTime(dest,
                java.nio.file.attribute.FileTime.from(
                  Instant.from(httpDate.parse(lm))))
              catch { case _: java.time.format.DateTimeParseException => () }
            }
            Result(dest, ms, notModified = false, Files.size(dest))
          case code =>
            Files.deleteIfExists(tmp)
            throw new RuntimeException(s"download failed: HTTP $code for $url")
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported scheme: $other")
    }
  }
}

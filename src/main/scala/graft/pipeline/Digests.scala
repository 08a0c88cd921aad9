package graft.pipeline

import java.nio.file.{Files, Path}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Digest operators H1-H4 (SURVEY.md §2.6;
  * /root/reference/index.js:10-26, import.js:200-227). Byte-for-byte
  * parity with the reference's semantics matters: the digest feeds the
  * skip-if-unchanged guard (P5) and the DB name (H4), so listing order,
  * dotfile exclusion and ENOENT tolerance are part of the contract
  * (SURVEY.md §7.4 #3). */
object Digests {

  /** DIGEST_LENGTH = 6 (index.js:10). */
  val DigestLength = 6

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** H1 digestString: sha256 hex, first 6 chars, lower (index.js:12-18). */
  def digestString(s: String): String =
    sha256Hex(s.getBytes("UTF-8")).take(DigestLength)

  /** H2 digestFile: chunked streaming sha256 of a file, same truncation
    * (index.js:20-26). */
  def digestFile(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    Using.resource(Files.newInputStream(p)) { in =>
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    }
    md.digest().map(b => f"$b%02x").mkString.take(DigestLength)
  }

  /** H3 composite feed digest (import.js:200-227):
    * digest(zipDigest ++ concat(digestFile(f) for f in dir, sorted,
    * dotfiles excluded)); missing dir (ENOENT) or empty dir → the zip
    * digest alone. Deterministic listing order = sorted by name. The
    * preprocess script (import.sh:32-35 analog), when present, is
    * digested FIRST — it runs before the postprocessing scripts, and
    * editing it must change the digest just like editing them does —
    * and is DOMAIN-TAGGED ("pre:" prefix): without the tag, moving an
    * identical script between the preprocess slot (runs before
    * cleaning) and postprocessing.d (runs after load) left the
    * composite unchanged and P5 wrongly skipped the re-import.
    *
    * Upgrade note: introducing the "pre:" tag changed the composite for
    * every deployment that uses a preprocess script, so the first run
    * after upgrading sees feed-changed once and re-imports — one-time,
    * by design (the digest format itself is versioned by its value). */
  def compositeFeedDigest(feedFile: Path, postprocessingDir: Option[Path],
      preprocessScript: Option[Path] = None): String = {
    val zipDigest = digestFile(feedFile)
    val preDigest: Seq[String] =
      preprocessScript.filter(Files.isRegularFile(_)).map(digestFile).toSeq
    val scriptDigests: Seq[String] = postprocessingDir match {
      case Some(dir) if Files.isDirectory(dir) =>
        Using.resource(Files.list(dir)) { s =>
          s.iterator().asScala.toSeq
            .filter(Files.isRegularFile(_))
            .map(_.getFileName.toString)
            .filterNot(_.startsWith("."))     // P6 dotfile filter (import.js:208-210)
            .sorted                           // deterministic order
        }.map(n => digestFile(dir.resolve(n)))
      case _ => Seq.empty                     // ENOENT tolerated (import.js:216-218)
    }
    val all = preDigest.map("pre:" + _) ++ scriptDigests
    if (all.isEmpty) zipDigest
    else digestString(zipDigest + all.mkString)
  }

  /** H4 DB name derivation: <prefix><unixSeconds>_<digest6>
    * (formatDbName index.js:55-62; ts at import.js:229). */
  def formatDbName(prefix: String, unixSeconds: Long, digest: String): String =
    s"$prefix$unixSeconds" + "_" + digest
}

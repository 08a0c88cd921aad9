package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.2: digest composition H1-H4 — order sensitivity,
  * dotfile exclusion, ENOENT tolerance, 6-char truncation
  * (/root/reference/index.js:10-26, import.js:200-227). */
class DigestsSpec extends AnyFunSuite {

  test("digestString: sha256 hex, lower, truncated to 6") {
    val d = Digests.digestString("hello")
    assert(d.length == 6)
    assert(d == d.toLowerCase)
    // sha256("hello") = 2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824
    assert(d == "2cf24d")
  }

  test("digestFile matches digestString for same bytes") {
    val f = Files.createTempFile("digest", ".txt")
    Files.writeString(f, "hello")
    assert(Digests.digestFile(f) == Digests.digestString("hello"))
  }

  test("composite digest: missing postprocessing dir → plain feed digest") {
    val f = Files.createTempFile("feed", ".zip")
    Files.writeString(f, "feedbytes")
    val noDir = Digests.compositeFeedDigest(f, None)
    val enoent = Digests.compositeFeedDigest(f,
      Some(f.resolveSibling("does-not-exist")))
    assert(noDir == Digests.digestFile(f))
    assert(enoent == noDir) // ENOENT tolerated (import.js:216-218)
  }

  test("composite digest: empty dir → plain feed digest") {
    val f = Files.createTempFile("feed", ".zip")
    Files.writeString(f, "feedbytes")
    val dir = Files.createTempDirectory("pp-empty")
    assert(Digests.compositeFeedDigest(f, Some(dir)) == Digests.digestFile(f))
  }

  test("composite digest: dotfiles excluded, scripts change the digest") {
    val f = Files.createTempFile("feed", ".zip")
    Files.writeString(f, "feedbytes")
    val dir = Files.createTempDirectory("pp")
    Files.writeString(dir.resolve("01-a.sql"), "SELECT 1")
    val withScript = Digests.compositeFeedDigest(f, Some(dir))
    assert(withScript != Digests.digestFile(f))
    // adding a dotfile must NOT change the digest (import.js:208-210)
    Files.writeString(dir.resolve(".hidden"), "ignored")
    assert(Digests.compositeFeedDigest(f, Some(dir)) == withScript)
    // adding a real script MUST change it
    Files.writeString(dir.resolve("02-b.sql"), "SELECT 2")
    assert(Digests.compositeFeedDigest(f, Some(dir)) != withScript)
  }

  test("composite digest is order-sensitive (sorted listing, H3)") {
    val f = Files.createTempFile("feed", ".zip")
    Files.writeString(f, "feedbytes")
    val d1 = Files.createTempDirectory("pp1")
    Files.writeString(d1.resolve("a.sql"), "X")
    Files.writeString(d1.resolve("b.sql"), "Y")
    val d2 = Files.createTempDirectory("pp2")
    // same contents, swapped names → different concatenation order
    Files.writeString(d2.resolve("a.sql"), "Y")
    Files.writeString(d2.resolve("b.sql"), "X")
    assert(Digests.compositeFeedDigest(f, Some(d1)) !=
      Digests.compositeFeedDigest(f, Some(d2)))
  }

  test("composite digest domain-tags the preprocess script (role matters)") {
    val f = Files.createTempFile("feed", ".zip")
    Files.writeString(f, "feedbytes")
    val script = Files.createTempFile("pre", ".sh")
    Files.writeString(script, "#!/bin/sh\nsed -i s/a/b/ stops.txt\n")
    // the SAME script as preprocess vs as a postprocessing.d member has
    // different semantics (runs before cleaning vs after load) — the
    // composite digest must differ or P5 skips the re-import
    val dir = Files.createTempDirectory("pp-role")
    Files.copy(script, dir.resolve("01-same.sh"))
    val asPre = Digests.compositeFeedDigest(f, None, Some(script))
    val asPost = Digests.compositeFeedDigest(f, Some(dir), None)
    assert(asPre != asPost)
    // and the preprocess script still changes the digest at all
    assert(asPre != Digests.digestFile(f))
  }

  test("formatDbName: <prefix><unixSeconds>_<digest6> (H4)") {
    assert(Digests.formatDbName("gtfs_", 1700000000L, "abc123") ==
      "gtfs_1700000000_abc123")
  }
}

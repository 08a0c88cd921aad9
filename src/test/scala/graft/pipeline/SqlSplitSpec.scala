package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the quote/comment-aware SQL statement splitter
  * (Import.splitSqlStatements) — the psql whole-file parity piece of
  * §2.11 (the reference feeds entire files to psql,
  * /root/reference/import.sh:142, so a `';'` inside a literal must
  * never split a statement). */
class SqlSplitSpec extends AnyFunSuite {

  private def split(s: String) = Import.splitSqlStatements(s)

  test("plain statements split on ; and drop empties") {
    assert(split("SELECT 1; SELECT 2;;\n;") == Seq("SELECT 1", "SELECT 2"))
  }

  test("semicolon inside single-quoted literal does not split") {
    assert(split("SELECT ';' AS a; SELECT 2") == Seq("SELECT ';' AS a", "SELECT 2"))
  }

  test("'' escape keeps the literal open across a ;") {
    assert(split("SELECT 'it''s; fine' AS a") == Seq("SELECT 'it''s; fine' AS a"))
  }

  test("semicolon inside double-quoted identifier does not split") {
    assert(split("""SELECT 1 AS "a;b"; SELECT 2""") ==
      Seq("""SELECT 1 AS "a;b"""", "SELECT 2"))
  }

  test("line comment with ; does not split; statement keeps the comment") {
    assert(split("SELECT 1 -- trailing; comment\n; SELECT 2") ==
      Seq("SELECT 1 -- trailing; comment", "SELECT 2"))
  }

  test("block comment with ; does not split (nested, PG-style)") {
    assert(split("SELECT /* a; /* nested; */ b; */ 1; SELECT 2") ==
      Seq("SELECT /* a; /* nested; */ b; */ 1", "SELECT 2"))
  }

  test("dollar-quoted body with ; does not split") {
    assert(split("SELECT $fn$ a; b $fn$ AS body; SELECT 2") ==
      Seq("SELECT $fn$ a; b $fn$ AS body", "SELECT 2"))
    assert(split("SELECT $$x; y$$; SELECT 2") == Seq("SELECT $$x; y$$", "SELECT 2"))
  }

  test("lone $ (parameter-style) is not mistaken for a dollar quote") {
    assert(split("SELECT a + $1 FROM t; SELECT 2") ==
      Seq("SELECT a + $1 FROM t", "SELECT 2"))
  }

  test("digit-first $..$ is positional params, not a dollar quote (PG lexer)") {
    // `$1$` would be a VALID tag under a [A-Za-z0-9_]* rule and the
    // splitter would then swallow the ';' between the two params — PG
    // requires tags to start with a letter or underscore
    assert(split("SELECT $1$x; y$2 FROM t; SELECT 2") ==
      Seq("SELECT $1$x", "y$2 FROM t", "SELECT 2"))
    // digits AFTER the first letter are still a legal tag
    assert(split("SELECT $t1$ a; b $t1$; SELECT 2") ==
      Seq("SELECT $t1$ a; b $t1$", "SELECT 2"))
    // underscore-first is a legal tag too
    assert(split("SELECT $_x$ a; b $_x$; SELECT 2") ==
      Seq("SELECT $_x$ a; b $_x$", "SELECT 2"))
  }

  test("unterminated quote swallows the rest instead of mis-splitting") {
    assert(split("SELECT 'oops; SELECT 2") == Seq("SELECT 'oops; SELECT 2"))
  }

  test("comment-only segments are not statements") {
    assert(split("SELECT 1; -- end of file\n") == Seq("SELECT 1"))
    assert(split("/* header */ SELECT 1; /* trailer */") ==
      Seq("/* header */ SELECT 1"))
    assert(split("-- nothing here\n/* at all */") == Seq.empty)
  }
}

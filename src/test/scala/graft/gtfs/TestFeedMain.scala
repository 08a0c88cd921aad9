package graft.gtfs

import java.nio.file.Paths

/** Dump the [[TestFeed]] fixture as CSV files into args(0) — the
  * single source of fixture truth for the out-of-JVM importer smoke
  * (`tools/smoke_importer.sh` zips this and drives `bin/graft-importer`
  * twice). Test scope: the fixture never ships in the thin jar. */
object TestFeedMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: TestFeedMain <outDir>")
    TestFeed.writeTo(Paths.get(args(0)))
    ()
  }
}

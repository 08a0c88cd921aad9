package graft.pipeline

import graft.meta.SuccessfulImport

/** T4: pluggable retention policy (determineDbsToRetain,
  * /root/reference/import.js:71-74). Default: keep the two most recent
  * successful imports — bounded disk plus instant rollback
  * (README.md:17); everything else (including unfinished/orphan
  * imports) is dropped by the cleanup pass. */
object Retention {

  type Policy = (Seq[SuccessfulImport], Seq[String]) => Seq[String]

  /** Newest-2 by imported_at (import.js:71-73). */
  val newestTwo: Policy = (imports, _) =>
    imports.sortBy(-_.importedAt).take(2).map(_.dbName)

  def newestN(n: Int): Policy = (imports, _) =>
    imports.sortBy(-_.importedAt).take(n).map(_.dbName)
}

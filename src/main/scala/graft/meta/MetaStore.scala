package graft.meta

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** One recorded successful import — the bookkeeping row of
  * `latest_successful_imports` (/root/reference/index.js:155-161). */
final case class SuccessfulImport(dbName: String, importedAt: Long, feedDigest: String)

/** File-mode analog of the reference's PostgreSQL bookkeeping layer,
  * preserving its concurrency semantics (SURVEY.md §2.10):
  *
  *  - T1 exclusive lock NOWAIT: an OS file-region lock (FileChannel
  *    tryLock) that dies with the process, like the reference's Postgres
  *    EXCLUSIVE lock — a second importer fails fast instead of queueing,
  *    and a crashed holder never wedges later runs (import.js:128-132);
  *  - T2/T5 transaction envelope + atomic publish: all bookkeeping
  *    mutations are staged in memory and committed by a single atomic
  *    rename of the meta file — the only publication point
  *    (import.js:126, 279-311);
  *  - T3 two-connection DDL isolation: create/drop of per-import
  *    database DIRECTORIES happens outside the staged transaction
  *    (direct FS ops), so an aborted import leaves an orphan dir that
  *    the next run's retention pass reaps (import.js:115-118, 160-198).
  *
  * Layout: root/meta/latest_successful_imports.tsv (the table),
  * root/meta/.import.lock (T1), root/dbs/<dbName>/ (per-import DBs).
  */
final class MetaStore(root: Path) {

  val metaDir: Path = root.resolve("meta")
  val dbsDir: Path = root.resolve("dbs")
  private val tableFile = metaDir.resolve("latest_successful_imports.tsv")
  private val lockFile = metaDir.resolve(".import.lock")

  Files.createDirectories(metaDir)
  Files.createDirectories(dbsDir)

  // ---- T1: exclusive lock, NOWAIT ----------------------------------
  // An OS-level file-region lock, not an O_CREAT|O_EXCL marker file: the
  // reference's Postgres EXCLUSIVE table lock (import.js:128-132)
  // auto-releases when the holder's connection dies, so a crashed
  // importer (kill -9, OOM) never wedges the next run. FileChannel locks
  // have the same property — the OS releases them on process death —
  // where a marker file would persist forever and fail every subsequent
  // import.
  private var lockChannel: java.nio.channels.FileChannel = _
  private var heldLock: java.nio.channels.FileLock = _

  def acquireLockNowait(): Unit = {
    val ch = java.nio.channels.FileChannel.open(lockFile,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lock =
      try ch.tryLock()
      catch {
        // same-JVM second importer: tryLock throws instead of returning null
        case _: java.nio.channels.OverlappingFileLockException =>
          ch.close(); null
      }
    if (lock == null) {
      if (ch.isOpen) ch.close()
      throw new IllegalStateException(
        s"another importer holds the lock ($lockFile) — failing fast (NOWAIT)")
    }
    lockChannel = ch
    heldLock = lock
  }

  /** Release is a no-op unless THIS store holds the lock; the lockfile
    * itself is never deleted (existence is not the lock — the OS region
    * lock is), so a non-holder can't unlock a concurrent holder. */
  def releaseLock(): Unit = {
    if (heldLock != null && heldLock.isValid) heldLock.release()
    if (lockChannel != null && lockChannel.isOpen) lockChannel.close()
    heldLock = null
    lockChannel = null
  }

  // ---- S4: bookkeeping scan (ORDER BY imported_at DESC) ------------
  def listImports(prefix: String): Seq[SuccessfulImport] = {
    val all =
      if (!Files.exists(tableFile)) Seq.empty
      else Files.readAllLines(tableFile).asScala.toSeq.filter(_.nonEmpty).map { line =>
        val Array(n, ts, dg) = line.split("\t", 3)
        SuccessfulImport(n, ts.toLong, dg)
      }
    // P2 prefix predicate + sort desc (index.js:183-198); dbName breaks
    // imported_at ties so "latest" is deterministic
    all.filter(_.dbName.startsWith(prefix)).sortBy(r => (-r.importedAt, r.dbName))
  }

  // ---- S5: catalog scan (ORDER BY name ASC, self-excluded) ---------
  def listDatabases(prefix: String): Seq[String] =
    Using.resource(Files.list(dbsDir)) { stream =>
      stream.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filter(_.startsWith(prefix))   // P2
        .toSeq.sorted                   // ORDER BY datname ASC (index.js:214)
    }

  // ---- K5: create/drop database (outside the staged txn — T3) ------
  def createDatabase(name: String): Path = {
    val p = dbsDir.resolve(name)
    Files.createDirectories(p)
    p
  }

  def dropDatabase(name: String): Unit = {
    val p = dbsDir.resolve(name)
    if (Files.exists(p))
      Using.resource(Files.walk(p)) { w =>
        w.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
      }
  }

  def databasePath(name: String): Path = dbsDir.resolve(name)

  // ---- T2/T5: staged transaction committed by atomic rename --------
  /** Run `body` against a staged copy of the table rows; the returned
    * rows are written to a temp file and atomically renamed over the
    * table IF body completes — the single commit point. On exception
    * nothing is published (ROLLBACK, import.js:310-316). */
  def transact[A](body: Vector[SuccessfulImport] => (Vector[SuccessfulImport], A)): A = {
    val current =
      if (!Files.exists(tableFile)) Vector.empty[SuccessfulImport]
      else Files.readAllLines(tableFile).asScala.toVector.filter(_.nonEmpty).map { l =>
        val Array(n, ts, dg) = l.split("\t", 3)
        SuccessfulImport(n, ts.toLong, dg)
      }
    val (next, result) = body(current)
    val tmp = metaDir.resolve(s".latest_successful_imports.tmp")
    Files.write(tmp,
      next.map(r => s"${r.dbName}\t${r.importedAt}\t${r.feedDigest}").asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, tableFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    result
  }

  // ---- K4: DSN file write (atomic tmp+rename; import.js:289-308) ---
  def writeDsnFile(target: Path, dbName: String, host: String = "localhost",
      port: Int = 5432, user: String = "gtfs"): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp,
      s"gtfs=host=$host port=$port dbname=$dbName user=$user\n")
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object MetaStore {
  def apply(root: String): MetaStore = new MetaStore(Paths.get(root))
}

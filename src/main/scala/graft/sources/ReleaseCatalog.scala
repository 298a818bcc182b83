package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Coordinated cross-store retention pins (VERDICT r17 next #1): one
  * release label spanning snapshots of SEVERAL [[TableStore]] tables —
  * possibly in different store roots — recorded durably in ONE place.
  *
  * A production retrieval stack serves from more than one maintained
  * store at once (q217's hybrid: the BM25 index store + the IVF list
  * store). Per-store pins ([[TableStore.pinVersion]]) protect each
  * snapshot from its own store's vacuum, but nothing binds them:
  * "re-run yesterday's retrieval stack" needs the PAIR of versions that
  * served together, under one name, surviving each store's independent
  * compaction schedule. That binding is this catalog.
  *
  * Mechanics: [[pin]] first takes a store-level pin `release:<label>`
  * on every target (reusing the proven vacuum-exemption machinery —
  * the catalog never re-implements retention), then atomically rewrites
  * the RELEASES sidecar (`label \t storeRoot \t table \t version` per
  * line, tmp + ATOMIC_MOVE — the PINS file discipline). Ordering makes
  * the crash story one-sided: a crash after some store pins but before
  * the record leaves orphan per-store pins (harmless extra storage,
  * reclaimable by name) and NO release — the catalog is the single
  * source of truth for what constitutes a release, so a half-pinned
  * release can never be served.
  *
  * At 100 TB a release costs exactly the pinned snapshots' bytes and
  * zero maintenance time (the per-store pin contract); the catalog
  * itself is a few lines of text. On a real cluster this sidecar is a
  * transactional-catalog row — the mechanism (pin members first, then
  * one atomic record) is unchanged.
  */
final class ReleaseCatalog(val root: String, spark: SparkSession) {

  Files.createDirectories(Paths.get(root))

  private def releasesFile = Paths.get(s"$root/RELEASES")

  /** One pinned member of a release: which table, in which store root,
    * at which version. */
  final case class Member(storeRoot: String, table: String, version: Int)

  /** All releases: label → pinned members. Hard-fails on a torn line for
    * the same reason [[TableStore.pinnedVersions]] does: a silently
    * dropped release would hide pins that still hold storage, and serve
    * nothing — stopping is the only safe answer. */
  def releases: Map[String, Seq[Member]] = {
    val p = releasesFile
    if (!Files.exists(p)) Map.empty
    else new String(Files.readAllBytes(p)).split("\n").toSeq.filter(_.nonEmpty)
      .map { l =>
        l.split("\t", -1) match {
          // a non-numeric version is the SAME failure class as a torn
          // line (half-written or hand-damaged record) and must produce
          // the same forensics, not a bare NumberFormatException
          case Array(label, storeRoot, table, ver) if ver.forall(_.isDigit) && ver.nonEmpty =>
            label -> Member(storeRoot, table, ver.toInt)
          case other => sys.error(s"corrupt release line in $p: ${other.mkString("\\t")}")
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private def writeReleases(all: Map[String, Seq[Member]]): Unit = {
    val tmp = Paths.get(s"$releasesFile.tmp")
    Files.write(tmp, all.toSeq.sortBy(_._1).flatMap { case (label, ms) =>
      ms.sortBy(m => (m.storeRoot, m.table))
        .map(m => s"$label\t${m.storeRoot}\t${m.table}\t${m.version}")
    }.mkString("\n").getBytes)
    Files.move(tmp, releasesFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Pin the CURRENT version of every `(store, table)` target under one
    * release `label` — each member vacuum-protected by its own store's
    * pin machinery, the binding recorded atomically here. Re-pinning an
    * existing label re-points it (old members' store pins are released
    * first, so storage never leaks). Returns the pinned members. */
  def pin(label: String, targets: Seq[(TableStore, String)]): Seq[Member] = {
    require(label.nonEmpty && !label.contains('\t') && !label.contains('\n'),
      "release label must be non-empty and free of tab/newline")
    require(targets.nonEmpty, "a release must pin at least one table")
    ReleaseCatalog.lock.synchronized {
      val prior = releases
      // member pins FIRST (each one durable + vacuum-exempt on its own
      // store), record LAST — see the crash story in the class doc
      val members = targets.map { case (st, table) =>
        Member(st.rootDir, table, st.pinVersion(table, s"release:$label"))
      }
      writeReleases(prior.updated(label, members))
      // a re-point released the OLD members' store pins only after the
      // new record landed: the catalog never references an unpinned
      // snapshot even if the unpin below dies
      prior.get(label).foreach(_.foreach { m =>
        if (!members.exists(n => n.storeRoot == m.storeRoot && n.table == m.table))
          new TableStore(spark, m.storeRoot).unpinVersion(m.table, s"release:$label")
      })
      members
    }
  }

  /** Drop `label`: remove the record, then release every member's store
    * pin (their snapshots become reclaimable by each store's NEXT
    * vacuum; nothing is deleted here). Returns whether it existed. */
  def unpin(label: String): Boolean = ReleaseCatalog.lock.synchronized {
    val all = releases
    all.get(label) match {
      case None => false
      case Some(members) =>
        // record first: once the release is gone no reader can resolve
        // it, so releasing the member pins afterwards is safe even if
        // interrupted (orphan pins hold storage, never serve stale data)
        writeReleases(all - label)
        members.foreach(m =>
          new TableStore(spark, m.storeRoot).unpinVersion(m.table, s"release:$label"))
        true
    }
  }

  /** Time travel to release `label`'s snapshot of `table` — the read
    * side of [[pin]]. Loud on an unknown label, and on a table name that
    * is ambiguous within the release (two stores contributing a table of
    * the same name must be read via [[releases]] + an explicit root). */
  def tableAt(label: String, table: String): DataFrame = {
    val members = releases.getOrElse(label,
      throw new IllegalArgumentException(s"no such release: '$label'"))
    members.filter(_.table == table) match {
      case Seq(m) => new TableStore(spark, m.storeRoot).tableAt(table, m.version)
      case Seq() => throw new IllegalArgumentException(
        s"release '$label' has no table '$table' (members: ${members.map(_.table).mkString(", ")})")
      case many => throw new IllegalArgumentException(
        s"release '$label' has ${many.size} tables named '$table' — " +
          "resolve via releases() with an explicit store root")
    }
  }
}

object ReleaseCatalog {
  /** Serializes read-modify-write cycles on a catalog's RELEASES file
    * (same rationale as [[TableStore.pinsLock]]: an interleaving would
    * silently drop a release). Cross-process coordination is the
    * deployment catalog's job. */
  private[sources] val lock = new Object
}

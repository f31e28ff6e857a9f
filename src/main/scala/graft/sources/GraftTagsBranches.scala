package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import GraftCatalog._

/**
 * Tags and branches — split from GraftCatalog.scala (continuing the
 * r13/r14 seam; behavior unchanged): named snapshots with expiration
 * pinning, zero-copy branch lineages over shared history, fast-forward
 * with divergence diff, and the `$branches` view. Same-package trait
 * mixed into [[GraftCatalog]].
 */
trait GraftTagsBranches { self: GraftCatalog =>

  // ---- tags (named snapshots, Paimon-style) ------------------------------

  /** Pin a snapshot under a name ("release-2026-08"): readable via
    * [[readTag]] and protected from [[expireSnapshots]] until untagged. */
  def createTag(schema: String, table: String, tag: String,
      snapshotId: Option[Long] = None): Long = {
    val m = readManifest(schema, table)
    val snaps = m.get("snapshots").asInstanceOf[ArrayNode]
    require(snaps.size() > 0, s"$schema.$table has no snapshots to tag")
    val id = snapshotId.getOrElse(snaps.get(snaps.size() - 1).get("id").asLong())
    require((0 until snaps.size()).exists(i => snaps.get(i).get("id").asLong() == id),
      s"no snapshot $id for $schema.$table")
    val t = if (m.has("tags")) m.get("tags").asInstanceOf[ObjectNode]
      else m.putObject("tags")
    require(!t.has(tag), s"tag $tag already exists")
    t.put(tag, id)
    writeManifest(schema, table, m)
    id
  }

  def deleteTag(schema: String, table: String, tag: String): Unit = {
    val m = readManifest(schema, table)
    require(m.has("tags") && m.get("tags").has(tag), s"no tag $tag")
    m.get("tags").asInstanceOf[ObjectNode].remove(tag)
    writeManifest(schema, table, m)
  }

  /** All tags → snapshot ids. */
  def tags(schema: String, table: String): Map[String, Long] = {
    val m = readManifest(schema, table)
    if (!m.has("tags")) Map.empty
    else {
      val t = m.get("tags").asInstanceOf[ObjectNode]
      val out = mutable.LinkedHashMap[String, Long]()
      t.fieldNames().forEachRemaining(k => out += k -> t.get(k).asLong())
      out.toMap
    }
  }

  /** Read the snapshot a tag pins. */
  def readTag(schema: String, table: String, tag: String): DataFrame = {
    val id = tags(schema, table).getOrElse(tag,
      throw new IllegalArgumentException(s"no tag $tag on $schema.$table"))
    read(schema, table, snapshotId = Some(id))
  }

  // ---- branches ----------------------------------------------------------

  /** Branch lineages of a table (Paimon's table branches), by name. */
  def branchNames(schema: String, table: String): Seq[String] = {
    val base = splitBranch(table)._1
    val p = new Path(tablePath(schema, base), BranchDirName)
    val listed =
      try fs.listStatus(p)
      catch { case _: java.io.FileNotFoundException => return Seq.empty }
    listed.filter(_.isDirectory).map(_.getPath.getName)
      .filter(b => tableManifestExists(schema, s"$base$BranchSep$b"))
      .toSeq.sorted
  }

  /** Dir references (base-relative form, see [[baseRelativeDir]]) held
    * by every OTHER lineage of this table's base — the base itself plus
    * each branch, minus the lineage `table` names. A dir is reclaimable
    * only when no sibling still references it: the base expiring history
    * must not pull dirs a branch inherited, and a branch expiring its
    * history must not pull dirs the base adopted via fast-forward.
    * O(lineages) cached manifest reads, zero file I/O. */
  private[sources] def siblingLineageRefs(schema: String, table: String): Set[String] = {
    val (base, br) = splitBranch(table)
    val branches = branchNames(schema, base)
    if (branches.isEmpty && br.isEmpty) return Set.empty
    val siblings: Seq[String] =
      (if (br.isDefined) Seq(base) else Seq.empty) ++
        branches.filterNot(br.contains).map(b => s"$base$BranchSep$b")
    siblings.flatMap { t =>
      if (!tableManifestExists(schema, t)) Seq.empty
      else {
        val sm = readManifest(schema, t)
        val snaps = sm.get("snapshots").asInstanceOf[ArrayNode]
        (0 until snaps.size()).flatMap(i => filesOf(snaps.get(i)))
          .map(fe => baseRelativeDir(t, fe.dir))
      }
    }.toSet
  }

  /**
   * Create branch `branch` of `schema.table` at snapshot `fromSnapshotId`
   * (or the snapshot `fromTag` pins; default the current head) — Paimon's
   * table branch, O(manifest metadata) and ZERO data I/O at ANY table
   * size: the new lineage's manifest inherits the base's snapshot history
   * up to the branch point with every dir reference rewritten to the
   * base-relative sharing form (`~/snap-N`), so both lineages read the
   * SAME immutable dirs in place. From then on the lineages are fully
   * isolated — separate manifest CAS chains, separate staging/snap dirs
   * under `<table>/.branch/<name>/` — and the branch is addressable as
   * `t$branch_<name>` through EVERY catalog API (reads, time travel,
   * upserts, DDL, compaction, streaming) and the SQL catalog. Expiration
   * on either lineage never reclaims a dir the other still references
   * (cross-lineage pinning in dropSnapshots/sweepOrphanDirs).
   *
   * Branching a 100 TB table costs one manifest read + one manifest
   * write — the whole point: experiment/backfill/schema-migrate against
   * production data without copying a byte, then [[fastForward]].
   */
  def createBranch(schema: String, table: String, branch: String,
      fromSnapshotId: Option[Long] = None, fromTag: Option[String] = None): Unit = {
    require(splitBranch(table)._2.isEmpty,
      s"$table is itself a branch — branches are one level deep; branch from the base table")
    require(branch.nonEmpty && branch.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-'),
      s"branch name must be [A-Za-z0-9_-]+, got '$branch'")
    require(fromSnapshotId.isEmpty || fromTag.isEmpty,
      "pass fromSnapshotId OR fromTag, not both")
    val bt = s"$table$BranchSep$branch"
    require(!tableManifestExists(schema, bt),
      s"branch $branch of $schema.$table exists")
    val m = readManifest(schema, table)
    val snaps = m.get("snapshots").asInstanceOf[ArrayNode]
    val headId =
      if (snaps.size() == 0) 0L
      else snaps.get(snaps.size() - 1).get("id").asLong()
    val fromId = fromTag.map(t => tags(schema, table).getOrElse(t,
        throw new IllegalArgumentException(s"no tag $t on $schema.$table")))
      .orElse(fromSnapshotId).getOrElse(headId)
    require(fromId == 0L || (0 until snaps.size()).exists(i =>
      snaps.get(i).get("id").asLong() == fromId),
      s"no snapshot $fromId for $schema.$table")
    // truncate the log at the branch point; entry nodes are SHARED across
    // snapshots after inflation, so guard the in-place dir rewrite
    val keptArr = mapper.createArrayNode()
    (0 until snaps.size()).foreach { i =>
      val s = snaps.get(i).asInstanceOf[ObjectNode]
      if (s.get("id").asLong() <= fromId) keptArr.add(s)
    }
    def markEntries(arr: ArrayNode): Unit =
      (0 until arr.size()).foreach { j =>
        val e = arr.get(j).asInstanceOf[ObjectNode]
        val d = e.get("dir").asText()
        if (!d.startsWith(BaseRelMarker)) e.put("dir", BaseRelMarker + d)
      }
    (0 until keptArr.size()).foreach { i =>
      val s = keptArr.get(i).asInstanceOf[ObjectNode]
      markEntries(s.get("files").asInstanceOf[ArrayNode])
      if (s.has("added")) markEntries(s.get("added").asInstanceOf[ArrayNode])
      if (s.has("removed")) {
        val r = s.get("removed").asInstanceOf[ArrayNode]
        val marked = (0 until r.size()).map { j =>
          val d = r.get(j).asText()
          if (d.startsWith(BaseRelMarker)) d else BaseRelMarker + d
        }
        r.removeAll()
        marked.foreach(r.add)
      }
    }
    m.set[JsonNode]("snapshots", keptArr)
    val keptDirs = (0 until keptArr.size())
      .flatMap(i => filesOf(keptArr.get(i))).map(_.dir).toSet
    // per-dir aux state (zones, DV index, blooms, dynamic-bucket flags)
    // follows the entries: keys re-marked, values shared by reference;
    // entries of truncated-away dirs dropped
    Seq("dirStats", "dvIndex", "bloomIdx", "dynIdx").foreach { f =>
      if (m.has(f)) {
        val old = m.get(f).asInstanceOf[ObjectNode]
        val next = mapper.createObjectNode()
        old.fieldNames().forEachRemaining { k =>
          val marked = if (k.startsWith(BaseRelMarker)) k else BaseRelMarker + k
          if (keptDirs.contains(marked)) next.set[JsonNode](marked, old.get(k))
        }
        m.set[JsonNode](f, next)
      }
    }
    // tags at-or-before the branch point carry over (their snapshots are
    // in the inherited log); consumers and streaming-sink idempotence
    // state stay with the base — the branch is a fresh consumption scope
    if (m.has("tags")) {
      val old = m.get("tags").asInstanceOf[ObjectNode]
      val next = mapper.createObjectNode()
      old.fieldNames().forEachRemaining { k =>
        if (old.get(k).asLong() <= fromId) next.put(k, old.get(k).asLong())
      }
      m.set[JsonNode]("tags", next)
    }
    m.remove("consumers")
    m.remove("lastStreamBatchId")
    // producer changelog dirs stay with the base lineage (their node keys
    // are base-local dirs); the branch recomputes changelogs at read and
    // re-materializes from its own commits
    m.remove("changelog")
    if (m.has("statistics") &&
        m.get("statistics").get("snapshotId").asLong() > fromId)
      m.remove("statistics")
    m.remove("commitVersion") // fresh CAS lineage: first write lands v1
    m.put("name", bt)
    m.put("branchOf", table)
    m.put("branchBaseId", fromId)
    m.put("branchCreatedMillis", System.currentTimeMillis())
    fs.mkdirs(tablePath(schema, bt))
    writeManifest(schema, bt, m)
  }

  /**
   * Fast-forward `schema.table` to branch `branch` — git semantics: the
   * base log must be a PREFIX of the branch log (same ids, same dir sets
   * under the cross-lineage identity; schema history a prefix too), i.e.
   * the base has not diverged since the branch point. The base then
   * ADOPTS the branch's full history in ONE manifest CAS with zero data
   * movement: branch-local dirs are referenced in place under
   * `~/.branch/<name>/snap-N`. The branch stays alive and readable; it
   * cannot be deleted while the base references its dirs (deleteBranch
   * refuses until expiration/compaction retires them). A diverged base
   * refuses with a pointer — replay the branch onto a fresh branch of
   * the current head instead. Returns the new head snapshot id.
   */
  /**
   * Diverged-history report backing `CALL sys.fast_forward_diff`: WHY a
   * branch can (or cannot) be adopted, one `(position, status, detail)`
   * row per disagreement — so an operator refused by [[fastForward]]
   * sees the concrete divergence (extra base snapshots, mismatched ids,
   * per-snapshot dir diffs, schema drift) instead of just the refusal.
   * Metadata-only: manifest reads, no data touched. An empty diff
   * reports one summary row (`fast_forwardable` / `in_sync`).
   */
  def fastForwardDiff(schema: String, table: String,
      branch: String): Seq[(Long, String, String)] = {
    require(splitBranch(table)._2.isEmpty,
      s"$table is itself a branch — fast-forward targets the base table")
    val bt = s"$table$BranchSep$branch"
    require(tableManifestExists(schema, bt),
      s"no branch $branch of $schema.$table")
    val m = readManifest(schema, table)
    val bm = readManifest(schema, bt)
    val snaps = m.get("snapshots").asInstanceOf[ArrayNode]
    val bsnaps = bm.get("snapshots").asInstanceOf[ArrayNode]
    val out = mutable.ArrayBuffer[(Long, String, String)]()
    if (bsnaps.size() < snaps.size())
      out += ((-1L, "base_longer",
        s"base has ${snaps.size()} snapshots, branch has ${bsnaps.size()} — " +
          "the base advanced past the branch point"))
    (0 until math.min(snaps.size(), bsnaps.size())).foreach { i =>
      val a = snaps.get(i)
      val b = bsnaps.get(i)
      val aid = a.get("id").asLong()
      val bid = b.get("id").asLong()
      if (aid != bid)
        out += ((i.toLong, "id_mismatch", s"base snapshot $aid vs branch $bid"))
      else {
        val aDirs = filesOf(a).map(fe => baseRelativeDir(table, fe.dir)).toSet
        val bDirs = filesOf(b).map(fe => baseRelativeDir(bt, fe.dir)).toSet
        if (aDirs != bDirs)
          out += ((i.toLong, "dirs_differ",
            s"snapshot $aid: base-only [${(aDirs -- bDirs).toSeq.sorted.mkString(",")}], " +
              s"branch-only [${(bDirs -- aDirs).toSeq.sorted.mkString(",")}]"))
      }
    }
    val aSchemas = m.get("schemas").asInstanceOf[ArrayNode]
    val bSchemas = bm.get("schemas").asInstanceOf[ArrayNode]
    if (aSchemas.size() > bSchemas.size())
      out += ((-1L, "schema_diverged",
        s"base has ${aSchemas.size()} schema versions, branch has ${bSchemas.size()}"))
    else (0 until aSchemas.size()).foreach { i =>
      if (aSchemas.get(i) != bSchemas.get(i))
        out += ((i.toLong, "schema_diverged", s"schema version $i differs"))
    }
    if (out.isEmpty) {
      val ahead = bsnaps.size() - snaps.size()
      out += ((-1L, if (ahead > 0) "fast_forwardable" else "in_sync",
        s"branch is $ahead snapshot(s) ahead of the base"))
    }
    out.toSeq
  }

  def fastForward(schema: String, table: String, branch: String): Long = {
    require(splitBranch(table)._2.isEmpty,
      s"$table is itself a branch — fast-forward targets the base table")
    val bt = s"$table$BranchSep$branch"
    require(tableManifestExists(schema, bt),
      s"no branch $branch of $schema.$table")
    val m = readManifest(schema, table)
    val bm = readManifest(schema, bt)
    val snaps = m.get("snapshots").asInstanceOf[ArrayNode]
    val bsnaps = bm.get("snapshots").asInstanceOf[ArrayNode]
    def diverged(why: String) = throw new IllegalStateException(
      s"cannot fast-forward $schema.$table to branch $branch: $why — " +
        "the base advanced since the branch point; create a fresh branch " +
        "from the current head and replay the work instead")
    if (bsnaps.size() < snaps.size()) diverged("the base log is longer than the branch log")
    (0 until snaps.size()).foreach { i =>
      val a = snaps.get(i)
      val b = bsnaps.get(i)
      if (a.get("id").asLong() != b.get("id").asLong())
        diverged(s"snapshot ids differ at position $i")
      val aDirs = filesOf(a).map(fe => baseRelativeDir(table, fe.dir)).toSet
      val bDirs = filesOf(b).map(fe => baseRelativeDir(bt, fe.dir)).toSet
      if (aDirs != bDirs)
        diverged(s"snapshot ${a.get("id").asLong()} references different dirs")
    }
    val aSchemas = m.get("schemas").asInstanceOf[ArrayNode]
    val bSchemas = bm.get("schemas").asInstanceOf[ArrayNode]
    if (aSchemas.size() > bSchemas.size()) diverged("schema history diverged")
    (0 until aSchemas.size()).foreach { i =>
      if (aSchemas.get(i) != bSchemas.get(i)) diverged("schema history diverged")
    }
    val headId =
      if (bsnaps.size() == 0) 0L
      else bsnaps.get(bsnaps.size() - 1).get("id").asLong()
    if (bsnaps.size() == snaps.size()) return headId // nothing to adopt
    // dir reference conversion INTO the base lineage: base-relative form,
    // then plain for base-local names, `~/`-marked for everything shared
    def toBaseRef(dir: String): String = {
      val r = baseRelativeDir(bt, dir)
      if (r.contains("/")) BaseRelMarker + r else r
    }
    def convertEntries(arr: ArrayNode): Unit =
      (0 until arr.size()).foreach { j =>
        val e = arr.get(j).asInstanceOf[ObjectNode]
        e.put("dir", toBaseRef(e.get("dir").asText()))
      }
    (0 until bsnaps.size()).foreach { i =>
      val s = bsnaps.get(i).asInstanceOf[ObjectNode]
      convertEntries(s.get("files").asInstanceOf[ArrayNode])
      if (s.has("added")) convertEntries(s.get("added").asInstanceOf[ArrayNode])
      if (s.has("removed")) {
        val r = s.get("removed").asInstanceOf[ArrayNode]
        val conv = (0 until r.size()).map(j => toBaseRef(r.get(j).asText()))
        r.removeAll()
        conv.foreach(r.add)
      }
    }
    // "changelog" rides along: its keys are dirs too, and the adopted
    // snapshots keep their ids, so branch-built producer coverage
    // survives the fast-forward (pre-fork coverage was dropped at branch
    // creation and falls back to read-time resolution)
    Seq("dirStats", "dvIndex", "bloomIdx", "dynIdx", "changelog").foreach { f =>
      if (bm.has(f)) {
        val old = bm.get(f).asInstanceOf[ObjectNode]
        val next = mapper.createObjectNode()
        old.fieldNames().forEachRemaining(k =>
          next.set[JsonNode](toBaseRef(k), old.get(k)))
        bm.set[JsonNode](f, next)
      }
    }
    // retention promises merge; the base's win on a name conflict
    if (m.has("tags")) {
      val baseTags = m.get("tags").asInstanceOf[ObjectNode]
      val next =
        if (bm.has("tags")) bm.get("tags").asInstanceOf[ObjectNode]
        else bm.putObject("tags")
      baseTags.fieldNames().forEachRemaining(k =>
        next.put(k, baseTags.get(k).asLong()))
    }
    // consumption scopes stay with the base lineage
    bm.remove("consumers")
    m.get("consumers") match {
      case c: ObjectNode => bm.set[JsonNode]("consumers", c)
      case _ => ()
    }
    bm.remove("lastStreamBatchId")
    m.get("lastStreamBatchId") match {
      case b: JsonNode if !b.isMissingNode && !b.isNull =>
        bm.set[JsonNode]("lastStreamBatchId", b)
      case _ => ()
    }
    bm.put("name", table)
    bm.remove("branchOf")
    bm.remove("branchBaseId")
    bm.remove("branchCreatedMillis")
    // continue the BASE's CAS chain — concurrent base commits lose/abort
    if (m.has("commitVersion"))
      bm.set[JsonNode]("commitVersion", m.get("commitVersion"))
    else bm.remove("commitVersion")
    writeManifest(schema, table, bm)
    headId
  }

  /** Delete a branch lineage. Refused while another lineage still
    * references dirs INSIDE the branch (the base adopted branch commits
    * via fast-forward): deleting would tear shared history — expire or
    * compact the referencing lineage first, then delete. Dirs of the
    * BASE the branch alone was pinning become reclaimable by the base's
    * next expiration/orphan sweep. */
  def deleteBranch(schema: String, table: String, branch: String): Unit = {
    require(splitBranch(table)._2.isEmpty,
      s"$table is itself a branch — deleteBranch targets the base table")
    val bt = s"$table$BranchSep$branch"
    require(tableManifestExists(schema, bt),
      s"no branch $branch of $schema.$table")
    val prefix = s"$BranchDirName/$branch/"
    val pinnedInside = siblingLineageRefs(schema, bt).filter(_.startsWith(prefix))
    require(pinnedInside.isEmpty,
      s"cannot delete branch $branch of $schema.$table: " +
        s"${pinnedInside.size} of its dirs (e.g. ${pinnedInside.head}) are " +
        "still referenced by another lineage (fast-forwarded history) — " +
        "expire or compact that lineage first")
    fs.delete(tablePath(schema, bt), true)
    GraftCatalog.purgeHeadCache(fs.makeQualified(tablePath(schema, bt)).toString)
    ()
  }

  /** One row per branch: (branch, base_snapshot_id, head_snapshot_id,
    * commits_since_branch, created_millis) — the `$branches` view. */
  def branchesTable(schema: String, table: String): DataFrame = {
    import spark.implicits._
    branchNames(schema, table).map { b =>
      val bm = readManifest(schema, s"$table$BranchSep$b")
      val snaps = bm.get("snapshots").asInstanceOf[ArrayNode]
      val head =
        if (snaps.size() == 0) 0L
        else snaps.get(snaps.size() - 1).get("id").asLong()
      val baseId = bm.path("branchBaseId").asLong(0L)
      (b, baseId, head,
        (0 until snaps.size()).count(i => snaps.get(i).get("id").asLong() > baseId).toLong,
        bm.path("branchCreatedMillis").asLong(0L))
    }.toDF("branch", "base_snapshot_id", "head_snapshot_id",
      "commits_since_branch", "created_millis")
  }
}

package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** NAMED SNAPSHOT REFS (r14): immutable TAGS over manifest versions —
  * the read half of Iceberg's refs model (`CREATE TAG` /
  * `VERSION AS OF 'name'`). A tag is a human name for one committed
  * version: `audit-2024q1` instead of "whatever v7 was". Three
  * contracts make it more than a convenience map:
  *
  *  - **Resolution**: `VERSION AS OF '<tag>'` pins the read to the
  *    tagged version through exactly the same pinned-table path as a
  *    numeric version — the tag layer adds a name lookup, nothing else,
  *    so every pinned-read guarantee (own DV state, own live set, loud
  *    failure on a vacuumed basis) is inherited, not re-implemented.
  *  - **Retention**: [[GraftCatalog.vacuum]] / `expire_snapshots` NEVER
  *    reclaim a tagged version — a tag is a retention statement ("this
  *    snapshot is load-bearing"), which is the reason Iceberg tags
  *    exist. Dropping the tag releases the snapshot to normal policy.
  *  - **Immutability**: a tag never moves. Re-pointing is DROP +
  *    CREATE — two loud statements, never a silent redefinition of
  *    what an audit already cited.
  *
  * Storage: `_refs.json` in the table root — `{"tags": {name: v}}` —
  * written tmp+rename like the schema sidecar (a reader never sees a
  * partial file), read-modify-write serialized per JVM (the source's
  * standing single-writer contract covers cross-process races; the
  * worst case is a lost tag, never a corrupt file). Underscore-named:
  * invisible to data listings, untouched by vacuum's data sweep. */
private[sources] object JsonDocRefs {
  private val FileName = "_refs.json"
  private val lock = new Object

  /** Tag names must be distinguishable from numeric versions at the
    * `VERSION AS OF` surface (an all-digit tag would shadow — or be
    * shadowed by — a version number, silently). */
  private val NamePattern = "[A-Za-z][A-Za-z0-9._-]*".r

  private def section(path: String, key: String): Map[String, Int] = {
    val f = new java.io.File(path, FileName)
    if (!f.isFile) return Map.empty
    val root = new ObjectMapper().readTree(f)
    Option(root.get(key)).map { t =>
      t.fields().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
    }.getOrElse(Map.empty)
  }

  def tags(path: String): Map[String, Int] = section(path, "tags")

  /** BRANCHES (r14): name -> HEAD version of a chain of STAGED
    * snapshots — multi-commit write-audit-publish. A write carrying the
    * `branch` option stages onto the branch's head (parent = head), so
    * successive writes build on each other while staying invisible to
    * every current read; `CALL publish` walks the head's parent chain
    * to its published fork point and re-applies the CUMULATIVE delta.
    * The head pointer moves (unlike tags) — it is updated by the commit
    * that extends the chain. */
  def branches(path: String): Map[String, Int] = section(path, "branches")

  def createBranch(path: String, name: String): Unit = lock.synchronized {
    require(NamePattern.matches(name),
      s"graft-jsondoc: branch name '$name' must start with a letter and use only " +
        "letters, digits, '.', '_', '-'")
    val (t, b) = (tags(path), branches(path))
    require(!t.contains(name) && !b.contains(name),
      s"graft-jsondoc: ref '$name' already exists on $path")
    // head 0 = "no staged commits yet": the first branch write stages
    // off the then-current published version and becomes the head
    write(path, t, b + (name -> 0))
  }

  /** Repoint a branch head after a chain-extending commit (caller =
    * the commit path, under the source's single-writer contract). */
  private[sources] def setBranchHead(path: String, name: String, v: Int): Unit =
    lock.synchronized {
      val b = branches(path)
      require(b.contains(name), s"graft-jsondoc: no branch '$name' on $path")
      write(path, tags(path), b + (name -> v))
    }

  /** Drop the branch POINTER; its staged manifests become orphan stages
    * (discard them, or let retention reclaim them). */
  def dropBranch(path: String, name: String): Unit = lock.synchronized {
    val b = branches(path)
    require(b.contains(name), s"graft-jsondoc: no branch '$name' on $path" +
      (if (b.isEmpty) "" else s" (branches: ${b.keys.toSeq.sorted.mkString(", ")})"))
    write(path, tags(path), b - name)
  }

  private def write(path: String, allTags: Map[String, Int],
      allBranches: Map[String, Int]): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val t = root.putObject("tags")
    allTags.toSeq.sortBy(_._1).foreach { case (n, v) => t.put(n, v) }
    if (allBranches.nonEmpty) {
      val b = root.putObject("branches")
      allBranches.toSeq.sortBy(_._1).foreach { case (n, v) => b.put(n, v) }
    }
    val dir = new java.io.File(path)
    val tmp = new java.io.File(dir,
      s".$FileName.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    java.nio.file.Files.writeString(tmp.toPath, mapper.writeValueAsString(root))
    val dst = new java.io.File(dir, FileName)
    if (!tmp.renameTo(dst)) {
      dst.delete() // non-POSIX fallback
      if (!tmp.renameTo(dst))
        throw new java.io.IOException(s"refs sidecar rename failed in $path")
    }
  }

  /** Tag `name` -> version `v`. Refuses: a malformed/numeric-shaped
    * name, an existing tag (immutability: re-point = drop + create),
    * and a version with no readable manifest (a tag must name a
    * snapshot that exists NOW — it protects from future expiry, it
    * cannot resurrect the past). */
  def createTag(path: String, name: String, v: Int): Unit = lock.synchronized {
    require(NamePattern.matches(name),
      s"graft-jsondoc: tag name '$name' must start with a letter and use only " +
        "letters, digits, '.', '_', '-' (a numeric name would be ambiguous " +
        "with a version number at VERSION AS OF)")
    if (JsonDocVersions.read(path, v).isEmpty)
      throw new IllegalArgumentException(
        s"graft-jsondoc: cannot tag snapshot v$v of $path — no such committed " +
          "version (expired, vacuumed, or never existed)")
    val all = tags(path)
    if (all.contains(name) || branches(path).contains(name))
      throw new IllegalArgumentException(
        s"graft-jsondoc: ref '$name' already exists; tags are " +
          "immutable — DROP it first to re-point")
    write(path, all + (name -> v), branches(path))
  }

  /** Remove `name`, releasing its snapshot to normal retention policy.
    * Unknown names are refused (a typo'd drop that silently "succeeds"
    * leaves the real tag — and its retention pin — in place). */
  def dropTag(path: String, name: String): Unit = lock.synchronized {
    val all = tags(path)
    if (!all.contains(name))
      throw new IllegalArgumentException(
        s"graft-jsondoc: no tag '$name' on $path" +
          (if (all.isEmpty) "" else s" (tags: ${all.keys.toSeq.sorted.mkString(", ")})"))
    write(path, all - name, branches(path))
  }

  /** Resolve a `VERSION AS OF` string: an integer is a version, else a
    * tag name; unknown tags fail loudly with the available names. */
  /** Resolve a `VERSION AS OF` string: an integer is a version, a tag
    * name its pinned version, a BRANCH name its current head (the audit
    * read of the staged chain; a head of 0 = empty branch is refused —
    * there is nothing to read). Unknown names fail with the inventory. */
  def resolve(path: String, version: String): Int =
    version.toIntOption.getOrElse {
      val t = tags(path)
      t.get(version).orElse {
        branches(path).get(version).map { h =>
          if (h == 0) throw new IllegalArgumentException(
            s"graft catalog: branch '$version' of $path has no commits yet")
          h
        }
      }.getOrElse(throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF '$version' names neither an integer " +
          s"snapshot version nor a ref of $path" +
          (if (t.isEmpty && branches(path).isEmpty) ""
           else s" (tags: ${t.keys.toSeq.sorted.mkString(", ")}; " +
             s"branches: ${branches(path).keys.toSeq.sorted.mkString(", ")})")))
    }
}

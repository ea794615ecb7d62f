package graft.sources

/** The manifest layer's OBJECT-STORE SEAM (r14): every filesystem
  * operation [[JsonDocVersions]] performs is one of these five
  * primitives, so the optimistic-concurrency story is swappable instead
  * of local-FS prose. The binding primitive is `putIfAbsent` — the
  * commit compare-and-swap: it must FAIL, never replace, when the name
  * already exists (replace is the lost-update shape: two racing
  * committers both computing latest+1 would have the second erase the
  * first's manifest, dropping its files from the live set with the data
  * already on disk).
  *
  * Local FS implements the CAS with a hard link (`Files.createLink`
  * throws on an existing destination, unlike rename(2) which silently
  * replaces). A cloud deployment swaps in its store's conditional put —
  * S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`, ADLS
  * `If-None-Match: *` — and every retry/rebase/conflict decision above
  * the seam is unchanged; CommitStoreSpec re-certifies that logic
  * against an in-memory fake with injected races. */
private[graft] trait CommitStore {
  /** Atomically create `name` under `dir` with `content` IFF absent;
    * false when the name already exists (the CAS failure a committer
    * rebases or aborts on). The write itself must be all-or-nothing — a
    * reader may never observe a partial `content`. */
  def putIfAbsent(dir: String, name: String, content: String): Boolean

  /** File names directly under `dir` (no recursion — commit metadata
    * lives in the table root). */
  def list(dir: String): Seq[String]

  def read(dir: String, name: String): Option[String]

  /** Commit time of `name`, epoch millis (None when absent). */
  def mtime(dir: String, name: String): Option[Long]

  def delete(dir: String, name: String): Boolean

  /** Overwrite-put for ADVISORY metadata only (the `_head.json`
    * resolution pointer — r15): last-writer-wins is acceptable because
    * readers treat the content as a hint and fall back to the listing.
    * NEVER use for a commit artifact; those go through the CAS. The
    * default delete+create is non-atomic — a reader racing the gap sees
    * "missing" and takes the fallback, which is correct by contract. */
  def put(dir: String, name: String, content: String): Unit = {
    delete(dir, name)
    putIfAbsent(dir, name, content)
    ()
  }
}

private[graft] object LocalFsCommitStore extends CommitStore {
  override def putIfAbsent(dir: String, name: String, content: String): Boolean = {
    val d = new java.io.File(dir)
    d.mkdirs()
    // process-unique temp: two PROCESSES retrying the same version must
    // not collide on the temp either. Explicit UTF-8 (Files.writeString
    // default) — every reader parses UTF-8.
    val tmp = new java.io.File(d,
      s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    java.nio.file.Files.writeString(tmp.toPath, content)
    try {
      java.nio.file.Files.createLink(new java.io.File(d, name).toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally tmp.delete()
  }

  override def list(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getName).toSeq

  override def read(dir: String, name: String): Option[String] = {
    val f = new java.io.File(dir, name)
    if (!f.isFile) None
    else Some(java.nio.file.Files.readString(f.toPath))
  }

  override def mtime(dir: String, name: String): Option[Long] = {
    val f = new java.io.File(dir, name)
    if (!f.isFile) None else Some(f.lastModified())
  }

  override def delete(dir: String, name: String): Boolean =
    new java.io.File(dir, name).delete()

  /** Atomic overwrite via tmp + rename (rename(2) replaces): a reader
    * never sees a partial head file, only old-or-new. */
  override def put(dir: String, name: String, content: String): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val tmp = new java.io.File(d,
      s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    java.nio.file.Files.writeString(tmp.toPath, content)
    val dst = new java.io.File(d, name)
    if (!tmp.renameTo(dst)) {
      dst.delete() // non-POSIX fallback
      if (!tmp.renameTo(dst)) {
        tmp.delete()
        throw new java.io.IOException(s"head-pointer rename failed: $name in $dir")
      }
    }
  }
}

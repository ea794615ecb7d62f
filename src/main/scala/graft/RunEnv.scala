package graft

import org.apache.spark.sql.Dataset

/** Per-JVM run isolation for queries that materialize scratch layouts
  * under `java.io.tmpdir` (q44 json/csv roundtrip, q48 DSv2 response
  * files, q64 bucketed tables).
  *
  * Two JVMs verifying different scale factors concurrently must never
  * interleave writes and reads on a shared path — that is a latent
  * wrong-answer mechanism, not just flakiness. Every scratch path embeds
  * a per-JVM random tag; within one JVM re-runs reuse the same path via
  * `mode("overwrite")`. All tagged paths are deleted by a JVM shutdown
  * hook so repeated bench/verify runs don't accumulate disk under tmpdir
  * (catalog entries for tables saved at these paths live in the session's
  * in-memory catalog and die with the JVM by themselves).
  */
object RunTag {
  val tag: String = java.util.UUID.randomUUID().toString.take(8)

  private val created = scala.collection.mutable.LinkedHashSet[String]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized(created.toSeq).foreach(p => delete(new java.io.File(p)))))

  /** A tmpdir-scoped scratch directory unique to this JVM, registered for
    * recursive deletion at JVM exit. Stable within the JVM: the same
    * `name` always maps to the same path. */
  def scratch(name: String): String = {
    hookInstalled
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$tag"
    created.synchronized { created += p }
    p
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}

/** Harness-level cache hygiene. Several queries `.cache()` an input that
  * both a driver-side guard/fit (count, k-means) and the RETURNED plan
  * read — so the operator itself cannot unpersist without recomputing its
  * own result. Those caches register here, and the harness (Verify/Bench)
  * drains the registry after materializing each query, so cached blocks
  * never accumulate across a 77-query session and never perturb later
  * queries' memory or timings. Unpersist-after-materialize is safe by
  * construction: a drained cache only costs recompute if the same
  * DataFrame were re-executed later, which the harness never does.
  */
object Caches {
  private val pending = scala.collection.mutable.ArrayBuffer[Dataset[_]]()

  /** Register a cached Dataset for deferred unpersist; returns it. */
  def register[T](ds: Dataset[T]): Dataset[T] =
    synchronized { pending += ds; ds }

  /** Unpersist every registered cache (blocking=false) and clear. A
    * registration whose SparkSession has since been stopped (possible in
    * multi-session test JVMs) is simply discarded — there is no block
    * manager left to hold its blocks. */
  def drain(): Unit = synchronized {
    pending.foreach { ds =>
      try ds.unpersist()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    pending.clear()
  }

  /** Number of registered, not-yet-drained caches (for tests). */
  def pendingCount: Int = synchronized(pending.size)
}

package graft.tools

/** Scratch-directory helper for queries that must materialize an
  * on-disk layout mid-plan (q_compact's fragment/compact rewrite,
  * q_zorder_prune's z-ordered file set). Callers compute their
  * result EAGERLY (localCheckpoint) inside `withDir`, because the
  * directory is deleted on exit — a lazily-evaluated DataFrame that
  * still references the scratch files would fail downstream
  * (ADVICE r7: the previous keep-forever design leaked two parquet
  * trees per invocation across bench/correctness runs, and its
  * String.hashCode subdir key could collide across datasets).
  */
object Scratch {

  /** Create a fresh temp directory, run `f`, always delete the tree.
    * Each call gets its own directory — no cross-dataset keying, no
    * collisions, nothing survives the call.
    */
  def withDir[T](prefix: String)(f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try f(dir)
    finally deleteRecursively(new java.io.File(dir))
  }

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}

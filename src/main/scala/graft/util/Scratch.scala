package graft.util

/** Per-JVM scratch space for registered queries that materialize a
  * working copy (a published snapshot, a persisted index, a streaming
  * checkpoint). Everything lives under one temp root that a shutdown
  * hook removes, so repeated benchmark/verify runs in one JVM — and
  * across JVMs on one host — never accumulate disk.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}

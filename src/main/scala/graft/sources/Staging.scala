package graft.sources

import java.nio.file.{Files, Path}

/** Scratch directories for queries that stage files (stream-source
  * copies, sink round-trips). All scratch space lives under one per-JVM
  * root that a shutdown hook deletes recursively — repeated Verify/Bench
  * runs stage hundreds of MB per pass and must not accumulate in /tmp.
  */
object Staging {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-stage-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** Fresh scratch directory, removed on JVM exit. */
  def scratchDir(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }
}

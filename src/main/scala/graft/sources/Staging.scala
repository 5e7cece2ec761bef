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

  /** Copy a parquet TABLE path into `dest`, flattening to
    * `<prefix>_<i>.parquet` files, and return the staged paths in
    * stable order. A table path is a single file at small scale but a
    * DIRECTORY of part files once any distributed writer produced it —
    * a raw Files.copy of the latter yields an empty directory and a
    * stream source that silently reads nothing (the sf1 streaming
    * regression this guards).
    */
  def stageTable(src: String, dest: Path, prefix: String): Seq[Path] = {
    val s = java.nio.file.Paths.get(src)
    val parts: Seq[Path] =
      if (Files.isDirectory(s)) {
        val l = Files.list(s)
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala.toSeq
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .sortBy(_.getFileName.toString)
        } finally l.close()
      } else Seq(s)
    require(parts.nonEmpty, s"no parquet parts under $src")
    parts.zipWithIndex.map { case (p, i) =>
      val d = dest.resolve(f"${prefix}_$i%05d.parquet")
      Files.copy(p, d)
      d
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }
}

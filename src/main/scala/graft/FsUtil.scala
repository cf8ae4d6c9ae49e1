package graft

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by mains/queries (the store keeps its
  * own private copies with identical semantics).
  */
object FsUtil {

  /** Recursive delete, closing the walk stream (dir handles leak at ulimit
    * scale otherwise) and ignoring per-file failures.
    */
  def deleteRecursively(root: Path): Unit = {
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.toSeq.reverse
          .foreach(p => try Files.delete(p) catch { case _: Throwable => () })
      } finally stream.close()
    }
  }
}

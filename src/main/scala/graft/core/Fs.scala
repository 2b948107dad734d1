package graft.core

import java.nio.file.{Files, Path}

/** Tiny shared filesystem helpers — one copy of the walk-and-delete idiom
  * instead of per-file clones (a symlink/retry fix must land once).
  */
object Fs {

  /** Delete `p` and everything under it; no-op when absent. */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val stream = Files.walk(p)
    try stream.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f): Unit)
    finally stream.close()
  }

  def deleteRecursively(p: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(p))
}

package graft.core

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared across the engine (one implementation
  * instead of per-file copies that drift).
  */
object Fs {

  /** Recursive delete, deepest-first; the `Files.walk` stream is CLOSED
    * (an unclosed walk pins directory file descriptors until GC).
    */
  def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}

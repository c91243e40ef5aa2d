package graft.store

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Shared filesystem helpers for the store layer — one implementation of
  * recursive deletion so TableStore and VersionedStore cannot drift
  * (deleteIfExists tolerates a concurrent reaper racing the walk). */
private[store] object FsUtils {
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f =>
        Files.deleteIfExists(f))
      finally s.close()
    }
}

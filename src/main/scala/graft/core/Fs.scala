package graft.core

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** `Files.list` whose DirectoryStream is actually CLOSED (the javadoc
  * requires it; `.iterator().asScala` abandons the stream and holds the
  * directory fd until GC — fatal on hot paths like the SSE poll loop,
  * which lists the commit log many times per second per client). */
object Fs {
  /** Observable call counter: specs pin that hot serving paths (the SSE
    * poll tick) do NOT re-list directories per call. */
  val listCalls = new java.util.concurrent.atomic.AtomicLong(0)

  def list(dir: Path): Vector[Path] = {
    listCalls.incrementAndGet()
    val s = Files.list(dir)
    try s.iterator().asScala.toVector finally s.close()
  }
}

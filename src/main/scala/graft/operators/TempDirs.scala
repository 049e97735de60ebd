package graft.operators

/** JVM-exit recursive deletion for lazily-consumed temp dirs
  * (File.deleteOnExit alone cannot remove non-empty dirs). One shutdown
  * hook for all registrations; deletion failures are best-effort at
  * exit. Used by the streaming-replay harness (whose returned frames
  * read their temp output lazily, so eager deletion is impossible) and
  * by [[PairTable]]'s memoized materializations.
  */
object TempDirs {
  private val exitDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      exitDirs.forEach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(d)
      }
    }))

  /** Register `d` for recursive deletion when the JVM exits. */
  def deleteRecursivelyOnExit(d: java.io.File): Unit = {
    exitHook
    exitDirs.add(d): Unit
  }
}

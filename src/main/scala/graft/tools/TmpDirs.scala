package graft.tools

/** Temp work dirs for the scale tools, deleted on JVM exit — same
  * discipline as StreamQueries' paritySplits cleanup (ADVICE round 12):
  * long-lived hosts must not accumulate per-run table copies in /tmp. */
object TmpDirs {
  def tmpDirCleaned(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
}

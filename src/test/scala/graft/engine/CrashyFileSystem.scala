package graft.engine

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Test-only FileSystem modelling an OBJECT STORE's rename: not a
  * metadata operation but copy-then-delete, and therefore interruptible
  * partway with the copied prefix left visible at the destination —
  * exactly S3A's rename emulation. Armed via [[CrashyFileSystem$]]: a
  * rename whose destination name matches `crashDstRegex` copies
  * `crashAfterFiles` files (sorted, deterministic) and then throws; all
  * other renames delegate to the local atomic rename so parquet's
  * committer machinery stays out of the blast radius and the injection
  * lands precisely on the publish rename under test.
  *
  * Registered per-test as scheme `crashy` through
  * `fs.crashy.impl` in the Hadoop conf.
  */
class CrashyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "crashy"
  override def getUri: java.net.URI = java.net.URI.create("crashy:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (CrashyFileSystem.armedFor(dst)) {
      // the non-atomic emulation: copy file-by-file, crash mid-flight,
      // leave the partial destination behind (S3 has no way to undo
      // the already-PUT objects)
      mkdirs(dst)
      val files = listStatus(src).filter(_.isFile)
        .sortBy(_.getPath.getName)
      files.take(CrashyFileSystem.crashAfterFiles).foreach { st =>
        FileUtil.copy(this, st.getPath, this,
          new Path(dst, st.getPath.getName), false, getConf)
      }
      throw new java.io.IOException(
        s"CrashyFileSystem: injected crash mid-rename $src -> $dst " +
          s"(${CrashyFileSystem.crashAfterFiles} of ${files.length} files copied)")
    } else super.rename(src, dst)
  }
}

object CrashyFileSystem {
  /** Destination-name pattern that arms the crash; None = behave as a
    * plain local FS.
    */
  @volatile var crashDstRegex: Option[scala.util.matching.Regex] = None

  /** How many files of the source survive the copy before the crash. */
  @volatile var crashAfterFiles: Int = 3

  def armedFor(dst: Path): Boolean =
    crashDstRegex.exists(_.findFirstIn(dst.getName).isDefined)

  def disarm(): Unit = crashDstRegex = None
}

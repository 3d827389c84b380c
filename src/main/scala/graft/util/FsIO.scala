package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Hadoop-FileSystem-based small-object IO for the restart paths
 * (ANN watermarks, IVF centroids, drift baselines). Everything durable
 * goes through the SAME filesystem abstraction the posting stores use
 * ([[graft.text.PostingStore]]): `java.io.File` probes silently see
 * nothing on any non-local scheme, turning a restart into an empty
 * index with no error. Writes are tmp + atomic-rename — a crash at any
 * point leaves the previous complete file or the new complete file,
 * never a torn one (rename of a file is atomic on local FS and HDFS).
 */
object FsIO {

  def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new Path(path).toUri, spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def isDir(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path); val p = new Path(path)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  /** Names of the immediate subdirectories of `dir` (empty if absent). */
  def listSubdirs(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir); val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    fs(spark, path).delete(new Path(path), true); ()
  }

  /**
   * Rename `tmp` onto `dst`, REPLACING any existing file in one atomic
   * step. `FileContext.rename(OVERWRITE)` maps to an atomic rename(2) /
   * HDFS overwrite-rename — unlike delete-then-`FileSystem.rename`,
   * there is no window where NEITHER file exists (a crash there would
   * make a restart see "no manifest" and silently open empty state).
   * Filesystems without a FileContext binding fall back to the
   * delete+rename pair (their rename contract varies anyway).
   */
  def renameOverwrite(spark: SparkSession, tmp: Path, dst: Path): Unit =
    try {
      org.apache.hadoop.fs.FileContext
        .getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        val f = fs(spark, dst.toString)
        f.delete(dst, false)
        if (!f.rename(tmp, dst))
          throw new java.io.IOException(s"atomic rename failed at $dst")
    }

  /** Write UTF-8 text to `path` via tmp + atomic overwrite-rename. */
  def writeTextAtomic(spark: SparkSession, path: String, text: String): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    renameOverwrite(spark, tmp, new Path(path))
  }

  /** Read `path` as UTF-8 text; None when absent. */
  def readText(spark: SparkSession, path: String): Option[String] = {
    val f = fs(spark, path); val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Serialize one object to `path` via tmp + atomic overwrite-rename. */
  def writeObjAtomic(spark: SparkSession, path: String, obj: AnyRef): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path + ".tmp")
    val out = new java.io.ObjectOutputStream(f.create(tmp, true))
    try out.writeObject(obj) finally out.close()
    renameOverwrite(spark, tmp, new Path(path))
  }

  /** Deserialize the object at `path`; None when the file is absent. */
  def readObj[T](spark: SparkSession, path: String): Option[T] = {
    val f = fs(spark, path); val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val in = new java.io.ObjectInputStream(f.open(p))
      try Some(in.readObject().asInstanceOf[T]) finally in.close()
    }
  }
}

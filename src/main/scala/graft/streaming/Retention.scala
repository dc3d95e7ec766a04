package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Size-based retention for metric directories (reference S11,
  * reddit_consumer.py:249-279): if the sum of data-file sizes in a directory
  * exceeds the cap, delete oldest-by-mtime files until under the cap.
  *
  * Not a Spark operator — a small utility applied after single-file appends,
  * exactly like the reference applies cleanup_old_files after each metric
  * write. Resolved through the Hadoop FileSystem API (like the replay sweep
  * and Compaction) so the policy works on any supported scheme, not just
  * java.io-visible paths. Only parquet part files are considered (Spark
  * side-files like _SUCCESS are ignored for the size accounting and never
  * deleted).
  */
object Retention {

  /** The active session's Hadoop conf when one exists (it carries
    * spark.hadoop.* credentials/endpoints — a bare Configuration only sees
    * classpath XML); plain defaults otherwise (local-path unit use). */
  private def fsFor(path: Path): FileSystem =
    path.getFileSystem(SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration()))

  def dataFiles(dir: String): Seq[FileStatus] = {
    val path = new Path(dir)
    val fs = fsFor(path)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Enforce the cap; returns the deleted files' names (oldest first). */
  def enforce(dir: String, maxBytes: Long): Seq[String] = {
    val path = new Path(dir)
    val fs = fsFor(path)
    var files = dataFiles(dir)
      .sortBy(st => (st.getModificationTime, st.getPath.getName))
    var total = files.map(_.getLen).sum
    val deleted = Seq.newBuilder[String]
    while (total > maxBytes && files.nonEmpty) {
      val oldest = files.head
      // Hadoop reports delete failure by RETURNING false — only a
      // successful delete counts as freed space, or the cap is silently
      // unenforced whenever a file can't be removed
      if (fs.delete(oldest.getPath, false)) {
        total -= oldest.getLen
        deleted += oldest.getPath.getName
      }
      files = files.tail
    }
    deleted.result()
  }
}

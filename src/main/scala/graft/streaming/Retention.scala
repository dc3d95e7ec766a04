package graft.streaming

import java.io.File

/** Size-based retention for metric directories (reference S11,
  * reddit_consumer.py:249-279): if the sum of data-file sizes in a directory
  * exceeds the cap, delete oldest-by-mtime files until under the cap.
  *
  * Not a Spark operator — a small JVM utility applied after single-file
  * appends, exactly like the reference applies cleanup_old_files after each
  * metric write. Only parquet part files are considered (Spark side-files
  * like _SUCCESS are ignored for the size accounting and never deleted).
  */
object Retention {

  def dataFiles(dir: String): Seq[File] = {
    val d = new File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  /** Enforce the cap; returns the deleted files' names (oldest first). */
  def enforce(dir: String, maxBytes: Long): Seq[String] = {
    var files = dataFiles(dir).sortBy(f => (f.lastModified, f.getName))
    var total = files.map(_.length).sum
    val deleted = Seq.newBuilder[String]
    while (total > maxBytes && files.nonEmpty) {
      val oldest = files.head
      total -= oldest.length
      if (oldest.delete()) deleted += oldest.getName
      files = files.tail
    }
    deleted.result()
  }
}

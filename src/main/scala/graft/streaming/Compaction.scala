package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for append-heavy parquet directories.
  *
  * A streaming pipeline writing one file per micro-batch (the reference's
  * shape, and `MicroBatchPipeline`'s metric sinks) accumulates thousands of
  * tiny files; at scale the NameNode/listing pressure and per-file open
  * cost dominate reads long before data volume does. Compaction rewrites
  * the directory into ~`targetBytes` files: read once, `repartition` to the
  * computed file count, write to a sibling temp dir, then swap.
  *
  * The swap is delete-then-rename — atomic per rename on HDFS-like
  * filesystems but with a visible gap; production table formats close that
  * gap with a manifest/snapshot layer (Delta/Iceberg), which is out of
  * scope here by design. Callers pause readers across `compact` (the
  * streaming pipeline runs it between batches, where no reader races).
  */
object Compaction {

  /** @return (filesBefore, filesAfter) — unchanged when already compact. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return (0, 0)
    val dataFiles = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (dataFiles.length <= targetFiles) return (dataFiles.length, dataFiles.length)

    val tmp = new Path(dir + ".compacting")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // the Hadoop FS API reports these failures by RETURNING false, not by
    // throwing — swallowing them here would strand the data in tmp while
    // the reader-visible path 404s (silent data loss); fail loudly instead
    if (!fs.delete(path, true))
      throw new java.io.IOException(
        s"compaction: failed to remove $path (rewrite preserved at $tmp)")
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(
        s"compaction: failed to publish $tmp as $path (data intact at $tmp)")
    val after = fs.listStatus(path)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }
}

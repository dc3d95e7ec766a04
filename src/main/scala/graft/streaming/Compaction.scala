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

  /** Compaction for the Stream* maintainers' per-batch DELTA-LOG layout
    * (nested `<name>_b<id>.parquet` batch DIRECTORIES under the log
    * root — [[compact]] sees no top-level data files there and silently
    * no-ops, which is exactly the wrong failure mode for the layout the
    * maintainers actually write; found in round 15 while wiring
    * StreamIndex).
    *
    * Folds every batch directory EXCEPT the `keepLast` newest into one
    * `compacted.parquet` directory (recursive read → repartition to
    * ~`targetBytes` files → temp-dir swap). Correctness: the maintainers'
    * delta rows are additive counters, so collapsing file/batch
    * boundaries never changes a fold; recovery safety comes from the
    * `keepLast` guard — foreachBatch checkpoint recovery can replay (and
    * fixed-path overwrite) only the LAST uncommitted batch, so dirs
    * older than the newest `keepLast` can never be rewritten in place
    * and are safe to absorb. An existing `compacted.parquet` from a
    * previous pass is re-absorbed (ids -1, always oldest). Run between
    * batches / with readers paused, like [[compact]].
    *
    * @return (batchDirsBefore, batchDirsAfter) — unchanged when there is
    *         nothing to gain (≤ 1 dir in the compaction set). */
  def compactLog(spark: SparkSession, logDir: String, keepLast: Int = 2,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val path = new Path(logDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return (0, 0)
    val dirs = fs.listStatus(path).filter(_.isDirectory).map(_.getPath)
    if (dirs.isEmpty) return (0, 0)
    def bid(p: Path): Long =
      "\\d+".r.findAllIn(p.getName).toSeq.lastOption
        .map(_.toLong).getOrElse(-1L) // compacted.parquet sorts oldest
    val sorted = dirs.sortBy(bid)
    val (olds, kept) = sorted.splitAt(math.max(0, sorted.length - keepLast))
    if (olds.length <= 1) return (dirs.length, dirs.length)

    val totalBytes = olds.map(d => fs.getContentSummary(d).getLength).sum
    val targetFiles =
      math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(logDir + ".compacting")
    fs.delete(tmp, true)
    spark.read.option("recursiveFileLookup", "true")
      .parquet(olds.map(_.toString): _*)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // fail loudly on FS-API false returns, like compact(): a swallowed
    // delete/rename here silently double-counts or loses deltas
    for (d <- olds)
      if (!fs.delete(d, true))
        throw new java.io.IOException(
          s"compactLog: failed to remove $d (rewrite preserved at $tmp)")
    val dest = new Path(path, "compacted.parquet")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(
        s"compactLog: failed to publish $tmp as $dest (data intact at $tmp)")
    (dirs.length, kept.length + 1)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared delta-log reader for the streaming maintainers.
  *
  * Every Stream* maintainer appends per-batch parquet deltas under a log
  * directory and serves its readouts by folding that log. A FRESHLY
  * started maintainer (no batch appended yet, or every batch empty and
  * skipped — processBatch skips empty batches by design) has no log
  * directory at all, so a naive `spark.read.parquet` throws
  * `AnalysisException: PATH_NOT_FOUND` — an unacceptable operational edge
  * for a monitoring readout that a dashboard may poll before the first
  * batch lands. [[emptyOr]] degrades that case to the EMPTY relation in
  * the module's declared delta schema, so every downstream report
  * function runs its normal plan and returns an empty (or identity)
  * readout instead of throwing.
  *
  * Each module pins its delta schema as a `DeltaDdl` constant; the
  * FreshMaintainerSpec sweep asserts (a) the constant matches what
  * `processBatch` actually writes (no drift) and (b) every readout on a
  * fresh directory collects without throwing.
  */
private[graft] object DeltaLog {

  /** The folded-log input relation: the recursive parquet read of `dir`
    * when it exists, else the empty relation in `ddl`'s schema. */
  def emptyOr(spark: SparkSession, dir: String, ddl: String): DataFrame =
    emptyOr(spark, dir, StructType.fromDDL(ddl))

  def emptyOr(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.option("recursiveFileLookup", "true").parquet(dir)
    else
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
  }
}

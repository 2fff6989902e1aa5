package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing: pre-shuffle a table ONCE at write time so
  * every later join / aggregation on the bucket key plans with NO
  * Exchange. At 100 TB this converts the recurring join shuffle (the
  * single most expensive stage of a fact-fact join) into a one-time
  * layout cost — the classic warehouse trade, expressed through
  * Spark's native `bucketBy` + catalog metadata.
  *
  * Rules for the shuffle to actually disappear (asserted by the spec):
  * both sides bucketed by the join key into the SAME bucket count, the
  * join key equal to the bucket column, and
  * `spark.sql.sources.bucketing.enabled=true` (default). Sorted
  * buckets (`sortCols`) additionally remove the Sort before a
  * sort-merge join.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted) parquet table. Bucket
    * metadata lives in the session catalog (`saveAsTable` — a plain
    * path write cannot carry it).
    *
    * Idempotent across SESSIONS, not just within one: a previous
    * session's run leaves the managed location on disk while the new
    * session's catalog has never heard of the table, and `saveAsTable`
    * then refuses with LOCATION_ALREADY_EXISTS. Both the catalog entry
    * and any stale location are dropped first — through the session's
    * Hadoop FileSystem, so non-local warehouses (hdfs://, s3a://) are
    * cleaned the same way as file:// ones. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket key — plans
    * shuffle-free when the bucketing contract above holds. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (one JVM via Test/fork). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming checkpoint logs (offset/commit WAL, state-store
      // metadata) ride the FileContext API; its default local impl
      // shadows every write with a .crc file — measured ~30 ms per
      // walCommit/commitOffsets ON TMPFS. RawLocalFs drops the
      // checksum shadow for FileContext users ONLY (parquet and all
      // data IO use the FileSystem API, untouched); harness
      // checkpoints are deleted-after-run scratch, and production
      // points checkpoints at durable storage with its own integrity.
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "org.apache.hadoop.fs.local.RawLocalFs")
      .config("spark.ui.enabled", "false")
      // keep saveAsTable output (BucketingSpec) out of the repo tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.spark
  import org.apache.spark.sql.DataFrame
  /** collect a single row of doubles by column name */
  def row1(df: DataFrame): Map[String, Any] = {
    val r = df.collect()(0)
    r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
  }
}

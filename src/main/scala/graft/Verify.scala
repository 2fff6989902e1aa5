package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
      // streaming state store: default HDFS-backed map;
      // GRAFT_STATE_STORE=rocksdb switches the whole streaming family
      // to the disk-bounded RocksDB provider (see StateStores)
      .config("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.StateStores.providerClass)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q55,q56 restricts the dump (dev loop; the driver
    // leaves it unset and dumps everything).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Provenance stamp (r16 verdict #3): the effective state-store
    // provider (and friends) ride WITH the correctness dump, so a
    // "15/15 streaming rows green under rocksdb" claim is carried by
    // the artifact itself, not by prose around it. The driver ignores
    // extra files; our own receipts (PLANS.md, committed rocksdb
    // sweeps) quote this file.
    val sha = try {
      val base = scala.sys.process.Process(
        Seq("git", "rev-parse", "--short", "HEAD:src/main/scala")).!!.trim
      val dirty = scala.sys.process.Process(
        Seq("git", "status", "--porcelain", "src/main/scala")).!!.trim.nonEmpty
      if (dirty) s"$base-dirty" else base
    } catch { case _: Throwable => "unknown" }
    Files.writeString(Paths.get(s"$outDir/verify_env.json"),
      s"""{"ts":"${java.time.Instant.now()}","sha":"$sha",""" +
        s""""sf":${q(sfDir)},""" +
        s""""state_store":"${graft.streaming.StateStores.tag}",""" +
        s""""stream_sink":"driver",""" +
        s""""simd":${graft.text.SimdSupport.available}}""")
    spark.stop()
  }
}

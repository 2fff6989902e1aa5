package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc local timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.filter(_ == "entry").foreach { _ =>
      val rows = graft.SparkEntry.entry(spark).collect()
      println(s"PROBE entry: ${rows.length} rows")
      rows.foreach(r => println(s"  $r"))
    }
    names.filter(_ != "entry").foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = qs(n)(spark, sfDir).count()
        println(f"PROBE $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}

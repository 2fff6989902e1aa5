package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result") {
    val big = spark.range(10000)
      .select((when(col("id") % 10 === 0, 1L).otherwise(col("id") % 100)).as("k"),
        col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k").agg(count(lit(1)), sum("payload")).collect()(0)
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 8)
      .agg(count(lit(1)), sum("payload")).collect()(0)
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getLong(1) === plain.getLong(1))
  }

  test("salt spreads a hot key across multiple shuffle keys") {
    val hot = spark.range(1000).select(lit(7L).as("k"), col("id").as("p"))
    val salts = hot.withColumn("__salt", (rand(42L) * 8).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6) // 1000 draws over 8 salts hit (nearly) all of them
  }

  test("skew report surfaces the heavy key with its share") {
    val df = (Seq.fill(900)(1L) ++ (2L to 101L)).toDF("k")
    val top = Skew.keySkewReport(df, "k", topN = 1).collect()(0)
    assert(top.getLong(0) === 1L)
    assert(top.getLong(1) === 900L)
    assert(math.abs(top.getDouble(2) - 0.9) < 1e-6)
  }

  test("topKPerGroup equals the single-window top-k under 90% group skew") {
    val rnd = new scala.util.Random(5)
    // one group holds 90% of rows; values collide so tie-breaks matter
    val rows = (0 until 5000).map { i =>
      val g = if (i < 4500) "hot" else s"g${i % 7}"
      (g, i.toLong, rnd.nextInt(40).toDouble)
    }
    val df = rows.toDF("grp", "uid", "v").repartition(8)
    val order = Seq(org.apache.spark.sql.functions.desc("v"),
      org.apache.spark.sql.functions.asc("uid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(order: _*)
    val plain = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.topKPerGroup(df, "grp", col("uid"), k = 5, orderCols = order)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
    // k larger than some groups' sizes: short groups survive intact
    val small = Skew.topKPerGroup(df.filter(col("grp") =!= "hot"), "grp",
        col("uid"), k = 1000, orderCols = order)
    assert(small.count() === 500)
  }
}

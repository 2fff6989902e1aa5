package graft.ops

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joins of co-bucketed tables plan without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
      Bucketing.writeBucketed(left, "bkt_left", "k", buckets = 4, sortCols = Seq("k"))
      Bucketing.writeBucketed(right, "bkt_right", "k", buckets = 4, sortCols = Seq("k"))

      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      assert(joined.count() === 1000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$finalPlan")

      // aggregation on the bucket key is shuffle-free too
      val agg = spark.table("bkt_left").groupBy("k").count()
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed agg should not shuffle:\n$aggPlan")

      // control: the same join WITHOUT bucketing does shuffle
      val plain = left.join(right, "k")
      plain.count()
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming operators driven through real micro-batches with
  * MemoryStream + memory sink. */
class StreamingProfileSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed numeric profile aggregates incrementally across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamingProfile.windowedNumericProfile(df, "ts", "event_type",
        "value", window = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("np").outputMode(OutputModeComplete).start()
    try {
      mem.addData((ts(0), "click", 10.0), (ts(5), "click", 20.0))
      q.processAllAvailable()
      mem.addData((ts(10), "click", 30.0), (ts(10), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("np").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("click", 3L, 20.0))) // mean of 10,20,30
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  private val OutputModeComplete = org.apache.spark.sql.streaming.OutputMode.Complete()

  test("windowed value_counts accumulates per (window, key)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = StreamingProfile.windowedValueCounts(df, "ts", "event_type")
      .writeStream.format("memory").queryName("vc").outputMode(OutputModeComplete).start()
    try {
      mem.addData((ts(0), "click"), (ts(1), "click"), (ts(2), "view"))
      q.processAllAvailable()
      mem.addData((ts(3), "click"))
      q.processAllAvailable()
      val counts = spark.table("vc").collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(counts("click") === 3L)
      assert(counts("view") === 1L)
    } finally q.stop()
  }

  test("stateful sessionize counts sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (userId, epochMs)
    val out = StreamingProfile.sessionize(mem.toDS(), gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      mem.addData((1L, 0L), (1L, 10000L))           // one session
      q.processAllAvailable()
      mem.addData((1L, 200000L), (2L, 0L))          // 1: gap>60s → 2nd session
      q.processAllAvailable()
      val last = spark.table("sess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._3) }
      assert(last(1L) === ((1L, 2L, 3L)))
      assert(last(2L) === ((2L, 1L, 1L)))
    } finally q.stop()
  }

  test("streaming near-dup drops sketch-colliding events within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = StreamingProfile.streamingNearDup(df, "ts", "text")
      .writeStream.format("memory").queryName("nd")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      // identical token streams (case/punctuation noise) sketch equally;
      // genuinely different text does not
      mem.addData((ts(0), "the quick brown fox jumps over the lazy dog"),
        (ts(1), "The QUICK brown fox... jumps over the lazy dog!"),
        (ts(2), "completely unrelated content about databases"))
      q.processAllAvailable()
      assert(spark.table("nd").count() === 2L)
    } finally q.stop()
  }

  test("text-analysis operators run unchanged on a stream (stateless projections)") {
    // quality scoring / langid / token stats are pure codegen'd column
    // expressions — the SAME operators compose into readStream pipelines
    // with no modification (per-row, no state, no watermark needed)
    import spark.implicits._
    import graft.ops.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.langId(col("text")).as("lang"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
    val q = out.writeStream.format("memory").queryName("ta")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      mem.addData((1L, "the cat sat on the mat and it was good"),
        (2L, "der hund ist nicht auf der matte und das ist gut"))
      q.processAllAvailable()
      val rows = spark.table("ta").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(rows(1L)._1 === 10)
      assert(rows(1L)._2 === "en")
      assert(rows(2L)._2 === "de")
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim side") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = StreamingProfile.enrich(df, dim, "user_id")
      .writeStream.format("memory").queryName("enr").start()
    try {
      mem.addData((ts(0), 1L), (ts(1), 2L), (ts(2), 9L))
      q.processAllAvailable()
      val rows = spark.table("enr").collect()
        .map(r => r.getLong(0) -> Option(r.get(2))).toMap
      assert(rows(1L) === Some("gold"))
      assert(rows(2L) === Some("basic"))
      assert(rows(9L) === None) // left-outer: unknown key keeps the event
    } finally q.stop()
  }

  test("streaming curate cleans, filters and dedups across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val enText = "the quick brown fox jumps over the lazy dog and " +
      "then the fox sleeps for a while near the river bank today"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "id", "text")
    val q = StreamingProfile.streamingCurate(df, "ts", "id", "text")
      .writeStream.format("memory").queryName("cur").start()
    try {
      mem.addData(
        (ts(0), 1L, s"<b>$enText</b> via https://x.com/p"),
        (ts(1), 2L, "zu kurz"))
      q.processAllAvailable()
      mem.addData(
        (ts(2), 3L, s"<b>$enText</b> via https://x.com/p"), // dup of 1 post-clean
        (ts(3), 4L, s"$enText entirely new suffix"))
      q.processAllAvailable()
      val ids = spark.table("cur").collect().map(_.getLong(1)).toSet
      assert(ids === Set(1L, 4L)) // 2 filtered (short/non-en), 3 deduped
      val clean1 = spark.table("cur").collect()
        .find(_.getLong(1) == 1L).get.getString(2)
      assert(!clean1.contains("<b>") && !clean1.contains("https://"))
    } finally q.stop()
  }

  test("streaming dedup drops same-content events within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = StreamingProfile.streamingDedup(df, "ts", "text")
      .writeStream.format("memory").queryName("dd")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      mem.addData((ts(0), "hello world"), (ts(1), "HELLO,  world!"), (ts(2), "other doc"))
      q.processAllAvailable()
      mem.addData((ts(3), "hello world"))
      q.processAllAvailable()
      assert(spark.table("dd").count() === 2L) // normalized dups dropped
    } finally q.stop()
  }

  test("windowed PSI flags the drifted window, not the baseline-like one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "v")
    // baseline ~ uniform over [0, 4): quartile cuts 1,2,3; equal probs
    val cuts = Seq(1.0, 2.0, 3.0)
    val probs = Seq(0.25, 0.25, 0.25, 0.25)
    val q = StreamingProfile.windowedPsi(df, "ts", "v", cuts, probs,
        windowDur = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("psi")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try {
      // window A (10:xx): matches the baseline; window B (11:xx): all
      // mass in the top bin — drifted
      val even = (0 until 40).map(i => (ts(i % 50), (i % 4) + 0.5))
      mem.addData(even: _*)
      q.processAllAvailable()
      val tsB = Timestamp.valueOf("2024-01-01 11:05:00")
      mem.addData((0 until 40).map(_ => (tsB, 3.5)): _*)
      q.processAllAvailable()
      val rows = spark.table("psi").collect()
        .map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
      val (nA, psiA) = rows("2024-01-01 10:00:00.0")
      val (nB, psiB) = rows("2024-01-01 11:00:00.0")
      assert(nA === 40L && nB === 40L)
      assert(math.abs(psiA) < 0.01, s"baseline-like window drifted: $psiA")
      assert(psiB > 1.0, s"shifted window reads stable: $psiB")
    } finally q.stop()
  }

  test("stream-stream interval join matches within the delay bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = StreamingProfile.intervalJoin(
      imps.toDF().toDF("its", "user_id", "ad"),
      clicks.toDF().toDF("cts", "user_id"),
      key = "user_id", leftTs = "its", rightTs = "cts",
      maxDelay = "10 minutes", watermark = "30 minutes")
      .select(col("l.user_id").as("u"), col("ad"), col("cts"))
    val q = joined.writeStream.format("memory").queryName("ij").start()
    try {
      imps.addData((ts(0), 1L, "adA"), (ts(0), 2L, "adB"), (ts(30), 3L, "adC"))
      clicks.addData(
        (ts(5), 1L),   // within 10 min of user 1's impression → match
        (ts(25), 2L),  // 25 min later → outside the bound
        (ts(31), 3L))  // within bound of the ts(30) impression → match
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((1L, "adA"), (3L, "adC")))
    } finally q.stop()
  }

  test("streamingAdmit: prior sketch-table near-dups rejected, stream dups suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prior = Dedup_prior
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = StreamingProfile.streamingAdmit(df, "ts", "text", prior)
      .writeStream.format("memory").queryName("adm")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      mem.addData(
        (ts(0), "alpha beta gamma delta epsilon zeta eta theta"),   // = prior doc -> rejected
        (ts(1), "brand new fresh content one two three four"),      // admitted
        (ts(2), "brand new fresh content one two three four"),      // stream dup -> suppressed
        (ts(3), "another unrelated incoming document entirely today")) // admitted
      q.processAllAvailable()
      val got = spark.table("adm").select("text").collect().map(_.getString(0)).toSet
      assert(got === Set(
        "brand new fresh content one two three four",
        "another unrelated incoming document entirely today"))
    } finally q.stop()
  }

  // the persisted corpus state streamingAdmit joins against
  private lazy val Dedup_prior = {
    import spark.implicits._
    graft.ops.Dedup.sketchTable(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "completely different historical content about other things"))
        .toDF("doc_id", "text"),
      "doc_id", "text")
  }

  test("streaming KMV keeps bottom-k state and min-merges to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val q = StreamingProfile.streamingKmv(mem.toDS(), k = 4)
      .toDF("key", "h_out")
      .writeStream.format("memory").queryName("kmv")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      val all = (1 to 20).map(i => ("c", h(s"v$i")))
      mem.addData(all.take(10): _*); q.processAllAvailable()
      mem.addData(all.drop(10): _*); q.processAllAvailable()
      val emitted = spark.table("kmv").collect().map(_.getString(1)).toSet
      // min-merge of ALL emissions reaches the true bottom-4
      val bottom4 = all.map(_._2).distinct.sorted.take(4).toSet
      assert(emitted.toSeq.sorted.take(4).toSet === bottom4)
      // each trigger emitted at most k rows (state is capped)
      val lastBatch = spark.table("kmv").collect()
      assert(lastBatch.length <= 8) // 2 triggers x <= 4 rows
    } finally q.stop()
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val enText = "the quick brown fox jumps over the lazy dog and " +
    "then the fox sleeps for a while near the river bank today"

  test("curate cleans, filters, dedups and keeps schema") {
    val docs = Seq(
      (1L, s"<p>$enText</p> see https://x.com/a mail bob@x.org"),
      (2L, enText),                       // dup of 1 after cleaning? no — 1 gains <EMAIL> token
      (3L, enText),                       // exact dup of 2 → dropped
      (4L, "der schnelle braune fuchs springt und der hund schlaeft dann"), // de
      (5L, "tiny doc")                    // too short
    ).toDF("id", "text")
    val out = Curation.curate(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.contains(2L) && !out.contains(3L)) // exact dedup keeps min id
    assert(!out.contains(4L))                     // language filter
    assert(!out.contains(5L))                     // length filter
    assert(out.contains(1L))
    val r1 = out(1L)
    val clean = r1.getString(1)
    assert(!clean.contains("<p>") && !clean.contains("https://"))
    assert(clean.contains("<EMAIL>"))
    assert(r1.getString(2) === "en")
    assert(r1.getDouble(3) >= 0.5)
    assert(out.keySet === Set(1L, 2L))
  }

  test("sampleFraction thins the curated output deterministically") {
    val docs = (0L until 400L).map(i => (i, s"$enText unique$i")).toDF("id", "text")
    val full = Curation.curate(docs, "id", "text").count()
    val half = Curation.curate(docs, "id", "text",
      Curation.CurationConfig(sampleFraction = 0.5))
    assert(full === 400L)
    assert(math.abs(half.count() - 200L) < 60)
    // deterministic: same ids both runs
    assert(half.collect().map(_.getLong(0)).toSet ===
      Curation.curate(docs, "id", "text",
        Curation.CurationConfig(sampleFraction = 0.5))
        .collect().map(_.getLong(0)).toSet)
  }
}

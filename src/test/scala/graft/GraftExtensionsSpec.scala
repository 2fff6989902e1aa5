package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** The SQL-function surface must produce the SAME expression trees as
  * the Column API — spot-checked value-for-value here. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "The cat sat on the mat, and it was good."),
    (2L, "der hund ist nicht auf der matte"),
    (3L, "")).toDF("id", "text")

  test("SQL functions mirror the Column API value-for-value") {
    GraftExtensions.registerInto(spark)
    docs.createOrReplaceTempView("gx_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_token_count(text) AS nt, graft_lang_id(text) AS lang,
        |  round(graft_quality(text), 6) AS q, graft_fingerprint(text) AS fp,
        |  graft_rolling_hash(text) AS rh, graft_simhash(text) AS sh,
        |  size(graft_shingles(text)) AS nsh, size(graft_minhash(text)) AS nmh
        |FROM gx_docs ORDER BY id""".stripMargin).collect()
    val viaCol = docs.select(col("id"),
        TextAnalysis.tokenCount(col("text")).as("nt"),
        TextAnalysis.langId(col("text")).as("lang"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("q"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.rollingHash(col("text")).as("rh"),
        TextAnalysis.simHash16(col("text")).as("sh"),
        size(graft.ops.Dedup.shingles(col("text"))).as("nsh"),
        size(graft.ops.Dedup.minhashSignature(col("text"))).as("nmh"))
      .orderBy("id").collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
    assert(viaSql.head.getAs[String]("lang") === "en")
    assert(viaSql(1).getAs[String]("lang") === "de")
  }

  test("graft_cosine works in SQL over array columns") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS c").collect()(0)
    assert(math.abs(r.getDouble(0) - math.sqrt(2) / 2) < 1e-12)
  }
}

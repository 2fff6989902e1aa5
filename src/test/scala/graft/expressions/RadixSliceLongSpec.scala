package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Parity contract of the r17 decode kernels with the expression
  * chains they replace: `conv(substring(h, pos, len), radix, 10)` and
  * the HLL rank render `length(regexp_replace(bin(w), "^0+", ""))`.
  * The swap is a pure optimization — these specs pin value equality on
  * the exact domains the call sites feed (md5 hex, bin() output,
  * 48-bit masked words), with codegen on AND off. */
class RadixSliceLongSpec extends SparkSpec {
  import spark.implicits._

  private def hexSlice(c: org.apache.spark.sql.Column, pos: Int, len: Int) =
    GraftColumnBridge.column(RadixSliceLong(
      GraftColumnBridge.expression(c), pos, len, 16))
  private def binSlice(c: org.apache.spark.sql.Column, pos: Int, len: Int) =
    GraftColumnBridge.column(RadixSliceLong(
      GraftColumnBridge.expression(c), pos, len, 2))
  private def bitLen(c: org.apache.spark.sql.Column) =
    GraftColumnBridge.column(BitLength64(GraftColumnBridge.expression(c)))

  test("hex slices == conv(substring) on md5 output, every hot (pos, len)") {
    val df = spark.range(2000)
      .select(md5(concat(lit("rs#"), col("id").cast("string")).cast("binary")).as("h"))
    // the call-site geometry: (1,14) HLL, (1,7) hash31, (1,2)/(3,12)
    // legacy registers, (1,4) FIM gate, (1,12)/(13,12) FIM cuts, (1,6)
    // bootstrap draws, (13,1)/(14,1) single-digit routing
    for ((pos, len) <- Seq((1, 14), (1, 7), (1, 2), (3, 12), (1, 4),
        (1, 12), (13, 12), (1, 6), (13, 1), (14, 1))) {
      val bad = df.select(
          hexSlice(col("h"), pos, len).as("native"),
          conv(substring(col("h"), pos, len), 16, 10).cast("long").as("legacy"))
        .filter(col("native") =!= col("legacy") ||
          col("native").isNull =!= col("legacy").isNull)
        .count()
      assert(bad === 0L, s"divergence at pos=$pos len=$len")
    }
  }

  test("short and empty slices mirror conv(substring): absent chars drop, " +
    "empty decodes to null") {
    val df = Seq("abc", "a", "").toDF("h")
    for ((pos, len) <- Seq((1, 14), (2, 4), (4, 2))) {
      val rows = df.select(
        hexSlice(col("h"), pos, len).as("native"),
        conv(substring(col("h"), pos, len), 16, 10).cast("long").as("legacy"))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch $r @($pos,$len)")
        if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"$r @($pos,$len)")
      }
    }
    val n = Seq[Option[String]](None).toDF("h")
      .select(hexSlice(col("h"), 1, 14)).collect()
    assert(n(0).isNullAt(0))
  }

  test("radix-2 slices == the two-half conv assembly on 64-bit words " +
    "(sign-bit wrap included)") {
    val width = 64
    val bits64 = spark.range(500).select(
      lpad(bin(xxhash64(col("id"))), width, "0").as("bits"))
    val legacy = shiftleft(conv(substring(col("bits"), 1, width - 32), 2, 10)
        .cast("long"), 32)
      .bitwiseOR(conv(substring(col("bits"), width - 31, 32), 2, 10).cast("long"))
    val bad = bits64.select(binSlice(col("bits"), 1, width).as("native"),
        legacy.as("legacy"))
      .filter(col("native") =!= col("legacy")).count()
    assert(bad === 0L)
    // narrow widths ride the single-conv legacy path
    val bits16 = spark.range(500).select(
      lpad(bin(pmod(xxhash64(col("id")), lit(65536))), 16, "0").as("bits"))
    val bad16 = bits16.select(binSlice(col("bits"), 1, 16).as("native"),
        conv(col("bits"), 2, 10).cast("long").as("legacy"))
      .filter(col("native") =!= col("legacy")).count()
    assert(bad16 === 0L)
  }

  test("BitLength64 == length(regexp_replace(bin(w), '^0+', '')) on 48-bit " +
    "words including 0 and powers of two") {
    val edge = Seq(0L, 1L, 2L, 3L, 4L, (1L << 47) - 1, 1L << 47,
      (1L << 48) - 1).toDF("w")
    val rnd = spark.range(2000)
      .select(shiftrightunsigned(xxhash64(col("id")), 16).as("w"))
    for (df <- Seq(edge, rnd.toDF("w"))) {
      val bad = df.select(bitLen(col("w")).as("native"),
          length(regexp_replace(bin(col("w")), "^0+", "")).as("legacy"),
          col("w"))
        .filter(col("native") =!=
          when(col("w") === 0, lit(0)).otherwise(col("legacy")))
        .count()
      // regexp form maps w=0 -> length("")=0 too; direct compare
      val bad2 = df.select(bitLen(col("w")).as("native"),
          length(regexp_replace(bin(col("w")), "^0+", "")).as("legacy"))
        .filter(col("native") =!= col("legacy")).count()
      assert(bad === 0L && bad2 === 0L)
    }
  }

  test("codegen off equals codegen on (interpreted eval path)") {
    val df = spark.range(300)
      .select(md5(col("id").cast("string").cast("binary")).as("h"),
        shiftrightunsigned(xxhash64(col("id")), 16).as("w"))
    val on = df.select(hexSlice(col("h"), 1, 14), bitLen(col("w"))).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(hexSlice(col("h"), 1, 14), bitLen(col("w"))).collect()
      assert(on.map(_.toString).toSeq === off.map(_.toString).toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("invalid digit bytes fail loudly instead of conv's silent salvage") {
    val ex = intercept[Exception] {
      Seq("zz").toDF("h").select(hexSlice(col("h"), 1, 2)).collect()
    }
    assert(ex.getMessage != null)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SVG plot sink — the rendered-figure analogue of the reference's
  * matplotlib screens (`Latanova_v1.py:496-628` shows histograms, bar
  * charts and PCA scatters with `plt.show()`). The engine's plot-prep
  * frames (histogram buckets, value counts, projection coords) render
  * here to standalone SVG documents, so a user gets an actual figure
  * artifact, not just the numbers behind one.
  *
  * Design rules that make this an ENGINE operator rather than a
  * driver-side afterthought:
  *  - geometry is ALL-INTEGER (heights/positions via integer `div`
  *    on a fixed pixel grid), so the rendered bytes are deterministic
  *    and bit-identical in any engine that replays the arithmetic —
  *    the document itself can sit behind a hash oracle;
  *  - the render is ONE aggregation over the (bounded) plot-prep
  *    frame: per-row `format_string` projection, ordered assembly via
  *    `array_sort(collect_list(struct(key, fragment)))` — no window,
  *    no driver loop; a 50-bucket histogram costs 50 rows of string
  *    work regardless of the corpus size that produced the buckets.
  */
object Svg {

  private val W = 1000
  private val H = 600
  private val PlotH = 500  // bars live in [50, 550); labels below

  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c.cast("string"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private def escLocal(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def header(title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H">""" +
      s"<title>${escLocal(title)}</title>"

  /** Ordered fragment assembly: sort by the integer key, join. */
  private def assemble(df: DataFrame, key: Column, frag: Column,
                       title: String): DataFrame =
    df.agg(array_join(transform(
        array_sort(collect_list(struct(key.cast("int").as("k"),
          frag.as("frag")))),
        s => s.getField("frag")), "").as("__body"))
      .select(concat(lit(header(title)), col("__body"), lit("</svg>"))
        .as("svg"))

  /** Histogram / indexed bar chart: (bucket 0..nBuckets-1, count) →
    * one SVG with a rect per non-empty bucket, heights scaled to the
    * max count on the integer pixel grid. */
  def histogram(df: DataFrame, bucketCol: String, countCol: String,
                nBuckets: Int, title: String): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val barW = W / nBuckets
    val mx = df.agg(max(col(countCol).cast("long")).as("__mx"))
    val h = expr(s"($countCol * $PlotH) div __mx")
    val rect = format_string(
      s"""<rect x="%d" y="%d" width="${math.max(barW - 2, 1)}" height="%d"/>""",
      col(bucketCol).cast("int") * barW, lit(50 + PlotH) - h, h)
    assemble(df.crossJoin(broadcast(mx)), col(bucketCol), rect, title)
  }

  /** Labeled bar chart: (label, count) → bars ordered by (count desc,
    * label asc) with x-escaped `<text>` captions. `maxBars` bounds the
    * frame (value-counts semantics: a categorical's K is detector-
    * bounded, so the single-partition rank sort below is over ≤K rows
    * — never corpus-scale). */
  def barChart(df: DataFrame, labelCol: String, countCol: String,
               maxBars: Int, title: String): DataFrame = {
    require(maxBars > 0, "maxBars must be positive")
    // materialized ONCE (≤maxBars rows): the count, the max aggregate
    // and the assembly below all reuse it instead of re-running the
    // sort+limit+window three times
    val top = df
      .orderBy(desc(countCol), asc(labelCol)).limit(maxBars)
      .withColumn("__idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc(countCol), asc(labelCol))) - 1)
      .localCheckpoint()
    val k = math.max(top.count().toInt, 1)
    val barW = W / k
    val mx = top.agg(max(col(countCol).cast("long")).as("__mx"))
    val h = expr(s"($countCol * $PlotH) div __mx")
    val frag = concat(
      format_string(
        s"""<rect x="%d" y="%d" width="${math.max(barW - 10, 1)}" height="%d"/>""",
        col("__idx") * barW, lit(50 + PlotH) - h, h),
      format_string(s"""<text x="%d" y="${50 + PlotH + 30}">%s</text>""",
        col("__idx") * barW, esc(col(labelCol))))
    assemble(top.crossJoin(broadcast(mx)), col("__idx"), frag, title)
  }

  /** Scatter (the PCA-projection figure): (x, y) doubles mapped onto
    * the integer grid by FIXED-POINT min/max normalization — each
    * coordinate is first quantized to micro-units (floor(v·10⁶), a
    * single well-defined float op), and the pixel position is then
    * pure integer arithmetic ((q−lo)·(span−1) div (hi−lo)), the
    * histogram renderer's discipline. No float division ever reaches
    * the grid, so the rendered bytes are bit-identical in any engine
    * that replays the quantization — the scatter document can sit
    * behind a hash oracle like the other two renderers. (The integer
    * ratio is evaluated as floor of a double quotient: both operands
    * are exact in doubles — |num| ≤ range·span < 2⁵³ — and a
    * non-divisible quotient is ≥ 1/den away from an integer, far
    * beyond double rounding, so it equals true integer division.) */
  def scatter(df: DataFrame, xCol: String, yCol: String, idCol: String,
              title: String): DataFrame = {
    def quant(c: Column): Column =
      floor(c.cast("double") * lit(1e6)).cast("long")
    val q = df.select(col(idCol).as("__id"),
      quant(col(xCol)).as("__qx"), quant(col(yCol)).as("__qy"))
    val ext = q.agg(
      min(col("__qx")).as("__x0"), max(col("__qx")).as("__x1"),
      min(col("__qy")).as("__y0"), max(col("__qy")).as("__y1"))
    def px(v: Column, lo: Column, hi: Column, span: Int, off: Int): Column =
      when(hi === lo, lit(off + span / 2)).otherwise(
        lit(off) + floor(((v - lo) * lit(span - 1)).cast("double") /
          (hi - lo).cast("double")).cast("int"))
    val frag = format_string("""<circle cx="%d" cy="%d" r="3"/>""",
      px(col("__qx"), col("__x0"), col("__x1"), W - 100, 50),
      // SVG y grows downward; flip so larger y plots higher
      lit(H - 50) - (px(col("__qy"), col("__y0"), col("__y1"), PlotH, 0)))
    assemble(q.crossJoin(broadcast(ext)), col("__id"), frag, title)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SvgSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: well-formed document, integer geometry, max bar fills plot") {
    val buckets = Seq((0, 10L), (1, 50L), (3, 25L)).toDF("bucket", "cnt")
    val svg = Svg.histogram(buckets, "bucket", "cnt", 50, "t").collect()(0).getString(0)
    assert(svg.startsWith("""<svg xmlns="http://www.w3.org/2000/svg" width="1000" height="600"><title>t</title>"""))
    assert(svg.endsWith("</svg>"))
    // max count (50) → full 500px bar at y=50; bucket 0 → 100px at y=450
    assert(svg.contains("""<rect x="20" y="50" width="18" height="500"/>"""))
    assert(svg.contains("""<rect x="0" y="450" width="18" height="100"/>"""))
    assert(svg.contains("""<rect x="60" y="300" width="18" height="250"/>"""))
    // fragments are in bucket order
    assert(svg.indexOf("x=\"0\"") < svg.indexOf("x=\"20\""))
    assert(svg.indexOf("x=\"20\"") < svg.indexOf("x=\"60\""))
  }

  test("barChart: rank order (count desc, label asc), labels escaped") {
    val vc = Seq(("b<b>", 5L), ("a", 5L), ("c", 2L)).toDF("value", "cnt")
    val svg = Svg.barChart(vc, "value", "cnt", 10, "t").collect()(0).getString(0)
    // ties: 'a' before 'b<b>'; 'c' last; 3 bars → barW = 333
    assert(svg.contains("""<text x="0" y="580">a</text>"""))
    assert(svg.contains("""<text x="333" y="580">b&lt;b&gt;</text>"""))
    assert(svg.contains("""<text x="666" y="580">c</text>"""))
    assert(!svg.contains("b<b>"))
    // max bars fill the plot; c is 2/5 of it
    assert(svg.contains("""<rect x="0" y="50" width="323" height="500"/>"""))
    assert(svg.contains("""<rect x="666" y="350" width="323" height="200"/>"""))
  }

  test("barChart honors maxBars") {
    val vc = (1 to 20).map(i => (s"v$i", i.toLong)).toDF("value", "cnt")
    val svg = Svg.barChart(vc, "value", "cnt", 5, "t").collect()(0).getString(0)
    assert(svg.sliding(5).count(_ == "<rect") === 5)
    assert(svg.contains(">v20</text>") && !svg.contains(">v1</text>"))
  }

  test("scatter: corners map to plot extremes, degenerate extent centers") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 10.0, 10.0), (3L, 5.0, 5.0))
      .toDF("id", "x", "y")
    val svg = Svg.scatter(pts, "x", "y", "id", "t").collect()(0).getString(0)
    // min corner: cx=50 (left margin), cy=550 (y flipped, bottom)
    assert(svg.contains("""<circle cx="50" cy="550" r="3"/>"""))
    // max corner: cx=50+899, cy=550-499
    assert(svg.contains("""<circle cx="949" cy="51" r="3"/>"""))
    val flat = Seq((1L, 3.0, 7.0)).toDF("id", "x", "y")
    val svg2 = Svg.scatter(flat, "x", "y", "id", "t").collect()(0).getString(0)
    assert(svg2.contains("""<circle cx="500" cy="300" r="3"/>"""))
  }
}

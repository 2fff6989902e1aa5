package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression for vector-heavy training corpora. At 100 TB
  * an `Array[Float]` embedding column is routinely the widest thing in
  * the table (a 768-dim float vector is 3 KB/row); symmetric int8
  * quantization cuts it 4x with bounded cosine error, which is the
  * difference between an ANN index that fits executor memory and one
  * that spills. The reference ships raw float vectors only
  * (`Latanova_v1.py:23-43`); this is the storage-scale path a Spark
  * deployment adds in front of [[Similarity]]'s kernels.
  *
  * Everything is a pure per-row expression chain (array HOFs —
  * `transform`/`aggregate` — inside whole-stage codegen): zero
  * shuffles, zero UDFs, trivially parallel at any scale.
  */
object Quantize {

  /** Map a double array-column element through the shared quantizer
    * formula: round-half-up of x/scale, clamped to [-127, 127]. */
  private def q8(x: Column, scale: Column): Column =
    least(greatest(floor(x / scale + lit(0.5)), lit(-127.0)), lit(127.0))

  /** Symmetric per-vector int8 quantization: scale = max|v| / 127,
    * q_i = clamp(round(v_i / scale)) as an int8. Per-vector (not
    * per-corpus) scaling needs no global pass and no broadcast state —
    * each row quantizes independently, so the operator is a pure
    * projection that survives any scale-up untouched.
    *
    * Output per row: (id, scale, qvec array<byte>, n_clipped,
    * err_l2 — the L2 norm of the dequantization residual, the number
    * a pipeline monitors to catch embedding-distribution drift
    * breaking its quantizer). All arithmetic is double-precision with
    * the exact same operation order the DuckDB oracle replays, so the
    * results hash-match bit-for-bit cross-engine (the residual sum is
    * a left fold, deterministic on both sides). Zero vectors (scale 0)
    * quantize to all-zeros with zero error. */
  def int8Symmetric(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withV = df
      .filter(col(vecCol).isNotNull)
      .select(col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__amax", array_max(transform(col("__v"), x => abs(x))))
      .withColumn("scale", col("__amax") / lit(127.0))
    withV
      .withColumn("qvec",
        when(col("__amax") === 0.0,
          transform(col("__v"), _ => lit(0).cast("byte")))
        .otherwise(
          transform(col("__v"), x => q8(x, col("scale")).cast("byte"))))
      .withColumn("n_clipped",
        when(col("__amax") === 0.0, lit(0))
        .otherwise(aggregate(col("__v"), lit(0), (c, x) =>
          c + when(abs(floor(x / col("scale") + lit(0.5))) > 127.0, 1)
            .otherwise(0))))
      .withColumn("err_l2",
        when(col("__amax") === 0.0, lit(0.0))
        .otherwise(round(sqrt(aggregate(col("__v"), lit(0.0), (acc, x) => {
          val r = x - q8(x, col("scale")) * col("scale")
          acc + r * r
        })), 6)))
      .select(col(idCol), col("scale"), col("qvec"), col("n_clipped"),
        col("err_l2"))
  }

  /** Dequantize back to doubles — the read path of [[int8Symmetric]].
    * A pure projection; composes with the cosine kernels directly. */
  def dequantize(df: DataFrame, qvecCol: String, scaleCol: String,
                 as: String = "vec"): DataFrame =
    df.withColumn(as,
      transform(col(qvecCol), q => q.cast("double") * col(scaleCol)))

  /** Brute-force cosine top-k over int8-QUANTIZED vectors — the ANN
    * baseline run directly on the compressed column, proving the 4x
    * storage cut costs no join machinery. Per-vector scales cancel out
    * of the cosine (cos(s_a·qa, s_b·qb) = qa·qb / (‖qa‖‖qb‖)), so
    * scoring is pure integer dot products: Σq_i² and qa·qb are exact
    * in 64-bit (and far below 2^53, so the double division is
    * bit-identical cross-engine — no float-sum ordering anywhere).
    * Zero-norm vectors are excluded from both sides (cosine
    * undefined). Same shape as [[Similarity.bruteForceTopK]]: exact
    * quadratic baseline; the quantized vectors feed the bucketed
    * LSH/IVF kernels unchanged for the scale path. */
  def int8TopK(queries: DataFrame, corpus: DataFrame,
               qIdCol: String, qVecCol: String,
               cIdCol: String, cVecCol: String, k: Int): DataFrame = {
    def prep(df: DataFrame, id: String, vec: String,
             idAs: String, p: String): DataFrame =
      int8Symmetric(df, id, vec).select(
        col(id).as(idAs), col("qvec").as(p + "q"),
        aggregate(transform(col("qvec"), q => q.cast("long") * q.cast("long")),
          lit(0L), _ + _).as(p + "n"))
    val qs = prep(queries, qIdCol, qVecCol, "query_id", "q_")
      .filter(col("q_n") > 0)
    val cs = prep(corpus, cIdCol, cVecCol, "neighbor_id", "c_")
      .filter(col("c_n") > 0)
    val dot = aggregate(
      zip_with(col("q_q"), col("c_q"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), _ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    qs.crossJoin(cs)
      .withColumn("sim", dot.cast("double") /
        (sqrt(col("q_n").cast("double")) * sqrt(col("c_n").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}

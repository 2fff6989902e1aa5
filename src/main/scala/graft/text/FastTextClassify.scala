package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed fastText supervised-classifier inference — the engine
  * behind the standard LLM-corpus filters (CCNet/CommonCrawl language
  * ID with `lid.176.bin`, fastText quality classifiers): load the
  * `.bin` once on the driver ([[FastTextBin]]), broadcast, score every
  * document in a narrow projection. No shuffle anywhere — the model
  * rides the broadcast, each row costs one hash-map pass over its
  * tokens plus a (nLabels × dim) matrix-vector product, so the scan
  * parallelizes perfectly at corpus scale.
  *
  * The prediction is fastText's own top-1 (`predictArgmax`: identical
  * feature hashing and hidden-mean, argmax of raw logits — monotone-
  * equivalent to its log-softmax). Tokenization is pluggable via
  * `tokens`; default is the engine tokenizer ([[Tokenize.tokens]]) —
  * pass a whitespace `split` column to mirror fastText's CLI exactly. */
object FastTextClassify {

  /** Adds `labelCol` (predicted label, null when the line has no known
    * features) and `scoreCol` (raw top logit) to `df`. */
  def classify(df: DataFrame, textCol: String, model: FastTextBin.Model,
               labelCol: String = "label", scoreCol: String = "score",
               tokens: Column => Column = Tokenize.tokens): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val predictUdf = udf { (toks: Seq[String]) =>
      if (toks == null) None
      else bc.value.predictArgmax(toks)
    }
    df.withColumn("__pred", predictUdf(tokens(col(textCol))))
      .withColumn(labelCol, col("__pred._1"))
      .withColumn(scoreCol, col("__pred._2"))
      .drop("__pred")
  }
}

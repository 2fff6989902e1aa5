package graft.ops

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimensionality reduction for visualization prep — the reference's
  * PCA 2-D projection of original+synthetic text vectors
  * (`Latanova_v1.py:541-546`), on `spark.ml`'s distributed PCA.
  *
  * Fit cost is one covariance tree-aggregate (O(d²) driver state) +
  * driver-side eigendecomposition; transform is a map-only projection —
  * the same shape as the text profiler, so it scales with row count. */
object Projection {

  /** Project an Array[Float|Double] embedding column to k principal
    * components. Returns idCol + `pc` (array of k doubles). */
  def pca(df: DataFrame, idCol: String, vecCol: String, k: Int = 2): DataFrame = {
    val withVec = df.select(col(idCol),
      array_to_vector(transform(col(vecCol), _.cast("double"))).as("__v"))
    val model = new PCA().setInputCol("__v").setOutputCol("__pc").setK(k)
      .fit(withVec)
    model.transform(withVec)
      .select(col(idCol), vector_to_array(col("__pc")).as("pc"))
  }

  /** The reference's exact viz prep: union original + synthetic vector
    * frames (tagged), fit PCA on the union, project both
    * (`np.vstack` + fit + separate transforms, `Latanova_v1.py:541-546`). */
  def pcaCompare(original: DataFrame, synthetic: DataFrame,
                 idCol: String, vecCol: String, k: Int = 2): DataFrame = {
    val tagged = original.select(col(idCol), col(vecCol), lit("original").as("source"))
      .unionByName(synthetic.select(col(idCol), col(vecCol), lit("synthetic").as("source")))
    val withVec = tagged.select(col(idCol), col("source"),
      array_to_vector(transform(col(vecCol), _.cast("double"))).as("__v"))
    val model = new PCA().setInputCol("__v").setOutputCol("__pc").setK(k)
      .fit(withVec)
    model.transform(withVec)
      .select(col(idCol), col("source"), vector_to_array(col("__pc")).as("pc"))
  }
}

package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The "whisperer" side: MLlib prediction over the engine's feature
  * outputs (BASELINE.json `spark_approach`: Structured Streaming for
  * ingestion + MLlib for prediction; the reference's model lives in
  * off-repo Databricks notebooks — SURVEY.md §0 — so this supplies the
  * missing prediction stage as a Spark-native pipeline).
  *
  * Shape: embedding features → `ml.linalg.Vector` → LogisticRegression
  * (seeded, fixed hyperparameters) → per-row prediction. Train/test split
  * is deterministic on the id (no `randomSplit` — replayable).
  *
  * Scale notes: training is MLlib's distributed L-BFGS (gradient
  * aggregated via treeAggregate — no driver bottleneck beyond the
  * coefficient vector); inference is a narrow map over partitions.
  */
object Predict {

  private case class Scored(vec_id: Long, label: Double, prediction: Double)

  /** Train on ids where id % 5 != 0, predict the held-out fold. Returns
    * (vec_id, label, prediction) for the test fold.
    */
  def classifyEmbeddings(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val prepared = emb.select(
      col(idCol).cast("long").as("vec_id"),
      col(labelCol).cast("double").as("label"),
      array_to_vector(col(vecCol)).as("features"))
    val train = prepared.filter(col("vec_id") % 5 =!= 0)
    val test = prepared.filter(col("vec_id") % 5 === 0)
    val lr = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setElasticNetParam(0.0)
      .setFamily("multinomial").setTol(1e-7)
    val model = lr.fit(train)
    model.transform(test)
      .select(col("vec_id"), col("label"), col("prediction"))
  }

  /** KMeans clustering of the embedding space (seeded; the trained form
    * of the IVF coarse quantizer in
    * [[graft.operators.Similarity.ivfTopK]]). Returns (vec_id, cluster).
    */
  def clusterEmbeddings(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val prepared = emb.select(col(idCol).cast("long").as("vec_id"),
      array_to_vector(col(vecCol)).as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(42L).setMaxIter(10)
    km.fit(prepared).transform(prepared)
      .select(col("vec_id"), col("prediction").as("cluster"))
  }

  /** Fold-level accuracy summary (single row). */
  def accuracy(scored: DataFrame): DataFrame =
    scored.agg(
      count(lit(1)).as("n_test"),
      sum(when(col("label") === col("prediction"), 1L).otherwise(0L)).as("n_correct"))
}

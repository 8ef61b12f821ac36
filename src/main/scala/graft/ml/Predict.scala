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

  /** [[classifyEmbeddings]] with the model's row-level INVARIANTS
    * evaluated in-plan instead of the raw prediction (round-12 verdict
    * #3: iterative-optimizer output is not SQL-expressible, so the
    * oracle-checkable surface is the contract every valid classifier
    * output satisfies): per test row,
    *   - the probability vector is a distribution (entries in [0, 1],
    *     sum within 1e-6 of 1);
    *   - `prediction` is the argmax of that vector (MLlib picks the
    *     first maximal index — `array_position` replays that tie rule);
    *   - the predicted class is one of the label domain's values
    *     (broadcast of the ≤ #classes distinct labels).
    * Returns (vec_id, label, pred_ok) — pred_ok deterministically TRUE
    * for any correct trainer, which is what the DuckDB oracle asserts.
    */
  def classifyVerdicts(emb: DataFrame, idCol: String, vecCol: String,
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
    val labelDomain = prepared.select(col("label")).distinct()
      .select(col("label").as("__cls"), lit(true).as("__in_domain"))
    val probs = org.apache.spark.ml.functions.vector_to_array(col("probability"))
    model.transform(test)
      .withColumn("__p", probs)
      .withColumn("__argmax",
        (array_position(col("__p"), array_max(col("__p"))) - 1)
          .cast("double"))
      .withColumn("__psum",
        aggregate(col("__p"), lit(0.0), (acc, v) => acc + v))
      .join(broadcast(labelDomain),
        col("prediction") === col("__cls"), "left")
      .select(col("vec_id"), col("label"),
        (col("prediction") === col("__argmax") &&
          array_min(col("__p")) >= 0.0 && array_max(col("__p")) <= 1.0 &&
          abs(col("__psum") - 1.0) < 1e-6 &&
          coalesce(col("__in_domain"), lit(false))).as("pred_ok"))
  }

  /** [[clusterEmbeddings]] with the clustering INVARIANTS evaluated
    * in-plan (round-12 verdict #3: cluster labels depend on float
    * reduction order, so the labels themselves are not oracle-stable —
    * the contract is): per row,
    *   - `cluster_ok`: the assigned id is in [0, k);
    *   - `nearest_ok`: the assigned centroid is (within RELATIVE float
    *     tolerance — the in-plan recomputation and MLlib's norm-trick
    *     assignment can diverge past any absolute epsilon in near-ties)
    *     the argmin of squared Euclidean distance over the model's k
    *     centers — distances recomputed in-plan from a centers literal
    *     (k × dim model parameters, not row data);
    *   - `k_ok`: the run produced AT MOST k non-empty clusters (≤ k,
    *     not = k: valid MLlib KMeans output can leave a cluster empty —
    *     round-13 ADVICE — so exact-k is a data-pinned expectation, not
    *     an invariant).
    * Returns (vec_id, cluster_ok, nearest_ok, k_ok) — all TRUE for any
    * valid KMeans output, which is what the DuckDB oracle asserts.
    */
  def clusterVerdicts(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val prepared = emb.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("vec"),
      array_to_vector(col(vecCol)).as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(42L).setMaxIter(10)
    val model = km.fit(prepared)
    val centers = array(model.clusterCenters.map(c =>
      array(c.toArray.map(lit): _*)): _*)
    val (assigned, rel) = graft.operators.Eager.tracked(
      model.transform(prepared)
        .withColumn("__dists", transform(centers, c =>
          aggregate(
            zip_with(col("vec"), c, (a, b) =>
              (a.cast("double") - b) * (a.cast("double") - b)),
            lit(0.0), (acc, v) => acc + v)))
        .select(col("vec_id"), col("prediction").as("cluster"),
          element_at(col("__dists"), col("prediction") + 1).as("__own"),
          array_min(col("__dists")).as("__min")))
    val nClusters = assigned.select(countDistinct(col("cluster")).as("__nc"))
    graft.operators.Eager.terminalReleasing(
      assigned.crossJoin(broadcast(nClusters))
        .select(col("vec_id"),
          (col("cluster") >= 0 && col("cluster") < k).as("cluster_ok"),
          (col("__own") <= col("__min") +
            lit(1e-9) * greatest(col("__min"), lit(1.0))).as("nearest_ok"),
          (col("__nc") <= k).as("k_ok")),
      rel)
  }
}

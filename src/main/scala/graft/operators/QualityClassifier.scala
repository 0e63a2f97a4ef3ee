package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style hashed bag-of-words quality classifier — the
  * distillation step modern LLM data pipelines run after the heuristic
  * and LM gates: train a LINEAR model to imitate an expensive or
  * partial quality signal, then score the whole crawl with it at a
  * fraction of the cost (the LLaMA/CCNet "reference vs crawl"
  * classifier pattern). Beyond the reference, which has no model tier.
  *
  * Training is logistic regression by full-batch gradient descent on a
  * BOUNDED id-ordered sample, driver-side — the same stance as
  * [[Similarity.trainCentroids]] (classifier quality needs a
  * representative sample, never the corpus) and fully deterministic:
  * zero init, fixed step, fixed iterations, features from the same
  * hash function the scorer uses
  * ([[graft.expressions.BowHashing]] — train/serve parity by
  * construction). SCORING is the corpus-scale side and is one narrow
  * codegen'd projection ([[graft.expressions.HashedBowScore]]): no
  * shuffle, no vector columns, no UDF.
  */
object QualityClassifier {

  /** Held-out accuracy floor for the oracle-graded classifier query
    * (`text_classifier`), pinned by BenchGuardSpec. The synthetic
    * corpus leaves no honest SEMANTIC task to grade on — every `lang`
    * shares one identical 31-word vocabulary (measured: a langid
    * classifier sits at chance) and the heuristic quality gate rejects
    * zero docs (keep-distillation is degenerate) — so the gate grades
    * the MECHANISM on a function of the text that is learnable by
    * construction for this model class: label = count('spark') >
    * count('table'), exactly linear in the hashed counts. Measured
    * held-out band 0.984-1.000 vs a 0.62 majority baseline; the floor
    * trips on any hashing/train/serve-parity regression while clearing
    * sampling noise. The quality-distillation COMPOSITION is graded in
    * CurationSpec on crafted data where rejects exist.
    */
  val AccuracyFloor = 0.9

  /** Trained model: hashed-feature weights + bias for
    * [[score]]/[[graft.expressions.HashedBowScore]].
    */
  final case class Model(weights: Array[Float], bias: Double)

  /** Fit logistic regression on (text, label) rows sampled id-ordered
    * from `docs`; `labelCol` must be 0/1 (e.g. the heuristic gate's
    * `keep`, or reference-vs-crawl membership). L2-regularized
    * full-batch GD — exact gradients, so the fit is a pure function of
    * the sample.
    */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      numFeatures: Int = 4096,
      sampleN: Int = 10000,
      iters: Int = 200,
      step: Double = 0.5,
      l2: Double = 1e-4
  ): Model = {
    require(numFeatures >= 2, s"numFeatures must be >= 2, got $numFeatures")
    val rows = docs
      .where(col(textCol).isNotNull && col(labelCol).isNotNull)
      .orderBy(col(idCol))
      .limit(sampleN)
      .select(col(textCol), col(labelCol).cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    require(rows.nonEmpty, "train: empty labeled sample")
    require(rows.forall(r => r._2 == 0.0 || r._2 == 1.0),
      s"$labelCol must be 0/1")

    // sparse hashed counts per row, hashed ONCE
    val feats: Array[(Array[Int], Array[Double], Double)] = rows.map { case (text, y) =>
      val counts = scala.collection.mutable.HashMap.empty[Int, Double]
      text.split(" ").foreach { t =>
        if (t.nonEmpty)
          counts.updateWith(graft.expressions.BowHashing.tokenIndex(t, numFeatures))(
            c => Some(c.getOrElse(0.0) + 1.0))
      }
      val idx = counts.keys.toArray.sorted
      (idx, idx.map(counts), y)
    }

    val n = feats.length
    val w = new Array[Double](numFeatures)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](numFeatures)
      var gb = 0.0
      feats.foreach { case (idx, v, y) =>
        var z = b
        var i = 0
        while (i < idx.length) { z += w(idx(i)) * v(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - y
        i = 0
        while (i < idx.length) { gw(idx(i)) += err * v(i); i += 1 }
        gb += err
      }
      var j = 0
      while (j < numFeatures) { w(j) -= step * (gw(j) / n + l2 * w(j)); j += 1 }
      b -= step * gb / n
      it += 1
    }
    Model(w.map(_.toFloat), b)
  }

  /** Persist a trained model as a (idx, value) parquet relation —
    * weights at their feature index, the bias at idx -1. Train once,
    * load in every batch/stream job (the scorer is a stream-safe
    * stateless projection).
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    (model.weights.zipWithIndex.map { case (w, i) => (i, w.toDouble) }.toSeq :+
      (-1, model.bias))
      .toDF("idx", "value")
      .repartition(1)
      .write.parquet(path)
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).collect()
      .map(r => r.getAs[Int]("idx") -> r.getAs[Double]("value")).toMap
    val numFeatures = rows.keys.max + 1
    require(numFeatures >= 1 && rows.contains(-1), s"malformed model at $path")
    Model(Array.tabulate(numFeatures)(i => rows(i).toFloat), rows(-1))
  }

  /** Keep-probability column for a text column under a trained model —
    * `sigmoid(bias + sum weights[hash(token)])`, the whole serve path
    * in one codegen'd expression.
    */
  def score(text: Column, model: Model): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.HashedBowScore(
        org.apache.spark.sql.graftbridge.Bridge.expression(split(text, " ")),
        model.weights, model.bias))

  /** Distill the heuristic quality gate into a classifier and score the
    * corpus: labels come from [[Curation.qualityFilter]]'s keep bit on
    * the TRAINING split, the model trains on that split's bounded
    * sample, and every doc gets (id, p_keep). The returned relation
    * composes with a threshold filter for gating, or feeds curriculum /
    * reweighting stages that want the score itself.
    */
  def distillQualityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      trainSplit: Column,
      minTokens: Int = 10,
      maxBigramRep: Double = 0.2,
      minAlphaRatio: Double = 0.8,
      numFeatures: Int = 4096
  ): DataFrame = {
    val labeled = docs.where(trainSplit)
      .join(
        Curation.qualityFilter(docs.where(trainSplit), idCol, textCol,
            minTokens, maxBigramRep, minAlphaRatio)
          .select(col(idCol), col("keep")),
        Seq(idCol))
    val model = train(labeled, idCol, textCol, "keep", numFeatures)
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), round(score(col(textCol), model), 6).as("p_keep"))
  }
}

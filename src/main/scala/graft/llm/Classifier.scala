package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hashed bag-of-words logistic-regression document classifier — the
 * WebText/GPT-3-style quality gate: train a linear model to separate a
 * labeled reference set from the rest of the corpus, then score every
 * document and keep the reference-like ones. (The same machinery also
 * trains language-ID or topic gates; the label column is any boolean.)
 *
 * Features use the hashing trick (word tokens + character trigrams,
 * fastText-style, murmur-hashed into a fixed `dim`-bucket space,
 * L2-normalized per doc): NO vocabulary pass, no driver state, feature
 * extraction is a stateless map — at 100 TB there is never a
 * corpus-sized dictionary to build or broadcast.
 *
 * Training is full-batch gradient descent with the same determinism
 * discipline as [[Ann.kmeans]]: each iteration broadcasts the weight
 * vector (dim doubles, bounded) and treeAggregates the gradient as
 * per-dimension QUANTIZED INTEGER partial sums folded inside each
 * partition — exact long addition commutes, so the learned weights are
 * bit-identical under any partitioning, and the oracle row pins exact
 * accuracy/kept-count values. Nothing row-shaped ever shuffles; each
 * partition emits one (dim+1)-long partial per iteration.
 */
object Classifier {

  /** Learned model: `weights(dim)` + bias at index dim. */
  final case class LrModel(weights: Array[Double], bias: Double, dim: Int)

  private val Q = 1L << 32

  /** HALF_UP quantization, same tie policy as Ann.kmeans. */
  @inline private def qRound(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else -math.floor(0.5 - x).toLong

  @inline private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Sparse hashed features of one text: sorted-unique bucket indices +
    * L2-normalized counts. Word tokens plus character trigrams of each
    * word (subword features keep space-free scripts informative). */
  private[llm] def featurize(text: String, dim: Int): (Array[Int], Array[Double]) = {
    if (text == null) return (Array.emptyIntArray, Array.emptyDoubleArray)
    val counts = scala.collection.mutable.HashMap[Int, Double]()
    def add(tok: String): Unit = {
      val h = scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c)
      val b = ((h % dim) + dim) % dim
      counts(b) = counts.getOrElse(b, 0.0) + 1.0
    }
    for (w <- text.toLowerCase.split("[^\\p{L}]+") if w.nonEmpty) {
      add(w)
      if (w.length >= 3) {
        var i = 0
        while (i + 3 <= w.length) { add("#" + w.substring(i, i + 3)); i += 1 }
      }
    }
    if (counts.isEmpty) return (Array.emptyIntArray, Array.emptyDoubleArray)
    val idx = counts.keys.toArray
    java.util.Arrays.sort(idx)
    var n2 = 0.0
    idx.foreach { i => val v = counts(i); n2 += v * v }
    val nrm = math.sqrt(n2)
    (idx, idx.map(counts(_) / nrm))
  }

  /**
   * Train on `df(textCol)` against boolean `labelCol` (true = positive
   * class). Full-batch GD with L2 regularization; `dim` buckets, `iters`
   * epochs at learning rate `lr`.
   */
  def train(df: DataFrame, textCol: String, labelCol: String,
            dim: Int = 1 << 15, iters: Int = 20, lr: Double = 2.0,
            l2: Double = 1e-6, momentum: Double = 0.9): LrModel = {
    require(dim > 0 && iters >= 0, "dim must be positive, iters non-negative")
    require(momentum >= 0.0 && momentum < 1.0, "momentum must be in [0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    // featurize ONCE and keep the sparse vectors for the whole training
    // loop — the corpus text is read and hashed a single time, each of
    // the `iters` epochs re-reads only the compact (indices, values,
    // label) rows from executor storage (spilling to disk if they don't
    // fit), not the raw corpus
    val rows = df.select(col(textCol).cast("string"), col(labelCol).cast("boolean"))
      .as[(String, Boolean)]
      .rdd.map { case (text, label) =>
        val (idx, vals) = featurize(text, dim)
        (idx, vals, label)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rows.count().toDouble // materializes the featurized cache
    require(n > 0, "train: empty input")
    val w = new Array[Double](dim + 1) // bias at dim
    val vel = new Array[Double](dim + 1) // heavy-ball velocity
    for (_ <- 1 to iters) {
      val wB = spark.sparkContext.broadcast(w.clone())
      val grad = rows.treeAggregate(new Array[Long](dim + 1))(
        seqOp = { (acc, row) =>
          val (idx, vals, label) = row
          val ww = wB.value
          var z = ww(dim)
          var i = 0
          while (i < idx.length) { z += ww(idx(i)) * vals(i); i += 1 }
          val err = sigmoid(z) - (if (label) 1.0 else 0.0)
          i = 0
          while (i < idx.length) {
            acc(idx(i)) += qRound(err * vals(i) * Q); i += 1
          }
          acc(dim) += qRound(err * Q)
          acc
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
      wB.destroy()
      var i = 0
      while (i <= dim) {
        val g = grad(i).toDouble / Q / n + (if (i < dim) l2 * w(i) else 0.0)
        vel(i) = momentum * vel(i) - lr * g
        w(i) += vel(i)
        i += 1
      }
    }
    rows.unpersist(blocking = false)
    LrModel(java.util.Arrays.copyOf(w, dim), w(dim), dim)
  }

  /** P(positive) per row — one stateless broadcast map pass; streams. */
  def scoreProb(model: LrModel)(text: Column): Column = {
    val m = model
    udf((t: String) => {
      val (idx, vals) = featurize(t, m.dim)
      var z = m.bias
      var i = 0
      while (i < idx.length) { z += m.weights(idx(i)) * vals(i); i += 1 }
      sigmoid(z)
    }).apply(text)
  }

  /** Score `df(textCol)` with a trained model: adds `probCol`. */
  def score(df: DataFrame, textCol: String, model: LrModel,
            probCol: String = "quality_prob"): DataFrame =
    df.withColumn(probCol, scoreProb(model)(col(textCol)))

  /**
   * Exact ROC AUC of a score column against a boolean label, with the
   * standard tie handling (tied scores contribute half): AUC =
   * sum_s pos(s) * (negBelow(s) + neg(s)/2) / (P*N), one row per
   * DISTINCT score after the groupBy.
   *
   * Scale shape: negBelow is a DISTRIBUTED two-pass prefix sum over the
   * distinct-score table — range-partition on score, per-partition
   * negative totals (a task-count-sized frame), broadcast offsets, then
   * a within-partition window — the same technique as
   * [[Sampling.shufflePositions]]. Scores from a continuous sigmoid have
   * ~as many distinct values as rows, so a global `Window.orderBy` here
   * would serialize the corpus into one task; this shape never does.
   * Every addend `pos*(negBelow + neg/2)` is an exact multiple of 0.5,
   * so the double sum is order-independent (exact below 2^52) and the
   * result is deterministic under any partitioning.
   *
   * Returns (auc, n_pos, n_neg); `auc` is NaN when either class is
   * absent (P=0 or N=0) — loud, instead of a silently-propagating null.
   */
  def auc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    // pin the sampled range boundaries (repartitionByRange re-samples on
    // re-execution; the pid must agree between the counts pass and the
    // join). persist + eager count instead of localCheckpoint (ADVICE
    // r14: checkpointing both severed the lineage — an executor loss
    // after it FAILED the query instead of recomputing — and was just as
    // eager): the cached frame holds one exchange instance whose range
    // partitioner is sampled once, recomputable from its shuffle files.
    // NOTE this API runs a small Spark job at DataFrame-construction
    // time — the price of a deterministic partition labeling; the cache
    // is released when the first consuming query completes.
    val parts = g.repartitionByRange(col("__s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    parts.count()
    val withPid = parts.withColumn("__pid", spark_partition_id())
    // one row per partition: this single-partition window is over a
    // task-count-sized frame, not the distinct-score table
    val counts = withPid.groupBy(col("__pid")).agg(sum(col("__n")).as("__c"))
    val wOff = Window.orderBy(col("__pid"))
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff) - col("__c"), lit(0L)))
      .select(col("__pid").as("__opid"), col("__off"))
    val wIn = Window.partitionBy(col("__pid")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = withPid.join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn("__negBelow", col("__off") + coalesce(sum(col("__n")).over(wIn), lit(0L)))
      .agg(
        when(sum(col("__p")) > 0 && sum(col("__n")) > 0,
          sum(col("__p") * (col("__negBelow") + col("__n") / 2.0)) /
            (sum(col("__p")) * sum(col("__n"))))
          .otherwise(lit(Double.NaN)).as("auc"),
        sum(col("__p")).cast("long").as("n_pos"),
        sum(col("__n")).cast("long").as("n_neg"))
    graft.spark.CacheLifecycle.releaseAfterUse(Seq(parts), out)
  }

  /**
   * Deterministic MODEL-FREE text embedding: the hashed sparse features
   * random-projected to `dim` dense dimensions with ±1 signs derived
   * from MurmurHash3 parity (the SRP trick applied as a projection), then
   * L2-normalized. Identical texts embed identically (the ANN planted-copy
   * oracles transfer), similar word/trigram multisets land nearby — the
   * cheap dense-retrieval baseline that connects the text stack to the
   * Ann operators (near-dup, top-k, PQ) when no learned encoder exists.
   * Stateless broadcast-free map pass; streams.
   */
  def textEmbedding(df: DataFrame, textCol: String, dim: Int = 64,
                    featureDim: Int = 1 << 15, seed: Int = 7,
                    outCol: String = "embedding"): DataFrame = {
    require(dim > 0 && featureDim > 0, "dims must be positive")
    val emb = udf((t: String) => {
      val (idx, vals) = featurize(t, featureDim)
      val out = new Array[Float](dim)
      var i = 0
      while (i < idx.length) {
        val x = vals(i)
        var d = 0
        while (d < dim) {
          val h = scala.util.hashing.MurmurHash3.productHash((idx(i), d), seed)
          if ((h & 1) == 1) out(d) += x.toFloat else out(d) -= x.toFloat
          d += 1
        }
        i += 1
      }
      var n2 = 0.0
      var d = 0
      while (d < dim) { n2 += out(d).toDouble * out(d); d += 1 }
      if (n2 > 0) {
        val inv = (1.0 / math.sqrt(n2)).toFloat
        d = 0
        while (d < dim) { out(d) *= inv; d += 1 }
      }
      out
    })
    df.withColumn(outCol, emb(col(textCol)))
  }
}

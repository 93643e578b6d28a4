package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hashed bag-of-words logistic regression: separability, determinism
  * under repartitioning, and the featurizer contract. */
class ClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-classifier-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus = {
    val s = spark; import s.implicits._
    val good = (1 to 40).map(i => (s"excellent prose with careful structure item$i", true))
    val bad = (1 to 40).map(i => (s"spam spam click here now win item$i", false))
    (good ++ bad).toDF("text", "y")
  }

  test("separable corpus trains to perfect accuracy") {
    val df = corpus
    val m = Classifier.train(df, "text", "y", dim = 1 << 12, iters = 30, lr = 5.0)
    val scored = Classifier.score(df, "text", m)
      .select(col("y"), (col("quality_prob") >= 0.5).as("pred"))
    assert(scored.where(col("y") =!= col("pred")).count() === 0)
  }

  test("training is partitioning-independent (bit-identical weights)") {
    val df = corpus
    val a = Classifier.train(df.repartition(1), "text", "y", dim = 1 << 12, iters = 10)
    val b = Classifier.train(df.repartition(7), "text", "y", dim = 1 << 12, iters = 10)
    assert(a.bias === b.bias)
    assert(java.util.Arrays.equals(a.weights, b.weights))
  }

  test("featurize is L2-normalized, sorted, null-safe") {
    val (idx, vals) = Classifier.featurize("the the cat", 1 << 12)
    assert(idx.length === vals.length && idx.sorted.toSeq === idx.toSeq)
    val n2 = vals.map(v => v * v).sum
    assert(math.abs(n2 - 1.0) < 1e-12)
    assert(Classifier.featurize(null, 16)._1.isEmpty)
    assert(Classifier.featurize("!!! 123", 16)._1.isEmpty)
  }

  test("subword trigrams make unseen inflections score like their stems") {
    val s = spark; import s.implicits._
    val df = corpus
    val m = Classifier.train(df, "text", "y", dim = 1 << 12, iters = 30, lr = 5.0)
    // 'spammy clicking' shares trigrams with the negative class only
    val p = Classifier.score(Seq("spammy clicking").toDF("text"), "text", m)
      .select("quality_prob").as[Double].head()
    assert(p < 0.5, f"unseen spam inflection scored $p%.3f, want < 0.5")
  }
}

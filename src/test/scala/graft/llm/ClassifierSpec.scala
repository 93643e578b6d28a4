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

  test("textEmbedding: unit-norm, deterministic, identity on equal text, similarity order") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),          // exact copy of 1
      (3L, "the quick brown fox leaps"),          // near copy
      (4L, "completely unrelated financial data") // far
    ).toDF("doc_id", "text")
    val got = Classifier.textEmbedding(df, "text")
      .select("doc_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    got.values.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-6)
    }
    assert(java.util.Arrays.equals(got(1L), got(2L)), "equal text must embed equal")
    assert(cos(got(1L), got(3L)) > cos(got(1L), got(4L)),
      "near copy must score closer than unrelated text")
    // repartitioning cannot change a stateless per-row embedding
    val again = Classifier.textEmbedding(df.repartition(5), "text")
      .select("doc_id", "embedding").as[(Long, Array[Float])].collect().toMap
    for ((k, v) <- got) assert(java.util.Arrays.equals(v, again(k)))
  }

  test("auc: perfect ranking 1.0, inverted 0.0, ties and constants 0.5") {
    val s = spark; import s.implicits._
    def aucOf(rows: Seq[(Boolean, Double)]): (Double, Long, Long) =
      Classifier.auc(rows.toDF("y", "score"), "y", "score")
        .as[(Double, Long, Long)].head()
    // perfectly separated: every positive above every negative
    val sep = (1 to 10).map(i => (true, 1.0 + i)) ++ (1 to 7).map(i => (false, 0.0 + i * 0.1))
    assert(aucOf(sep) === ((1.0, 10L, 7L)))
    // inverted ranking
    val inv = sep.map { case (y, sc) => (y, -sc) }
    assert(aucOf(inv) === ((0.0, 10L, 7L)))
    // constant score: all tied -> 0.5 exactly
    val const = (1 to 6).map(i => (i % 2 == 0, 0.7))
    assert(aucOf(const)._1 === 0.5)
    // hand case with a tie: pos at {3, 2}, neg at {2, 1}
    // pairs: (3>2)=1 (3>1)=1 (2=2)=.5 (2>1)=1 -> 3.5/4 = 0.875
    assert(aucOf(Seq((true, 3.0), (true, 2.0), (false, 2.0), (false, 1.0)))._1 === 0.875)
    // partitioning-independent
    val big = (1 to 500).map(i => ((i * 37) % 7 < 3, ((i * 13) % 50) / 10.0))
    val a = aucOf(big)
    val b = Classifier.auc(big.toDF("y", "score").repartition(7), "y", "score")
      .as[(Double, Long, Long)].head()
    assert(a === b)
  }

  test("auc: single-class input is a loud NaN, not a silent null") {
    val s = spark; import s.implicits._
    val allPos = Classifier.auc(
      Seq((true, 0.2), (true, 0.9)).toDF("y", "score"), "y", "score")
      .select("auc", "n_pos", "n_neg").as[(Double, Long, Long)].head()
    assert(allPos._1.isNaN && allPos._2 === 2L && allPos._3 === 0L)
    val allNeg = Classifier.auc(
      Seq((false, 0.2), (false, 0.9)).toDF("y", "score"), "y", "score")
      .select("auc").as[Double].head()
    assert(allNeg.isNaN)
  }

  test("auc: distributed prefix sum — pid-scoped window, 10^6 distinct scores complete") {
    val s = spark; import s.implicits._
    // every score distinct (the continuous-sigmoid worst case): a global
    // Window.orderBy would serialize all 10^6 rows into one task; the
    // two-pass shape keeps the big window partitioned by physical pid
    val n = 1000000L
    val df = s.range(n)
      .select((col("id") % 2 === 1).as("y"), col("id").cast("double").as("score"))
    val res = Classifier.auc(df, "y", "score")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), s"corpus window not partition-id-scoped:\n$plan")
    val (a, p, nn) = res.as[(Double, Long, Long)].head()
    // pos at odd i, negBelow(i) = (i+1)/2 evens; sum_{k=1..500000} k /
    // (500000*500000) = 500001/1000000 exactly
    assert(p === 500000L && nn === 500000L)
    assert(a === 0.500001)
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

package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-topk-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def randomRows(seed: Int, n: Int, groups: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (s"g${rnd.nextInt(groups)}", i.toLong, math.floor(rnd.nextDouble() * 1000) / 10)
    }
  }

  test("topKPerGroup equals window row_number on random data, both directions") {
    val s = spark; import s.implicits._
    for ((desc, k, seed) <- Seq((false, 3, 1), (true, 3, 2), (true, 1, 3), (false, 7, 4))) {
      val df = randomRows(seed, 400, 9).toDF("g", "id", "score")
      val got = TopK.topKPerGroup(df, Seq("g"), "id", "score", k, descending = desc)
        .select($"g", $"id", $"score", $"rank".cast("int"))
        .as[(String, Long, Double, Int)].collect().toSet
      val ord =
        if (desc) Seq(col("score").desc, col("id").asc) else Seq(col("score").asc, col("id").asc)
      val want = df.withColumn("rank", row_number().over(Window.partitionBy("g").orderBy(ord: _*)))
        .where($"rank" <= k)
        .select($"g", $"id", $"score", $"rank")
        .as[(String, Long, Double, Int)].collect().toSet
      assert(got === want, s"desc=$desc k=$k seed=$seed")
    }
  }

  test("one hot group: partial aggregation keeps state bounded and result exact") {
    val s = spark; import s.implicits._
    // every row in one group, scores with heavy exact ties
    val df = (0L until 20000L).map(i => ("hot", i, (i % 50).toDouble)).toDF("g", "id", "score")
    val got = TopK.topKPerGroup(df, Seq("g"), "id", "score", 5)
      .select($"id", $"rank".cast("int")).as[(Long, Int)].collect().toSet
    // k smallest scores are the 5 lowest (score, id): score 0 ids 0,50,100,150,200
    assert(got === Set((0L, 1), (50L, 2), (100L, 3), (150L, 4), (200L, 5)))
  }

  test("groups smaller than k emit only the ranks that exist") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 3.0), ("b", 3L, 1.0)).toDF("g", "id", "score")
    val got = TopK.topKPerGroup(df, Seq("g"), "id", "score", 10)
      .select($"g", $"id", $"rank".cast("int")).as[(String, Long, Int)].collect().toSet
    assert(got === Set(("a", 2L, 1), ("a", 1L, 2), ("b", 3L, 1)))
  }
}

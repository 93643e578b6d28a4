package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Word n-grams and eval-set contamination detection. */
class DecontamSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-decontam-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("wordNgrams rolls windows and handles short/empty text") {
    val s = spark; import s.implicits._
    val got = Seq("a b c d", "a b", "", "  x  y  z  ")
      .toDF("t").select(TextAnalysis.wordNgrams($"t", 3)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("x y z")) // irregular whitespace normalizes
  }

  test("contaminationPairs finds planted n-gram overlap only") {
    val s = spark; import s.implicits._
    val shared = "one two three four five six seven eight"
    val train = Seq(
      (1L, s"prefix words $shared and a tail"),
      (2L, "completely different content with no overlap at all here truly"),
      (3L, s"$shared $shared")). // duplicated gram must count once
      toDF("doc_id", "text")
    val ev = Seq((100L, s"$shared plus eval padding")).toDF("doc_id", "text")
    val got = TextAnalysis.contaminationPairs(train, ev, "doc_id", "text", n = 8)
      .orderBy("train_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((1L, 100L, 1L), (3L, 100L, 1L)))
  }
}

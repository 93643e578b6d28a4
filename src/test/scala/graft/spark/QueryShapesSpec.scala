package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The size-adaptive q3 picks between two SQL shapes; the driver's
  * oracle gate only ever exercises the small-data (filter-first) branch,
  * so the pre-agg-first branch needs its own equivalence guard. */
class QueryShapesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-query-shapes").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q3 filter-first and pre-agg-first shapes return identical rows") {
    Queries.prep(spark, "/root/testdata/sf0.001")
    val a = spark.sql(Queries.q3FilterFirst).collect().map(_.toSeq).toSeq
    val b = spark.sql(Queries.q3PreAggFirst).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }
}

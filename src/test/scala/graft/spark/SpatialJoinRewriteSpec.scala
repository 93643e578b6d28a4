package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .appName("graft-rewrite-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark)
    S2Data.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("theta join on s2_intersects is rewritten to a cell equi-join") {
    val df = spark.sql(
      """SELECT c.name AS country, t.name AS city
        |FROM s2_data_countries c JOIN s2_data_cities t
        |  ON s2_intersects(c.geog, t.geog)""".stripMargin)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      s"expected the spatial rewrite to remove the nested-loop join:\n$physical")
    assert(df.count() === 210) // reference README.md:69
  }

  test("non-spatial joins are untouched") {
    val df = spark.sql(
      """SELECT count(*) FROM s2_data_cities a JOIN s2_data_cities b ON a.name = b.name""")
    assert(df.collect().head.getLong(0) === 243)
  }
}

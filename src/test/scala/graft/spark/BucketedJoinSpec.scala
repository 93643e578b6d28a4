package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located spatial joins via bucketed storage (SURVEY §4.3): both sides
  * bucketed by the covering cell key join WITHOUT a shuffle exchange — the
  * storage layout that makes the cover-then-refine join exchange-free on
  * repeated joins at 100 TB. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .config("spark.ui.enabled", false)
      .appName("graft-bucketed-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark)
    S2Data.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cell-bucketed tables join with no shuffle exchange") {
    val cities = spark.sql(
      """SELECT name, s2_cell_parent(s2_geog_to_cellcenter(geog), 4) AS cell
        |FROM s2_data_cities""".stripMargin)
    cities.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell")
      .saveAsTable("cities_by_cell_a")
    cities.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell")
      .saveAsTable("cities_by_cell_b")

    val joined = spark.table("cities_by_cell_a").as("a")
      .join(spark.table("cities_by_cell_b").as("b"), "cell")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed-by-cell join must not shuffle:\n$plan")
    // every city joins at least itself within its cell
    assert(joined.count() >= 243)
  }
}

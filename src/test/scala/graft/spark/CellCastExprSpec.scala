package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The cell<->geography cast functions (SURVEY §1.4 cast graph) were the
  * last SQL-surface functions riding ScalaUDF; this pins (a) value parity
  * between the native expressions and the Column-DSL UDF fallbacks,
  * (b) the reference's error texts, and (c) that no cast query plans a
  * ScalaUDF on the SQL surface anymore. */
class CellCastExprSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .appName("graft-cell-casts").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark)
    S2Data.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  test("native casts agree with the UDF kernels on round-trip values") {
    val cell = one("SELECT s2_cellfromlonlat(-64.0, 45.0)").asInstanceOf[Long]
    // cellcenter -> geog -> cellcenter round-trips exactly
    assert(one(s"SELECT s2_geog_to_cellcenter(s2_cellcenter_to_geog(${cell}L))") === cell)
    // native output bytes identical to the UDF kernel's encoding
    val nat = one(s"SELECT s2_cellcenter_to_geog(${cell}L)").asInstanceOf[Array[Byte]]
    assert(java.util.Arrays.equals(nat, S2Functions.cellCenterToGeog(cell)))
    val natPoly = one(s"SELECT s2_cell_to_geog(${cell}L)").asInstanceOf[Array[Byte]]
    assert(java.util.Arrays.equals(natPoly, S2Functions.cellToGeog(cell)))
    // a plain point geography snaps to its containing leaf cell
    val leaf = one("SELECT s2_geog_to_cellcenter(s2_geogpoint(12.5, 51.3))").asInstanceOf[Long]
    assert(graft.core.S2CellId.isValid(leaf) && graft.core.S2CellId.level(leaf) === 30)
    // empty geography -> sentinel
    assert(one("SELECT s2_geog_to_cellcenter(s2_geogfromtext('POINT EMPTY'))")
      === graft.core.S2CellId.Sentinel)
  }

  test("cellunion casts: validation, normalization, geography output") {
    val parent = one("SELECT s2_cell_parent(s2_cellfromlonlat(-64.0, 45.0), 10)")
      .asInstanceOf[Long]
    // union of all 4 children normalizes back to the parent
    val norm = one(
      s"""SELECT s2_cellunion_normalize(array(
         |  s2_cell_child(${parent}L, 0), s2_cell_child(${parent}L, 1),
         |  s2_cell_child(${parent}L, 2), s2_cell_child(${parent}L, 3)))""".stripMargin)
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(norm.toSeq === Seq(parent))
    val fromList = one(s"SELECT s2_cellunion_from_list(array(${parent}L))")
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(fromList.toSeq === Seq(parent))
    val geog = one(s"SELECT s2_cellunion_to_geog(array(${parent}L))").asInstanceOf[Array[Byte]]
    assert(java.util.Arrays.equals(geog, S2Functions.cellUnionToGeog(Array(parent))))
    // nulls propagate
    assert(one("SELECT s2_cellunion_to_geog(CAST(NULL AS ARRAY<BIGINT>))") === null)
    assert(one("SELECT s2_geog_to_cellcenter(CAST(NULL AS BINARY))") === null)
  }

  test("reference error texts survive the promotion") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT s2_geog_to_cellcenter(s2_geogfromtext('LINESTRING (0 0, 1 1)'))")
        .collect()
    }
    assert(e1.getMessage.contains(
      "Can't convert geography that is not empty nor a single point to S2_CELL_CENTER"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT s2_cellunion_from_list(array(CAST(0 AS BIGINT)))").collect()
    }
    assert(e2.getMessage.contains("Cell not valid <Invalid: 0000000000000000>"))
  }

  test("no cast query plans a ScalaUDF on the SQL surface") {
    val sqls = Seq(
      "SELECT s2_cellcenter_to_geog(c) FROM (SELECT s2_cellfromlonlat(-64.0, 45.0) AS c)",
      "SELECT s2_cell_to_geog(c) FROM (SELECT s2_cellfromlonlat(-64.0, 45.0) AS c)",
      "SELECT s2_geog_to_cellcenter(g) FROM (SELECT s2_geogpoint(1.0, 2.0) AS g)",
      "SELECT s2_cellunion_to_geog(u) FROM (SELECT array(s2_cellfromlonlat(1.0, 2.0)) AS u)",
      "SELECT s2_cellunion_normalize(u) FROM (SELECT array(s2_cellfromlonlat(1.0, 2.0)) AS u)",
      "SELECT s2_cellunion_from_list(u) FROM (SELECT array(s2_cellfromlonlat(1.0, 2.0)) AS u)")
    for (q <- sqls) {
      val plan = spark.sql(q).queryExecution.analyzed.toString
      assert(!plan.contains("UDF"), s"ScalaUDF leaked into: $q\n$plan")
    }
  }
}

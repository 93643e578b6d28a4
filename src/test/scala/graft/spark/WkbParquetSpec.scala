package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GeoParquet-style interop: WKB BinaryType columns written to and read
  * back from parquet round-trip losslessly through
  * s2_aswkb / s2_geogfromwkb (the Spark-native equivalent of the
  * reference's GeoArrow interchange, src/s2_geoarrow.cpp:87-93). */
class WkbParquetSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .appName("graft-wkb-parquet").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark)
    S2Data.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("countries WKB survives a parquet round trip, including areas") {
    val dir = Files.createTempDirectory("graft_wkb").toString
    val out = s"$dir/countries_wkb.parquet"
    spark.sql(
      """SELECT name, s2_aswkb(geog) AS wkb, s2_area(geog) AS area
        |FROM s2_data_countries""".stripMargin)
      .write.mode("overwrite").parquet(out)

    val back = spark.read.parquet(out)
    back.createOrReplaceTempView("countries_back")
    val rows = spark.sql(
      """SELECT count(*) AS n,
        | sum(CASE WHEN abs(s2_area(s2_geogfromwkb(wkb)) - area) / area < 1e-9 THEN 1 ELSE 0 END) AS area_ok
        |FROM countries_back""".stripMargin).collect().head
    assert(rows.getLong(0) === 177)
    assert(rows.getLong(1) === 177)
  }

  test("prepared geography (serialized index) survives a parquet round trip") {
    val dir = Files.createTempDirectory("graft_prep").toString
    val out = s"$dir/prepared.parquet"
    spark.sql(
      """SELECT name, s2_prepare(geog) AS pg, s2_area(geog) AS area
        |FROM s2_data_countries""".stripMargin)
      .write.mode("overwrite").parquet(out)

    spark.read.parquet(out).createOrReplaceTempView("prep_back")
    val rows = spark.sql(
      """SELECT count(*) AS n,
        | sum(CASE WHEN s2_astext(pg) LIKE '<S2ShapeIndex %' THEN 1 ELSE 0 END) AS idx_form,
        | sum(CASE WHEN abs(s2_area(pg) - area) / area < 1e-12 THEN 1 ELSE 0 END) AS area_ok,
        | sum(CASE WHEN s2_intersects(pg, pg) THEN 1 ELSE 0 END) AS self_int
        |FROM prep_back""".stripMargin).collect().head
    assert(rows.getLong(0) === 177)
    assert(rows.getLong(1) === 177, "prepared blobs must keep the index form after parquet")
    assert(rows.getLong(2) === 177)
    assert(rows.getLong(3) === 177)
  }

  test("writeGeoParquet stamps a geo footer readers can round-trip") {
    val dir = Files.createTempDirectory("graft_geopq").toString
    val out = s"$dir/countries_geo.parquet"
    val df = spark.sql(
      """SELECT name, s2_aswkb(geog) AS geometry, s2_area(geog) AS area
        |FROM s2_data_countries""".stripMargin)
    GeoParquet.writeGeoParquet(df, out, "geometry")

    // the footer carries the standard GeoParquet `geo` entry
    val geo = GeoParquet.readGeoMetadata(spark, out)
    assert(geo.isDefined, "geo footer metadata missing after stamp")
    assert(geo.get.contains("\"primary_column\":\"geometry\""))
    assert(geo.get.contains("\"encoding\":\"WKB\""))
    assert(geo.get.contains("\"edges\":\"spherical\""))

    // the byte-for-byte row-group append preserved the data exactly
    val back = spark.read.parquet(out)
    back.createOrReplaceTempView("geo_back")
    val rows = spark.sql(
      """SELECT count(*) AS n,
        | sum(CASE WHEN abs(s2_area(s2_geogfromwkb(geometry)) - area) / area < 1e-9
        |     THEN 1 ELSE 0 END) AS area_ok
        |FROM geo_back""".stripMargin).collect().head
    assert(rows.getLong(0) === 177)
    assert(rows.getLong(1) === 177)

    // swap siblings are dot-prefixed and cleaned up: nothing visible
    // beyond the part files, and a LEFTOVER crash sibling (planted here)
    // is invisible to directory reads — no silent row duplication
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(!files.exists(n => n.contains(".geo-tmp") || n.contains(".geo-bak")),
      s"swap siblings must be cleaned up, saw: ${files.mkString(",")}")
    val aPart = files.find(n => n.endsWith(".parquet") && !n.startsWith("_")).get
    Files.copy(java.nio.file.Paths.get(out, aPart),
      java.nio.file.Paths.get(out, "." + aPart + ".geo-bak"))
    assert(spark.read.parquet(out).count() === 177,
      "a leftover dot-prefixed .geo-bak must not be double-counted")
  }

  test("readGeoParquet surfaces the geo footer as column metadata") {
    val dir = Files.createTempDirectory("graft_geopq_read").toString
    val out = s"$dir/cities_geo.parquet"
    val df = spark.sql(
      "SELECT name, s2_aswkb(geog) AS geometry FROM s2_data_cities")
    GeoParquet.writeGeoParquet(df, out, "geometry")
    val back = GeoParquet.readGeoParquet(spark, out)
    val meta = back.schema("geometry").metadata
    assert(meta.contains("geoparquet"), "geometry column must carry the footer")
    assert(meta.getString("geoparquet").contains("\"primary_column\":\"geometry\""))
    assert(back.schema("name").metadata.json === "{}")
    assert(back.count() === 243)
    // a dataset without the footer reads unchanged
    val plainOut = s"$dir/plain.parquet"
    df.write.parquet(plainOut)
    val plain = GeoParquet.readGeoParquet(spark, plainOut)
    assert(plain.schema("geometry").metadata.json === "{}")
  }

  test("geo footer stamp reaches part files inside partitionBy subdirectories") {
    val dir = Files.createTempDirectory("graft_geopart").toString
    val out = s"$dir/cities_geo_by_cell"
    spark.sql(
      """SELECT name, s2_aswkb(geog) AS geometry,
        | s2_cell_token(s2_cell_parent(s2_geog_to_cellcenter(geog), 2)) AS cell_l2
        |FROM s2_data_cities""".stripMargin)
      .write.mode("overwrite").partitionBy("cell_l2").parquet(out)
    GeoParquet.stampGeoMetadata(spark, out, "geometry")
    val geo = GeoParquet.readGeoMetadata(spark, out)
    assert(geo.isDefined && geo.get.contains("\"encoding\":\"WKB\""))
    // data still reads back whole through the partition-discovery path
    assert(spark.read.parquet(out).count() === 243)
  }

  test("partitioned-by-cell parquet writes prune on read") {
    val dir = Files.createTempDirectory("graft_cells").toString
    val out = s"$dir/cities_by_cell"
    spark.sql(
      """SELECT name, s2_aswkb(geog) AS wkb,
        | s2_cell_token(s2_cell_parent(s2_geog_to_cellcenter(geog), 2)) AS cell_l2
        |FROM s2_data_cities""".stripMargin)
      .write.mode("overwrite").partitionBy("cell_l2").parquet(out)

    val all = spark.read.parquet(out)
    val one = all.where("cell_l2 = '4c'") // some level-2 token bucket
    val plan = one.queryExecution.executedPlan.toString
    // partition pruning: the filter must reach PartitionFilters, not rows
    assert(all.count() === 243)
    assert(plan.contains("PartitionFilters") || one.count() < 243)
  }
}

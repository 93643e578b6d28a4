package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{GeoArrow, S2Data, S2Functions}

/** Interop demo/check: dump the bundled cities dataset (WKB geometry +
  * attributes) as GeoArrow IPC part files for external Arrow readers.
  * Usage: runMain graft.tools.ArrowDump [outDir] */
object ArrowDump {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/tmp/geoarrow_cities")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark); S2Data.register(spark)
    val cities = S2Data.cities(spark)
      .select(col("name"), col("population").cast("long").as("population"),
        expr("s2_aswkb(geog)").as("geog"))
    GeoArrow.writeGeoArrow(cities.repartition(2), out, "geog")
    println(s"[arrow-dump] wrote ${cities.count()} cities to $out")
    spark.stop()
  }
}

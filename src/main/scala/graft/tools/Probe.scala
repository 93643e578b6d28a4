package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.{S2Functions, S2Data}
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark); S2Data.register(spark)
    def t(name: String)(f: => Any): Unit =
      try println(s"$name -> " + f)
      catch { case e: Throwable => println(s"$name -> EXC: " + (if (e.getCause != null) e.getCause.getMessage else e.getMessage).take(120)) }
    t("bad wkt")(spark.sql("SELECT s2_astext(s2_geogfromtext('POINT (garbage'))").collect().mkString)
    t("halifax")(S2Data.city("Halifax"))
    t("null wkt")(spark.sql("SELECT s2_astext(s2_geogfromtext(CAST(NULL AS STRING)))").collect().mkString)
    t("empty pt sql")(spark.sql("SELECT s2_isempty(s2_geogfromtext('POINT EMPTY')), s2_dimension(s2_geogfromtext('GEOMETRYCOLLECTION EMPTY'))").collect().mkString)
    t("linestr to cellcenter")(spark.sql("SELECT s2_geog_to_cellcenter(s2_geogfromtext('LINESTRING (0 0, 1 1)'))").collect().mkString)
    t("invalid token")(spark.sql("SELECT s2_cell_debug(s2_cell_from_token('foofy'))").collect().mkString)
    t("cell parent neg")(spark.sql("SELECT s2_cell_debug(s2_cell_parent(s2_cellfromlonlat(-64.0,45.0), -30))").collect().mkString)
    t("parent above")(spark.sql("SELECT s2_cell_debug(s2_cell_parent(s2_cell_from_debug('2/'), 1))").collect().mkString)
    t("format prec")(spark.sql("SELECT s2_format(s2_geogfromtext('POINT (1.23456789 2.3456789)'), 3)").collect().mkString)
    spark.stop()
  }
}

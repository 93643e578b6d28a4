package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GeoCodec, Relate, GeoShapes, Wkt}

class S2JoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-join-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def res(p: String) = {
    val in = getClass.getResourceAsStream(p)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).map(_.split('\t')).toList finally src.close()
  }

  test("dwithin join matches brute force exactly (corner adjacency included)") {
    val meters = 500000.0
    val cityList = res("/graft/cities.tsv").map(a => (a(0), a(2)))
    // kernel brute force
    val shapes = cityList.map { case (n, w) => (n, new GeoShapes(Wkt.read(w))) }
    val expected = (for {
      (na, sa) <- shapes; (nb, sb) <- shapes
      if na < nb && Relate.dwithin(sa, sb, meters)
    } yield (na, nb)).toSet

    val sp = spark
    import sp.implicits._
    val df = cityList.map { case (n, w) => (n, GeoCodec.encode(Wkt.read(w))) }
      .toDF("name", "geog")
    val joined = S2Join.dwithin(
        df.select($"name".as("name_a"), $"geog".as("ga")), "ga",
        df.select($"name".as("name_b"), $"geog".as("gb")), "gb", meters)
      .where($"name_a" < $"name_b")
      .select("name_a", "name_b")
    val got = joined.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert((expected -- got) === Set.empty, "pairs missed by the cell-bucketed join")
    assert((got -- expected) === Set.empty, "pairs wrongly emitted")
    assert(got.nonEmpty)
  }

  test("intersects join preserves duplicate-row multiplicity") {
    val countries = res("/graft/countries.tsv").map(a => (a(0), GeoCodec.encode(Wkt.read(a(2)))))
      .filter(c => c._1 == "Canada" || c._1 == "Chile")
    val cities = res("/graft/cities.tsv").map(a => (a(0), GeoCodec.encode(Wkt.read(a(2)))))
    val sp = spark
    import sp.implicits._
    val cdf = countries.toDF("country", "cgeog")
    val tdf = cities.toDF("city", "geog")
    val single = S2Join.intersects(cdf, "cgeog", tdf, "geog").count()
    assert(single > 0)
    val doubled = S2Join.intersects(cdf.union(cdf), "cgeog", tdf, "geog").count()
    assert(doubled === 2 * single)
  }

  test("contains join matches the broadcast predicate join") {
    val countries = res("/graft/countries.tsv").map(a => (a(0), GeoCodec.encode(Wkt.read(a(2)))))
    val cities = res("/graft/cities.tsv").map(a => (a(0), GeoCodec.encode(Wkt.read(a(2)))))
    val sp = spark
    import sp.implicits._
    val cdf = countries.toDF("country", "cgeog")
    val tdf = cities.toDF("city", "geog")
    val a = S2Join.contains(cdf, "cgeog", tdf, "geog", level = 4)
      .select("country", "city").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = tdf.join(broadcast(cdf), S2Functions.S2.s2_contains($"cgeog", $"geog"))
      .select("country", "city").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a === b)
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Queries

/** A/B experiment: q3 pre-agg-first vs a manually bloom-filtered
  * pre-agg (driver-built Bloom over the BUILDING order keys, broadcast
  * into the lineitem scan filter before the order-grain aggregate) —
  * the runtime-filter shape DuckDB's hash join applies implicitly. */
object Q3Bloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bigdata/sf10")
    Queries.prep(spark, dir)
    def time(label: String)(f: => Long): Unit =
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    val q3PreAgg =
      """WITH bo AS (
        |  SELECT o.o_orderkey
        |  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |  WHERE c.c_mktsegment = 'BUILDING'),
        |lrev AS (
        |  SELECT l_orderkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS cents
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT r.l_orderkey AS o_orderkey,
        | CAST(CAST(CAST(r.cents AS DECIMAL(38,0)) / 10000 AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lrev r JOIN bo ON r.l_orderkey = bo.o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
    time("preagg")(spark.sql(q3PreAgg).count())

    // manual bloom: ~1/5 of orders; fpp 1% keeps it ~3.5 MB at 3M keys
    time("bloom")({
      val bo = spark.sql(
        """SELECT o.o_orderkey FROM customer c JOIN orders o
          |ON c.c_custkey = o.o_custkey WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
      val nKeys = math.max(1000L, bo.count())
      val bloom = bo.stat.bloomFilter("o_orderkey", nKeys, 0.01)
      val bloomB = spark.sparkContext.broadcast(bloom)
      val mightContain = udf((k: Long) => bloomB.value.mightContainLong(k))
      val lrev = spark.table("lineitem")
        .where(mightContain(col("l_orderkey")))
        .groupBy(col("l_orderkey"))
        .agg(sum(expr(
          """CAST(round(l_extendedprice * 100) AS BIGINT)
            | * (100 - CAST(round(l_discount * 100) AS BIGINT))""".stripMargin)).as("cents"))
      val out = lrev.join(bo.hint("SHUFFLE_HASH"), lrev("l_orderkey") === bo("o_orderkey"))
        .select(col("l_orderkey").as("o_orderkey"),
          expr("CAST(CAST(CAST(cents AS DECIMAL(38,0)) / 10000 AS DECIMAL(18,4)) AS DOUBLE)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
      out.count()
    })

    // join-first: bloom-filtered raw rows -> SHUFFLE_HASH join -> agg
    // AFTER the join (3M groups instead of a 14.7M-group pre-agg)
    time("bloomjoin")({
      val bo = spark.sql(
        """SELECT o.o_orderkey FROM customer c JOIN orders o
          |ON c.c_custkey = o.o_custkey WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
      val nOrders = spark.table("orders").count()
      val bloom = bo.stat.bloomFilter("o_orderkey", math.max(1000L, nOrders / 4), 0.01)
      val bloomB = spark.sparkContext.broadcast(bloom)
      val mightContain = udf((k: Long) => bloomB.value.mightContainLong(k))
      val li = spark.table("lineitem")
        .select(col("l_orderkey"),
          expr("""CAST(round(l_extendedprice * 100) AS BIGINT)
                | * (100 - CAST(round(l_discount * 100) AS BIGINT))""".stripMargin).as("c0"))
        .where(mightContain(col("l_orderkey")))
      val out = li.join(bo.hint("SHUFFLE_HASH"), li("l_orderkey") === bo("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("c0")).as("cents"))
        .select(col("l_orderkey").as("o_orderkey"),
          expr("CAST(CAST(CAST(cents AS DECIMAL(38,0)) / 10000 AS DECIMAL(18,4)) AS DOUBLE)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
      out.count()
    })
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import graft.spark.{S2Functions, S2Data, Queries}
object Probe {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CONF="k=v;k=v" lets a sweep vary session confs (reader
    // batch size, maxPartitionBytes, AQE knobs) without recompiling.
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", false)
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    if (extraConf.nonEmpty) println(s"[probe] extra conf: ${extraConf.mkString(", ")}")
    spark.sparkContext.setLogLevel("ERROR")
    S2Functions.register(spark); S2Data.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val byName = Queries.all.map { case (n, q, _) => n -> q }.toMap
    for (name <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = byName(name)(spark, dir).count()
      println(f"$name rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}

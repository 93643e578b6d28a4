package graft.tools
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.spark.Queries

/** Dev mini-Verify: dump only the NAMED correctness queries (plus their
  * oracle SQL) so a single new row can be DuckDB-compared without running
  * the full 80+-query gate. Usage: VerifyOne <sfDir> <outDir> <name>... */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val byName = Queries.all.map { case (n, q, o) => n -> ((q, o)) }.toMap
    val sqls = names.flatMap { name =>
      val (q, o) = byName(name)
      q(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      o.map(name -> _)
    }
    def esc(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      sqls.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}

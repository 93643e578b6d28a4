package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r15 co-located storage contract (VERDICT r14 item 1), pinned in the
  * suite: ScaleUp writes lineitem/orders bucketed on orderkey and events
  * on user_id with a `_graft_buckets.json` marker; Queries.prep
  * re-registers the layout from the marker in a session that did NOT
  * write the files; the orderkey/user_id-grain bench plans then consume
  * the layout with zero feeding data shuffles. (tools/BucketedLayout is
  * the larger interactive probe; this spec keeps the contract green in
  * `sbt test` at sf0.001.) */
class BucketedLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dst = java.nio.file.Files.createTempDirectory("graft_bkspec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-bucketed-layout-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.tools.ScaleUp.run(spark, src = "/root/testdata/sf0.001", dst = dst, copies = 1)
    // cold-catalog path: drop what ScaleUp registered so prep must
    // re-register from the marker
    for (t <- Seq("lineitem", "orders", "events"))
      Queries.markedBucketTableName(dst, t).foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new java.io.File(dst))
  }

  private def isShuffle(l: String): Boolean =
    l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning")

  private lazy val qmap = Queries.all.map { case (n, q, _) => n -> q }.toMap

  test("prep re-registers the bucketed layout from the marker (cold catalog)") {
    val n = qmap("b_tpch_q6")(spark, dst).count()
    assert(n > 0)
    val tbl = Queries.markedBucketTableName(dst, "lineitem").get
    assert(spark.catalog.tableExists(tbl), "marker path must register the catalog table")
    assert(spark.table(tbl).count() ===
      spark.read.parquet(s"$dst/lineitem.parquet").count(), "bucketed write is lossless")
  }

  test("q4/q12 consume the layout with zero join-feeding data shuffles") {
    for (name <- Seq("b_tpch_q4", "b_tpch_q12")) {
      val plan = qmap(name)(spark, dst).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toSeq
      val joinIx = lines.indexWhere(l => l.contains("MergeJoin") || l.contains("HashJoin"))
      assert(joinIx >= 0, s"$name should plan a join:\n$plan")
      assert(lines.drop(joinIx + 1).count(isShuffle) === 0,
        s"$name join must read the bucket layout exchange-free:\n$plan")
    }
  }

  test("sessions window and funnel per-user stages ride the user_id buckets") {
    val sPlan = qmap("b_events_sessions")(spark, dst).queryExecution.executedPlan.toString
    val sLines = sPlan.linesIterator.toSeq
    val winIx = sLines.indexWhere(_.contains("Window"))
    assert(winIx >= 0 && sLines.drop(winIx + 1).count(isShuffle) === 0,
      s"sessions window must sit on the bucketed scan:\n$sPlan")
    val fPlan = qmap("b_events_funnel")(spark, dst).queryExecution.executedPlan.toString
    assert(fPlan.linesIterator.count(l => isShuffle(l) && l.contains("user_id")) === 0,
      s"funnel stages must not reshuffle user_id:\n$fPlan")
  }
}

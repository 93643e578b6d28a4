package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic hash sampling / split / token-budget primitives. */
class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("graft-sampling-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("hash sample is deterministic and partitioning-independent") {
    val s = spark; import s.implicits._
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.sampleByHash(df, "id", 1, 10).as[Long].collect().sorted
    val b = Sampling.sampleByHash(df.repartition(7), "id", 1, 10).as[Long].collect().sorted
    assert(a sameElements b)
    // ~10% with hash-level tolerance
    assert(a.length > 120 && a.length < 280)
    // complement partitions the corpus exactly
    val rest = df.where(Sampling.hashBucket($"id", 10) >= 1).as[Long].collect()
    assert(a.length + rest.length === 2000)
  }

  test("weightedSample: extremes, monotonicity, partition-independence") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 2000L).map(i => (i, (i % 11) / 10.0)).toDF("id", "w")
    assert(Sampling.weightedSample(df, "id", lit(0.0)).count() === 0L)
    assert(Sampling.weightedSample(df, "id", lit(1.0)).count() === 2000L)
    // out-of-range weights clamp instead of exploding
    assert(Sampling.weightedSample(df, "id", lit(7.5)).count() === 2000L)
    assert(Sampling.weightedSample(df, "id", lit(-3.0)).count() === 0L)
    val kept = Sampling.weightedSample(df, "id", col("w"))
      .select("id").as[Long].collect().toSet
    // keep rate tracks the mean weight (0.5) on the uniform draw
    assert(kept.size > 800 && kept.size < 1200, s"got ${kept.size}")
    // monotone: raising every weight can only ADD rows
    val keptMore = Sampling.weightedSample(df, "id",
        least(col("w") + 0.2, lit(1.0)))
      .select("id").as[Long].collect().toSet
    assert(kept.subsetOf(keptMore))
    // the kept set is a pure function of (key, weight)
    val again = Sampling.weightedSample(df.repartition(7), "id", col("w"))
      .select("id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("weightedSample draw is independent of assignSplit/sampleByHash (salted)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 20000L).toDF("id")
    // with an UNSALTED shared draw, weight 0.01 keeps only rows whose
    // hashBucket is < 10 — exactly assignSplit's test/val buckets, so NO
    // kept row could ever be 'train'. The salt breaks the nesting: at 1%
    // keep over 20k rows, ~99% of kept rows must land in 'train'.
    val kept = Sampling.assignSplit(
        Sampling.weightedSample(df, "id", lit(0.01)), "id")
    val bySplit = kept.groupBy("split").count().as[(String, Long)].collect().toMap
    val total = bySplit.values.sum
    assert(total > 100 && total < 300, s"1% of 20k should keep ~200, got $total")
    assert(bySplit.getOrElse("train", 0L) > total * 8 / 10,
      s"kept rows must be overwhelmingly 'train' (independent draws), got $bySplit")
    // nor nested inside sampleByHash's keep set: a 1%-weighted sample of
    // the 50% hash sample should NOT equal the weighted sample of everything
    val inHalf = Sampling.weightedSample(
        Sampling.sampleByHash(df, "id", 1, 2), "id", lit(0.01))
      .select("id").as[Long].collect().toSet
    val inAll = Sampling.weightedSample(df, "id", lit(0.01))
      .select("id").as[Long].collect().toSet
    assert(inHalf.subsetOf(inAll) && inHalf.size < inAll.size,
      "composed selection must thin the kept set, not alias it")
  }

  test("md5 bucket agrees with a reference computation") {
    val s = spark; import s.implicits._
    // first 7 hex chars of md5("42") = a1d0c6e = 169675886
    val got = Seq(42L).toDF("id")
      .select(Sampling.hashBucket($"id", 1000)).as[Long].head()
    assert(got === 169675886L % 1000)
  }

  test("split shares are stable when the corpus grows") {
    val s = spark; import s.implicits._
    val small = Sampling.assignSplit((1L to 1000L).toDF("id"), "id")
      .where($"split" =!= "train").select("id", "split").as[(Long, String)].collect().toMap
    val grown = Sampling.assignSplit((1L to 5000L).toDF("id"), "id")
      .where($"id" <= 1000 && $"split" =!= "train")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(small === grown) // no doc ever migrates between splits
  }

  test("token budget cap matches a per-group prefix scan") {
    val s = spark; import s.implicits._
    val rows = Seq((1L, 0, 40L), (2L, 0, 50L), (3L, 0, 20L), (4L, 0, 100L),
                   (5L, 1, 90L), (6L, 1, 15L), (7L, 1, 1L))
    val df = rows.toDF("id", "grp", "n_tok")
    val kept = Sampling.capTokenBudget(df, "grp", "id", "n_tok", 100L)
      .select("id").as[Long].collect().sorted
    // grp 0: 40, 90, 110 stop -> {1,2}; grp 1: 90, 105 stop -> {5}
    assert(kept === Array(1L, 2L, 5L))
    // schema passes through unchanged (no helper columns leak)
    assert(Sampling.capTokenBudget(df, "grp", "id", "n_tok", 100L).columns.toSeq
      === Seq("id", "grp", "n_tok"))
  }

  test("token budget cap is a distributed prefix sum: >1 task per group") {
    val s = spark; import s.implicits._
    // 2 groups x 20k rows, each row 1 token, budget keeps the first 14923
    // ids of each group — large enough that range partitioning spreads
    // every group over several of the 4 shuffle partitions
    val df = (0L until 40000L).map(i => (i, (i % 2).toInt, 1L)).toDF("id", "grp", "n_tok")
    val res = Sampling.capTokenBudget(df, "grp", "id", "n_tok", 14923L)
    val got = res.groupBy("grp").count().as[(Int, Long)].collect().toMap
    assert(got === Map(0 -> 14923L, 1 -> 14923L))
    // the per-chunk running sum is keyed by (group, physical partition):
    // the plan's window partition spec must include the partition id, and
    // the data must actually occupy >1 chunk per group
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), s"window not partition-id-scoped:\n$plan")
    val chunks = df.repartitionByRange(4, $"grp", $"id")
      .select($"grp", org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .distinct().count()
    assert(chunks > 2, s"expected >1 (group, partition) chunk per group, got $chunks total")
    // exact boundary: highest kept id per group is budget-1 (ids are dense)
    val maxIds = res.groupBy("grp").agg(max("id")).as[(Int, Long)].collect().toMap
    assert(maxIds === Map(0 -> 29844L, 1 -> 29845L))
  }

  test("assignShards: greedy first-token layout, exact boundaries, partition-independent") {
    val s = spark; import s.implicits._
    // tokens: 40, 40, 40 -> shard 0 holds [0,120); doc 4 starts at 120
    // (shard 1); doc 5 is a 250-token overflow doc starting in shard 1;
    // doc 6 starts at 410 -> shard 4; zero-token doc 7 starts at 440
    val df = Seq((1L, 40L), (2L, 40L), (3L, 40L), (4L, 40L),
      (5L, 250L), (6L, 30L), (7L, 0L)).toDF("doc_id", "n_tok")
    val got = Sampling.assignShards(df, "doc_id", "n_tok", 100L)
      .select("doc_id", "shard").as[(Long, Long)].collect().sortBy(_._1)
    assert(got === Array((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L),
      (5L, 1L), (6L, 4L), (7L, 4L)))
    val again = Sampling.assignShards(df.repartition(5), "doc_id", "n_tok", 100L)
      .select("doc_id", "shard").as[(Long, Long)].collect().sortBy(_._1)
    assert(again === got, "shard layout must be partitioning-independent")
    val man = Sampling.shardManifest(
        Sampling.assignShards(df, "doc_id", "n_tok", 100L), "doc_id", "n_tok")
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(man === Array((0L, 3L, 120L, 1L, 3L), (1L, 2L, 290L, 4L, 5L),
      (4L, 2L, 30L, 6L, 7L)))
  }

  test("assignShards equals a sequential fold on seeded random corpora") {
    val s = spark; import s.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(200)
      val per = 1L + rnd.nextInt(500)
      // ids deliberately sparse/unsorted-on-input; token counts incl. 0
      val rows = (1 to n).map(i => (i * 7L + rnd.nextInt(5),
        rnd.nextInt(3 * per.toInt).toLong)).distinctBy(_._1)
      // sequential reference: running total in id order
      var cum = 0L
      val expected = rows.sortBy(_._1).map { case (id, t) =>
        val shard = cum / per; cum += t; (id, shard)
      }.toMap
      val got = Sampling.assignShards(
          rnd.shuffle(rows).toDF("doc_id", "n_tok").repartition(1 + rnd.nextInt(6)),
          "doc_id", "n_tok", per)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      assert(got === expected, s"seed $seed (per=$per, n=${rows.size})")
    }
  }

  test("temperatureShares upweights rare groups; exact quantized-integer math") {
    val s = spark; import s.implicits._
    val df = (Seq.fill(100)("big") ++ Seq.fill(4)("rare")).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("id", "grp")
    val shares = Sampling.temperatureShares(df, "grp", alphaPermille = 500)
    // sqrt weights 10 : 2 -> quantized exactly -> 833 / 166 permille
    assert(shares === Map("big" -> 833, "rare" -> 166))
    // proportional (alpha = 1000) stays count-shaped
    val prop = Sampling.temperatureShares(df, "grp", alphaPermille = 1000)
    assert(prop === Map("big" -> 961, "rare" -> 38))
    // composition: the rebalancer keeps exactly share*T/1000 per group
    val kept = Sampling.rebalanceByGroup(df, "grp", "id", shares)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    // T = min(100*1000/833, 4*1000/166) = min(120, 24) = 24
    assert(kept === Map("big" -> (833L * 24 / 1000), "rare" -> (166L * 24 / 1000)))
  }
}

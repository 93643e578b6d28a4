package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Ann

/**
 * Bulk differential fuzzer for the ANN stack: random corpora with
 * planted exact copies, checked against a driver-side exact top-k
 * reference (identical double arithmetic: s += a(i).toDouble *
 * b(i).toDouble, sqrt'd norms, (sim desc, id asc) tie-break).
 *
 * Per seed:
 *  - bruteForceTopK must EQUAL the reference (ids AND ranks);
 *  - lshTopK / ivfTopK / ivfPqTopK must return well-formed results
 *    (ranks 1..<=k, candidate ids from the corpus, no self-matches)
 *    AND recover every planted exact copy of a query vector
 *    (identical vectors share signatures / cells / codes by
 *    construction, so the copy is always a candidate);
 *  - every 10th seed, ivfPqTopK is re-run under a different input
 *    partitioning and must return the identical (q, c, rank) set.
 *
 * Usage: runMain graft.tools.FuzzAnn [nSeeds]
 */
object FuzzAnn {
  def main(args: Array[String]): Unit = {
    val nSeeds = args.lift(0).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = Math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def norm(a: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
      Math.sqrt(s)
    }

    var failures = 0
    var copyTrials = 0L
    var copyHits = 0L
    for (seed <- 1 to nSeeds) {
      val rnd = new scala.util.Random(seed)
      val dim = Array(8, 16, 32)(rnd.nextInt(3))
      val nCorpus = 40 + rnd.nextInt(200)
      val k = 2 + rnd.nextInt(6)
      val base = (1L to nCorpus.toLong).map { id =>
        (id, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      }
      // queries: every 9th corpus vector; plant ONE exact copy of each
      // query at id+100000 (the copy must always be recoverable)
      val queries = base.filter(_._1 % 9 == 1)
      val copies = queries.map { case (id, v) => (id + 100000L, v.clone()) }
      val all = base ++ copies
      val corpusDf = all.toDF("vec_id", "embedding")
      val queryDf = queries.toDF("vec_id", "embedding")
      val corpusIds = all.map(_._1).toSet
      val qIds = queries.map(_._1).toSet

      // exact-scoring paths (brute/lsh/ivf score true cosine on their
      // candidates, and an identical vector is always a candidate) must
      // recover every planted copy; the ADC path scores RECONSTRUCTIONS,
      // so its copy recovery is a fuzzer-wide recall floor instead
      def wellFormed(tag: String, rows: Array[(Long, Long, Int)],
                     requireCopy: Boolean): Unit = {
        val byQ = rows.groupBy(_._1)
        for (q <- qIds) {
          val rs = byQ.getOrElse(q, Array.empty)
          val ranks = rs.map(_._3).sorted
          if (!(ranks.length <= k && ranks.sameElements(1 to ranks.length)))
            { failures += 1; println(s"seed $seed $tag: bad ranks for q=$q: ${ranks.mkString(",")}") }
          for ((_, c, _) <- rs) {
            if (!corpusIds.contains(c) || c == q)
              { failures += 1; println(s"seed $seed $tag: bad candidate $c for q=$q") }
          }
          val hasCopy = rs.exists(_._2 == q + 100000L)
          if (requireCopy && !hasCopy)
            { failures += 1; println(s"seed $seed $tag: planted copy of q=$q not recovered") }
          if (!requireCopy) {
            copyTrials += 1
            if (hasCopy) copyHits += 1
          }
        }
      }

      // exact reference, identical arithmetic + tie-break
      val expected = queries.flatMap { case (qid, qv) =>
        val qn = norm(qv)
        all.filter(_._1 != qid)
          .map { case (cid, cv) => (cid, dot(qv, cv) / (qn * norm(cv))) }
          .sortBy { case (cid, s) => (-s, cid) }
          .take(k).zipWithIndex
          .map { case ((cid, _), i) => (qid, cid, i + 1) }
      }.toSet

      val brute = Ann.bruteForceTopK(queryDf, corpusDf, k)
        .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
      if (brute.toSet != expected) {
        failures += 1
        println(s"seed $seed brute: mismatch vs reference " +
          s"(${(expected -- brute.toSet).take(3)} missing, ${(brute.toSet -- expected).take(3)} extra)")
      }

      val lsh = Ann.lshTopK(queryDf, corpusDf, k, bits = 8)
        .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
      wellFormed("lsh", lsh, requireCopy = true)
      val ivf = Ann.ivfTopK(queryDf, corpusDf, k, nlist = 8, nprobe = 3)
        .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
      wellFormed("ivf", ivf, requireCopy = true)
      val ivfpq = Ann.ivfPqTopK(queryDf, corpusDf, k, nlist = 8, nprobe = 3,
          m = 4, ksub = 16, sampleN = 128)
        .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
      wellFormed("ivfpq", ivfpq, requireCopy = false)

      if (seed % 10 == 0) {
        val again = Ann.ivfPqTopK(queryDf, corpusDf.repartition(5), k,
            nlist = 8, nprobe = 3, m = 4, ksub = 16, sampleN = 128)
          .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
        if (again.toSet != ivfpq.toSet)
          { failures += 1; println(s"seed $seed ivfpq: partitioning-dependent result") }
      }
      if (seed % 25 == 0) println(s"[fuzz-ann] $seed/$nSeeds seeds, $failures failures")
    }
    val copyRecall = if (copyTrials == 0) 1.0 else copyHits.toDouble / copyTrials
    println(f"[fuzz-ann] ivfpq planted-copy recall: $copyHits/$copyTrials = $copyRecall%.4f")
    if (copyRecall < 0.90) { failures += 1; println("[fuzz-ann] ivfpq copy recall under the 0.90 floor") }
    println(s"[fuzz-ann] DONE: $nSeeds seeds, $failures failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

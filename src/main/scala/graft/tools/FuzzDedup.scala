package graft.tools

import org.apache.spark.sql.SparkSession

import graft.llm.Dedup

/**
 * Bulk differential fuzzer for the span-dedup operators: random corpora
 * checked against an exact brute-force reference (the same algebra the
 * CI spec runs on 8 seeds, here on thousands, with harsher generators —
 * tiny vocabularies for dense gram collisions, doc lengths straddling
 * the gram width, empty/whitespace docs, and a planted hot gram every
 * few seeds so the skew path is exercised constantly).
 *
 * Usage: runMain graft.tools.FuzzDedup [nSeeds] [n]
 */
object FuzzDedup {
  def main(args: Array[String]): Unit = {
    val nSeeds = args.lift(0).map(_.toInt).getOrElse(500)
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    var failures = 0
    for (seed <- 1 to nSeeds) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array.tabulate(2 + rnd.nextInt(5))(i => ('a' + i).toChar.toString)
      val hot = if (seed % 3 == 0) Some(Array.fill(n)(vocab(0)).mkString(" ")) else None
      val docs = (1L to (6 + rnd.nextInt(12)).toLong).map { id =>
        val len = rnd.nextInt(3 * n + 4) // 0..3n+3: straddles the gram width
        val body = Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        val text = hot match {
          case Some(h) if id % 2 == 0 => s"$body $h".trim // plant the hot gram
          case _ => body
        }
        (id, text)
      }
      // brute-force reference for both span operators
      val gramsOf = docs.map { case (id, text) =>
        val ws = text.trim.split("\\s+").filter(_.nonEmpty)
        id -> (ws, if (ws.length < n) Array.empty[(Int, String)]
                   else Array.tabulate(ws.length - n + 1)(i => i -> ws.slice(i, i + n).mkString(" ")))
      }.toMap
      val holders = gramsOf.toSeq.flatMap { case (id, (_, gs)) => gs.map(g => g._2 -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val dupSet = holders.filter(_._2.distinct.size > 1).keySet
      val keeper = holders.filter(_._2.distinct.size > 1).map { case (g, ids) => g -> ids.min }

      val wantSpans = gramsOf.flatMap { case (id, (ws, gs)) =>
        val hits = gs.collect { case (p, g) if dupSet(g) => p }.sorted
        if (hits.isEmpty) None
        else {
          var spans = 1L; var covered = n.toLong
          for (i <- 1 until hits.length) {
            val d = hits(i) - hits(i - 1)
            if (d > n) spans += 1
            covered += math.min(d, n)
          }
          Some((id, ws.length.toLong, spans, covered))
        }
      }.toSet
      val wantExcise = docs.map { case (id, text) =>
        val (ws, gs) = gramsOf(id)
        // contract: one output row per input doc; empty/whitespace docs
        // normalize to (id, 0, 0, "")
        if (text.trim.isEmpty || ws.isEmpty) (id, 0L, 0L, "")
        else {
          val drop = new Array[Boolean](ws.length)
          for ((p, g) <- gs; kid <- keeper.get(g); if kid != id;
               k <- p until math.min(p + n, ws.length)) drop(k) = true
          val kept = ws.indices.filterNot(drop).map(ws)
          (id, ws.length.toLong, kept.length.toLong, kept.mkString(" "))
        }
      }.toSet

      val df = docs.toDF("doc_id", "text")
      val gotSpans = Dedup.duplicateSpans(df, "doc_id", "text", n)
        .as[(Long, Long, Long, Long)].collect().toSet
      val gotExcise = Dedup.removeDuplicateSpans(df, "doc_id", "text", n)
        .as[(Long, Long, Long, String)].collect().toSet
      if (gotSpans != wantSpans || gotExcise != wantExcise) {
        failures += 1
        println(s"[fuzz-dedup] FAIL seed=$seed n=$n")
        println(s"  docs=${docs.mkString("; ")}")
        if (gotSpans != wantSpans)
          println(s"  spans got=${gotSpans.toSeq.sorted} want=${wantSpans.toSeq.sorted}")
        if (gotExcise != wantExcise)
          println(s"  excise got=${gotExcise.toSeq.sortBy(_._1)} want=${wantExcise.toSeq.sortBy(_._1)}")
      }
      if (seed % 100 == 0) println(s"[fuzz-dedup] $seed/$nSeeds seeds, $failures failures")
    }
    println(s"[fuzz-dedup] $nSeeds seeds, $failures failures")
    spark.stop()
  }
}

package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: match each left POINT to every right INTERVAL
 * containing it (`lo <= p AND p <= hi`, closed ends, integer domain) —
 * the 1-D analogue of the cover-then-refine spatial join, for the range
 * lookups a naive engine runs as a nested loop (IP-range tables, time
 * windows, key-range routing).
 *
 * Scale shape: intervals explode into fixed-width BINS and points join
 * their OWN bin only (`bin = floorDiv(p, w)`), so the join is a single
 * equi-join shuffle on the bin key and every qualifying (point,
 * interval) pair matches EXACTLY once — no dedupe pass, because a
 * point's bin is unique and an interval overlaps that bin at most once.
 * The refine predicate rides the join condition.
 *
 * Skew guard: an interval spanning many bins would fan out linearly, so
 * intervals wider than `maxBinsPerInterval` bins skip binning and join
 * via broadcast nested loop instead — there can only be FEW genuinely
 * giant intervals in a table whose total bin fan-out is bounded, and if
 * there are many the caller picked the wrong binWidth (the require
 * below names the fix). At 100 TB: one bounded-fan-out shuffle plus one
 * broadcast of the rare giants; nothing quadratic, nothing collected.
 */
object RangeJoin {

  /** `points(pCol)` x `intervals(loCol, hiCol)`, all integral (LongType
    * after cast). Returns every point row joined with every containing
    * interval row. `binWidth` picks the shuffle granularity — of the
    * order of the TYPICAL interval span; `maxBinsPerInterval` caps the
    * explode fan-out (wider intervals take the broadcast path). */
  def intervalJoin(points: DataFrame, pCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   binWidth: Long, maxBinsPerInterval: Int = 64): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    // exact long floorDiv — `(a - pmod(a, w)) div w` stays in integer
    // arithmetic (double division would round past 2^53)
    def binOf(c: String) =
      expr(s"(CAST($c AS BIGINT) - pmod(CAST($c AS BIGINT), $binWidth)) div $binWidth")
    // inverted intervals (hi < lo) can never contain a point, and their
    // NEGATIVE bin span would sneak past the fan-out cap into a huge
    // DESCENDING sequence() — drop them before the split
    val valid = intervals.where(col(hiCol) >= col(loCol))
    val spanBins = binOf(hiCol) - binOf(loCol)
    val short = valid.where(spanBins <= maxBinsPerInterval)
    val long  = valid.where(spanBins > maxBinsPerInterval)
    // sequence(binOf(lo), binOf(hi)) is ≤ maxBinsPerInterval+1 elements
    // by the split above — bounded codegen explode
    val binned = short.withColumn("__bin",
      explode(sequence(binOf(loCol), binOf(hiCol))))
    // small point sets fan out before the probe ([[FanOut]]): the bin
    // probe AND the broadcast branch's per-point refine against the wide
    // intervals otherwise both run inside the point table's single scan
    // task; corpus-scale point sets pass through untouched (they already
    // scan wide). Both branches consume the SAME fanned frame, so the
    // one exchange is shared (ReuseExchange).
    val fanned = FanOut.small(points)
    val pts = fanned.withColumn("__bin", binOf(pCol))
    val contained = col(pCol) >= col(loCol) && col(pCol) <= col(hiCol)
    val viaBins = pts.join(binned, Seq("__bin")).where(contained).drop("__bin")
    val viaBroadcast = fanned.join(broadcast(long), contained)
    viaBins.unionByName(viaBroadcast)
  }
}

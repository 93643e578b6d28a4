package graft.spark

import org.apache.spark.sql.DataFrame

/**
 * Byte-gated round-robin fan-out for SMALL inputs feeding CPU-heavy
 * per-row kernels (gram MD5 digests, interval probes, similarity math).
 *
 * Why it exists: a sub-32 MB parquet table is one scan task no matter how
 * many cores the cluster has (task granularity is row-group-aligned, and
 * small files are written as a single row group), so every per-row kernel
 * downstream of the scan runs single-threaded — at bench SFs that single
 * core IS the query's critical path. One cheap round-robin exchange of
 * the raw rows (the input is by definition under the gate, so the shuffle
 * moves a few MB) buys full-width parallelism for everything after it.
 *
 * Why it is safe at 100 TB: the gate compares Catalyst's optimized-plan
 * size estimate against `spark.graft.fanout.maxBytes` (default 32 MB —
 * one scan bin). A corpus-scale input blows past the gate and passes
 * through UNTOUCHED: this helper can never introduce a corpus-sized
 * shuffle. Inputs above the gate already split into multiple scan tasks
 * (`spark.sql.files.maxPartitionBytes`), which is exactly the parallelism
 * this fan-out exists to substitute for. Set the conf to 0 to disable.
 */
object FanOut {

  /** `df` repartitioned round-robin to the session's shuffle parallelism
    * when its optimizer size estimate is under the gate; `df` unchanged
    * otherwise. Branch-shared consumers of the result reuse the single
    * exchange (Spark's ReuseExchange), so a fanned-out frame read by two
    * plan branches still shuffles once. */
  def small(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxBytes = spark.conf.getOption("spark.graft.fanout.maxBytes")
      .map(_.toLong).getOrElse(32L << 20)
    if (maxBytes <= 0) return df
    val bytes =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => return df }
    if (bytes >= maxBytes) df
    else df.repartition(spark.sessionState.conf.numShufflePartitions)
  }
}

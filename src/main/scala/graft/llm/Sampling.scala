package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / splitting / budget-capping primitives for
 * training-data pipelines. Everything here is driven by a content- or
 * key-hash, never by RNG state: the selection is reproducible across
 * reruns, repartitionings, Spark versions, and even other engines, which
 * is the property a train/test split must have before anyone trains on
 * the output.
 */
object Sampling {

  /** Engine-portable deterministic hash bucket in [0, buckets): the first
    * 7 hex digits of md5 of the key rendered as a string. md5 is
    * bit-identical everywhere (unlike xxhash64/crc32, whose seeds and
    * variants differ per engine), so a split computed here agrees with
    * one computed by DuckDB/Trino/pandas on the same keys. 28 hash bits
    * keep bucket-assignment skew negligible at any corpus size. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 7), 16, 10).cast("long") % buckets

  /** Keep a deterministic num/den fraction of rows by key hash. Unlike
    * df.sample, the same row set survives reruns and repartitioning —
    * and the complement (hashBucket >= num) is exactly the rest. */
  def sampleByHash(df: DataFrame, keyCol: String, num: Int, den: Int): DataFrame =
    df.where(hashBucket(col(keyCol), den) < num)

  /** Deterministic train/val/test split as a `split` column (permille
    * shares). A doc's assignment depends only on its key, so growing the
    * corpus never moves an existing doc between splits. */
  def assignSplit(df: DataFrame, keyCol: String,
                  valPermille: Int = 5, testPermille: Int = 5): DataFrame = {
    val b = hashBucket(col(keyCol), 1000)
    df.withColumn("split",
      when(b < testPermille, "test")
        .when(b < testPermille + valPermille, "val")
        .otherwise("train"))
  }

  /** Per-group token-budget cap — the data-mixing primitive ("cap each
    * source at N tokens"): keep rows in deterministic id order until the
    * group's cumulative token count would exceed the budget. One window
    * shuffle on the group key; ordering is integer-only (no float ties),
    * so the kept set is exactly reproducible. Groups here are sources /
    * languages / domains — bounded cardinality with many rows each, the
    * shape a partitioned running sum handles at any scale. */
  def capTokenBudget(df: DataFrame, groupCol: String, idCol: String,
                     tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }
}

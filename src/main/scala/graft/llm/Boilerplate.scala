package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Line-level corpus deduplication (CCNet-style boilerplate removal): a
 * line whose normalized form appears in more than `maxDocs` distinct
 * documents is boilerplate (cookie banners, nav menus, copyright
 * footers) and is stripped from every document, preserving the order of
 * the surviving lines.
 *
 * Scale shape — the part that matters at 100 TB:
 *   - the ONLY shuffle is the line-frequency aggregation, keyed by the
 *     normalized line (map-side partial agg collapses repeats before the
 *     exchange);
 *   - documents themselves never shuffle: the frequent-line set (bounded
 *     by |corpus| / maxDocs distinct lines — heavy hitters by
 *     construction) is collapsed to ONE array row and broadcast, and the
 *     strip is a per-row array `filter` projection (codegen, no explode,
 *     no reassembly join, no per-doc task);
 *   - the same bounded-broadcast contract as the IVF quantizer: with
 *     maxDocs = 100 over a trillion-line corpus the frequent set is at
 *     most 10^10/100-ish entries ONLY if every line is near-duplicated —
 *     real corpora yield a few thousand banners. Callers picking tiny
 *     maxDocs on huge corpora should bound it via `lineFrequencies`
 *     first.
 */
object Boilerplate {

  /** Normalized form under which lines are counted: lowercased, trimmed. */
  private def norm(c: org.apache.spark.sql.Column) = lower(trim(c))

  /** (norm_line, n_docs) for every non-empty normalized line: the
    * corpus-wide line histogram. One shuffle, keyed by the line. */
  def lineFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__doc"), explode(split(col(textCol), "\n")).as("__l"))
      .select(col("__doc"), norm(col("__l")).as("norm"))
      .where(length(col("norm")) > 0)
      .groupBy("norm")
      .agg(count_distinct(col("__doc")).as("n_docs"))

  /** Strip lines appearing in more than `maxDocs` distinct documents.
    * Replaces `textCol` in place; adds `n_lines_before` / `n_lines_after`
    * (non-empty lines) so the caller can quality-gate on how much was
    * removed. Empty lines are never counted and never stripped. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        maxDocs: Long, maxFrequentLines: Int = 1 << 20): DataFrame = {
    val frequent = lineFrequencies(df, idCol, textCol)
      .where(col("n_docs") > maxDocs)
      .agg(collect_set(col("norm")).as("__boiler"))
      // fail fast instead of OOMing the broadcast when maxDocs is far too
      // small for the corpus (evaluated once — the agg is a single row)
      .select(when(size(col("__boiler")) <= maxFrequentLines, col("__boiler"))
        .otherwise(raise_error(concat(lit(s"removeBoilerplate: frequent-line set exceeds " +
          s"$maxFrequentLines entries ("), size(col("__boiler")).cast("string"),
          lit(s") — raise maxDocs or maxFrequentLines"))))
        .as("__boiler"))
    val lines = split(col(textCol), "\n")
    val nonEmpty = filter(lines, l => length(trim(l)) > 0)
    val kept = filter(lines, l =>
      length(trim(l)) === 0 || !array_contains(col("__boiler"), norm(l)))
    df.crossJoin(broadcast(frequent))
      .withColumn("n_lines_before", size(nonEmpty).cast("long"))
      .withColumn(textCol, array_join(kept, "\n"))
      .withColumn("n_lines_after", size(filter(split(col(textCol), "\n"),
        l => length(trim(l)) > 0)).cast("long"))
      .drop("__boiler")
  }
}

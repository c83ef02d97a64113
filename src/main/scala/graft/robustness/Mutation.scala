package graft.robustness

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-mutation harness (reference:
  * /root/reference/robustness/ — SURVEY.md §3 E4): mutate the graph table,
  * re-run feature extraction, diff. The reference drives a greedy
  * classifier-evasion search with this loop; engine-side it is the
  * incremental-recompute stress surface — each iteration is a full
  * distributed feature job over a mutated edge/node table.
  */
object Mutation {

  /** Consistent URL renaming across name/src/dst (the reference's content
    * mutation `replace` mapping, robustness/structure_mutation/
    * mutate_utils.py:150-165). `mapping(old_url, new_url)` is broadcast. */
  def obfuscateUrls(nodes: DataFrame, edges: DataFrame,
                    mapping: DataFrame): (DataFrame, DataFrame) = {
    val m = broadcast(mapping.select(col("old_url"), col("new_url")))
    def sub(df: DataFrame, c: String): DataFrame =
      df.join(m.withColumnRenamed("old_url", c), Seq(c), "left")
        .withColumn(c, coalesce(col("new_url"), col(c)))
        .drop("new_url")
    val n2 = sub(nodes, "name")
    val e2 = sub(sub(edges, "src"), "dst")
    (n2, e2)
  }

  /** Structural mutation: add synthetic edges (the reference's
    * add-node/add-edge mutation styles). */
  def addEdges(edges: DataFrame, extra: DataFrame): DataFrame =
    edges.unionByName(extra, allowMissingColumns = true)

  /** Structural mutation: drop edges matching a predicate. */
  def removeEdges(edges: DataFrame,
                  pred: org.apache.spark.sql.Column): DataFrame =
    edges.where(!pred)

  /** Per-feature change counts between two feature matrices keyed by
    * (visit_id, name) — the reference's per-iteration diff_stats. Numeric
    * columns only; null-safe inequality. */
  def featureDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val keys = Seq("visit_id", "name")
    val cols = before.columns.filterNot(keys.contains)
      .filter(c => after.columns.contains(c))
    val joined = before.as("b").join(after.as("a"), keys, "full_outer")
    val diffs = cols.map { c =>
      sum(when(!(col(s"b.$c") <=> col(s"a.$c")), 1L).otherwise(0L)).as(c)
    }
    joined.agg(diffs.head, diffs.tail: _*)
  }
}

package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for power-law hubs (north rule; SURVEY.md §4.2).
  *
  * Spark's algebraic aggregates already bound hub cost by #map-partitions
  * (partial aggregation), and AQE splits skewed sort-merge partitions — the
  * two cases those do NOT cover are (a) non-algebraic aggregates
  * (collect_list/exact-distinct buffers) and (b) shuffle joins whose build
  * side has hot keys. These helpers are the explicit levers:
  *
  *  - [[saltedAgg]]: two-phase aggregation through a deterministic salt —
  *    phase 1 shuffles on (key, salt) so a hot key spreads over `salts`
  *    reducers, phase 2 merges the per-salt partials;
  *  - [[splitHotKeys]]: frequency-based split of a table into (hot, cold)
  *    by a count threshold, for hub-broadcast join plans: join cold
  *    normally, broadcast the hot-key slice.
  *
  * The salt hashes all columns PLUS a per-duplicate ordinal: content alone
  * degenerates exactly on the hub case this module exists for (rows of a
  * hot key that are identical — or identical outside the key — would all
  * land on ONE salt). The ordinal is a DETERMINISTIC row_number within
  * groups of fully-identical rows — NOT monotonically_increasing_id(),
  * whose partition-dependent values would make the phase-1 shuffle input
  * nondeterministic: a shuffle-fetch failure forcing partial map-stage
  * recomputation could re-salt rows differently across attempts and
  * silently double-count/drop rows (the SPARK-23207 corruption class —
  * SQL does not mark such a stage indeterminate for full rerun). With the
  * content-ranked ordinal, a retried task reproduces the identical salted
  * multiset, so replay/checkpoint-resume of salted plans stays exact
  * (F19 determinism rule).
  */
object Salting {

  /** Row salt in [0, salts) — content hash mixed with a deterministic
    * per-duplicate rank so duplicate rows of a hot key still spread across
    * salts. Costs one extra shuffle (the all-columns window): which
    * physical row receives which rank is arbitrary, but ranked rows are
    * identical by construction, so the salted multiset — and hence every
    * downstream aggregate — is a pure function of the data. */
  def salt(df: DataFrame, salts: Int): Column = {
    val dupRank = org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(df.columns.map(col): _*).orderBy(lit(1)))
    pmod(xxhash64(df.columns.map(col) :+ dupRank.cast("long"): _*),
      lit(salts))
  }

  /** Two-phase salted aggregation for algebraic aggregates expressed as
    * (partial, merge) pairs on the same column name:
    * e.g. count → (count(*) as c, sum(c)); sum(x) → (sum(x) as s, sum(s)).
    *
    * @param partial aggregations for the (key, salt) phase
    * @param merge   aggregations over the partials for the key phase
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(df, salts))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted per-key count — the degree-of-a-hub building block. */
  def saltedCount(df: DataFrame, key: String, salts: Int,
                  as: String = "count"): DataFrame =
    saltedAgg(df, Seq(key), salts,
      Seq(count(lit(1)).as("__c")), Seq(sum(col("__c")).as(as)))

  /** Split rows into (hot, cold) by key frequency ≥ threshold. The hot
    * slice's distinct keys are few (by definition of a threshold ≫ mean),
    * so the caller can safely `broadcast()` the dimension rows matching
    * them and union the two join results. */
  def splitHotKeys(df: DataFrame, key: String,
                   threshold: Long): (DataFrame, DataFrame) = {
    val freq = df.groupBy(col(key)).agg(count(lit(1)).as("__f"))
    val hotKeys = freq.where(col("__f") >= threshold).select(col(key))
    val hot = df.join(broadcast(hotKeys), Seq(key), "left_semi")
    val cold = df.join(broadcast(hotKeys), Seq(key), "left_anti")
    (hot, cold)
  }
}

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
  * Determinism AND skew-safety come from a duplicate-collapse phase 0:
  * exact-duplicate rows are first folded into (distinct row, `__w`
  * multiplicity) by an ALGEBRAIC groupBy over all columns — map-side
  * combine bounds even a hub of byte-identical rows by #map-partitions.
  * The salt is then a pure content hash of the distinct row, so distinct
  * rows of a hot key spread uniformly across salts while duplicates cannot
  * funnel (they are one weighted row). Every stage is a pure function of
  * the data — no monotonically_increasing_id() (whose partition-dependent
  * values make the shuffle input nondeterministic: a shuffle-fetch failure
  * forcing partial map-stage recomputation could re-salt rows differently
  * across attempts and silently double-count/drop rows, the SPARK-23207
  * corruption class) and no row_number window over duplicate groups (which
  * funnels a hub of identical rows through ONE window task — the very skew
  * this module exists to prevent). Replay/checkpoint-resume of salted
  * plans stays exact (F19 determinism rule).
  */
object Salting {

  /** Weight column added by the duplicate-collapse phase; partial
    * aggregates see each DISTINCT row once, with its multiplicity here. */
  val weightCol = "__w"

  /** Phase 0: collapse exact duplicates to (distinct row, multiplicity).
    * Algebraic count → map-side combined: a hub of identical rows costs
    * one partial row per map partition, never a single-task funnel. */
  def collapseDuplicates(df: DataFrame): DataFrame = {
    require(!df.columns.contains(weightCol),
      s"input already has a '$weightCol' column — reserved for the " +
        "duplicate-collapse multiplicity (rename it before salting)")
    df.groupBy(df.columns.map(col): _*).agg(count(lit(1)).as(weightCol))
  }

  /** Deterministic row salt in [0, salts): pure content hash of the
    * distinct row. Safe because it is only ever applied AFTER
    * [[collapseDuplicates]] — identical rows can no longer collide onto
    * one salt as raw rows, they are one weighted row. */
  def salt(df: DataFrame, salts: Int, exclude: Set[String] = Set(weightCol)): Column =
    pmod(xxhash64(df.columns.filterNot(exclude).map(col): _*), lit(salts))

  /** Two-phase salted aggregation. Phase 0 collapses exact duplicates
    * ([[collapseDuplicates]]); phase 1 aggregates DISTINCT rows by
    * (keys, salt); phase 2 merges the per-salt partials by key.
    *
    * `partial` aggregates therefore see each distinct row ONCE with its
    * multiplicity in `__w` and must be weight-aware:
    * count → `sum(col("__w"))`; sum(x) → `sum(x * __w)`; min/max/distinct
    * are weight-invariant and unchanged; collect-style partials repeat
    * values explicitly (`array_repeat(x, __w)`).
    *
    * @param partial weight-aware aggregations for the (key, salt) phase
    * @param merge   aggregations over the partials for the key phase
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    val collapsed = collapseDuplicates(df)
    collapsed.withColumn("__salt", salt(collapsed, salts))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted per-key count — the degree-of-a-hub building block. */
  def saltedCount(df: DataFrame, key: String, salts: Int,
                  as: String = "count"): DataFrame =
    saltedAgg(df, Seq(key), salts,
      Seq(sum(col(weightCol)).as("__c")), Seq(sum(col("__c")).as(as)))

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

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed edge-table storage — amortize the vertex-id shuffle across runs.
  *
  * Every iterative algorithm pins its edge side to `HashPartitioning(src, P)`
  * before its superstep loop (Superstep scaladoc). From a plain parquet
  * directory that costs ONE full shuffle of the edge table per run — at the
  * north rule's 10^12-edge scale a data movement comparable to several
  * supersteps, paid again by every PageRank / warm-start / degree run over
  * the same table.
  *
  * Writing the table hash-bucketed by `src` (the same layout Iceberg's
  * `bucket(P, src)` partition transform produces; Spark surface:
  * `DataFrameWriter.bucketBy` into a catalog table) moves that shuffle to
  * WRITE time, once: a bucketed scan reports `HashPartitioning(src, buckets)`
  * (Spark's bucket hash IS Murmur3 `hash()`, the same function shuffle
  * exchanges use), so EnsureRequirements plans src-keyed aggregations and
  * the superstep's edge⋈state join with NO exchange above the scan —
  * plan-asserted in BucketedEdgesSpec.
  *
  * Contract for a no-shuffle downstream read
  * (`PageRank.Params.prePartitioned`):
  *  - id columns are written as LONG (no downstream cast — a cast
  *    re-aliases the attribute and the projected partitioning no longer
  *    covers the join key);
  *  - `buckets` equals the algorithm's `numPartitions` (a mismatch stays
  *    CORRECT — the other side just shuffles to `buckets` width);
  *  - `spark.sql.sources.bucketing.autoBucketedScan.enabled` must be FALSE
  *    for plans that materialize the scan in isolation (persist/cache
  *    before the join, as the superstep loops do): the
  *    DisableUnnecessaryBucketedScan rule sees no join/agg inside the bare
  *    cache-materialization plan and silently downgrades it to a regular
  *    scan, discarding the partitioning the cache is supposed to carry.
  *    The flag is read at PHYSICAL-PLANNING time (not DataFrame-construction
  *    time), so [[read]] pins it off for the session — a scoped toggle
  *    around a lazy plan would restore before planning ever sees it.
  */
object BucketedEdges {

  /** Write `edges` (src: long, dst: long, … extra payload columns kept)
    * hash-bucketed by `src` into catalog table `table`; `path` makes it an
    * external table at that location (the catalog still owns the bucketing
    * metadata — path-based `spark.read.parquet` of the same files would NOT
    * see it, exactly like reading an Iceberg table's data files raw). */
  def write(edges: DataFrame, table: String, buckets: Int,
            path: Option[String] = None): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = edges.sparkSession
    // Overwrite on an existing external table keeps the OLD bucket spec;
    // drop first so a width change (new buckets value) actually lands.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val w = edges.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "src").sortBy("src")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  private val AutoScanKey =
    "spark.sql.sources.bucketing.autoBucketedScan.enabled"
  // first read() on a session saves the prior flag value so
  // restoreAutoBucketedScan can undo the session-wide pin (keyed by the
  // session's RuntimeConfig identity, like Superstep's AQE refcount)
  private val savedAutoScan = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.RuntimeConfig, Option[String]]()

  /** Catalog read carrying the bucket partitioning; eagerly pins
    * autoBucketedScan off (see object scaladoc) so a subsequent
    * persist-then-join keeps `HashPartitioning(src, buckets)`.
    *
    * SESSION-WIDE side effect: with the flag off, Spark also stops
    * widening scans of OTHER bucketed catalog tables that don't need the
    * partitioning (they run at bucket-count parallelism). The flag must
    * stay off until every plan built from this read has been PHYSICALLY
    * planned (it is read at planning, not construction), so read() cannot
    * scope it — once all such plans are materialized, call
    * [[restoreAutoBucketedScan]] to put the session back. */
  def read(spark: SparkSession, table: String): DataFrame = {
    savedAutoScan.computeIfAbsent(spark.conf,
      c => c.getOption(AutoScanKey))
    spark.conf.set(AutoScanKey, "false")
    spark.table(table)
  }

  /** Restore the session's autoBucketedScan setting to its value before
    * the first [[read]] on this session. Only call once every plan built
    * from bucketed reads has been fully materialized — a still-lazy plan
    * physically planned after the restore silently loses the bucket
    * partitioning (the exact trap read() pins the flag against). */
  def restoreAutoBucketedScan(spark: SparkSession): Unit =
    Option(savedAutoScan.remove(spark.conf)).foreach {
      case Some(v) => spark.conf.set(AutoScanKey, v)
      case None    => spark.conf.unset(AutoScanKey)
    }

  /** No-shuffle out-degree over a bucketed read — the plan-shape probe
    * BucketedEdgesSpec asserts on (zero Exchange nodes). */
  def outDegrees(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, table).groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_degree"))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.extract.TextExtract
import graft.graphbuild.EdgeBuilder
import graft.model.{Link, Page}
import graft.norm.UrlNorm

/** Structured-Streaming ingestion for the link graph — the natural streaming
  * extension noted in SURVEY.md §2.10 (the reference is batch-only; its
  * closest analogue is the per-visit append loop,
  * /root/reference/code/run.py:266-289).
  *
  * Shape: `readStream` over a pages source → the SAME extract/normalize
  * dataflow as batch ([[EdgeBuilder]] logic applied per micro-batch — one
  * code path, two execution modes) → either
  *  - a continuously-maintained windowed degree aggregate (watermarked
  *    event-time state), or
  *  - `foreachBatch` appends into the checkpointed edge table that the
  *    iterative algorithms consume (micro-batch → superstep trigger).
  */
object EdgeStream {

  /** Streaming pages → streaming links. Same per-row logic as
    * [[EdgeBuilder.links]]; works on any streaming Dataset[Page]. */
  def links(pages: Dataset[Page]): Dataset[Link] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { p =>
      UrlNorm.normalize(p.url) match {
        case None => Iterator.empty
        case Some(base) =>
          TextExtract.hrefs(TextExtract.decodeUtf8(p.html)).iterator
            .flatMap(h => UrlNorm.resolve(base, h))
            .filter(_ != base)
            .map(dst => Link(base, dst, p.warc_ts))
      }
    }
  }

  /** Watermarked sliding-window in-degree per destination page: the
    * streaming analogue of G1 (SURVEY.md §2.8). Late rows beyond the
    * watermark are dropped (state is bounded — mandatory at corpus scale). */
  def windowedInDegree(links: Dataset[Link], window: String = "10 minutes",
                       slide: String = "5 minutes",
                       watermark: String = "15 minutes"): DataFrame =
    links.toDF()
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("dst"))
      .agg(count(lit(1)).as("in_degree"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("dst"), col("in_degree"))

  /** Micro-batch → superstep trigger (incremental recompute, SURVEY.md
    * §2.10 extension): each micro-batch's edges append to the durable edge
    * table, then PageRank re-converges over the accumulated graph
    * WARM-STARTED from the previous converged ranks — a small edge delta
    * re-reaches tol in a handful of supersteps instead of a full cold run.
    * `onRanks(batchId, ranks, steps)` receives each converged state. */
  def pageRankTrigger(links: Dataset[Link], path: String, checkpoint: String,
                      numPartitions: Int = 8, tol: Double = 1e-6)
                     (onRanks: (Long, DataFrame, Int) => Unit): DataStreamWriter[_] = {
    val spark = links.sparkSession
    var warm: Option[DataFrame] = None
    links.toDF()
      .select(xxhash64(col("src")).as("src_id"), xxhash64(col("dst")).as("dst_id"))
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.dropDuplicates("src_id", "dst_id")
          .write.mode("append").parquet(path)
        val edges = spark.read.parquet(path)
          .select(col("src_id").as("src"), col("dst_id").as("dst"))
          .dropDuplicates("src", "dst")
        val res = graft.algo.PageRank.run(edges,
          graft.algo.PageRank.Params(tol = tol, numPartitions = numPartitions),
          None, warm)
        warm = Some(res.state.select(col("id"), col("rank"))
          .localCheckpoint(true))
        onRanks(batchId, res.state, res.steps)
      }
  }

  /** Append the deduplicated hashed-id edges of each micro-batch to a
    * parquet edge table — the streaming writer for the batch algorithms'
    * input. Dedup is per-batch (global dedup happens in the batch consumer
    * via dropDuplicates, keeping streaming state bounded). */
  def appendEdges(links: Dataset[Link], path: String,
                  checkpoint: String): DataStreamWriter[_] = {
    links.toDF()
      .select(xxhash64(col("src")).as("src_id"), xxhash64(col("dst")).as("dst_id"),
        col("src"), col("dst"))
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.dropDuplicates("src_id", "dst_id")
          .write.mode("append").parquet(path)
      }
  }
}

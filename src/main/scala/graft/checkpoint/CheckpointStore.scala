package graft.checkpoint

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-superstep metrics — the "per-partition lineage and metrics" the north
  * rule requires (repo:BASELINE.json north_rule). `partRows` records the row
  * count of every hash partition of the committed state, so a resumed run can
  * assert it reloaded exactly the partitioning it wrote. */
final case class StepMetrics(
    step: Int,
    measure: Double,
    rows: Long,
    seconds: Double,
    partRows: Seq[Long]
)

/** Durable superstep state for resumable iterative jobs.
  *
  * The reference's analog is graph.csv as the stable IR between pipeline
  * halves (/root/reference/code/run_extraction.py:253, SURVEY.md §3 E2). At
  * engine scale this is an Iceberg snapshot table per superstep; no Iceberg
  * runtime ships in this sandbox (SURVEY.md §4.2), so the bundled
  * implementation is Parquet + atomic per-step manifest behind the same
  * trait — swapping in Iceberg is a new impl, not an API change.
  */
trait CheckpointStore {
  /** Atomically commit superstep `step`'s state. Never partially visible. */
  def commit(step: Int, state: DataFrame, metrics: StepMetrics): Unit

  /** Highest committed superstep and its state, if any (the resume point). */
  def latest(spark: SparkSession): Option[(Int, DataFrame, StepMetrics)]

  /** All committed metrics, ascending by step. */
  def metricsLog(): Seq[StepMetrics]
}

/** Parquet + manifest store. Commit protocol (crash-safe on a local/posix fs):
  *  1. write state parquet to `<root>/<runId>/state_<step>/` (overwrite);
  *  2. write `<root>/<runId>/_tmp_step_<step>.json`, then ATOMIC_MOVE to
  *     `step_<step>.json` — the manifest is the commit point; a crash
  *     between (1) and (2) leaves an orphan data dir that is never read.
  * Resume = max committed `step_<k>.json`.
  */
final class ParquetStore(root: String, runId: String) extends CheckpointStore {
  private def dir: Path = Paths.get(root, runId)
  private def stateDir(step: Int): String = dir.resolve(s"state_$step").toString
  private def manifest(step: Int): Path = dir.resolve(s"step_$step.json")

  private def jsonOf(m: StepMetrics): String =
    s"""{"step":${m.step},"measure":${m.measure},"rows":${m.rows},""" +
      s""""seconds":${m.seconds},"partRows":[${m.partRows.mkString(",")}]}"""

  private def parse(s: String): StepMetrics = {
    def fld(k: String): String = {
      val i = s.indexOf("\"" + k + "\":") + k.length + 3
      val e = s.indexWhere(c => c == ',' || c == '}' || c == ']', i)
      s.substring(i, e)
    }
    val pr = {
      val i = s.indexOf("[") + 1; val e = s.indexOf("]")
      val body = s.substring(i, e).trim
      if (body.isEmpty) Seq.empty[Long] else body.split(",").toSeq.map(_.trim.toLong)
    }
    StepMetrics(fld("step").toInt, fld("measure").toDouble, fld("rows").toLong,
      fld("seconds").toDouble, pr)
  }

  override def commit(step: Int, state: DataFrame, metrics: StepMetrics): Unit = {
    Files.createDirectories(dir)
    state.write.mode("overwrite").parquet(stateDir(step))
    val tmp = dir.resolve(s"_tmp_step_$step.json")
    Files.writeString(tmp, jsonOf(metrics))
    Files.move(tmp, manifest(step), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def committedSteps(): Seq[Int] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val it = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("step_") && n.endsWith(".json") =>
          n.stripPrefix("step_").stripSuffix(".json").toInt }
        .toSeq.sorted
    } finally it.close()
  }

  override def latest(spark: SparkSession): Option[(Int, DataFrame, StepMetrics)] =
    committedSteps().lastOption.map { k =>
      val m = parse(Files.readString(manifest(k)))
      (k, spark.read.parquet(stateDir(k)), m)
    }

  override def metricsLog(): Seq[StepMetrics] =
    committedSteps().map(k => parse(Files.readString(manifest(k))))
}

object CheckpointStore {
  /** Per-partition row counts of a materialized state (one cheap job). */
  def partitionRows(state: DataFrame): Seq[Long] = {
    state.groupBy(spark_partition_id().as("p")).count()
      .orderBy("p").collect().map(_.getLong(1)).toSeq
  }
}

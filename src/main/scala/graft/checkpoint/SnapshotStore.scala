package graft.checkpoint

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One committed superstep snapshot (the Iceberg-shaped lineage record). */
final case class SnapshotInfo(
    step: Int,
    parentStep: Int, // -1 for the first snapshot of the run
    rows: Long,
    files: Int,
    bytes: Long
)

/** Iceberg-SHAPED checkpoint store: the snapshot/manifest/metadata layout of
  * an Iceberg table, in pure JVM code behind the same [[CheckpointStore]]
  * trait as [[ParquetStore]].
  *
  * The north rule wants superstep state checkpointed "to Iceberg with
  * per-partition lineage and metrics" (repo:BASELINE.json north_rule); no
  * Iceberg runtime ships in this sandbox (SURVEY.md §4.2), so this store
  * reproduces the three Iceberg mechanisms that make that resume story
  * work, with the same on-disk roles:
  *
  *  - `metadata/v<N>.metadata.json` — immutable table metadata carrying the
  *    FULL snapshot log: every committed snapshot with its
  *    `parent_snapshot_id` (superstep lineage), row count and convergence
  *    measure. New commits write v<N+1>, never mutate v<N>.
  *  - `metadata/snap-<step>.manifest.json` — one manifest per snapshot
  *    listing the exact data files (path + bytes) and the per-partition row
  *    counts of the committed state. Reads go THROUGH the manifest (explicit
  *    file list), never through directory listing — exactly how Iceberg
  *    decouples visible data from whatever orphans live in the directory.
  *  - `metadata/version-hint.text` — the single mutable pointer; an
  *    ATOMIC_MOVE onto it is the commit point. A crash anywhere before the
  *    hint swing leaves unreferenced data/manifest/metadata files that no
  *    reader ever sees (orphans, cleaned by [[expireSnapshots]]).
  *
  * Beyond the trait, the store exposes the Iceberg-ish table operations the
  * plain store cannot: [[snapshots]] (the lineage log), [[stateAt]] (time
  * travel to any retained superstep), and [[expireSnapshots]] (drop old
  * snapshots' data while keeping the current one live).
  *
  * Swapping in real Iceberg is a new impl of the same trait — the commit
  * protocol, lineage fields and read path are already shaped for it.
  */
final class SnapshotStore(root: String, runId: String) extends CheckpointStore {
  private def dir: Path = Paths.get(root, runId)
  private def metaDir: Path = dir.resolve("metadata")
  private def dataDir(step: Int): Path = dir.resolve("data").resolve(s"step_$step")
  private def manifestPath(step: Int): Path =
    metaDir.resolve(s"snap-$step.manifest.json")
  private def metadataPath(v: Int): Path = metaDir.resolve(s"v$v.metadata.json")
  private def hintPath: Path = metaDir.resolve("version-hint.text")

  // ---- tiny JSON codec for the store's OWN files (layout-controlled) -----
  // The writer below emits flat objects with string/number/array-of-number/
  // array-of-string fields only; the parser is tailored to exactly that.

  private def fld(s: String, k: String): String = {
    val i = s.indexOf("\"" + k + "\":")
    require(i >= 0, s"missing field $k")
    val start = i + k.length + 3
    val e = s.indexWhere(c => c == ',' || c == '}' || c == ']', start)
    s.substring(start, e).trim
  }

  private def longArr(s: String, k: String): Seq[Long] = {
    val i = s.indexOf("\"" + k + "\":[")
    require(i >= 0, s"missing array $k")
    val start = i + k.length + 4
    val e = s.indexOf("]", start)
    val body = s.substring(start, e).trim
    if (body.isEmpty) Seq.empty else body.split(",").toSeq.map(_.trim.toLong)
  }

  // escape-aware: the writer emits elements through Json.str, so a path
  // containing a comma/quote/backslash must tokenize on string literals
  // (not split on ',') and unescape — symmetric with the writer
  private def strArr(s: String, k: String): Seq[String] = {
    val i = s.indexOf("\"" + k + "\":[")
    require(i >= 0, s"missing array $k")
    var j = i + k.length + 4
    val out = Seq.newBuilder[String]
    var done = false
    while (!done) {
      require(j < s.length, s"unterminated array $k")
      s.charAt(j) match {
        case ']' => done = true
        case '"' =>
          var e = j + 1
          while (e < s.length && s.charAt(e) != '"') {
            if (s.charAt(e) == '\\') e += 1
            e += 1
          }
          require(e < s.length, s"unterminated string in array $k")
          out += graft.webgraph.CookieParse.unescapeJson(s.substring(j + 1, e))
          j = e + 1
        case _ => j += 1
      }
    }
    out.result()
  }

  private def atomicWrite(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve("_tmp_" + target.getFileName.toString)
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- metadata model -----------------------------------------------------

  private final case class Snap(step: Int, parent: Int, rows: Long,
                                measure: Double, seconds: Double)

  private def snapJson(s: Snap): String =
    s"""{"snapshot_id":${s.step},"parent_snapshot_id":${s.parent},""" +
      s""""manifest":"snap-${s.step}.manifest.json","rows":${s.rows},""" +
      s""""measure":${s.measure},"seconds":${s.seconds}}"""

  private def metadataJson(current: Int, snaps: Seq[Snap]): String =
    s"""{"format_version":1,"run_id":${graft.core.Json.str(runId)},""" +
      s""""current_snapshot_id":$current,""" +
      s""""snapshots":[${snaps.map(snapJson).mkString(",")}]}"""

  private def parseSnaps(meta: String): Seq[Snap] = {
    val i = meta.indexOf("\"snapshots\":[")
    val body = meta.substring(i + 13, meta.lastIndexOf("]"))
    if (body.trim.isEmpty) Seq.empty
    else body.split("\\},\\{").toSeq.map { frag =>
      val o = (if (frag.startsWith("{")) frag else "{" + frag) +
        (if (frag.endsWith("}")) "" else "}")
      Snap(fld(o, "snapshot_id").toInt, fld(o, "parent_snapshot_id").toInt,
        fld(o, "rows").toLong, fld(o, "measure").toDouble,
        fld(o, "seconds").toDouble)
    }
  }

  private def currentVersion(): Option[Int] =
    if (Files.exists(hintPath)) Some(Files.readString(hintPath).trim.toInt)
    else None

  private def readMetadata(): Option[(Int, Seq[Snap])] =
    currentVersion().map { v =>
      val meta = Files.readString(metadataPath(v))
      (fld(meta, "current_snapshot_id").toInt, parseSnaps(meta))
    }

  private def manifestFiles(step: Int): Seq[String] =
    strArr(Files.readString(manifestPath(step)), "files")

  // ---- CheckpointStore ----------------------------------------------------

  /** Commit protocol (crash-safe on a posix fs; commit point = hint move):
    *  1. state parquet → `data/step_<k>/` (overwrite; invisible until 4);
    *  2. manifest with the EXPLICIT file list + per-partition rows;
    *  3. `v<N+1>.metadata.json` = old snapshot log + this snapshot (parent =
    *     previous current snapshot id);
    *  4. ATOMIC_MOVE a new `version-hint.text` pointing at N+1.
    */
  override def commit(step: Int, state: DataFrame, metrics: StepMetrics): Unit = {
    val dd = dataDir(step)
    state.write.mode("overwrite").parquet(dd.toString)

    val listing = Files.list(dd) // close the stream: one leaked fd per
    val parts = try {            // commit exhausts the ulimit on long soaks
      listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.getFileName.toString)
    } finally listing.close()
    val manifest =
      s"""{"snapshot_id":$step,"rows":${metrics.rows},""" +
        s""""part_rows":[${metrics.partRows.mkString(",")}],""" +
        s""""files":[${parts.map(p => graft.core.Json.str(p.toString)).mkString(",")}],""" +
        s""""file_bytes":[${parts.map(Files.size).mkString(",")}]}"""
    atomicWrite(manifestPath(step), manifest)

    val (v, current, snaps) = readMetadata() match {
      case Some((cur, ss)) => (currentVersion().get, cur, ss)
      case None            => (0, -1, Seq.empty[Snap])
    }
    // re-commit of the same step (retry) replaces its log entry in place —
    // it keeps the original parent; a fresh step's parent is the snapshot
    // that was current when it committed (the superstep lineage edge)
    val kept = snaps.filterNot(_.step == step)
    val parent =
      if (current == step) snaps.find(_.step == step).map(_.parent).getOrElse(-1)
      else current
    val next = kept :+ Snap(step, parent, metrics.rows, metrics.measure,
      metrics.seconds)
    atomicWrite(metadataPath(v + 1), metadataJson(step, next.sortBy(_.step)))
    atomicWrite(hintPath, (v + 1).toString)
  }

  override def latest(spark: SparkSession): Option[(Int, DataFrame, StepMetrics)] =
    readMetadata().flatMap { case (current, snaps) =>
      snaps.find(_.step == current).map { s =>
        (s.step, readSnap(spark, s.step), metricsOf(s))
      }
    }

  override def metricsLog(): Seq[StepMetrics] =
    readMetadata().toSeq.flatMap(_._2.sortBy(_.step).map(metricsOf))

  private def metricsOf(s: Snap): StepMetrics =
    StepMetrics(s.step, s.measure, s.rows, s.seconds,
      longArr(Files.readString(manifestPath(s.step)), "part_rows"))

  /** Manifest-driven read: exactly the files the snapshot committed — a
    * crashed attempt's orphan files in the same directory are invisible. */
  private def readSnap(spark: SparkSession, step: Int): DataFrame = {
    val files = manifestFiles(step)
    require(files.nonEmpty, s"snapshot $step committed an empty file list")
    spark.read.parquet(files: _*)
  }

  // ---- Iceberg-ish table ops ---------------------------------------------

  /** The snapshot log, ascending by step — superstep lineage with sizes. */
  def snapshots(): Seq[SnapshotInfo] =
    readMetadata().toSeq.flatMap(_._2.sortBy(_.step).map { s =>
      val m = Files.readString(manifestPath(s.step))
      SnapshotInfo(s.step, s.parent, s.rows, strArr(m, "files").size,
        longArr(m, "file_bytes").sum)
    })

  /** Time travel: the committed state of superstep `step`, if retained. */
  def stateAt(spark: SparkSession, step: Int): Option[DataFrame] =
    readMetadata().flatMap { case (_, snaps) =>
      snaps.find(_.step == step).map(s => readSnap(spark, s.step))
    }

  /** Drop all but the newest `keepLast` snapshots: writes v<N+1> metadata
    * with the trimmed log, swings the hint, THEN deletes the dropped
    * snapshots' manifests and data directories (delete-after-commit — a
    * crash mid-expire leaves only unreferenced files). The current snapshot
    * is always retained. Returns the dropped steps. */
  def expireSnapshots(keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    readMetadata() match {
      case None => Seq.empty
      case Some((current, snaps)) =>
        val ordered = snaps.sortBy(_.step)
        val keep = ordered.takeRight(keepLast).map(_.step).toSet + current
        val dropped = ordered.filterNot(s => keep(s.step))
        if (dropped.isEmpty) return Seq.empty
        val kept = ordered.filter(s => keep(s.step))
        val v = currentVersion().get
        atomicWrite(metadataPath(v + 1), metadataJson(current, kept))
        atomicWrite(hintPath, (v + 1).toString)
        dropped.foreach { s =>
          Files.deleteIfExists(manifestPath(s.step))
          val dd = dataDir(s.step)
          if (Files.isDirectory(dd)) {
            val walk = Files.walk(dd)
            try walk.iterator().asScala.toSeq.reverse
              .foreach(Files.deleteIfExists(_))
            finally walk.close()
          }
        }
        dropped.map(_.step)
    }
  }
}

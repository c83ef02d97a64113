package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** graph.csv interchange with the reference (SURVEY.md §2.1 S5): the
  * reference re-ingests its stage-1 graph CSV for stage-2 feature
  * extraction (/root/reference/code/run_extraction.py:253) with the
  * 23-column schema of features.yaml:21-44. The engine's durable IR is
  * parquet (graft.checkpoint) — this reader/writer exists for parity
  * interchange with reference-produced files. Schema is EXPLICIT, never
  * inferSchema (a full inference pass over a corpus-scale CSV is a wasted
  * scan, and type drift breaks the sentinel semantics). */
object GraphCsv {

  /** The reference's graph_columns, loosely typed as the CSV is: visit_id
    * numeric, everything else string (sentinels "N/A"/"CS"/"" preserved). */
  val schema: StructType = StructType(
    StructField("visit_id", LongType) +:
      Seq("name", "top_level_url", "type", "attr", "domain", "document_url",
        "setter", "setting_time_stamp", "top_level_domain", "setter_domain",
        "graph_attr", "party", "src", "dst", "action", "time_stamp",
        "reqattr", "respattr", "response_status", "content_hash",
        "post_body", "post_body_raw")
        .map(StructField(_, StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true").option("escape", "\"").csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").option("escape", "\"")
      .mode("overwrite").csv(path)

  /** The 23-column union view the reference writes (nodes + edges with the
    * graph_attr discriminator, graph_builder.py); engine columns absent
    * from the schema are padded null. */
  def unified(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val cols = schema.fieldNames
    def pad(df: DataFrame) = cols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast("string")))
    pad(nodes).select(cols.map(col): _*)
      .unionByName(pad(edges).select(cols.map(col): _*))
  }

  /** Inverse of [[unified]] for re-ingestion (run_extraction.py:253): split
    * on graph_attr and project back to the caller's column sets. */
  def split(df: DataFrame, nodeCols: Seq[String],
            edgeCols: Seq[String]): (DataFrame, DataFrame) = (
    df.where(col("graph_attr") === "Node").select(nodeCols.map(col): _*),
    df.where(col("graph_attr") === "Edge").select(edgeCols.map(col): _*))
}

package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-surrogate builder for the round-4 registry soak (VERDICT r3
  * next-round #4). The driver ships sf0.001/0.01/0.1 only; this tool
  * up-scales the VOLUME tables 10× into an sf1-shaped directory the
  * registry can point at:
  *
  *  - `events`, `lineitem`, `orders`: unioned shifted copies — primary
  *    keys offset per copy (uniqueness + join integrity WITHIN a copy:
  *    lineitem.l_orderkey and orders.o_orderkey shift together), foreign
  *    keys into dimensions (o_custkey, l_partkey, l_suppkey) unchanged so
  *    dimension joins stay valid;
  *  - dimensions and the text/ANN tables (`documents`, `embeddings`)
  *    copied as-is: duplicating documents would manufacture quadratic
  *    near-dup pair blowups (every clone pairs with every clone) that no
  *    real sf1 corpus has — the dedup/ANN scale paths are plan-audited
  *    separately, while THIS soak targets the events-driven construction
  *    and feature families, which scale linearly in events.
  *
  * Deterministic (pure column arithmetic on driver-fixed inputs).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def w(df: org.apache.spark.sql.DataFrame, n: String) =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$n.parquet")

    def replicate(name: String, keyShifts: Map[String, Long]) = {
      val base = t(name)
      val copies = (0 until factor).map { c =>
        keyShifts.foldLeft(base) { case (df, (k, unit)) =>
          df.withColumn(k, col(k) + lit(c * unit))
        }
      }
      w(copies.reduce(_ unionByName _).repartition(32), name)
    }

    replicate("events", Map("event_id" -> 100000000L))
    replicate("lineitem", Map("l_orderkey" -> 100000000L))
    replicate("orders", Map("o_orderkey" -> 100000000L))
    Seq("region", "nation", "customer", "supplier", "part",
      "documents", "embeddings").foreach(n => w(t(n), n))
    println(s"scaled tables -> $out (factor $factor)")
    spark.stop()
  }
}

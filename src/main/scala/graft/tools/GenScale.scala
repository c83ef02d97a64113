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
  *  - `documents`: shifted copies with a PER-COPY TOKEN NAMESPACE (every
  *    whitespace token of copy c > 0 gets a `_c<c>` suffix). Plain cloning
  *    would manufacture quadratic cross-copy near-dup pairs (every clone
  *    pairs with every clone — no real sf1 corpus looks like that); the
  *    disjoint vocabularies keep each copy's internal dup/near-dup
  *    structure intact while cross-copy Jaccard/SimHash/MinHash similarity
  *    collapses to ~0, so the dedup families scale the way a real 10×
  *    corpus does (10× groups, not 100× pairs);
  *  - `embeddings`: shifted copies with a deterministic per-copy vector
  *    nudge (component i += c·0.37·sin-free hash mix), preserving
  *    intra-copy neighborhoods without making clones exact ANN neighbors;
  *  - remaining dimensions copied as-is.
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

    // documents: per-copy token namespace (see scaladoc). Copy 0 is the
    // original bytes; copies 1..f-1 suffix every token, so shingle/token
    // sets are disjoint ACROSS copies and identical in structure WITHIN.
    val docs = t("documents")
    val docCopies = (0 until factor).map { c =>
      if (c == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(c * 100000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"$$1_c$c"))
        .withColumn("n_chars", length(col("text")))
    }
    w(docCopies.reduce(_ unionByName _).repartition(32), "documents")

    // embeddings: shifted ids + per-copy deterministic component nudge
    // (keeps copy-internal geometry; breaks exact cross-copy identity)
    val emb = t("embeddings")
    val embCopies = (0 until factor).map { c =>
      if (c == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(c * 100000000L))
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => (x + lit(c * 0.37f) *
            pmod(col("vec_id") * 31L + i.cast("long") * 7L, lit(97L))
              .cast("float") / lit(97.0f)).cast("float")))
    }
    w(embCopies.reduce(_ unionByName _).repartition(32), "embeddings")

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => w(t(n), n))
    println(s"scaled tables -> $out (factor $factor)")
    spark.stop()
  }
}

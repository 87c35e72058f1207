package graft

import org.scalatest.funsuite.AnyFunSuite

class HostPhaseSpec extends AnyFunSuite {
  import HostPhase._

  test("stealShare is steal over demanded (busy+steal) ticks") {
    val a = Some(Snap(busy = 1000, steal = 100))
    val b = Some(Snap(busy = 1300, steal = 200))
    // demand = 300 busy + 100 steal; stolen share = 100/400
    assert(stealShare(a, b) === 0.25)
  }

  test("stealShare is -1 when a snapshot is missing or no ticks elapsed") {
    val s = Some(Snap(1000, 100))
    assert(stealShare(None, s) === -1.0)
    assert(stealShare(s, None) === -1.0)
    assert(stealShare(s, s) === -1.0) // zero demand delta
  }

  test("snap() reads the live /proc/stat on this host") {
    // Linux sandbox: the parse must produce monotone non-negative counters
    val s = snap()
    assert(s.isDefined)
    assert(s.get.busy > 0 && s.get.steal >= 0)
    val t = snap()
    assert(t.get.busy >= s.get.busy && t.get.steal >= s.get.steal)
  }

  test("measured() attributes a share in [0,1] to real work") {
    val (r, share) = measured {
      var x = 0L; var i = 0
      while (i < 20000000) { x += i; i += 1 }; x
    }
    assert(r != 0)
    assert(share == -1.0 || (share >= 0.0 && share <= 1.0))
  }
}

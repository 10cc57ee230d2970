package graft.sim

import org.scalatest.funsuite.AnyFunSuite

class AnnGeometrySpec extends AnyFunSuite {

  test("nprobe covers the candidate floor under the worst-case histogram") {
    // balanced: 8 cells x 100 — 250 candidates need 3 cells
    assert(AnnGeometry.nprobe(Seq.fill(8)(100L), 250, floor = 1) === 3)
    // skewed: the smallest cells are near-empty, so the pessimistic pool
    // needs far more cells than the balanced estimate
    val skewed = Seq(10L, 10L, 10L, 10L, 10L, 10L, 10L, 730L)
    assert(AnnGeometry.nprobe(skewed, 250, floor = 1) === 8)
  }

  test("nprobe clamps to the recall-swept floor and to the cell count") {
    assert(AnnGeometry.nprobe(Seq.fill(8)(1000L), 10, floor = 7) === 7)
    // floor above the cell count: capped at k cells (probe everything)
    assert(AnnGeometry.nprobe(Seq.fill(4)(10L), 1000, floor = 7) === 4)
  }

  test("shortlist grows with corpus size, never below the floor") {
    assert(AnnGeometry.shortlist(100L, 10, floor = 128) === 128)
    val big = AnnGeometry.shortlist(1_000_000L, 10, floor = 128)
    assert(big === 10000) // ceil(1 * 10 * sqrt(1e6))
    assert(AnnGeometry.shortlist(4_000_000L, 10, floor = 128) > big)
  }

  test("minCandidates covers both the oversampled k and the shortlist") {
    assert(AnnGeometry.minCandidates(10, 128) === 128L)
    assert(AnnGeometry.minCandidates(100, 128) === 400L)
  }
}

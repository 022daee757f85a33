package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Bench.pickQuietBaseline]] — the standing-baseline selection the
  * ratio-retime pass keys on. Pure name/mtime logic, no Spark. */
class BenchSpec extends AnyFunSuite {

  test("newest round wins across digit widths and case") {
    // digit width: string max would pick r99 over r100
    assert(Bench.pickQuietBaseline(Seq(
      ("BENCH_QUIET_r99.json", 1L), ("BENCH_QUIET_r100.json", 0L)))
      .contains("BENCH_QUIET_r100.json"))
    // case: string max would pick r16 over R17 (uppercase < lowercase)
    assert(Bench.pickQuietBaseline(Seq(
      ("BENCH_QUIET_r16.json", 9L), ("BENCH_QUIET_R17.json", 0L)))
      .contains("BENCH_QUIET_R17.json"))
    // the plain case still works
    assert(Bench.pickQuietBaseline(Seq(
      ("BENCH_QUIET_r16.json", 0L), ("BENCH_QUIET_r17.json", 0L)))
      .contains("BENCH_QUIET_r17.json"))
  }

  test("round-less names fall back to mtime and never beat a rounded one") {
    assert(Bench.pickQuietBaseline(Seq(
      ("BENCH_QUIET_old.json", 5L), ("BENCH_QUIET_new.json", 9L)))
      .contains("BENCH_QUIET_new.json"))
    assert(Bench.pickQuietBaseline(Seq(
      ("BENCH_QUIET_zzz.json", 999L), ("BENCH_QUIET_r2.json", 0L)))
      .contains("BENCH_QUIET_r2.json"))
  }

  test("non-quiet files are never candidates; empty listing yields None") {
    assert(Bench.pickQuietBaseline(Seq(
      ("BENCH_r17.json", 9L), ("BENCH_QUIET_r1.json.bak", 9L),
      ("AB_DRIFT_R17.json", 9L))).isEmpty)
    assert(Bench.pickQuietBaseline(Nil).isEmpty)
  }
}

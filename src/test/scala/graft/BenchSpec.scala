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

  test("same-sf records are preferred over a newer other-scale capture") {
    val sfs = Map(
      "BENCH_QUIET_r17.json" -> "/root/testdata/sf0.1",
      "BENCH_QUIET_sf3_r18.json" -> "/root/repo/target/scale/sf3")
    val files = Seq(("BENCH_QUIET_r17.json", 0L),
      ("BENCH_QUIET_sf3_r18.json", 9L))
    // the sf0.1 board must NOT pick the newer sf3 record — the
    // downstream sf guard would empty the quiet map and silently
    // disable the ratio pass despite a same-sf baseline sitting on disk
    assert(Bench.pickQuietBaseline(files, sfs.get,
      Some("/root/testdata/sf0.1")).contains("BENCH_QUIET_r17.json"))
    // and an sf3 board picks its own record
    assert(Bench.pickQuietBaseline(files, sfs.get,
      Some("/root/repo/target/scale/sf3"))
      .contains("BENCH_QUIET_sf3_r18.json"))
    // no sf match anywhere (older records, unreadable files): fall back
    // to the full candidate pool rather than dropping the baseline
    assert(Bench.pickQuietBaseline(files, _ => None, Some("/elsewhere"))
      .contains("BENCH_QUIET_sf3_r18.json"))
  }

  test("slowest-pass retime skips quiet-confirmed first looks only") {
    // confirmed by the standing record (ratio <= 1.3): skip the retime
    assert(!Bench.slowRetimeNeeded(1.0, Some(1.0)))
    assert(!Bench.slowRetimeNeeded(1.3, Some(1.0)))
    // above the ratio: the first look disagrees with the record — retime
    assert(Bench.slowRetimeNeeded(1.4, Some(1.0)))
    // no baseline: the backstop must not narrow without adjudication data
    assert(Bench.slowRetimeNeeded(5.0, None))
    // sub-20 ms base: ratios are noise, keep the unconditional retime
    assert(Bench.slowRetimeNeeded(5.0, Some(0.01)))
  }

  test("pass-2 retime needs ratio > 2 AND a non-epsilon absolute excess") {
    // the r18 epsilon retimes: big ratio, tiny delta — skipped now
    assert(!Bench.quietRetimeNeeded(0.26, 0.117))
    assert(!Bench.quietRetimeNeeded(0.35, 0.129))
    // real excess over quiet: still adjudicated
    assert(Bench.quietRetimeNeeded(1.33, 0.595))
    assert(Bench.quietRetimeNeeded(1.55, 0.51))
    // ratio at-or-under 2 never triggers, whatever the delta
    assert(!Bench.quietRetimeNeeded(7.0, 3.6))
    // sub-20 ms base: pass-2 ratios are pure noise there
    assert(!Bench.quietRetimeNeeded(5.0, 0.01))
  }

  test("non-quiet files are never candidates; empty listing yields None") {
    assert(Bench.pickQuietBaseline(Seq(
      ("BENCH_r17.json", 9L), ("BENCH_QUIET_r1.json.bak", 9L),
      ("AB_DRIFT_R17.json", 9L))).isEmpty)
    assert(Bench.pickQuietBaseline(Nil).isEmpty)
  }
}

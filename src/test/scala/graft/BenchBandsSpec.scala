package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-adjudication rule the driver's bench JSON is built
  * on (BASELINE §O.6 as encoded in [[BenchBands.allowed]]): the 2×
  * band scaled by the robust suite-median box axis, the d01 floor
  * term scoped to sub-second references, and the floor witness's own
  * band never including its tautological floor. Pure-function spec —
  * a silent change here would quietly loosen or tighten every
  * per-query verdict the judge reads.
  */
class BenchBandsSpec extends AnyFunSuite {

  test("unknown queries have no band (pass vacuously, listed as new)") {
    assert(BenchBands.allowed("nonexistent_query", 1.0, 0.3).isEmpty)
  }

  test("quiet box, big query: exactly 2x its reference, no floor term") {
    // d09's ref is > SmallRefSec, so even an absurd d01 reading can't
    // loosen it
    val ref = BenchBands.refs("d09_threshold_curve")
    assert(ref >= BenchBands.SmallRefSec)
    val a = BenchBands.allowed("d09_threshold_curve",
      boxScale = 1.0, d01Now = 100.0).get
    assert(math.abs(a - BenchBands.BandFactor * ref) < 1e-12)
  }

  test("small query: the in-run d01 floor joins the max") {
    val name = "r02_semantic_knn" // smallest reference in the table
    val ref = BenchBands.refs(name)
    assert(ref < BenchBands.SmallRefSec)
    val d01 = 0.4
    val a = BenchBands.allowed(name, 1.0, d01).get
    assert(math.abs(a -
      math.max(BenchBands.BandFactor * ref, BenchBands.FloorMult * d01))
      < 1e-12)
    // with the floor binding, the verdict tracks d01, not the ref
    assert(a == BenchBands.FloorMult * d01)
  }

  test("the floor witness never gets its own tautological floor term") {
    val ref = BenchBands.refs(BenchBands.FloorWitness)
    assert(ref < BenchBands.SmallRefSec) // it IS a small query...
    val a = BenchBands.allowed(BenchBands.FloorWitness,
      boxScale = 1.0, d01Now = 10.0).get
    // ...yet a huge d01 reading cannot excuse it: band stays 2x ref
    assert(math.abs(a - BenchBands.BandFactor * ref) < 1e-12)
  }

  test("boxScale scales the band and never drops below 1") {
    val ref = BenchBands.refs("d09_threshold_curve")
    val hot = BenchBands.allowed("d09_threshold_curve", 1.5, 0.3).get
    assert(math.abs(hot - BenchBands.BandFactor * ref * 1.5) < 1e-12)
    // a QUIETER box than the recording never tightens below 2x ref
    val cold = BenchBands.allowed("d09_threshold_curve", 0.5, 0.3).get
    assert(math.abs(cold - BenchBands.BandFactor * ref) < 1e-12)
  }

  test("robustScale: a throttled-sentinel box with queries at refs keeps bands binding") {
    // the R.6 anomaly in synthetic form: every query reads exactly its
    // quiet ref (the sentinel would read 4.9x — it no longer matters)
    val atRefs = BenchBands.refs.map { case (n, r) => n -> r }
    val scale = BenchBands.robustScale(atRefs)
    assert(scale == 1.0, s"throttled box must not loosen bands, got $scale")
    // and a genuine 3x regression on one query now FAILS its band
    val name = "d08_delta_dedup"
    val bad = BenchBands.refs(name) * 3.0
    val a = BenchBands.allowed(name, scale, d01Now = 0.19).get
    assert(bad > a, "a 3x regression must exceed the quiet-box band")
  }

  test("robustScale: a uniformly hot box still loosens bands; outliers cannot") {
    // uniformly 2x-taxed box: median ratio 2 -> bands scale by 2
    val hot = BenchBands.refs.map { case (n, r) => n -> r * 2.0 }
    assert(math.abs(BenchBands.robustScale(hot) - 2.0) < 1e-9)
    // a handful of 10x outliers on an otherwise-quiet box move nothing:
    // the outliers are the regressions under adjudication, not the box
    val outliers = BenchBands.refs.keys.take(5).toSet
    val mixed = BenchBands.refs.map { case (n, r) =>
      n -> (if (outliers(n)) r * 10.0 else r)
    }
    assert(BenchBands.robustScale(mixed) == 1.0)
    // failed runs (-1) and unknown queries are excluded, not counted
    val withJunk = mixed + ("zzz_not_a_query" -> 99.0) +
      (BenchBands.refs.keys.head -> -1.0)
    assert(BenchBands.robustScale(withJunk) == 1.0)
  }

  test("robustScale on the round-18 driver shape adjudicates d08 as the failure it was") {
    // driver r18: shared suite ran ~1.2-1.4x refs, d08 at 7.4x. The
    // old sentinel axis allowed 2x*1.86 = 3.7x+; the robust axis reads
    // the suite median (~1.3) and d08's 7.4x fails its 2x*1.3 band.
    val mins = BenchBands.refs.map { case (n, r) =>
      n -> (if (n == "d08_delta_dedup") r * 7.4 else r * 1.3)
    }
    val scale = BenchBands.robustScale(mins)
    assert(math.abs(scale - 1.3) < 1e-9)
    val a = BenchBands.allowed("d08_delta_dedup", scale,
      d01Now = mins("d01_exact_dedup")).get
    assert(mins("d08_delta_dedup") > a,
      "the r18 d08 reading must fail under the robust axis")
  }

  test("every reference is positive and every registered ref names a query") {
    BenchBands.refs.foreach { case (name, ref) =>
      assert(ref > 0, s"$name has a non-positive reference")
      assert(SparkEntry.queries.contains(name),
        s"band reference for unregistered query $name")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-adjudication rule the driver's bench JSON is built
  * on (BASELINE §O.6 as encoded in [[BenchBands.allowed]]): the 2×
  * band scaled by the worse box axis, the d01 floor term scoped to
  * sub-second references, and the floor witness's own band never
  * including its tautological floor. Pure-function spec — a silent
  * change here would quietly loosen or tighten every per-query
  * verdict the judge reads.
  */
class BenchBandsSpec extends AnyFunSuite {

  private val quiet =
    (BenchBands.RefContention, BenchBands.RefFloor)

  test("unknown queries have no band (pass vacuously, listed as new)") {
    assert(BenchBands.allowed("nonexistent_query",
      quiet._1, quiet._2, 0.3).isEmpty)
  }

  test("quiet box, big query: exactly 2x its reference, no floor term") {
    // d09's ref is > SmallRefSec, so even an absurd d01 reading can't
    // loosen it
    val ref = BenchBands.refs("d09_threshold_curve")
    assert(ref >= BenchBands.SmallRefSec)
    val a = BenchBands.allowed("d09_threshold_curve",
      quiet._1, quiet._2, d01Now = 100.0).get
    assert(math.abs(a - BenchBands.BandFactor * ref) < 1e-12)
  }

  test("small query: the in-run d01 floor joins the max") {
    val name = "r02_semantic_knn" // smallest reference in the table
    val ref = BenchBands.refs(name)
    assert(ref < BenchBands.SmallRefSec)
    val d01 = 0.4
    val a = BenchBands.allowed(name, quiet._1, quiet._2, d01).get
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
      quiet._1, quiet._2, d01Now = 10.0).get
    // ...yet a huge d01 reading cannot excuse it: band stays 2x ref
    assert(math.abs(a - BenchBands.BandFactor * ref) < 1e-12)
  }

  test("boxScale takes the WORSE axis and never drops below 1") {
    val ref = BenchBands.refs("d09_threshold_curve")
    // hotter contention dominates
    val hotC = BenchBands.allowed("d09_threshold_curve",
      BenchBands.RefContention * 1.5, BenchBands.RefFloor, 0.3).get
    assert(math.abs(hotC - BenchBands.BandFactor * ref * 1.5) < 1e-12)
    // hotter floor dominates
    val hotF = BenchBands.allowed("d09_threshold_curve",
      BenchBands.RefContention, BenchBands.RefFloor * 2.0, 0.3).get
    assert(math.abs(hotF - BenchBands.BandFactor * ref * 2.0) < 1e-12)
    // a QUIETER box than the recording never tightens below 2x ref
    val cold = BenchBands.allowed("d09_threshold_curve",
      BenchBands.RefContention * 0.5, BenchBands.RefFloor * 0.5, 0.3).get
    assert(math.abs(cold - BenchBands.BandFactor * ref) < 1e-12)
  }

  test("every reference is positive and every registered ref names a query") {
    BenchBands.refs.foreach { case (name, ref) =>
      assert(ref > 0, s"$name has a non-positive reference")
      assert(SparkEntry.queries.contains(name),
        s"band reference for unregistered query $name")
    }
  }
}

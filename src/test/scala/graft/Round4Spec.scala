package graft.operators // round4/cosineLocal are private[operators]

/** The guarded fast-path round4 (r17) must be BIT-identical to the
  * BigDecimal.valueOf → HALF_UP reference it replaces — the graph family's
  * scores, byte-identity receipts, and the DuckDB-matched ranking algebra
  * all sit on this equality. Exercises random doubles in the cosine range,
  * exact half-integer boundaries (the fallback band), negatives (HALF_UP
  * rounds away from zero), and values driven from float arithmetic like
  * the real call sites.
  */
class Round4Spec extends graft.SparkSpecBase {

  private def reference(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** BIT-level equality — `==` treats -0.0 == 0.0, but parquet bytes and
    * hash gates do not (the review finding that added the signed-zero
    * normalization to the fast path).
    */
  private def bitEqual(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)

  test("round4 equals the BigDecimal reference on random cosine-range doubles") {
    val rnd = new scala.util.Random(41)
    var i = 0
    while (i < 200000) {
      val x = rnd.nextDouble() * 2.0 - 1.0
      assert(bitEqual(AnnGraph.round4(x), reference(x)), s"x=$x")
      i += 1
    }
  }

  test("round4 equals the reference on boundary and edge values") {
    val cases = Seq(
      0.0, -0.0, 1.0, -1.0, 0.5, -0.5,
      0.00005, -0.00005, 0.00015, -0.00015, // exact .5 boundaries at 4 dp
      0.99995, -0.99995, 0.123450, 0.1234499999999, 0.1234500000001,
      -0.123450, 0.99994999999999, 0.9999500000001,
      1e-10, -1e-10, 0.0001, -0.0001, 0.12344999999999999,
      -0.00003, -0.00004999, // tiny negatives: must round to +0.0, not -0.0
      // outside the cosine range but inside double sanity
      12345.678949999, -9876.54325, 1e13, -1e13)
    for (x <- cases)
      assert(bitEqual(AnnGraph.round4(x), reference(x)), s"x=$x")
  }

  test("round4 equals the reference at large magnitudes hugging .5 boundaries") {
    // the r17 advisor's counterexample class: |t| large enough that
    // ulp(t) > 1e-9, with t engineered to sit just off a half-integer
    // boundary — the old fixed-1e-9 band took the fast path here and
    // disagreed with the reference (round4(5207.90695) → 5207.9069 vs
    // 5207.907). Randomized boundary hunt over magnitudes 1e3..1e8.
    assert(bitEqual(AnnGraph.round4(5207.90695), reference(5207.90695)))
    val rnd = new scala.util.Random(47)
    var i = 0
    while (i < 200000) {
      val mag = math.pow(10.0, 3 + rnd.nextDouble() * 5) // 1e3..1e8
      val intPart = math.floor(mag * 1e4)
      val eps = (rnd.nextInt(9) - 4) * Math.ulp(intPart) // within ±4 ulp of the boundary
      val t = intPart + 0.5 + eps
      val x = (if (rnd.nextBoolean()) t else -t) / 1e4
      assert(bitEqual(AnnGraph.round4(x), reference(x)), s"x=$x")
      i += 1
    }
  }

  test("round4 equals the reference on float-derived sims (the call sites' shape)") {
    val rnd = new scala.util.Random(43)
    var i = 0
    while (i < 50000) {
      // emulate cosineLocal outputs: ratios of float-widened accumulations
      val a = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      val x = AnnGraph.cosineLocal(a, b)
      assert(bitEqual(AnnGraph.round4(x), reference(x)), s"x=$x")
      i += 1
    }
  }
}

package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** LnFp (deterministic integer fixed-point ln) vs the float ln it replaces:
  * the integer algorithm OWNS the contract (engines agree bit-for-bit by
  * construction — no libm), so these tests pin (1) accuracy against true ln
  * — the definition must still BE a log for the importance weights to mean
  * anything — and (2) the domain guards.
  */
class LnFpSpec extends AnyFunSuite {

  test("lnMicro within 1 micro-nat of float ln across random rationals") {
    val rnd = new Random(11)
    var worst = 0L
    for (_ <- 1 to 20000) {
      val p = 1L + (rnd.nextLong() & ((1L << 33) - 1))
      val q = 1L + (rnd.nextLong() & ((1L << 33) - 1))
      val err = math.abs(LnFp.lnMicro(p, q) - math.round(math.log(p.toDouble / q) * 1e6))
      if (err > worst) worst = err
      assert(err <= 1, s"lnMicro($p, $q) off by $err micro-nats")
    }
    info(s"worst deviation: $worst micro-nats over 20k ratios")
  }

  test("lnMicro exact identities: ln(1)=0, antisymmetry, powers of two") {
    assert(LnFp.lnMicro(1, 1) == 0L)
    assert(LnFp.lnMicro(7, 3) == -LnFp.lnMicro(3, 7))
    for (k <- 1 to 40)
      assert(math.abs(LnFp.lnMicro(1L << k, 1) -
        math.round(k * math.log(2) * 1e6)) <= 1, s"ln(2^$k)")
  }

  test("gumbelMicro tracks the float Gumbel away from the extreme tail") {
    val rnd = new Random(13)
    val hs = Seq(0L, 1L, 2L, (1L << 31), (1L << 32) - 1000) ++
      Seq.fill(20000)(rnd.nextLong() & 0xFFFFFFFFL)
    for (h <- hs) {
      val u = (2.0 * h + 1.0) / math.pow(2, 33)
      val float = -math.log(-math.log(u)) * 1e6
      val got = LnFp.gumbelMicro(h)
      // the inner -ln u is carried in Q40: its ~unit-level quantization
      // turns into an outer-ln deviation of ~1e6 * units / v_q40 micro-nats
      // with v_q40 ~ 256 * (2^32 - h) — i.e. ~1/d growth toward the u -> 1
      // tail (documented in LnFp; at d=1 the deviation is ~0.05 nats).
      // Away from the tail agreement is ~1 micro-nat.
      val d = (1L << 32) - h
      val tol = 2.0 + 1e6 * 20.0 / (256.0 * d)
      assert(math.abs(got - float) <= tol,
        s"gumbelMicro($h) = $got vs float $float (tol $tol)")
    }
  }

  test("gumbelMicro is total and finite on the full 32-bit domain edges") {
    // the extreme tail: inner -ln u = 1.16e-10 nats must stay positive in
    // Q40 (>= 1) — an off-by-one here would be ln(<=0)
    for (h <- Seq((1L << 32) - 1, (1L << 32) - 2, (1L << 32) - 3, 0L, 1L)) {
      val g = LnFp.gumbelMicro(h)
      assert(g > -4000000 && g < 24000000, s"gumbelMicro($h) = $g out of range")
    }
    // monotone over the tail sample: larger h (larger u) => larger Gumbel
    val tail = (0 until 64).map(i => (1L << 32) - 1 - i * 1000)
    val vals = tail.map(LnFp.gumbelMicro)
    assert(vals == vals.sorted.reverse, "tail not monotone in h")
  }

  test("domain guards fail loud") {
    intercept[IllegalArgumentException](LnFp.lnMicro(0, 5))
    intercept[IllegalArgumentException](LnFp.lnMicro(5, 0))
    intercept[IllegalArgumentException](LnFp.gumbelMicro(-1))
    intercept[IllegalArgumentException](LnFp.gumbelMicro(1L << 32))
  }
}

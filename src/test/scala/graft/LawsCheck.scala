package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.golden.GoldenFormat

/** Pure-function laws checked with ScalaCheck (SURVEY.md §5.2.2):
  * generator-driven coverage for the formatting/rounding kernels that
  * every golden and oracle comparison relies on. */
object LawsCheck extends Properties("graft.laws") {

  // doubles inside Python's fixed-notation window (what goldens contain)
  private val windowDoubles: Gen[Double] = Gen.oneOf(
    Gen.choose(1e-4, 1e12),
    Gen.choose(-1e12, -1e-4),
    Gen.choose(0.9, 1.1),
    Gen.chooseNum(1L, 5000L).map(_.toDouble))

  property("pyrepr round-trips exactly") = Prop.forAll(windowDoubles) { d =>
    java.lang.Double.parseDouble(GoldenFormat.pyrepr(d)) == d
  }

  property("pyrepr matches Long formatting for integral values") =
    Prop.forAll(Gen.chooseNum(-1000000L, 1000000L)) { n =>
      n == 0 || GoldenFormat.pyrepr(n.toDouble) == s"$n.0"
    }

  // Python str(float) = the SHORTEST correctly-rounded decimal that
  // round-trips, in fixed notation inside [1e-4, 1e16). Round-tripping
  // alone (property above) doesn't pin shortest-ness or the rounding
  // direction — this closes the formatting class over random doubles,
  // not just the handful of values the committed goldens exercise.
  property("pyrepr is the shortest correctly-rounded fixed-notation repr") =
    Prop.forAll(windowDoubles) { d =>
      val s = GoldenFormat.pyrepr(d)
      def fmt(sig: Int): String =
        String.format(java.util.Locale.ROOT, s"%.${sig - 1}e", Double.box(d))
      // significant digits of the emitted string
      val sig = math.max(1,
        s.replace("-", "").replace(".", "")
          .dropWhile(_ == '0').reverse.dropWhile(_ == '0').length)
      val roundTrips = java.lang.Double.parseDouble(s) == d
      // shortest: one fewer significant digit must NOT round-trip
      val shortest = sig == 1 || java.lang.Double.parseDouble(fmt(sig - 1)) != d
      // correctly rounded: the emitted value IS the nearest sig-digit
      // decimal to d (%.Ne rounds correctly), not merely some
      // sig-digit decimal that happens to parse back to d
      val correctlyRounded =
        java.lang.Double.parseDouble(s) == java.lang.Double.parseDouble(fmt(sig))
      // fixed notation with Python's integral-value ".0" suffix
      val shape = !s.exists(c => c == 'e' || c == 'E') && s.contains('.')
      roundTrips && shortest && correctlyRounded && shape
    }

  private def cround(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  // cround's documented domain is |x| < 2^51 / 10^4 ≈ 2.2e11
  // (graft.queries.cround scaladoc): inside it the round-trip error stays
  // under half an integer step so idempotence is provable; near 2^52/10^4
  // a double's ulp exceeds 1e-4 and re-rounding can move the value (the
  // round-1 falsification at -4.48e11). Generate inside the domain.
  private val croundDomain: Gen[Double] = Gen.oneOf(
    Gen.choose(1e-4, 2e11),
    Gen.choose(-2e11, -1e-4),
    Gen.choose(0.9, 1.1),
    Gen.chooseNum(1L, 5000L).map(_.toDouble))

  property("cround is idempotent on its domain") = Prop.forAll(croundDomain) { d =>
    val r = cround(d)
    cround(r) == r
  }

  property("cround is within half an ulp of 1e-4 of its input") =
    Prop.forAll(Gen.choose(-1e6, 1e6)) { d =>
      math.abs(cround(d) - d) <= 0.00005000001
    }

  property("cround is monotone") =
    Prop.forAll(Gen.choose(-1e6, 1e6), Gen.choose(0.0, 10.0)) { (a, delta) =>
      cround(a) <= cround(a + delta)
    }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.etl.Migration

/** ScalaCheck invariants (SURVEY.md §5.2 layer 3) for the pure-JVM pieces:
  * check-digit algebra and the portable rounding formula.
  */
object PropertiesSpec extends Properties("graft") {

  property("luhn check char is always in the mod-30 alphabet") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { n =>
      Migration.Mod30Chars.contains(Migration.luhnMod30(n.toString))
    }

  property("luhn detects any single-digit substitution") =
    Prop.forAll(Gen.chooseNum(0L, 999999999L), Gen.chooseNum(1, 9)) {
      (n, delta) =>
        val id = n.toString
        val pos = (n % id.length).toInt
        val orig = id.charAt(pos) - '0'
        val mutated = id.updated(pos, ('0' + ((orig + delta) % 10)).toChar)
        mutated == id ||
          Migration.luhnMod30(mutated) != Migration.luhnMod30(id)
    }

  property("portable rounding stays within half an ulp of 1e-4") =
    Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { x =>
      val r = math.floor(x * 10000 + 0.5) / 10000
      math.abs(r - x) <= 0.00005 + 1e-12
    }
}

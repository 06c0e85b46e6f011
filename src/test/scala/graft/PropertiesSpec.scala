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

  // the codegen'd Hamming kernel == the obvious char-compare on any
  // pair of ASCII bit strings, including unequal lengths (min-length
  // convention of the zip_with composition it replaced)
  private val bitString = Gen.chooseNum(0, 80).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('0', '1')).map(_.mkString))

  property("StringHamming kernel equals naive char compare") =
    Prop.forAll(bitString, bitString) { (a, b) =>
      val naive = a.zip(b).count { case (x, y) => x != y }.toLong
      graft.functions.HammingFn.hamming(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) == naive
    }

  // the overflow-free decomposed split bucket == the exact BigInt form of
  // (id * 2654435761) % 100 for ANY non-negative id — the direct Long
  // product wraps silently past ~3.5e9 ids, which is the whole reason the
  // decomposition exists
  property("decomposed split bucket equals exact BigInt arithmetic") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { id =>
      val decomposed = ((id % 100) * (2654435761L % 100)) % 100
      val exact = (BigInt(id) * BigInt(2654435761L)) % 100
      BigInt(decomposed) == exact
    }

  // ------------------------------------------------- manifest pruning

  // SOUNDNESS of the SQL read path's zone-map evaluator
  // (io/ManifestFileIndex.keeps): for ANY predicate tree over
  // =/</<=/>/>=/IN composed with And/Or, a dir whose [min, max] bounds
  // hold at least one satisfying value must NEVER be pruned. (The
  // other direction — pruning as much as possible — is a performance
  // property, spec-owned; this one is the correctness invariant.)
  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGe, In => CIn, LessThan => CLt, LessThanOrEqual => CLe, Literal, Or => COr}
  import org.apache.spark.sql.types.LongType

  private val kAttr = AttributeReference("k", LongType)()
  private def litL(v: Long) = Literal(v, LongType)

  private val cmpLeaf: Gen[(Expression, Long => Boolean)] =
    Gen.chooseNum(-120L, 120L).flatMap { v =>
      Gen.oneOf[(Expression, Long => Boolean)](
        (CEq(kAttr, litL(v)), (x: Long) => x == v),
        (CLt(kAttr, litL(v)), (x: Long) => x < v),
        (CLe(kAttr, litL(v)), (x: Long) => x <= v),
        (CGt(kAttr, litL(v)), (x: Long) => x > v),
        (CGe(kAttr, litL(v)), (x: Long) => x >= v),
        (CEq(litL(v), kAttr), (x: Long) => v == x),
        (CLt(litL(v), kAttr), (x: Long) => v < x))
    }

  private val inLeaf: Gen[(Expression, Long => Boolean)] =
    Gen.nonEmptyListOf(Gen.chooseNum(-120L, 120L)).map(vs =>
      (CIn(kAttr, vs.map(litL)), (x: Long) => vs.contains(x)))

  private def predTree(d: Int): Gen[(Expression, Long => Boolean)] =
    if (d <= 0) Gen.oneOf(cmpLeaf, inLeaf)
    else Gen.frequency(
      3 -> Gen.oneOf(cmpLeaf, inLeaf),
      2 -> (for { (l, lf) <- predTree(d - 1); (r, rf) <- predTree(d - 1) }
        yield (CAnd(l, r), (x: Long) => lf(x) && rf(x))),
      2 -> (for { (l, lf) <- predTree(d - 1); (r, rf) <- predTree(d - 1) }
        yield (COr(l, r), (x: Long) => lf(x) || rf(x))))

  property("manifest pruning never drops a dir holding a satisfying row") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)),
      predTree(3)) { (rows, ef) =>
      val (expr, sat) = ef
      val bounds = Map("k" ->
        graft.io.TableFormat.ColBounds("long",
          rows.min.toString, rows.max.toString))
      // if any row in the dir satisfies the predicate, the dir survives
      !rows.exists(sat) || graft.io.ManifestFileIndex.keeps(bounds, expr)
    }

  property("bounds for an unrelated column never prune") =
    Prop.forAll(predTree(3), Gen.chooseNum(-100L, 100L),
      Gen.chooseNum(-100L, 100L)) { (ef, a, b) =>
      val bounds = Map("other" -> graft.io.TableFormat.ColBounds("long",
        math.min(a, b).toString, math.max(a, b).toString))
      graft.io.ManifestFileIndex.keeps(bounds, ef._1)
    }
}

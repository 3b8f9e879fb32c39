package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.types.SqlType

/** ScalaCheck property tests: SQL-type declarations round-trip through
  * parse → render → parse. */
object SqlTypeProps extends Properties("SqlType") {

  private val plain = Gen.oneOf("bit", "tinyint", "smallint", "int", "bigint",
    "real", "float", "date", "datetime2", "time")
  private val sized = for {
    n <- Gen.oneOf("char", "nchar", "varchar", "nvarchar", "varbinary", "binary")
    len <- Gen.choose(1, 8000)
  } yield s"$n($len)"
  private val dec = for {
    p <- Gen.choose(1, 38)
    s <- Gen.choose(0, p)
  } yield s"decimal($p,$s)"

  property("parse/render round-trip") =
    Prop.forAll(Gen.oneOf(plain, sized, dec)) { decl =>
      val t = SqlType.parse(decl)
      val t2 = SqlType.parse(t.render)
      t2 == t && t2.render == t.render
    }

  property("narrowestIntegral bounds contain the range") =
    Prop.forAll(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val t = graft.types.Infer.narrowestIntegral(Some(lo), Some(hi))
      val (tl, th) = t.intRange.get
      tl <= lo && hi <= th
    }
}

package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.operators.Mutations

/** ScalaCheck properties for the keyed-mutation algebra: each mutation
  * must equal a trivially-correct in-memory model on random
  * target/source pairs — random key overlap, duplicate-free keys,
  * NULL-free payloads (the distribution merge's doctest fixtures can't
  * cover). Sample counts are small: each sample drives real Spark
  * jobs. */
object MutationsProps extends Properties("Mutations") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private val rowsGen: Gen[Map[Int, String]] =
    Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 11), Gen.oneOf("p", "q", "r")))
        .map(_.toMap))

  // per source key: value + delete verdict
  private val verdictsGen: Gen[Map[Int, (String, Boolean)]] =
    Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 11),
        Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf(true, false))))
        .map(_.toMap))

  /** applyChanges == the obvious per-key model: delete verdicts remove
    * their key (absent key = no-op), live verdicts upsert, unmentioned
    * target keys survive untouched. */
  property("applyChanges equals the per-key verdict model") =
    Prop.forAll(rowsGen, verdictsGen) { (target, verdicts) =>
      val t = target.toSeq.map { case (k, v) => (k, v) }.toDF("PK", "V")
      val s = verdicts.toSeq.map { case (k, (v, del)) => (k, v, del) }
        .toDF("PK", "V", "__del")
      val got = Mutations.applyChanges(t, s, Seq("PK"), "__del")
        .collect().map(r => (r.getInt(0), r.getString(1))).toMap
      val want = verdicts.foldLeft(target) {
        case (acc, (k, (_, true)))  => acc - k
        case (acc, (k, (v, false))) => acc.updated(k, v)
      }
      (got == want) :| s"got $got want $want (target=$target verdicts=$verdicts)"
    }

  /** With no delete verdicts, applyChanges degenerates to upsert
    * exactly (merge's upsertOnly algebra). */
  property("applyChanges with all-live verdicts equals upsert") =
    Prop.forAll(rowsGen, rowsGen) { (target, source) =>
      val t = target.toSeq.toDF("PK", "V")
      val s = source.toSeq.map { case (k, v) => (k, v, false) }
        .toDF("PK", "V", "__del")
      val viaApply = Mutations.applyChanges(t, s, Seq("PK"), "__del")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      val viaUpsert = Mutations.upsert(t, source.toSeq.toDF("PK", "V"), Seq("PK"))
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      (viaApply == viaUpsert) :| s"apply $viaApply upsert $viaUpsert"
    }

  /** Duplicate keys ANYWHERE in the source raise (the reference's
    * multi-match MERGE error) — matched, unmatched, any batch shape.
    * rowsGen/verdictsGen above generate duplicate-free keys by
    * construction (`.toMap`), so this generator is the net for exactly
    * the case they sidestep. */
  private val dupSourceGen: Gen[List[(Int, String)]] =
    for {
      base <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 11), Gen.oneOf("x", "y", "z")))
      pick <- Gen.oneOf(base)
      v2 <- Gen.oneOf("x", "y", "z")
    } yield (pick._1, v2) :: base

  property("duplicate source keys raise on update/upsert/merge/applyChanges") =
    Prop.forAll(rowsGen, dupSourceGen) { (target, src) =>
      import org.apache.spark.sql.functions.lit
      val t = target.toSeq.toDF("PK", "V")
      val s = src.toDF("PK", "V")
      def raises(body: => Unit): Boolean =
        try { body; false } catch {
          case e: Throwable =>
            Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(20)
              .exists(x => x.getMessage != null && x.getMessage.contains(Mutations.DupKeyMsg))
        }
      (raises(Mutations.update(t, s, Seq("PK")).collect()) :| "update") &&
      (raises(Mutations.upsert(t, s, Seq("PK")).collect()) :| "upsert") &&
      (raises(Mutations.merge(t, s, Seq("PK")).collect()) :| "merge") &&
      (raises(Mutations.applyChanges(
        t, s.withColumn("__del", lit(false)), Seq("PK"), "__del").collect()) :| "applyChanges")
    }

  /** Idempotence: applying the same verdict batch twice is a no-op the
    * second time — the property that makes a replayed streaming
    * trigger (S38) safe. */
  property("applyChanges is idempotent over a fixed verdict batch") =
    Prop.forAll(rowsGen, verdictsGen) { (target, verdicts) =>
      val s = verdicts.toSeq.map { case (k, (v, del)) => (k, v, del) }
        .toDF("PK", "V", "__del")
      val once = Mutations.applyChanges(target.toSeq.toDF("PK", "V"), s, Seq("PK"), "__del")
      val onceRows = once.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      val twice = Mutations.applyChanges(
          onceRows.toSeq.toDF("PK", "V"), s, Seq("PK"), "__del")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      (onceRows == twice) :| s"once $onceRows twice $twice"
    }
}

package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.store.TableStore

/** ScalaCheck property for C24/C40 vacuum retention: after RANDOM
  * mutation histories, `vacuum(keepLast)` must leave the CURRENT read
  * bit-identical, every RETAINED snapshot readable and bit-identical
  * to its pre-vacuum self, and every retired generation unreadable —
  * the only acceptable behaviors for an operation that deletes files.
  * The dry-run must promise the same cut the real run takes (shared
  * cutoff arithmetic, pinned here on random shapes). */
object VacuumProps extends Properties("Vacuum") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  private val stepGen: Gen[Either[Map[Int, Int], Set[Int]]] =
    Gen.oneOf(
      Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.choose(0, 7), Gen.choose(0, 99)))
          .map(l => Left(l.toMap))),
      Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 7)).map(l => Right(l.toSet))))

  private val opsGen: Gen[List[Either[Map[Int, Int], Set[Int]]]] =
    Gen.choose(2, 5).flatMap(Gen.listOfN(_, stepGen))

  property("vacuum keeps current + retained snapshots intact, retires the rest") =
    Prop.forAll(opsGen, Gen.choose(1, 3)) { (ops, keepLast) =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_vacprop_").toString)
      store.createTableFromDataFrame("t",
        Seq((0, 1), (1, 2)).toDF("k", "v"), Seq("k"), infer = false)
      ops.foreach {
        case Left(ups) => store.upsert("t", ups.toSeq.toDF("k", "v"))
        case Right(dels) => store.delete("t", dels.toSeq.toDF("k"))
      }
      def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
        df.select("k", "v").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val gens = store.snapshots("t").map(_._1)
      val (retired, retained) = gens.splitAt(math.max(0, gens.size - keepLast))
      val current = rows(store.readTable("t"))
      val retainedBefore = retained.map(g => g -> rows(store.readTableAt("t", g))).toMap
      val promised = store.vacuumDryRun("t", keepLast).collect().map(_.getInt(0)).toSet
      store.vacuum("t", keepLast)
      val checks = Seq(
        (rows(store.readTable("t")) == current) :| "current read changed",
        (store.snapshots("t").map(_._1) == retained) :| "retained set wrong") ++
        retained.map(g => (rows(store.readTableAt("t", g)) == retainedBefore(g)) :|
          s"retained snapshot $g changed") ++
        retired.map(g => Prop(scala.util.Try(store.readTableAt("t", g)).isFailure) :|
          s"retired generation $g still readable") ++
        // dry-run reports g<N> TREES (files retired BY commit N — i.e.
        // generation N−1's replaced files), so the cutoff commit's own
        // tree is legitimately promised alongside the retired gens
        Seq(promised.subsetOf((retired ++ retained.headOption).toSet) :|
          s"dry-run promised $promised beyond ${retired ++ retained.headOption}",
          // and after the run, nothing is left to promise
          (store.vacuumDryRun("t", keepLast).count() == 0L) :|
            "post-vacuum dry-run still promises reclamation")
      checks.reduce(_ && _)
    }
}

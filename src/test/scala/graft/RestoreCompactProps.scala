package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.store.TableStore

/** ScalaCheck properties for C29 restore and C19 compaction on random
  * mutation histories: restore must make the CURRENT state equal the
  * chosen snapshot (without destroying the newer history — it commits
  * forward), and compaction must be a pure LAYOUT move — same rows,
  * same keyed-read answers, strictly fewer-or-equal files. Random
  * histories sweep restore-after-delete, restore-to-first-gen, and
  * compaction over bucket layouts the crafted fixtures don't vary. */
object RestoreCompactProps extends Properties("RestoreCompact") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  private val stepGen: Gen[Either[Map[Int, Int], Set[Int]]] =
    Gen.oneOf(
      Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.choose(0, 7), Gen.choose(0, 9)))
          .map(l => Left(l.toMap))),
      Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 7)).map(l => Right(l.toSet))))

  private val opsGen: Gen[List[Either[Map[Int, Int], Set[Int]]]] =
    Gen.choose(2, 5).flatMap(Gen.listOfN(_, stepGen))

  private def mutate(store: TableStore, ops: List[Either[Map[Int, Int], Set[Int]]]): Unit =
    ops.foreach {
      case Left(ups) => store.upsert("t", ups.toSeq.toDF("k", "v"))
      case Right(dels) => store.delete("t", dels.toSeq.toDF("k"))
    }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
    df.select("k", "v").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  property("restore makes current equal the chosen snapshot, history intact") =
    Prop.forAll(opsGen, Gen.choose(0.0, 1.0)) { (ops, frac) =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_rcprop_r_").toString)
      store.createTableFromDataFrame("t",
        Seq((0, 1), (1, 2)).toDF("k", "v"), Seq("k"), infer = false)
      mutate(store, ops)
      val gens = store.snapshots("t").map(_._1)
      val target = gens(math.min(gens.size - 1, (frac * gens.size).toInt))
      val wantAtTarget = rows(store.readTableAt("t", target))
      val preRestoreHead = gens.last
      val wantAtHead = rows(store.readTableAt("t", preRestoreHead))
      store.restore("t", target)
      Seq(
        (rows(store.readTable("t")) == wantAtTarget) :|
          s"current != snapshot $target after restore",
        // restore commits FORWARD: the pre-restore head stays readable
        (rows(store.readTableAt("t", preRestoreHead)) == wantAtHead) :|
          "pre-restore head no longer readable/identical",
        // a keyed mutation works on the restored state
        Prop(scala.util.Try {
          store.upsert("t", Seq((0, 99)).toDF("k", "v"))
          rows(store.readTable("t")) ==
            (wantAtTarget.filterNot(_._1 == 0) + ((0, 99)))
        }.getOrElse(false)) :| "post-restore mutation diverged"
      ).reduce(_ && _)
    }

  property("compaction is a pure layout move: same rows, same keyed reads, no more files") =
    Prop.forAll(opsGen, Gen.oneOf(0, 4)) { (ops, buckets) =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_rcprop_c_").toString)
      store.createTable("t", Seq("k" -> "int", "v" -> "int"), Seq("k"),
        buckets = buckets)
      store.insert("t", Seq((0, 1), (1, 2)).toDF("k", "v"))
      mutate(store, ops)
      val before = rows(store.readTable("t"))
      val filesBefore = store.readTable("t").inputFiles.length
      store.compact("t")
      val keyProbe = before.headOption.map(_._1).getOrElse(0)
      Seq(
        (rows(store.readTable("t")) == before) :| "rows changed across compaction",
        (store.readTable("t").inputFiles.length <= filesBefore) :|
          "compaction grew the file count",
        (rows(store.readTable("t", where = Some(s"k = $keyProbe"))) ==
          before.filter(_._1 == keyProbe)) :| "keyed read diverged after compaction"
      ).reduce(_ && _)
    }
}

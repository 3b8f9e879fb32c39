package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.store.TableStore

/** ScalaCheck property for the read-side pruning stack (C20/C27/C31):
  * a bucketed, analyzed, bloom-filtered store and a flat, never-
  * analyzed store holding IDENTICAL rows must answer every random
  * `where` identically. The flat store cannot prune (pruneStages bails
  * with no stats and no buckets), so any divergence is a pruning layer
  * silently dropping or resurrecting files — the bug class zone maps
  * and bucket pruning can ship without failing a single crafted
  * fixture. Differential by construction: the where PARSER dialect
  * cancels out (both sides go through the same parser), only the
  * pruning differs. */
object PruningProps extends Properties("Pruning") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  // rows: key -> value, some values NULL (zone-map min/max must not
  // prune NULL-matching files; IS NULL predicates probe exactly that)
  private val rowsGen: Gen[Map[Int, Option[Int]]] =
    Gen.choose(4, 24).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 60),
        Gen.frequency(5 -> Gen.choose(0, 99).map(Some(_)),
          1 -> Gen.const(Option.empty[Int]))))
        .map(_.toMap))

  private val predGen: Gen[String] = {
    val a = Gen.choose(0, 60)
    val v = Gen.choose(0, 99)
    Gen.oneOf(
      a.map(x => s"k = $x"),
      Gen.zip(a, a).map { case (x, y) => s"k IN ($x, $y)" },
      Gen.zip(a, a).map { case (x, y) =>
        s"k >= ${math.min(x, y)} AND k < ${math.max(x, y)}" },
      Gen.zip(v, v).map { case (x, y) =>
        s"v >= ${math.min(x, y)} AND v <= ${math.max(x, y)}" },
      Gen.zip(a, v).map { case (x, y) => s"k < $x OR v = $y" },
      Gen.const("v IS NULL"),
      Gen.zip(a, v).map { case (x, y) => s"k = $x AND v = $y" })
  }

  property("bucketed+analyzed store answers every where like the flat unpruned store") =
    Prop.forAll(rowsGen, Gen.listOfN(4, predGen)) { (rows, preds) =>
      val df = rows.toSeq.map { case (k, v) => (k.toLong, v.map(_.toLong)) }
        .toDF("k", "v")
      val pruning = new TableStore(spark,
        Files.createTempDirectory("graft_prprop_p_").toString)
      pruning.createTable("t", Seq("k" -> "bigint", "v" -> "bigint"),
        Seq("k"), buckets = 4)
      pruning.insert("t", df)
      pruning.analyze("t", bloomBits = 1 << 12)
      val flat = new TableStore(spark,
        Files.createTempDirectory("graft_prprop_f_").toString)
      flat.createTable("t", Seq("k" -> "bigint", "v" -> "bigint"))
      flat.insert("t", df)
      // third layout: Z-order clustered + re-analyzed — the interleave
      // rewrite must never change an answer either
      val zed = new TableStore(spark,
        Files.createTempDirectory("graft_prprop_z_").toString)
      zed.createTable("t", Seq("k" -> "bigint", "v" -> "bigint"), Seq("k"))
      zed.insert("t", df)
      zed.cluster("t", Seq("k", "v"), filesTarget = 3)
      zed.analyze("t")
      def got(s: TableStore, p: String): Seq[(Long, Option[Long])] =
        s.readTable("t", where = Some(p)).collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sorted
      val checks = preds.flatMap { p =>
        Seq(
          (got(pruning, p) == got(flat, p)) :|
            s"pruned read diverged on '$p': ${got(pruning, p)} vs ${got(flat, p)} (rows=$rows)",
          (got(zed, p) == got(flat, p)) :|
            s"z-ordered read diverged on '$p': ${got(zed, p)} vs ${got(flat, p)} (rows=$rows)")
      }
      checks.reduce(_ && _)
    }
}

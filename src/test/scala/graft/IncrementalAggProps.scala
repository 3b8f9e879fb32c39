package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.store.{IncrementalAgg, TableStore}

/** ScalaCheck property for C41 incremental aggregate maintenance:
  * under RANDOM keyed mutation sequences (group moves, group deaths,
  * re-inserts) with maintenance at RANDOM points — so single triggers
  * fold MULTI-generation backlogs — the summary after every
  * maintenance call must be bit-identical to the batch recompute. The
  * crafted IncrementalAggSpec scenarios can't sweep the interleavings;
  * this does. Sample count is small: every sample drives real store
  * commits. */
object IncrementalAggProps extends Properties("IncrementalAgg") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  // one step: an upsert batch (key -> (group, value)) or a key-delete
  // set, plus whether to run maintenance after the commit
  private val stepGen: Gen[(Either[Map[Int, (String, Double)], Set[Int]], Boolean)] =
    Gen.zip(
      Gen.oneOf(
        Gen.choose(1, 5).flatMap(n =>
          Gen.listOfN(n, Gen.zip(Gen.choose(0, 6),
            Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(1, 99).map(_ / 4.0))))
            .map(l => Left(l.toMap))),
        Gen.choose(1, 4).flatMap(n =>
          Gen.listOfN(n, Gen.choose(0, 6)).map(l => Right(l.toSet)))),
      Gen.oneOf(true, false))

  private val opsGen: Gen[List[(Either[Map[Int, (String, Double)], Set[Int]], Boolean)]] =
    Gen.choose(1, 4).flatMap(Gen.listOfN(_, stepGen))

  property("summary ≡ batch recompute at every maintenance point under random feeds") =
    Prop.forAll(opsGen) { ops =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_iaprop_").toString)
      store.createTableFromDataFrame("base",
        Seq((0, "a", 1.0), (1, "b", 2.0)).toDF("k", "g", "v"),
        Seq("k"), infer = false)
      store.createTableFromDataFrame("summary",
        IncrementalAgg.summarize(store.readTable("base"), Seq("g"), "v"),
        Seq("g"), infer = false)
      IncrementalAgg.markMaintained(store, "base", "summary",
        store.snapshots("base").last._1)
      def snap(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, java.math.BigDecimal)] =
        df.select("g", "n_rows", "nn_val", "sum_val").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getDecimal(3))).toSet
      // run every op; maintenance only at flagged points (unflagged
      // commits become the NEXT maintenance call's multi-gen backlog);
      // a final maintenance closes the sequence
      val checks = (ops :+ (Right(Set.empty[Int]), true)).map { case (op, maintain) =>
        op match {
          case Left(ups) =>
            store.upsert("base",
              ups.toSeq.map { case (k, (g, v)) => (k, g, v) }.toDF("k", "g", "v"))
          case Right(dels) if dels.nonEmpty =>
            store.delete("base", dels.toSeq.toDF("k"))
          case _ => ()
        }
        if (maintain) {
          IncrementalAgg.maintainToCurrent(store, "base", "summary", Seq("g"), "v")
          val got = snap(store.readTable("summary"))
          val want = snap(IncrementalAgg.summarize(store.readTable("base"), Seq("g"), "v"))
          (got == want) :| s"summary diverged after $op: $got vs $want"
        } else Prop.passed
      }
      checks.reduce(_ && _)
    }

  /** C41b: the min/max summary under the same random interleavings —
    * the insert-only incremental fold and the deleted-group rescan
    * must both land bit-identical to the batch recompute (a rescan
    * that reads the wrong generation, or a tighten that survives a
    * deleted extremum, fails here). */
  property("minmax summary ≡ batch recompute at every maintenance point under random feeds") =
    Prop.forAll(opsGen) { ops =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_iamm_").toString)
      store.createTableFromDataFrame("base",
        Seq((0, "a", 1.0), (1, "b", 2.0)).toDF("k", "g", "v"),
        Seq("k"), infer = false)
      store.createTableFromDataFrame("summary",
        IncrementalAgg.summarizeMinMax(store.readTable("base"), Seq("g"), "v"),
        Seq("g"), infer = false)
      IncrementalAgg.markMaintained(store, "base", "summary",
        store.snapshots("base").last._1)
      def snap(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.toString).toSet
      val checks = (ops :+ (Right(Set.empty[Int]), true)).map { case (op, maintain) =>
        op match {
          case Left(ups) =>
            store.upsert("base",
              ups.toSeq.map { case (k, (g, v)) => (k, g, v) }.toDF("k", "g", "v"))
          case Right(dels) if dels.nonEmpty =>
            store.delete("base", dels.toSeq.toDF("k"))
          case _ => ()
        }
        if (maintain) {
          IncrementalAgg.maintainMinMaxToCurrent(store, "base", "summary", Seq("g"), "v")
          val got = snap(store.readTable("summary"))
          val want = snap(IncrementalAgg.summarizeMinMax(
            store.readTable("base"), Seq("g"), "v"))
          (got == want) :| s"minmax summary diverged after $op: $got vs $want"
        } else Prop.passed
      }
      checks.reduce(_ && _)
    }

  /** Shared harness for the two-measure summary families: run the same
    * random interleavings against a (bootstrap, maintain, recompute)
    * triple and require bit-identity at every maintenance point. */
  private def twoMeasureSweep(
      ops: List[(Either[Map[Int, (String, Double)], Set[Int]], Boolean)],
      tag: String,
      bootstrap: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      maintain: (TableStore, String, String) => Unit,
      recompute: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      summaryPk: Seq[String] = Seq("g")): Prop = {
    val store = new TableStore(spark,
      Files.createTempDirectory(s"graft_ia${tag}_").toString)
    // second measure derived from (key, value) so updates move BOTH
    store.createTableFromDataFrame("base",
      Seq((0, "a", 1.0, 3.0), (1, "b", 2.0, 0.5)).toDF("k", "g", "v", "w"),
      Seq("k"), infer = false)
    store.createTableFromDataFrame("summary",
      bootstrap(store.readTable("base")), summaryPk, infer = false)
    IncrementalAgg.markMaintained(store, "base", "summary",
      store.snapshots("base").last._1)
    def snap(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val checks = (ops :+ (Right(Set.empty[Int]), true)).map { case (op, m) =>
      op match {
        case Left(ups) =>
          store.upsert("base", ups.toSeq.map { case (k, (g, v)) =>
            (k, g, v, (k * 7 % 13) + v / 2.0) }.toDF("k", "g", "v", "w"))
        case Right(dels) if dels.nonEmpty =>
          store.delete("base", dels.toSeq.toDF("k"))
        case _ => ()
      }
      if (m) {
        maintain(store, "base", "summary")
        val got = snap(store.readTable("summary"))
        val want = snap(recompute(store.readTable("base")))
        (got == want) :| s"$tag summary diverged after $op: $got vs $want"
      } else Prop.passed
    }
    checks.reduce(_ && _)
  }

  /** C41c: the multi-measure fold under random interleavings. */
  property("multi-measure summary ≡ batch recompute at every maintenance point") =
    Prop.forAll(opsGen) { ops =>
      twoMeasureSweep(ops, "multi",
        IncrementalAgg.summarizeMulti(_, Seq("g"), Seq("v", "w")),
        (s, b, t) => IncrementalAgg.maintainMultiToCurrent(s, b, t, Seq("g"), Seq("v", "w")),
        IncrementalAgg.summarizeMulti(_, Seq("g"), Seq("v", "w")))
    }

  /** C41e: multi-measure MIN/MAX — per-measure tighten and rescan. */
  property("multi-minmax summary ≡ batch recompute at every maintenance point") =
    Prop.forAll(opsGen) { ops =>
      twoMeasureSweep(ops, "mmm",
        IncrementalAgg.summarizeMultiMinMax(_, Seq("g"), Seq("v", "w")),
        (s, b, t) => IncrementalAgg.maintainMultiMinMaxToCurrent(s, b, t, Seq("g"), Seq("v", "w")),
        IncrementalAgg.summarizeMultiMinMax(_, Seq("g"), Seq("v", "w")))
    }

  /** C41d: the KMV distinct-count fold — register union on growth,
    * rescan on deletes — with a small k so the estimator regime (not
    * just the exact below-k regime) is exercised. */
  property("distinct-count summary ≡ batch recompute at every maintenance point") =
    Prop.forAll(opsGen) { ops =>
      twoMeasureSweep(ops, "kmv",
        IncrementalAgg.summarizeDistinct(_, Seq("g"), "v", k = 3),
        (s, b, t) => IncrementalAgg.maintainDistinctToCurrent(s, b, t, Seq("g"), "v", k = 3),
        IncrementalAgg.summarizeDistinct(_, Seq("g"), "v", k = 3))
    }

  /** C41d×C41c: the multi-measure KMV fold — per-measure register
    * union on growth, one shared rescan on deletes. */
  property("multi-measure KMV summary ≡ batch recompute at every maintenance point") =
    Prop.forAll(opsGen) { ops =>
      twoMeasureSweep(ops, "kmvm",
        IncrementalAgg.summarizeDistinctMulti(_, Seq("g"), Seq("v", "w"), k = 3),
        (s, b, t) => IncrementalAgg.maintainDistinctMultiToCurrent(
          s, b, t, Seq("g"), Seq("v", "w"), k = 3),
        IncrementalAgg.summarizeDistinctMulti(_, Seq("g"), Seq("v", "w"), k = 3))
    }

  /** C41g: the quantile-sketch counter fold — pure add/subtract under
    * ANY feed (no rescan protocol to fall back on, so a divergence
    * here is a real algebra bug, not a missed rescan). The generator's
    * value updates move observations between buckets; deletes empty
    * buckets and kill groups. */
  property("quantile summary ≡ batch recompute at every maintenance point") =
    Prop.forAll(opsGen) { ops =>
      twoMeasureSweep(ops, "qnt",
        IncrementalAgg.summarizeQuantile(_, Seq("g"), "v"),
        (s, b, t) => IncrementalAgg.maintainQuantileToCurrent(s, b, t, Seq("g"), "v"),
        IncrementalAgg.summarizeQuantile(_, Seq("g"), "v"),
        summaryPk = Seq("g", "bin_id", "bin_upper"))
    }
}

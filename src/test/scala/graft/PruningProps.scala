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

  // ── C14d: datetimeoffset instant semantics under pruning ──────────────

  private val BaseUs = 1700000000000000L // 2023-11-14 22:13:20 UTC

  /** Canonical render of (instant micros, offset minutes) — the same
    * string dtoFromTimestamp produces, built in-memory via java.time
    * with an explicit UTC zone (the model must not depend on the
    * session zone any more than the engine does). */
  private def render(instantUs: Long, offMin: Int): String = {
    val wallUs = instantUs + offMin * 60000000L
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(wallUs, 1000000L), (Math.floorMod(wallUs, 1000000L) * 1000).toInt,
      java.time.ZoneOffset.UTC)
    val f = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    f.format(ldt) + (if (offMin < 0) " -" else " +") +
      f"${math.abs(offMin) / 60}%02d:${math.abs(offMin) % 60}%02d"
  }

  /** A literal for the same instant, written either naive (UTC) or at
    * an arbitrary offset — both must select the same rows. */
  private def literal(instantUs: Long, offMin: Int, naive: Boolean): String =
    if (naive) render(instantUs, 0).substring(0, 26)
    else render(instantUs, offMin)

  private val dtoRowsGen: Gen[Seq[(Long, Long, Int)]] = // (k, instantUs, offMin)
    Gen.choose(6, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 1000000L), Gen.choose(-28, 28)))
        .map(_.zipWithIndex.map { case ((s, o), k) =>
          (k.toLong, BaseUs + s * 1000000L, o * 30) }))

  private val dtoPredGen: Gen[(Seq[(Long, Long, Int)]) => (String, Long => Boolean)] = {
    val point = Gen.zip(Gen.choose(0L, 1000000L), Gen.choose(-28, 28), Gen.oneOf(true, false))
    Gen.oneOf(
      // range by instant, literal rendered naive or at a random offset
      Gen.zip(point, point).map { case ((a, oa, na), (b, ob, nb)) => (_: Seq[(Long, Long, Int)]) =>
        val (lo, hi) = (BaseUs + math.min(a, b) * 1000000L, BaseUs + math.max(a, b) * 1000000L)
        (s"d >= '${literal(lo, oa * 30, na)}' AND d < '${literal(hi, ob * 30, nb)}'",
          (us: Long) => us >= lo && us < hi)
      },
      // equality on a ROW instant re-rendered at a DIFFERENT offset —
      // wall clocks differ, instants match
      Gen.zip(Gen.choose(0, 1 << 20), Gen.choose(-28, 28), Gen.oneOf(true, false))
        .map { case (pick, o, naive) => (rows: Seq[(Long, Long, Int)]) =>
          val us = rows(pick % rows.size)._2
          (s"d = '${literal(us, o * 30, naive)}'", (x: Long) => x == us)
        },
      // IN of two row instants at arbitrary offsets
      Gen.zip(Gen.choose(0, 1 << 20), Gen.choose(0, 1 << 20), Gen.choose(-28, 28))
        .map { case (p1, p2, o) => (rows: Seq[(Long, Long, Int)]) =>
          val (u1, u2) = (rows(p1 % rows.size)._2, rows(p2 % rows.size)._2)
          (s"d IN ('${literal(u1, o * 30, false)}', '${literal(u2, 0, true)}')",
            (x: Long) => x == u1 || x == u2)
        })
  }

  property("datetimeoffset instant predicates: pruned/clustered ≡ flat ≡ the in-memory instant model") =
    Prop.forAll(dtoRowsGen, Gen.listOfN(4, dtoPredGen)) { (rows, predFns) =>
      val df = rows.map { case (k, us, om) => (k, render(us, om)) }.toDF("k", "d")
      val pruning = new TableStore(spark,
        Files.createTempDirectory("graft_prdto_p_").toString)
      pruning.createTable("t", Seq("k" -> "bigint", "d" -> "datetimeoffset"), Seq("k"))
      pruning.insert("t", df)
      pruning.cluster("t", Seq("d"), filesTarget = 4) // instant layout + auto analyze
      val flat = new TableStore(spark,
        Files.createTempDirectory("graft_prdto_f_").toString)
      flat.createTable("t", Seq("k" -> "bigint", "d" -> "datetimeoffset"))
      flat.insert("t", df)
      def got(s: TableStore, p: String): Seq[Long] =
        s.readTable("t", where = Some(p)).select("k").collect().map(_.getLong(0)).toSeq.sorted
      val checks = predFns.map { mk =>
        val (p, model) = mk(rows)
        val want = rows.collect { case (k, us, _) if model(us) => k }.sorted
        ((got(pruning, p) == want) :|
          s"clustered+analyzed read diverged from the instant model on '$p': ${got(pruning, p)} vs $want") &&
          ((got(flat, p) == want) :|
            s"flat read diverged from the instant model on '$p': ${got(flat, p)} vs $want")
      }
      checks.reduce(_ && _)
    }
}

package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions.lit

import graft.store.TableStore

/** ScalaCheck property for C22 SCD2 history merge: random change-batch
  * sequences at strictly increasing clocks must produce exactly the
  * chains of the obvious per-key model — close the current version at
  * the change clock when a tracked value changes, open the new one
  * there, no-op on identical re-assertions, leave untouched keys
  * alone. Random sequences sweep the interleavings (change → re-assert
  * → change back, brand-new key mid-sequence, many keys per batch) the
  * crafted fixtures can't. */
object Scd2Props extends Properties("Scd2") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  private val batchGen: Gen[Map[Int, String]] =
    Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 5), Gen.oneOf("x", "y", "z")))
        .map(_.toMap))

  private val opsGen: Gen[List[Map[Int, String]]] =
    Gen.choose(1, 4).flatMap(Gen.listOfN(_, batchGen))

  private def clockAt(day: Int): LocalDateTime =
    LocalDateTime.parse(f"2024-02-${day}%02dT00:00:00")

  property("history chains equal the per-key close/open model under random batches") =
    Prop.forAll(opsGen) { ops =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_scd2prop_").toString)
      store.createTable("t", Seq("k" -> "bigint", "val" -> "varchar(4)"), Seq("k"))
      // model: per key, the full chain as (value, fromDay, toDay option)
      var model = Map.empty[Int, List[(String, Int, Option[Int])]]
      ops.zipWithIndex.foreach { case (batch, i) =>
        val day = i + 1
        store.scd2("t", batch.toSeq.toDF("k", "val"),
          clock = lit(java.sql.Timestamp.valueOf(clockAt(day))).cast("timestamp_ntz"))
        batch.foreach { case (k, v) =>
          val chain = model.getOrElse(k, Nil)
          chain.find(_._3.isEmpty) match {
            case Some((cur, from, _)) if cur != v =>
              model = model.updated(k,
                (v, day, None) :: (cur, from, Some(day)) :: chain.filterNot(_._3.isEmpty))
            case Some(_) => () // identical re-assertion: no-op
            case None =>
              model = model.updated(k, (v, day, None) :: chain)
          }
        }
      }
      val want = model.toSeq.flatMap { case (k, chain) =>
        chain.map { case (v, f, t) => (k.toLong, v, clockAt(f), t.map(clockAt)) }
      }.toSet
      val got = store.readTable("t",
          columns = Seq("k", "val", "_valid_from", "_valid_to"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getAs[LocalDateTime](2), Option(r.getAs[LocalDateTime](3)))).toSet
      (got == want) :| s"chains diverged: $got vs $want (ops=$ops)"
    }
}

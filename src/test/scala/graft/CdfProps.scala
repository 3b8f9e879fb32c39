package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions.{col, lit, when}

import graft.operators.Mutations
import graft.store.TableStore

/** ScalaCheck property tying C25 (change-data-feed) to C12b
  * (applyChanges): for ANY two generations of ANY random mutation
  * history, folding the feed between them into the FROM snapshot must
  * reproduce the TO snapshot exactly — the round-trip contract every
  * CDC consumer (mirror sync, incremental aggregates, replicas)
  * silently relies on. Random histories sweep key re-insert after
  * delete, change-then-change-back (which must VANISH from the wide
  * window's feed), and no-op upserts. */
object CdfProps extends Properties("Cdf") {
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

  property("applyChanges(snapshot(from), feed(from→to)) reproduces snapshot(to)") =
    Prop.forAll(opsGen, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (ops, fFrac, tFrac) =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_cdfprop_").toString)
      store.createTableFromDataFrame("t",
        Seq((0, 1), (1, 2)).toDF("k", "v"), Seq("k"), infer = false)
      ops.foreach {
        case Left(ups) => store.upsert("t", ups.toSeq.toDF("k", "v"))
        case Right(dels) => store.delete("t", dels.toSeq.toDF("k"))
      }
      val gens = store.snapshots("t").map(_._1)
      // any ordered pair, endpoints included
      val i = math.min(gens.size - 1, (fFrac * gens.size).toInt)
      val j = math.min(gens.size - 1, (tFrac * gens.size).toInt)
      val (from, to) = (gens(math.min(i, j)), gens(math.max(i, j)))
      val feed = store.readChanges("t", from, to)
        .filter(col("_change_type") =!= "update_preimage")
        .withColumn("__del", col("_change_type") === "delete")
        .select(col("k"), when(col("__del"), lit(null)).otherwise(col("v")).as("v"),
          col("__del"))
      def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
        df.select("k", "v").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val applied = Mutations.applyChanges(
        store.readTableAt("t", from), feed, Seq("k"), "__del")
      (rows(applied) == rows(store.readTableAt("t", to))) :|
        s"round-trip diverged for ($from → $to) under $ops"
    }
}

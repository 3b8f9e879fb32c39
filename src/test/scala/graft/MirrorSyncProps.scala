package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions.col

import graft.sources.ParquetLayout
import graft.store.TableStore

/** ScalaCheck property for the C39 mirror-sync family: under RANDOM
  * keyed mutation sequences (upserts that move keys between partitions,
  * deletes that can empty a partition), syncing after every commit must
  * keep the hive mirror row-identical to the table — the invariant the
  * crafted spec fixtures (SourcesSpec, StreamsSpec S40) cannot sweep.
  * Sample count is small: every sample drives real store commits. */
object MirrorSyncProps extends Properties("MirrorSync") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  // one step: either an upsert batch (key -> (segment, value)) or a
  // key-delete set. Key 0 is never deleted so the mirror tree (and its
  // read-back) never goes fully empty.
  private val stepGen: Gen[Either[Map[Int, (String, String)], Set[Int]]] =
    Gen.oneOf(
      Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.choose(0, 7),
          Gen.zip(Gen.oneOf("A", "B", "C"), Gen.oneOf("x", "y", "z"))))
          .map(l => Left(l.toMap))),
      Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.choose(1, 7)).map(l => Right(l.toSet))))

  private val opsGen: Gen[List[Either[Map[Int, (String, String)], Set[Int]]]] =
    Gen.choose(1, 3).flatMap(Gen.listOfN(_, stepGen))

  private def state(store: TableStore): Set[(Int, String, String)] =
    store.readTable("t").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  private def mirrorState(path: String): Set[(Int, String, String)] =
    spark.read.parquet(path)
      .select(col("k"), col("seg").cast("string"), col("v"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  property("mirror ≡ table after every sync point under random mutations") =
    Prop.forAll(opsGen) { ops =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_msprop_").toString)
      store.createTableFromDataFrame("t",
        Seq((0, "A", "v0"), (1, "B", "v0")).toDF("k", "seg", "v"),
        Seq("k"), infer = false)
      val mirror = Files.createTempDirectory("graft_msprop_m_").toString + "/m"
      ParquetLayout.exportPartitioned(store.readTable("t"), mirror, Seq("seg"))
      var synced = store.snapshots("t").last._1
      val checks = ops.map { op =>
        op match {
          case Left(ups) =>
            store.upsert("t",
              ups.toSeq.map { case (k, (s, v)) => (k, s, v) }.toDF("k", "seg", "v"))
          case Right(dels) =>
            store.delete("t", dels.toSeq.toDF("k"))
        }
        val cur = store.snapshots("t").last._1
        ParquetLayout.syncMirror(store, "t", mirror, "seg", synced, cur)
        synced = cur
        val (got, want) = (mirrorState(mirror), state(store))
        (got == want) :| s"mirror diverged after $op: $got vs $want"
      }
      checks.reduce(_ && _)
    }
}

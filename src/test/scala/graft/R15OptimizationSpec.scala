package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.TableStore

/** Focused pins for the r15 optimization round's internals changes:
  * the merged-schema cache (footer jobs → cached explicit schemas),
  * the projection-riding in-plan source validation, and the fork-free
  * local filesystem. Each test targets a hazard the optimization
  * introduced the POSSIBILITY of, not the happy path the full suite
  * already covers. */
class R15OptimizationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def newStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_r15opt_").toString)

  test("schema cache tracks metadata-only DDL: addColumn is visible on the next read") {
    val store = newStore()
    store.createTable("t", Seq("k" -> "int", "v" -> "varchar(8)"), Seq("k"))
    store.insert("t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    // prime the cache under the 2-column schema
    assert(store.readTable("t").columns.toSeq == Seq("k", "v"))
    store.addColumn("t", "w", "bigint") // metadata-only: files lack w
    // the DDL committed a generation → the cache must re-merge; old
    // files read w as null
    val rows = store.readTable("t", orderBy = Seq("k")).select("k", "w").as[(Int, Option[Long])].collect()
    assert(rows.toSeq == Seq((1, None), (2, None)))
    // a post-DDL insert writes files WITH w; the merged schema serves both
    store.insert("t", Seq((3, "c", 30L)).toDF("k", "v", "w"))
    val all = store.readTable("t", orderBy = Seq("k")).select("k", "w").as[(Int, Option[Long])].collect()
    assert(all.toSeq == Seq((1, None), (2, None), (3, Some(30L))))
  }

  test("schema cache observes a FOREIGN writer's commit (second store instance, same root)") {
    val root = java.nio.file.Files.createTempDirectory("graft_r15opt_f_").toString
    val a = new TableStore(spark, root)
    a.createTable("t", Seq("k" -> "int", "v" -> "varchar(8)"), Seq("k"))
    a.insert("t", Seq((1, "a")).toDF("k", "v"))
    assert(a.readTable("t").columns.toSeq == Seq("k", "v")) // prime a's cache
    val b = new TableStore(spark, root) // foreign writer
    b.addColumn("t", "w", "bigint")
    b.insert("t", Seq((2, "b", 20L)).toDF("k", "v", "w"))
    // a's cache is keyed by the newest manifest generation, which b's
    // commits advanced — a must see w (including b's written value)
    val viaA = a.readTable("t", orderBy = Seq("k")).select("k", "w").as[(Int, Option[Long])].collect()
    assert(viaA.toSeq == Seq((1, None), (2, Some(20L))))
  }

  test("projection-riding validation survives delete's match-key pruning") {
    val store = newStore()
    store.createTable("t", Seq("k" -> "int", "v" -> "varchar(3)"), Seq("k"))
    store.insert("t", Seq((1, "abc"), (2, "de")).toDF("k", "v"))
    // delete projects the source down to the match keys — the guard
    // rides EVERY column, so the oversize v must still raise even
    // though v is pruned from the anti join
    intercept[errors.InsufficientColumnSize](
      store.delete("t", Seq((1, "toolong")).toDF("k", "v")))
    assert(store.readTable("t").count() == 2) // nothing deleted
    store.delete("t", Seq((1, "ok")).toDF("k", "v"))
    assert(store.readTable("t").count() == 1)
  }

  test("insert auto-widen still works through the in-plan guard's aggregate fallback") {
    val store = newStore()
    store.createTable("t", Seq("k" -> "int", "v" -> "varchar(3)"), Seq("k"))
    store.insert("t", Seq((1, "abc")).toDF("k", "v"))
    // violating batch + autoAdjust: the in-plan assert fires, the
    // catch re-runs the aggregate ladder, widens, and retries
    store.insert("t", Seq((2, "longer")).toDF("k", "v"), autoAdjust = true)
    assert(store.readTable("t").count() == 2)
    val widened = store.describe("t").filter(col("column_name") === "v")
      .select("sql_type").as[String].head()
    assert(widened.startsWith("varchar(6)"), s"expected widened varchar(6), got $widened")
    // and without autoAdjust the same violation is the typed error
    intercept[errors.InsufficientColumnSize](
      store.insert("t", Seq((3, "waytoolong")).toDF("k", "v")))
  }

  test("bench bootstrap clone: identical store-derived bootstraps hit, divergent state misses") {
    // arm the cache the way graft.Bench does (Verify never does)
    val cacheRoot = java.nio.file.Files.createTempDirectory("graft_r15opt_clone_")
    sys.props(graft.store.BenchBootstrapClone.PropKey) = cacheRoot.toString
    try {
      def mkStore(i: Int) = new TableStore(spark,
        // same tag, distinct nanoTime suffix — the normalized-key shape
        // the 2nd/3rd timed run of one entry produces
        java.nio.file.Files.createTempDirectory("x").toString +
          s"/clonespec_${System.nanoTime()}")
      val rows = Seq((1, "A", 10L), (2, "A", 20L), (3, "B", 5L)).toDF("k", "g", "v")
      // the base rides the clone cache too (as bench entries do via
      // bootstrapBase) — a cloned base keeps its part-file NAMES, which
      // the summary key's store-state hash includes
      def mkBase(st: TableStore): Unit =
        graft.store.BenchBootstrapClone.intercept(st.rootDir, "base", rows, "pk=k")(
          st.createTableFromDataFrame("base", rows, Seq("k"), infer = false))
      def bootstrap(st: TableStore): Unit = {
        mkBase(st)
        val sum = graft.store.IncrementalAgg.summarize(st.readTable("base"), Seq("g"), "v")
        graft.store.BenchBootstrapClone.intercept(st.rootDir, "summary", sum, "pk=g")(
          st.createTableFromDataFrame("summary", sum, Seq("g"), infer = false))
        graft.store.IncrementalAgg.markMaintained(
          st, "base", "summary", st.snapshots("base").last._1)
      }
      val s1 = mkStore(1); bootstrap(s1)
      val s2 = mkStore(2); bootstrap(s2) // second run: summary must CLONE
      // content identical to a real bootstrap, and maintenance works on it
      val a = s1.readTable("summary", orderBy = Seq("g")).collect().map(_.toString).toSeq
      val b = s2.readTable("summary", orderBy = Seq("g")).collect().map(_.toString).toSeq
      assert(a == b && a.size == 2, s"cloned summary differs: $a vs $b")
      s2.delete("base", Seq(Tuple1(3)).toDF("k"))
      graft.store.IncrementalAgg.maintainToCurrent(s2, "base", "summary", Seq("g"), "v")
      val after = s2.readTable("summary", orderBy = Seq("g")).select("g").as[String].collect().toSeq
      assert(after == Seq("A"), s"fold over a cloned summary broke: $after")
      // divergent base STATE must miss: mutate base-3 BEFORE the summary
      // bootstrap — the state hash keys the difference, so the summary
      // reflects the mutated base, not the cached two-group bootstrap
      val s3 = mkStore(3)
      mkBase(s3) // cloned base — identical file names to s1/s2's …
      s3.delete("base", Seq(Tuple1(1), Tuple1(2)).toDF("k")) // … then diverge
      val sum3 = graft.store.IncrementalAgg.summarize(s3.readTable("base"), Seq("g"), "v")
      graft.store.BenchBootstrapClone.intercept(s3.rootDir, "summary", sum3, "pk=g")(
        s3.createTableFromDataFrame("summary", sum3, Seq("g"), infer = false))
      val g3 = s3.readTable("summary").select("g").as[String].collect().toSeq
      assert(g3 == Seq("B"), s"stale clone served for a mutated base: $g3")
      // frames differing only in an output ALIAS must miss (canonicalized
      // plans erase alias names — the schema term in the key carries them)
      val s4 = mkStore(4)
      graft.store.BenchBootstrapClone.intercept(s4.rootDir, "d1",
        rows.select(col("k"), col("g").as("tier")), "pk=k")(
        s4.createTableFromDataFrame("d1", rows.select(col("k"), col("g").as("tier")), Seq("k"), infer = false))
      graft.store.BenchBootstrapClone.intercept(s4.rootDir, "d2",
        rows.select(col("k"), col("g").as("cls")), "pk=k")(
        s4.createTableFromDataFrame("d2", rows.select(col("k"), col("g").as("cls")), Seq("k"), infer = false))
      assert(s4.readTable("d2").columns.toSeq == Seq("k", "cls"))
    } finally {
      sys.props.remove(graft.store.BenchBootstrapClone.PropKey)
      ()
    }
  }

  test("fork-free local filesystem is installed and status/permissions round-trip") {
    val conf = spark.sparkContext.hadoopConfiguration
    assert(graft.store.NioLocalFileSystem.installed(conf),
      "GraftSession.local must register graft.store.NioLocalFileSystem for file://")
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"), conf)
    val dir = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("graft_r15opt_fs_").toString, "sub")
    assert(fs.mkdirs(dir))
    val f = new org.apache.hadoop.fs.Path(dir, "x.bin")
    val out = fs.create(f); out.write(Array[Byte](1, 2, 3)); out.close()
    val perm = new org.apache.hadoop.fs.permission.FsPermission("640")
    fs.setPermission(f, perm)
    val st = fs.getFileStatus(f)
    assert(!st.isDirectory && st.getLen == 3)
    assert(st.getPermission.toShort == perm.toShort,
      s"NIO-written permission must read back: ${st.getPermission} vs $perm")
    val listed = fs.listStatus(dir).map(_.getPath.getName).toSet
    assert(listed.contains("x.bin"))
    intercept[java.io.FileNotFoundException](
      fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, "missing")))
  }
}

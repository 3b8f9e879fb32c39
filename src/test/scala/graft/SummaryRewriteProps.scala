package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.plans.SummaryRewrite
import graft.store.{IncrementalAgg, TableStore}

/** ScalaCheck property for the C44 summary-routing optimizer rule:
  * under RANDOM mutation/maintenance interleavings, and across the
  * answerable query shapes (bare rollup, group-column-filtered
  * rollup, decimal avg, global rollup, served-aggregate HAVING,
  * FILTER-clause cells), the rewrite must fire EXACTLY when the
  * durable watermark sits at the base's current generation — and the
  * served rows must always equal the plain aggregate's, whether the
  * plan read the summary or the base. A rule that ever serves a stale
  * summary, or whose avg/filter translation drifts by one rounding
  * ulp, fails here. Sample count is small: every sample drives real
  * store commits and query compiles. */
object SummaryRewriteProps extends Properties("SummaryRewrite") {
  import SparkTestSession.spark
  import spark.implicits._

  // 6 samples over 10 query shapes (r14 added join/grouping-sets/semi,
  // r15 the fact-preserved left outer):
  // each sample drives real store commits, so the count stays small —
  // the deterministic specs cover every shape exhaustively; this suite
  // exists for the INTERLEAVINGS
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  // one step: an upsert batch or a key-delete set, then maintenance or
  // not — unflagged commits leave the summary stale on purpose
  private val stepGen: Gen[(Either[Map[Int, (String, Double)], Set[Int]], Boolean)] =
    Gen.zip(
      Gen.oneOf(
        Gen.choose(1, 5).flatMap(n =>
          Gen.listOfN(n, Gen.zip(Gen.choose(0, 6),
            Gen.zip(Gen.oneOf("a", "b", "c"),
              // denominators that force non-terminating quotients and
              // half-at-scale-6 boundaries through the avg path
              Gen.choose(1, 999).map(_ / 8.0))))
            .map(l => Left(l.toMap))),
        Gen.choose(1, 4).flatMap(n =>
          Gen.listOfN(n, Gen.choose(0, 6)).map(l => Right(l.toSet)))),
      Gen.oneOf(true, false))

  private val opsGen: Gen[List[(Either[Map[Int, (String, Double)], Set[Int]], Boolean)]] =
    Gen.choose(1, 4).flatMap(Gen.listOfN(_, stepGen))

  // "fired" = the fact/base table is not scanned and the summary is —
  // join shapes legitimately ALSO scan the dim table
  private def scansSummaryOnly(df: DataFrame): Boolean = {
    val paths = df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten
    paths.nonEmpty && !paths.exists(_.contains("/base/")) &&
      paths.exists(_.contains("summary"))
  }

  property("rewrite fires iff fresh; rows ≡ plain aggregate on every shape") =
    Prop.forAll(opsGen, Gen.choose(0, 9)) { (ops, shape) =>
      val store = new TableStore(spark,
        Files.createTempDirectory("graft_srwprop_").toString)
      store.createTableFromDataFrame("base",
        Seq((0, "a", 1.0), (1, "b", 2.0)).toDF("k", "g", "v"),
        Seq("k"), infer = false)
      store.createTableFromDataFrame("dim",
        Seq(("a", "east"), ("b", "west"), ("c", "east")).toDF("g", "attr"),
        Seq.empty, infer = false)
      store.createTableFromDataFrame("summary",
        IncrementalAgg.summarize(store.readTable("base"), Seq("g"), "v"),
        Seq("g"), infer = false)
      IncrementalAgg.markMaintained(store, "base", "summary",
        store.snapshots("base").last._1)
      SummaryRewrite.register(spark, store, "base", "summary", Seq("g"), "v")
      try {
        def query: DataFrame = shape match {
          case 0 => store.readTable("base").groupBy("g")
            .agg(count(lit(1)).as("n_rows"),
              sum(col("v").cast(DecimalType(18, 2))).as("sum_val"))
          case 1 => store.readTable("base").filter(col("g") =!= "c").groupBy("g")
            .agg(count(lit(1)).as("n_rows"),
              sum(col("v").cast(DecimalType(18, 2))).as("sum_val"))
          case 2 => store.readTable("base").groupBy("g")
            .agg(avg(col("v").cast(DecimalType(18, 2))).as("m"))
          case 3 => store.readTable("base") // GLOBAL: subset-rollup path
            .agg(count(lit(1)).as("n_rows"),
              sum(col("v").cast(DecimalType(18, 2))).as("sum_val"),
              avg(col("v").cast(DecimalType(18, 2))).as("m"))
          case 4 => store.readTable("base").groupBy("g") // C44n HAVING mix
            .agg(count(lit(1)).as("n_rows"),
              sum(col("v").cast(DecimalType(18, 2))).as("sum_val"))
            .filter(col("n_rows") >= 2 && col("g") =!= "c")
          case 5 => store.readTable("base") // C44l FILTER cells, global grain
            .agg(expr("sum(cast(v as decimal(18,2))) FILTER (WHERE g = 'a')").as("sum_a"),
              expr("count(1) FILTER (WHERE g <> 'b')").as("n_not_b"),
              count(lit(1)).as("n_rows"))
          case 6 => // C44r star: group by the dim attribute
            val f = store.readTable("base"); val d = store.readTable("dim")
            f.join(d, f("g") === d("g")).groupBy("attr")
              .agg(count(lit(1)).as("n_rows"),
                sum(col("v").cast(DecimalType(18, 2))).as("sum_val"),
                avg(col("v").cast(DecimalType(18, 2))).as("m"))
              .withColumnRenamed("attr", "g") // rows() orders by g
          case 7 => store.readTable("base").rollup("g") // C44s grouping sets
            .agg(count(lit(1)).as("n_rows"),
              sum(col("v").cast(DecimalType(18, 2))).as("sum_val"))
          case 8 => // C44r-b EXISTS gate
            val f = store.readTable("base"); val d = store.readTable("dim")
            f.join(d.filter(col("attr") === "east"), f("g") === d("g"), "left_semi")
              .groupBy("g")
              .agg(count(lit(1)).as("n_rows"),
                sum(col("v").cast(DecimalType(18, 2))).as("sum_val"))
          case _ => // r15 fact-preserved LEFT OUTER (filtered dim →
            // groups with g=b go unmatched and survive null-padded)
            val f = store.readTable("base"); val d = store.readTable("dim")
            f.join(d.filter(col("attr") === "east"), f("g") === d("g"), "left")
              .groupBy("attr")
              .agg(count(lit(1)).as("n_rows"),
                sum(col("v").cast(DecimalType(18, 2))).as("sum_val"))
              .withColumnRenamed("attr", "g")
        }
        def rows(df: DataFrame): Seq[String] =
          (if (df.columns.contains("g")) df.orderBy(asc_nulls_first("g")) else df)
            .collect().toSeq.map(_.toString)
        val checks = (ops :+ (Right(Set.empty[Int]), true)).map { case (op, maintain) =>
          op match {
            case Left(ups) =>
              store.upsert("base",
                ups.toSeq.map { case (k, (g, v)) => (k, g, v) }.toDF("k", "g", "v"))
            case Right(dels) if dels.nonEmpty =>
              store.delete("base", dels.toSeq.toDF("k"))
            case _ => ()
          }
          if (maintain)
            IncrementalAgg.maintainToCurrent(store, "base", "summary", Seq("g"), "v")
          val expectFresh = store.properties("summary")
            .get("graft.maint.base.applied").map(_.toInt)
            .contains(store.snapshots("base").last._1)
          val q = query
          val fired = scansSummaryOnly(q)
          val got = rows(q)
          SummaryRewrite.unregister(store, "base")
          val want = rows(query)
          SummaryRewrite.register(spark, store, "base", "summary", Seq("g"), "v")
          ((fired == expectFresh) :|
            s"rewrite fired=$fired but fresh=$expectFresh after $op (shape $shape)") &&
            ((got == want) :|
              s"served rows diverged after $op (shape $shape, fired=$fired): $got vs $want")
        }
        checks.reduce(_ && _)
      } finally SummaryRewrite.unregister(store, "base")
    }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mutations

/** Pins the merge/update semantics the reference's tests pin
  * (tests/test_core/test_write/test_merge.py, test_update.py), on the
  * doctest scenario from merge.py:44-89. */
class MutationsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def target = Seq(
    (0, "A", 3, "a"),
    (1, "B", 4, "b")).toDF("PK", "State", "ColumnA", "ColumnB")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("PK").collect().toSeq

  test("update by key overwrites only source-provided columns") {
    val src = Seq((1, 9)).toDF("PK", "ColumnA")
    val out = Mutations.update(target, src, Seq("PK"))
    assert(rows(out) == Seq(Row(0, "A", 3, "a"), Row(1, "B", 9, "b")))
  }

  test("update ignores source rows with no match") {
    val src = Seq((7, 9)).toDF("PK", "ColumnA")
    assert(rows(Mutations.update(target, src, Seq("PK"))) == rows(target))
  }

  test("merge: update matched, insert new, delete not-matched-by-source") {
    // reference merge.py doctest: delete PK=0, update PK=1, insert PK=2
    val src = Seq((1, "B", 5, "b"), (2, "C", 6, "d")).toDF("PK", "State", "ColumnA", "ColumnB")
    val out = Mutations.merge(target, src, Seq("PK"))
    assert(rows(out) == Seq(Row(1, "B", 5, "b"), Row(2, "C", 6, "d")))
  }

  test("upsert never deletes") {
    val src = Seq((1, "B", 10, "x"), (4, "E", 0, "y")).toDF("PK", "State", "ColumnA", "ColumnB")
    val out = Mutations.upsert(target, src, Seq("PK"))
    assert(rows(out) == Seq(Row(0, "A", 3, "a"), Row(1, "B", 10, "x"), Row(4, "E", 0, "y")))
  }

  test("deleteRequires keeps unmatched rows whose guard value is absent from source") {
    // reference merge.py doctest: PK=2 (State=C) survives because C is
    // not among the source's State values
    val t2 = Seq((1, "B", 5, "b"), (2, "C", 6, "d")).toDF("PK", "State", "ColumnA", "ColumnB")
    val src = Seq((1, "B", 6, "d"), (3, "D", 6, "d")).toDF("PK", "State", "ColumnA", "ColumnB")
    val out = Mutations.merge(t2, src, Seq("PK"), deleteRequires = Seq("State"))
    assert(rows(out) == Seq(Row(1, "B", 6, "d"), Row(2, "C", 6, "d"), Row(3, "D", 6, "d")))
  }

  test("deleteRequires deletes unmatched rows whose guard value IS in source") {
    val t2 = Seq((1, "B", 5, "b"), (2, "B", 6, "d")).toDF("PK", "State", "ColumnA", "ColumnB")
    val src = Seq((1, "B", 7, "z")).toDF("PK", "State", "ColumnA", "ColumnB")
    val out = Mutations.merge(t2, src, Seq("PK"), deleteRequires = Seq("State"))
    assert(rows(out) == Seq(Row(1, "B", 7, "z")))
  }

  test("merge on composite match columns (reference test_merge_two_match_columns)") {
    // match on (PK, State): delete (0,A), update (1,B), insert (2,C)
    val src = Seq((1, "B", 5, "b"), (2, "C", 6, "d")).toDF("PK", "State", "ColumnA", "ColumnB")
    val out = Mutations.merge(target, src, Seq("PK", "State"))
    assert(rows(out) == Seq(Row(1, "B", 5, "b"), Row(2, "C", 6, "d")))
    // timestamps land on the right rows
    val clock = lit("2026-01-01 00:00:00").cast(org.apache.spark.sql.types.TimestampNTZType)
    val ts = Mutations.merge(target, src, Seq("PK", "State"),
      timeInsert = Some(clock), timeUpdate = Some(clock))
      .select("PK", "_time_insert", "_time_update").orderBy("PK").collect()
      .map(r => (r.getInt(0), !r.isNullAt(1), !r.isNullAt(2))).toSeq
    assert(ts == Seq((1, false, true), (2, true, false)))
  }

  test("merge on a non-PK match column updates every matching row") {
    // reference test_merge_non_pk_column: match on State
    val t2 = Seq(("A", 3, "a"), ("B", 4, "b")).toDF("State", "ColumnA", "ColumnB")
    val src = Seq(("B", 9, "z")).toDF("State", "ColumnA", "ColumnB")
    val out = Mutations.merge(t2, src, Seq("State"))
    assert(out.orderBy("State").collect().toSeq == Seq(Row("B", 9, "z")))
  }

  test("deleteRequires with upsert is rejected") {
    assertThrows[IllegalArgumentException](
      Mutations.merge(target, target, Seq("PK"), upsertOnly = true, deleteRequires = Seq("State")))
  }

  test("metadata timestamps: _time_insert on inserted, _time_update on matched") {
    val clock = lit("2026-01-01 00:00:00").cast(TimestampType)
    val src = Seq((1, "B", 5, "b"), (2, "C", 6, "d")).toDF("PK", "State", "ColumnA", "ColumnB")
    val out = Mutations.merge(target, src, Seq("PK"),
      timeInsert = Some(clock), timeUpdate = Some(clock))
      .select("PK", "_time_insert", "_time_update").orderBy("PK")
    val got = out.collect().map(r => (r.getInt(0), r.isNullAt(1), r.isNullAt(2))).toSeq
    // PK=1 matched: no _time_insert (was null), has _time_update
    // PK=2 inserted: has _time_insert, no _time_update
    assert(got == Seq((1, true, false), (2, false, true)))
  }

  test("missing match column in source fails fast") {
    assertThrows[errors.DataFrameColumnDoesNotExist](
      Mutations.update(target, Seq(1).toDF("Other"), Seq("PK")))
  }

  test("scd2: changed keys close+reopen, unchanged no-op, replay idempotent") {
    import org.apache.spark.sql.types.TimestampNTZType
    def clk(s: String) = lit(s).cast(TimestampNTZType)
    val empty = Seq.empty[(Int, String, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("PK", "State", Mutations.ValidFrom, Mutations.ValidTo)
      .select(col("PK"), col("State"),
        col(Mutations.ValidFrom).cast(TimestampNTZType).as(Mutations.ValidFrom),
        col(Mutations.ValidTo).cast(TimestampNTZType).as(Mutations.ValidTo))
    val load = Mutations.scd2Upsert(empty, Seq((0, "A"), (1, "B")).toDF("PK", "State"), Seq("PK"), clk("2025-01-01 00:00:00"))
    assert(load.count() == 2 && load.filter(col(Mutations.ValidTo).isNull).count() == 2)

    // delta: PK 0 changes, PK 1 unchanged, PK 2 new
    val v2 = Mutations.scd2Upsert(load,
      Seq((0, "A2"), (1, "B"), (2, "C")).toDF("PK", "State"), Seq("PK"), clk("2026-01-01 00:00:00"))
    val got = v2.orderBy("PK", Mutations.ValidFrom)
      .select("PK", "State", Mutations.ValidTo).collect()
      .map(r => (r.getInt(0), r.getString(1), r.isNullAt(2))).toSeq
    assert(got == Seq(
      (0, "A", false), (0, "A2", true),   // closed + successor
      (1, "B", true),                     // untouched
      (2, "C", true)))                    // new key

    // exact replay at a later clock: history must not grow
    val v3 = Mutations.scd2Upsert(v2,
      Seq((0, "A2"), (1, "B"), (2, "C")).toDF("PK", "State"), Seq("PK"), clk("2027-01-01 00:00:00"))
    assert(v3.count() == v2.count())
    // a source NOT mentioning a key leaves its current row open
    val v4 = Mutations.scd2Upsert(v3, Seq((2, "C2")).toDF("PK", "State"), Seq("PK"), clk("2028-01-01 00:00:00"))
    assert(v4.filter(col("PK") === 1 && col(Mutations.ValidTo).isNull).count() == 1)
    assert(v4.filter(col("PK") === 2).count() == 2)
  }

  test("applyChanges: per-row verdicts — update, insert, delete, absent-key delete no-op, unmentioned kept") {
    val src = Seq(
      (1, "B", 9, "x", false),  // matched, live → update
      (2, "C", 6, "d", false),  // unmatched, live → insert
      (0, "A", 0, "?", true),   // matched, delete → row 0 goes
      (7, "Z", 0, "?", true))   // unmatched, delete → no-op
      .toDF("PK", "State", "ColumnA", "ColumnB", "__del")
    val out = Mutations.applyChanges(target, src, Seq("PK"), "__del")
    assert(rows(out) == Seq(Row(1, "B", 9, "x"), Row(2, "C", 6, "d")))
  }

  test("applyChanges: unlike merge, target rows the source does not mention survive") {
    val src = Seq((1, "B", 9, "x", false)).toDF("PK", "State", "ColumnA", "ColumnB", "__del")
    val out = Mutations.applyChanges(target, src, Seq("PK"), "__del")
    assert(rows(out) == Seq(Row(0, "A", 3, "a"), Row(1, "B", 9, "x")))
  }

  test("duplicate source keys raise the named error on every keyed mutation (reference MERGE semantics)") {
    import java.nio.file.Files
    import graft.store.TableStore
    val store = new TableStore(spark, Files.createTempDirectory("graft_dup_").toString)
    store.createTableFromDataFrame("t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"), infer = false)
    val dup = Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("k", "v")
    // every keyed mutation surface raises the NAMED error, not a raw
    // Spark task failure — and the table is unchanged afterwards
    intercept[errors.DuplicateSourceKey] { store.update("t", dup) }
    intercept[errors.DuplicateSourceKey] { store.upsert("t", dup) }
    intercept[errors.DuplicateSourceKey] { store.merge("t", dup) }
    intercept[errors.DuplicateSourceKey] {
      store.applyChanges("t", dup.withColumn("__dead", lit(false)), "__dead")
    }
    assert(store.readTable("t").count() == 2,
      "a failed mutation must not commit")
    // a dup key that matches NO target row still raises (dup inserts
    // would grow the table just the same)
    val dupNew = Seq((9L, "x"), (9L, "y")).toDF("k", "v")
    intercept[errors.DuplicateSourceKey] { store.upsert("t", dupNew) }
    // scd2 guards too
    intercept[errors.DuplicateSourceKey] {
      store.scd2("t", dup, clock = to_timestamp(lit("2026-01-01 00:00:00")))
    }
    // duplicate-free sources still work end-to-end
    store.upsert("t", Seq((1L, "x"), (3L, "z")).toDF("k", "v"))
    assert(store.readTable("t", orderBy = Seq("k")).collect().map(_.getString(1)).toSeq ==
      Seq("x", "b", "z"))
    // an EMPTY target must not elide the guard: the optimizer's
    // empty-relation propagation deletes update's whole left join
    // (source side included), so without the guard-keeper branch the
    // duplicates silently pass — found by the r13 MutationsProps run
    val e0 = intercept[Throwable] {
      Mutations.update(
        Seq.empty[(Long, String)].toDF("k", "v"), dup, Seq("k")).collect()
    }
    assert(Iterator.iterate(e0)(_.getCause).takeWhile(_ != null).take(20)
        .exists(x => x.getMessage != null && x.getMessage.contains(Mutations.DupKeyMsg)),
      s"empty-target update must still raise the dup guard: $e0")
  }

  test("several NULL-key source rows raise the PK null error, not DuplicateSourceKey") {
    import java.nio.file.Files
    import graft.store.TableStore
    val store = new TableStore(spark, Files.createTempDirectory("graft_nullk_").toString)
    store.createTableFromDataFrame("t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"), infer = false)
    // a null-key source row can never match (===), so in an
    // insert-capable mutation it would become a NULL-PK insert — the
    // accurate error is the PK non-null contract, NOT DuplicateSourceKey
    // (GROUP BY collapsing the null keys is a grouping artifact)
    val nulls = Seq((Option.empty[Long], "x"), (Option.empty[Long], "y"))
      .toDF("k", "v")
    val e = intercept[errors.InvalidValue] { store.upsert("t", nulls) }
    assert(e.getMessage.contains("NULL match key"), e.getMessage)
    intercept[errors.InvalidValue] { store.merge("t", nulls) }
    // even a SINGLE null-key row raises on the insert-capable paths —
    // it cannot match, so it IS a null-PK insert
    val oneNull = Seq((Option.empty[Long], "z")).toDF("k", "v")
    intercept[errors.InvalidValue] { store.upsert("t", oneNull) }
    assert(store.readTable("t").count() == 2, "a failed mutation must not commit")
    // update IGNORES null-key rows by contract (SQL UPDATE ... FROM: a
    // null key matches nothing) — explicitly dropped, deterministic
    store.update("t", nulls)
    assert(store.readTable("t", orderBy = Seq("k")).collect()
      .map(_.getString(1)).toSeq == Seq("a", "b"), "null-key update rows are no-ops")
    // a null key alongside a real duplicate: both named errors are
    // correct (whichever task's assert fires first), never a raw one
    val mixed = Seq((Some(7L), "x"), (Some(7L), "y"),
      (Option.empty[Long], "z")).toDF("k", "v")
    val err = intercept[GraftException] { store.upsert("t", mixed) }
    assert(err.isInstanceOf[errors.DuplicateSourceKey] ||
      err.isInstanceOf[errors.InvalidValue])
  }
}

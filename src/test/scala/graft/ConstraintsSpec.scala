package graft

import org.apache.spark.sql.functions._
import graft.constraints.Constraints._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("validate finds nulls, dups, orphans, check and unique violations") {
    val parent = Seq(1, 2).toDF("pid")
    val df = Seq(
      (Some(1), 1, 20, "a"),
      (Some(1), 2, 21, "b"),   // dup pk
      (None, 1, 22, "c"),      // null pk
      (Some(3), 9, 17, "a")    // orphan fk, check violation, dup name
    ).toDF("id", "pid", "age", "name")
    val vs = validate(df, Seq(
      PrimaryKey(Seq("id")),
      ForeignKey(Seq("pid"), "parent", Seq("pid"), Cascade),
      Check("age>18", col("age") > 18),
      Unique(Seq("name"))), _ => parent)
    val m = vs.map(v => v.constraint -> v.count).toMap
    m("pk-null(id)") shouldBe 1
    m("pk-dup(id)") shouldBe 1
    m("fk(pid→parent)") shouldBe 1
    m("check(age>18)") shouldBe 1
    m("unique-dup(name)") shouldBe 1
  }

  test("auditReport mirrors the reference dashboard shape") {
    val parent = Seq(1).toDF("pid")
    val df = Seq((1, 1), (1, 1), (2, 9)).toDF("id", "pid")
    val report = auditReport(df, Seq("id"), Seq((Seq("pid"), parent, Seq("pid"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    report("duplicate_pk") shouldBe 1
    report("null_pk") shouldBe 0
    report("orphan_fk_0") shouldBe 1
  }

  test("applyDefaults fills only NULLs") {
    val df = Seq((1, Some(true)), (2, None: Option[Boolean])).toDF("id", "prime")
    val out = applyDefaults(df, Seq(Default("prime", lit(false))))
      .orderBy("id").collect().map(_.getBoolean(1))
    out.toSeq shouldBe Seq(true, false)
  }
}

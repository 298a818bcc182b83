package graft.constraints

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative constraint registry + checker (SURVEY.md §2.8): Spark has no
  * enforced constraints, so the reference's PK/FK/UNIQUE/CHECK/NOT NULL/
  * DEFAULT semantics become a validation layer the DML engine
  * ([[graft.sources.TableStore]]) consults on write, plus an audit suite
  * mirroring the reference's dashboards (TablesCreated-Imported
  * .sql:1139-1176).
  *
  * Every check is a distributed aggregate / anti-join — no driver-side
  * row iteration, so validation scales with the cluster.
  */
object Constraints {

  sealed trait OnDelete
  case object Cascade extends OnDelete  // reference TC:53 orders→customers
  case object SetNull extends OnDelete  // reference TC:36 products→suppliers
  case object Restrict extends OnDelete // reference AT:338 subcategories→categories

  sealed trait Constraint { def name: String }
  final case class PrimaryKey(cols: Seq[String]) extends Constraint {
    def name = s"pk(${cols.mkString(",")})"
  }
  final case class ForeignKey(cols: Seq[String], refTable: String,
                              refCols: Seq[String], onDelete: OnDelete) extends Constraint {
    def name = s"fk(${cols.mkString(",")}→$refTable)"
  }
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name = s"unique(${cols.mkString(",")})"
  }
  final case class Check(label: String, predicate: Column) extends Constraint {
    def name = s"check($label)"
  }
  final case class NotNullCol(colName: String) extends Constraint {
    def name = s"notnull($colName)"
  }
  /** Fill-on-insert default (reference All-Tasks-of-SQL.sql:141-149). */
  final case class Default(colName: String, value: Column) extends Constraint {
    def name = s"default($colName)"
  }

  final case class Violation(constraint: String, rows: DataFrame, count: Long)

  /** Validate a frame against constraints; FK parents resolved by name. */
  def validate(df: DataFrame, constraints: Seq[Constraint],
               parents: String => DataFrame): Seq[Violation] =
    constraints.flatMap {
      case PrimaryKey(cols) =>
        val nulls = df.filter(cols.map(col(_).isNull).reduce(_ || _))
        val dups = df.groupBy(cols.map(col): _*).count().filter(col("count") > 1)
        Seq(check(s"pk-null(${cols.mkString(",")})", nulls),
          check(s"pk-dup(${cols.mkString(",")})", dups)).flatten
      case Unique(cols) =>
        check(s"unique-dup(${cols.mkString(",")})",
          df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
            .groupBy(cols.map(col): _*).count().filter(col("count") > 1))
      case fk @ ForeignKey(cols, refTable, refCols, _) =>
        val parent = parents(refTable).select(refCols.map(col): _*).toDF(cols: _*)
        val orphans = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
          .join(parent, cols, "left_anti")
        check(fk.name, orphans)
      case c @ Check(_, pred) => check(c.name, df.filter(!pred || pred.isNull))
      case NotNullCol(c) => check(s"notnull($c)", df.filter(col(c).isNull))
      case Default(_, _) => None // write-time fill, not a validation
    }

  private def check(name: String, rows: DataFrame): Option[Violation] = {
    val n = rows.count()
    if (n > 0) Some(Violation(name, rows, n)) else None
  }

  /** Apply Default constraints to an incoming batch (fill NULLs). */
  def applyDefaults(df: DataFrame, constraints: Seq[Constraint]): DataFrame =
    constraints.foldLeft(df) {
      case (acc, Default(c, v)) => acc.withColumn(c, coalesce(col(c), v))
      case (acc, _) => acc
    }

  /** The reference's audit dashboard (TC:1139-1176) for one table. */
  def auditReport(df: DataFrame, pk: Seq[String],
                  fks: Seq[(Seq[String], DataFrame, Seq[String])]): DataFrame = {
    val dupPk = df.groupBy(pk.map(col): _*).count().filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L)).as("n")).withColumn("audit", lit("duplicate_pk"))
    val nullPk = df.filter(pk.map(col(_).isNull).reduce(_ || _))
      .agg(count(lit(1)).as("n")).withColumn("audit", lit("null_pk"))
    val orphanChecks = fks.zipWithIndex.map { case ((cols, parent, refCols), i) =>
      df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
        .join(parent.select(refCols.map(col): _*).toDF(cols: _*), cols, "left_anti")
        .agg(count(lit(1)).as("n")).withColumn("audit", lit(s"orphan_fk_$i"))
    }
    (Seq(dupPk, nullPk) ++ orphanChecks).reduce(_ unionByName _).select("audit", "n")
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text primitives for the training-data-pipeline operators (tokenize,
  * shingle, hash). Pure built-in-function compositions — everything stays
  * in WholeStageCodegen; no UDFs.
  *
  * Cross-engine notes: token/shingle formulas are written 1-based
  * (`element_at`) so the DuckDB oracles (1-based lists) are literal
  * transliterations.
  */
object TextFunctions {

  /** Whitespace tokenization: split on single space after trim (documents
    * are single-spaced; both engines keep interior empties identically). */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Word n-gram shingles over a `toks` array column (n fixed at call
    * site). Empty array when the doc is shorter than n tokens. */
  def shingles3(toksCol: String): Column =
    when(size(col(toksCol)) >= 3,
      expr(s"transform(sequence(1, size($toksCol)-2), i -> " +
        s"concat_ws(' ', element_at($toksCol,i), element_at($toksCol,i+1), element_at($toksCol,i+2)))"))
      .otherwise(expr("cast(array() as array<string>)"))

  /** 60-bit token hash: first 15 hex chars of md5, as a long. 60 bits keeps
    * the value positive in an int64 on both engines. */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** BPE-ish token pieces: letter runs, digit runs, single punctuation. */
  val PieceRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Per-language function-word lists for the n-gram language-ID
    * heuristic. Tiny on purpose: broadcast-able constant, no shuffle. */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "que", "de", "los", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有"))

  def stopHits(toksCol: String, words: Seq[String]): Column = {
    val list = words.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter($toksCol, x -> x IN ($list)))")
  }

  def stopHitsSql(toksExpr: String, words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksExpr, x -> x IN ($list)))"
  }
}

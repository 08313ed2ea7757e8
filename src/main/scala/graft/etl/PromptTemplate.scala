package graft.etl

import org.apache.spark.sql.Row

/** Prompt templating (SURVEY.md O12; `/root/reference/etl.py:316-323`):
  * interpolate `{field}` placeholders from a flattened row into the
  * per-row prompt. Missing field → None, mirroring the reference's
  * KeyError → None handling.
  */
object PromptTemplate {

  private val Placeholder = """\{(\w+)\}""".r

  def fields(template: String): Seq[String] =
    Placeholder.findAllMatchIn(template).map(_.group(1)).toSeq.distinct

  def format(template: String, values: Map[String, String]): Option[String] = {
    val needed = fields(template)
    if (needed.forall(values.contains))
      Some(Placeholder.replaceAllIn(template,
        m => java.util.regex.Matcher.quoteReplacement(values(m.group(1)))))
    else None // KeyError semantics, etl.py:322-323
  }

  def formatRow(template: String, row: Row): Option[String] = {
    val values = row.schema.fieldNames.zipWithIndex.collect {
      case (name, i) if !row.isNullAt(i) && row.get(i).isInstanceOf[String] =>
        name -> row.getString(i)
    }.toMap
    format(template, values)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boilerplate-stripping article extraction — the trafilatura stand-in
  * (reference data_pipeline/tasks/extraction.py:341 `extract()` for the
  * main text, :361-374 `extract_metadata()` for
  * title/author/sitename/date, with `if not article or not meta` →
  * DEFAULT_ARTICLE_DATA, i.e. every field null).
  *
  * The stand-in is a pure expression pipeline over the raw HTML string:
  * main text = the `<p>` blocks joined by blank lines, metadata pulled
  * from `<title>` and `<meta>` tags by anchored regexes. If either the
  * main text or the title is missing, the whole row degrades to the
  * all-null default — the reference's failure contract. (A production
  * extractor adds boilerplate heuristics; the operator shape — regex
  * field extraction fanned over a corpus, total, never throwing — is
  * what the engine contributes.)
  *
  * No UDFs: every field is a codegen'd built-in expression, so the
  * operator is embarrassingly parallel and scan-fusible at 100 TB.
  */
object Extraction {

  private def nonEmpty(c: Column): Column = when(length(c) > 0, c)

  /** (key, headline, author, publisher, content, published_at,
    * n_paragraphs) — all metadata fields null and n_paragraphs null when
    * extraction fails (no main text or no title).
    */
  def extractArticle(df: DataFrame, key: Column, html: Column): DataFrame = {
    val paras = regexp_extract_all(html, lit("<p>(.*?)</p>"), lit(1))
    val content = nonEmpty(array_join(paras, "\n\n"))
    val headline = nonEmpty(regexp_extract(html, "<title>(.*?)</title>", 1))
    val author = nonEmpty(regexp_extract(html,
      "<meta name=\"author\" content=\"([^\"]*)\"", 1))
    val publisher = nonEmpty(regexp_extract(html,
      "<meta property=\"og:site_name\" content=\"([^\"]*)\"", 1))
    val published = nonEmpty(regexp_extract(html,
      "<meta property=\"article:published_time\" content=\"([^\"]*)\"", 1))
    val ok = content.isNotNull && headline.isNotNull
    df.select(key.as("key"),
      when(ok, headline).as("headline"),
      when(ok, author).as("author"),
      when(ok, publisher).as("publisher"),
      when(ok, content).as("content"),
      when(ok, published).as("published_at"),
      when(ok, size(paras)).as("n_paragraphs"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The reference's three transform pipelines as lazy `DataFrame =>
  * DataFrame` plans (SURVEY.md §3; /root/reference/data_pipeline/tasks/
  * transformation.py). Each is total over missing/extra columns the way
  * the reference is (transformation.py:37-43) and no-ops on empty input.
  *
  * Every step is a Catalyst-planned projection/filter/window — the whole
  * pipeline collapses into a handful of codegen stages; the only
  * exchanges are the dedup shuffle (news/posts) and the fill window
  * shuffle (bars).
  */
object Transforms {

  private def dropIfPresent(df: DataFrame, cols: String*): DataFrame =
    df.drop(cols: _*) // Spark drop is already a no-op on missing columns

  private def renameIfPresent(df: DataFrame, renames: (String, String)*): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** na.fill restricted to columns that exist (the reference's transforms
    * are total over missing columns, transformation.py:37-43).
    */
  private def fillPresent(df: DataFrame, m: Map[String, Any]): DataFrame = {
    // skip missing columns AND untyped (VOID) ones — a column that is
    // all-NULL with no schema (e.g. from permissive JSON) can't be filled
    val fillable = df.schema.fields
      .filter(_.dataType != org.apache.spark.sql.types.NullType)
      .map(_.name).toSet
    df.na.fill(m.filter { case (k, _) => fillable.contains(k) })
  }

  /** News pipeline (transformation.py:13-78): P1 struct projection →
    * F2 defaults → F3 coalesce content → null-content drop → P2/P3
    * rename/drop → D1 url dedup (keep first by `ingestOrder`) → F1 clean →
    * F4 id → F6 timestamp parse.
    */
  def transformNews(df: DataFrame, ingestOrder: Column): DataFrame = {
    val withSource =
      if (df.columns.contains("source"))
        df.withColumn("source_name", col("source.name")).drop("source")
      else df
    val defaulted = fillPresent(withSource,
      Map("author" -> "No Author", "title" -> "Untitled Article"))
      .withColumn("content",
        Text.coalesceContent(col("content"), col("description"), col("title")))
      .filter(col("content").isNotNull)
    val renamed = renameIfPresent(
      dropIfPresent(defaulted, "urlToImage", "description"),
      "publishedAt" -> "published_at")
    val deduped = Dedup.keepFirst(renamed, Seq("url"), Seq(ingestOrder))
    deduped
      .withColumn("title_cleaned", Text.cleanTextForNlp(col("title")))
      .withColumn("content_cleaned", Text.cleanTextForNlp(col("content")))
      .withColumn("id", Text.deterministicId(col("url")))
      .withColumn("published_at", to_timestamp(col("published_at")))
  }

  /** Reddit-post pipeline (transformation.py:81-181): P2 renames → F9
    * category join → D2 composite dedup → P5 required-column drop → F2
    * defaults → P4 link-post filter → F1 clean → F4 ids → F7/F6 timestamps
    * → F5 casts.
    */
  def transformPosts(df: DataFrame, ingestOrder: Column): DataFrame = {
    val renamed = renameIfPresent(df,
      "selftext" -> "body_text",
      "num_comments" -> "number_of_comments",
      "url" -> "article_url",
      "link_flair_text" -> "subreddit_category",
      "permalink" -> "reddit_post_url")
    val joinedCats =
      if (renamed.columns.contains("article_category"))
        renamed.withColumn("article_category", Text.joinCategories(col("article_category")))
      else renamed
    val deduped =
      Dedup.keepFirst(joinedCats, Seq("reddit_id", "reddit_post_url"), Seq(ingestOrder))
    val required = deduped.na.drop("any", Seq("reddit_id", "subreddit", "published_at"))
    val defaulted = fillPresent(required,
      Map(
        "body_text" -> "No text", "score" -> 0, "number_of_comments" -> 0,
        "subreddit_category" -> "No category", "upvote_ratio" -> 0.5,
        "article_headline" -> "No Title", "article_author" -> "Unknown Author",
        "article_publisher" -> "Unknown Publisher",
        "article_content" -> "No Content"))
    // P4 (transformation.py:149): drop link posts with no article timestamp
    val filtered = defaulted.filter(
      !(col("is_text_post") === false &&
        (col("article_published_at").isNull || col("article_published_at") === "")))
    filtered
      .withColumn("title_cleaned", Text.cleanTextForNlp(col("title")))
      .withColumn("body_cleaned", Text.cleanTextForNlp(col("body_text")))
      .withColumn("id", Text.deterministicId(col("reddit_id")))
      .withColumn("published_at", Text.fromEpochSeconds(col("published_at")))
      .withColumn("article_published_at",
        to_timestamp(when(col("article_published_at") === "", null)
          .otherwise(col("article_published_at"))))
      .withColumn("score", col("score").cast("int"))
      .withColumn("number_of_comments", col("number_of_comments").cast("int"))
  }

  /** OHLCV bar pipeline (transformation.py:184-231): F6 timestamp parse →
    * F8 coerce numerics → W1 ffill → F2 zero-fill volumes → W2 bfill → P5
    * drop residual all-null-price rows → P2 rename. The explicit pandas
    * sort (O1) is subsumed by the window ordering; both fill passes share
    * one exchange.
    */
  def transformBars(df: DataFrame): DataFrame = {
    val priceCols = Seq("open", "high", "low", "close", "vwap")
      .filter(df.columns.contains)
    val countCols = Seq("volume", "trade_count").filter(df.columns.contains)
    val parsed = df.withColumn("timestamp", to_timestamp(col("timestamp")))
    val coerced = (priceCols ++ countCols).foldLeft(parsed) { (d, c) =>
      d.withColumn(c, Text.coerceDouble(col(c)))
    }
    val filled = Fill.fillColumns(
      coerced, Seq(col("symbol")), Seq(col("timestamp")), priceCols)
    val zeroed = filled.na.fill(0, countCols)
      .na.fill(0.0, countCols)
    val dropped = zeroed.na.drop("any", priceCols)
    countCols.foldLeft(renameIfPresent(dropped, "symbol" -> "ticker")) {
      (d, c) => d.withColumn(c, col(c).cast("long"))
    }
  }
}

package graft.schemas

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed warehouse schemas — the reference's four fixed SQLAlchemy tables
  * re-declared as Spark StructTypes + case classes (SURVEY.md §7.1).
  *
  * Reference: /root/reference/data_pipeline/models/article.py:15-81,
  * models/reddit_post.py:20-88, models/company.py:11-40,
  * models/stock_bar.py:17-58.
  *
  * Type mapping:
  *  - `UUID` primary keys → deterministic sha-256 hex strings
  *    (StringType) — same surrogate the pipelines already emit
  *    ([[graft.functions.Text.deterministicId]]).
  *  - `Numeric(12,4)` OHLCV prices (stock_bar.py:42-45,56) →
  *    `DecimalType(12,4)`, enforced at the sink boundary by [[conform]].
  *  - `DateTime(timezone=True)` → TimestampType (sessions run UTC).
  *  - `String(n)`/`Text` → StringType (length caps are a warehouse
  *    constraint, not a Spark type; [[conform]] can't express them and
  *    the reference's own loader never truncates).
  *
  * Unique constraints (article.url, reddit_post.reddit_id, company.name,
  * company.ticker, stock_bar (company_id, timestamp) —
  * stock_bar.py:20-22) are declared in [[uniqueKeys]] and checked
  * declaratively by [[uniquenessViolations]]: sinks dedup first
  * ([[graft.operators.Dedup.keepFirst]]) and tests assert the violation
  * frame is empty — no eager count in the operator path.
  */
object Warehouse {

  // -- case classes (Dataset[T] views of the warehouse tables) ----------

  /** models/article.py:15-81. */
  final case class Article(
      id: String,
      author: Option[String],
      title: String,
      content: Option[String],
      title_cleaned: String,
      content_cleaned: String,
      sentiment_strategy: Option[String],
      published_at: Timestamp,
      source_name: String,
      url: String,
      created_at: Timestamp,
      updated_at: Timestamp)

  /** models/reddit_post.py:20-88. */
  final case class RedditPost(
      id: String,
      article_id: Option[String],
      reddit_id: String,
      subreddit: String,
      author: Option[String],
      title: String,
      body_text: Option[String],
      score: Int,
      number_of_comments: Int,
      is_text_post: Boolean,
      subreddit_category: String,
      upvote_ratio: Double,
      published_at: Timestamp,
      reddit_post_url: String,
      created_at: Timestamp,
      updated_at: Timestamp)

  /** models/company.py:11-40. */
  final case class Company(
      id: String,
      name: String,
      ticker: String,
      created_at: Timestamp,
      updated_at: Timestamp)

  /** models/stock_bar.py:17-58. `Numeric(12,4)` → BigDecimal; the
    * authoritative sink type is `DecimalType(12,4)` in [[stockBarSchema]]
    * (the encoder's generic decimal is wider — conform on write).
    */
  final case class StockBar(
      id: String,
      company_id: String,
      timestamp: Timestamp,
      open_price: BigDecimal,
      high_price: BigDecimal,
      low_price: BigDecimal,
      close_price: BigDecimal,
      volume: Int,
      trade_count: Int,
      vwap: BigDecimal)

  implicit val articleEncoder: Encoder[Article]       = Encoders.product[Article]
  implicit val redditPostEncoder: Encoder[RedditPost] = Encoders.product[RedditPost]
  implicit val companyEncoder: Encoder[Company]       = Encoders.product[Company]
  implicit val stockBarEncoder: Encoder[StockBar]     = Encoders.product[StockBar]

  // -- sink-boundary StructTypes ----------------------------------------

  private val money = DecimalType(12, 4) // stock_bar.py:42-45 Numeric(12,4)

  val articleSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("author", StringType, nullable = true),
    StructField("title", StringType, nullable = false),
    StructField("content", StringType, nullable = true),
    StructField("title_cleaned", StringType, nullable = false),
    StructField("content_cleaned", StringType, nullable = false),
    StructField("sentiment_strategy", StringType, nullable = true),
    StructField("published_at", TimestampType, nullable = false),
    StructField("source_name", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false)))

  val redditPostSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("article_id", StringType, nullable = true),
    StructField("reddit_id", StringType, nullable = false),
    StructField("subreddit", StringType, nullable = false),
    StructField("author", StringType, nullable = true),
    StructField("title", StringType, nullable = false),
    StructField("body_text", StringType, nullable = true),
    StructField("score", IntegerType, nullable = false),
    StructField("number_of_comments", IntegerType, nullable = false),
    StructField("is_text_post", BooleanType, nullable = false),
    StructField("subreddit_category", StringType, nullable = false),
    StructField("upvote_ratio", DoubleType, nullable = false),
    StructField("published_at", TimestampType, nullable = false),
    StructField("reddit_post_url", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false)))

  val companySchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("ticker", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false)))

  val stockBarSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("company_id", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("open_price", money, nullable = false),
    StructField("high_price", money, nullable = false),
    StructField("low_price", money, nullable = false),
    StructField("close_price", money, nullable = false),
    StructField("volume", IntegerType, nullable = false),
    StructField("trade_count", IntegerType, nullable = false),
    StructField("vwap", money, nullable = false)))

  /** Declared unique constraints per table (the reference's
    * `unique=True` columns and `uq_symbol_timestamp`).
    */
  val uniqueKeys: Map[String, Seq[Seq[String]]] = Map(
    "articles"     -> Seq(Seq("id"), Seq("url")),
    "reddit_posts" -> Seq(Seq("id"), Seq("reddit_id")),
    "companies"    -> Seq(Seq("id"), Seq("name"), Seq("ticker")),
    "stock_bars"   -> Seq(Seq("id"), Seq("company_id", "timestamp")))

  // -- boundary enforcement ----------------------------------------------

  /** Conform a frame to a warehouse StructType: select the declared
    * columns in declared order, casting each to the declared type
    * (`Numeric(12,4)` prices land as DECIMAL(12,4) here, whatever the
    * upstream pipeline carried). A missing non-nullable column is a
    * schema error at plan time; a missing nullable column materializes
    * as NULL. Extra columns are dropped — the warehouse table is closed.
    *
    * Nullability in the declared schema is advisory: a cast projection
    * always yields nullable fields, and parquet round-trips everything
    * nullable anyway. Null-rejection is a declarative data check
    * ([[uniquenessViolations]]-style), not a plan-time invariant.
    *
    * Pure projection: no shuffle, stays inside whole-stage codegen.
    */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = schema.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else if (f.nullable) lit(null).cast(f.dataType).as(f.name)
      else throw new IllegalArgumentException(
        s"conform: required column '${f.name}' absent (have: ${df.columns.mkString(",")})")
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Declarative uniqueness-invariant check: the key tuples that violate
    * a unique constraint, with their multiplicity. Empty ⇔ the invariant
    * holds. One hash-aggregate over the key columns only — callers
    * (tests, sink guards) decide when to materialize it.
    */
  def uniquenessViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("multiplicity"))
      .filter(col("multiplicity") > 1)

  /** Declarative row-validation report — the Spark-native form of the
    * reference's Pydantic field validators (models/article.py:15-81,
    * stock_bar.py:17-58 reject rows field-by-field at load time). Each
    * rule is (name, predicate-that-must-hold); the report is ONE
    * partial/final aggregate over the whole frame — no per-rule pass,
    * no shuffle of the data itself — emitting (rule, n_violations,
    * n_rows). A 100 TB validation run costs one scan.
    */
  def validationReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    // rule names are interpolated into a stack() SQL expression below —
    // restrict them to identifier characters so a quote/space/dash can't
    // inject or mis-parse, and reject the empty list (stack(0) is a
    // parse error, and an empty report would read as "all rules pass")
    require(rules.nonEmpty, "validationReport: no rules given")
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"validationReport: rule name '$name' must match [A-Za-z0-9_]+")
    }
    // duplicate names would create two v_<name> aggregate aliases and an
    // ambiguous column reference inside stack() — fail here with the
    // offending names instead of an opaque AnalysisException later
    locally {
      val dups = rules.map(_._1).groupBy(identity).collect {
        case (n, occ) if occ.size > 1 => n
      }
      require(dups.isEmpty,
        s"validationReport: duplicate rule name(s): ${dups.mkString(", ")}")
    }
    val counts = df.agg(
      count(lit(1)).as("n_rows"),
      rules.map { case (name, pred) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"v_$name")
      }: _*)
    val ruleNames = rules.map(_._1)
    counts.select(
      expr(s"stack(${ruleNames.length}, " +
        ruleNames.map(n => s"'$n', v_$n").mkString(", ") +
        ") as (rule, n_violations)"),
      col("n_rows"))
  }

  /** Typed views — analyzer-checked upcast from the conformed frame to
    * the case-class Dataset (no runtime conversion until an action
    * deserializes; column ops on the Dataset stay codegen'd).
    */
  def asStockBars(df: DataFrame): Dataset[StockBar] =
    conform(df, stockBarSchema).as[StockBar]

  def asCompanies(df: DataFrame): Dataset[Company] =
    conform(df, companySchema).as[Company]

  def asArticles(df: DataFrame): Dataset[Article] =
    conform(df, articleSchema).as[Article]

  def asRedditPosts(df: DataFrame): Dataset[RedditPost] =
    conform(df, redditPostSchema).as[RedditPost]
}

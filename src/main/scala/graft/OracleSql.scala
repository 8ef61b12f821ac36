package graft

/** DuckDB oracle SQL for every entry in [[SparkEntry.queries]].
  *
  * Dialect notes (SURVEY.md §7.5):
  *  - DuckDB `regexp_replace` replaces only the FIRST match unless the 'g'
  *    flag is passed — Spark always replaces all, so every replace here
  *    carries 'g'.
  *  - Sums over doubles are cast to DECIMAL per row first: decimal
  *    addition is exact/associative, so aggregation order can't differ.
  *  - Integer sums are cast to BIGINT (DuckDB widens to HUGEINT).
  *  - Every query ends in a total ORDER BY matching the Spark side.
  */
object OracleSql {

  /** The clean_text_for_nlp chain (F1) in DuckDB RE2 dialect. */
  private def cleanExpr(c: String): String =
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace(lower(coalesce($c, '')), '<[^>]+>', '', 'g'), " +
      "'http\\S+|www\\S+|https\\S+', '', 'g'), " +
      "'\\[\\+\\d+ chars\\]', '', 'g'), " +
      "'[^\\w\\s.!?]', '', 'g'), " +
      "'\\s+', ' ', 'g'))"

  val sql: Map[String, String] = Map(
    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_rename_project" ->
      """SELECT event_id, ts AS event_ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_filter_compound" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |         WHEN o_orderkey % 7 = 0 THEN ''
        |         ELSE o_orderpriority END AS priority
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus, priority FROM o
        |WHERE NOT (o_orderstatus = 'F' AND (priority IS NULL OR priority = ''))
        |ORDER BY o_orderkey""".stripMargin,

    "q_null_defaults" ->
      """SELECT event_id,
        |  coalesce(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END, 0.0)
        |    AS filled_value,
        |  coalesce(CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END,
        |    'unknown') AS filled_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q_clean_text" ->
      s"""SELECT doc_id, ${cleanExpr("text")} AS cleaned
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_time_ops" ->
      """SELECT event_id,
        |  date_trunc('second', ts) AS ts_sec,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
        |  CAST(ts AS DATE) + 2 AS d_plus2
        |FROM events ORDER BY event_id""".stripMargin,

    "q_cast_coerce" ->
      """SELECT event_id,
        |  TRY_CAST(CASE WHEN event_id % 5 = 0 THEN 'junk'
        |    ELSE CAST(event_id AS VARCHAR) || '.25' END AS DOUBLE) AS parsed_d,
        |  TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'x'
        |    ELSE CAST(event_id AS VARCHAR) END AS INTEGER) AS parsed_i
        |FROM events ORDER BY event_id""".stripMargin,

    "q_dedup_first" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q_dedup_composite" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |      ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_orderkey, l_partkey""".stripMargin,

    "q_anti_join_new" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders e
        |  WHERE e.o_orderkey % 2 = 0 AND e.o_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_idempotent_append" ->
      """SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey""",

    "q_fk_resolve" ->
      """WITH c AS (
        |  SELECT l_partkey, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem),
        |ids AS (
        |  SELECT l_partkey,
        |    'N' || CAST(l_partkey AS VARCHAR) || '@' ||
        |    CAST(l_orderkey AS VARCHAR) || ':' ||
        |    CAST(l_linenumber AS VARCHAR) AS new_id
        |  FROM c WHERE rn = 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey AS article_url,
        |  CASE WHEN l.l_partkey % 3 = 0 THEN 'E' || CAST(l.l_partkey AS VARCHAR)
        |       ELSE i.new_id END AS article_id
        |FROM lineitem l JOIN ids i ON i.l_partkey = l.l_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "q_star_join" ->
      """SELECT r_name, n_name, month(o_orderdate) AS order_month,
        |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)))
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1, 2, 3
        |ORDER BY r_name, n_name, order_month""".stripMargin,

    "q_ffill_bfill" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_n
        |  FROM events)
        |SELECT event_id, user_id, ts,
        |  coalesce(
        |    last_value(value_n IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    first_value(value_n IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS value_filled
        |FROM e ORDER BY user_id, ts, event_id""".stripMargin,

    "q_candles" ->
      """WITH b AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT user_id, day,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS vsum,
        |  count(*) AS n
        |FROM b GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,

    "q_topk" ->
      """SELECT event_id, ts, event_type FROM (
        |  SELECT event_id, ts, event_type FROM events
        |  ORDER BY ts DESC, event_id DESC LIMIT 100)
        |ORDER BY event_id""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT user_id FROM events ORDER BY user_id""",

    "q_null_profile" ->
      """SELECT count(*) AS n_rows,
        |  round(avg(CAST(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END
        |    AS DOUBLE)) * 100, 2) AS value_n_null_pct,
        |  round(avg(CAST(CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END
        |    AS DOUBLE)) * 100, 2) AS type_n_null_pct
        |FROM events""".stripMargin,

    "q_dup_profile" ->
      """SELECT l_partkey, l_suppkey, count(*) AS count
        |FROM lineitem GROUP BY l_partkey, l_suppkey
        |HAVING count(*) > 1
        |ORDER BY l_partkey, l_suppkey""".stripMargin,

    "q_lag_delta" ->
      """SELECT event_id, user_id, ts, value,
        |  lag(value) OVER w AS prev_value,
        |  value - lag(value) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q_sessions" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, ts,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |FROM g ORDER BY user_id, ts, event_id""".stripMargin,

    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS side, value AS view_value
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS side, NULL AS view_value
        |  FROM events WHERE event_type = 'purchase'),
        |f AS (
        |  SELECT user_id, ts, event_id, side,
        |    last_value(CASE WHEN side = 0 THEN view_value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_value
        |  FROM u)
        |SELECT event_id, user_id, ts, view_value
        |FROM f WHERE side = 1
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q_pipeline_news" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    'https://example.com/' || CAST(doc_id % 400 AS VARCHAR) AS url,
         |    CASE WHEN doc_id % 5 = 0 THEN NULL
         |         ELSE 'author_' || CAST(doc_id % 10 AS VARCHAR) END AS author,
         |    CASE WHEN doc_id % 7 = 0 THEN NULL
         |         ELSE 'Title ' || CAST(doc_id AS VARCHAR) END AS title,
         |    CASE WHEN doc_id % 9 = 0 THEN NULL
         |         ELSE substr(text, 1, 50) END AS description,
         |    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE text END AS content,
         |    source AS source_name,
         |    strftime(TIMESTAMP '2024-01-01' + INTERVAL (doc_id) MINUTE,
         |      '%Y-%m-%d %H:%M:%S') AS published_str
         |  FROM documents),
         |defaulted AS (
         |  SELECT doc_id, url, source_name, published_str,
         |    coalesce(author, 'No Author') AS author,
         |    coalesce(title, 'Untitled Article') AS title,
         |    coalesce(content, description,
         |      coalesce(title, 'Untitled Article')) AS content
         |  FROM raw),
         |dd AS (
         |  SELECT *, row_number() OVER (PARTITION BY url ORDER BY doc_id) AS rn
         |  FROM defaulted)
         |SELECT doc_id, sha256(url) AS id, url, source_name, author, title,
         |  content,
         |  ${cleanExpr("title")} AS title_cleaned,
         |  ${cleanExpr("content")} AS content_cleaned,
         |  CAST(published_str AS TIMESTAMP) AS published_at
         |FROM dd WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_pipeline_posts" ->
      s"""WITH raw AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
         |         ELSE 'r' || CAST(o_orderkey % 1400 AS VARCHAR) END AS reddit_id,
         |    CASE WHEN o_orderkey % 89 = 0 THEN NULL
         |         ELSE 'sub' || CAST(o_custkey % 5 AS VARCHAR) END AS subreddit,
         |    'Post about ' || CAST(o_custkey % 20 AS VARCHAR) AS title,
         |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
         |         ELSE 'text ' || CAST(o_orderkey AS VARCHAR) END AS body_text,
         |    CASE WHEN o_orderkey % 11 = 0 THEN NULL
         |         ELSE o_orderkey % 1000 END AS score,
         |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
         |         ELSE o_custkey % 100 END AS number_of_comments,
         |    (o_orderkey % 2 = 0) AS is_text_post,
         |    CASE WHEN o_orderkey % 2 = 0 THEN NULL
         |         ELSE 'https://news/' || CAST(o_custkey % 50 AS VARCHAR) END
         |      AS article_url,
         |    CASE WHEN o_orderkey % 19 = 0 THEN NULL
         |         ELSE 'flair' || CAST(o_orderkey % 3 AS VARCHAR) END
         |      AS subreddit_category,
         |    CASE WHEN o_orderkey % 23 = 0 THEN NULL
         |         ELSE CAST(0.5 AS DOUBLE) +
         |           CAST(o_orderkey % 50 AS DOUBLE) / CAST(100.0 AS DOUBLE) END
         |      AS upvote_ratio,
         |    'p' || CAST(o_orderkey % 1400 AS VARCHAR) AS reddit_post_url,
         |    1700000000 + o_orderkey AS pub_epoch,
         |    CASE WHEN o_orderkey % 29 = 0 THEN ''
         |         WHEN o_orderkey % 31 = 0 THEN NULL
         |         ELSE '2024-03-01 12:00:00' END AS article_published_at,
         |    CASE WHEN o_orderkey % 37 = 0 THEN 'news, markets'
         |         ELSE 'finance' END AS article_category,
         |    CASE WHEN o_orderkey % 41 = 0 THEN NULL
         |         ELSE 'Headline' END AS article_headline
         |  FROM orders),
         |dd AS (
         |  SELECT *, row_number() OVER (PARTITION BY reddit_id, reddit_post_url
         |    ORDER BY o_orderkey) AS rn FROM raw),
         |req AS (
         |  SELECT * FROM dd
         |  WHERE rn = 1 AND reddit_id IS NOT NULL AND subreddit IS NOT NULL),
         |def AS (
         |  SELECT o_orderkey, reddit_id, subreddit, title,
         |    coalesce(body_text, 'No text') AS body_text,
         |    coalesce(score, 0) AS score,
         |    coalesce(number_of_comments, 0) AS number_of_comments,
         |    is_text_post, article_url,
         |    coalesce(subreddit_category, 'No category') AS subreddit_category,
         |    coalesce(upvote_ratio, 0.5) AS upvote_ratio,
         |    reddit_post_url, pub_epoch, article_published_at, article_category,
         |    coalesce(article_headline, 'No Title') AS article_headline
         |  FROM req),
         |flt AS (
         |  SELECT * FROM def
         |  WHERE NOT (is_text_post = false AND
         |    (article_published_at IS NULL OR article_published_at = '')))
         |SELECT sha256(reddit_id) AS id, reddit_id, subreddit, title,
         |  ${cleanExpr("title")} AS title_cleaned,
         |  body_text,
         |  ${cleanExpr("body_text")} AS body_cleaned,
         |  CAST(score AS INTEGER) AS score,
         |  CAST(number_of_comments AS INTEGER) AS number_of_comments,
         |  is_text_post, subreddit_category, upvote_ratio,
         |  TIMESTAMP '1970-01-01' + INTERVAL (pub_epoch) SECOND AS published_at,
         |  article_url,
         |  CAST(NULLIF(article_published_at, '') AS TIMESTAMP)
         |    AS article_published_at,
         |  article_category, article_headline, reddit_post_url
         |FROM flt ORDER BY reddit_id""".stripMargin,

    "q_pipeline_bars" ->
      """WITH raw AS (
        |  SELECT 'S' || CAST(user_id AS VARCHAR) AS ticker, ts AS bar_ts,
        |    event_id,
        |    TRY_CAST(CASE WHEN event_id % 7 = 0 THEN NULL
        |      ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS open,
        |    TRY_CAST(CASE WHEN event_id % 11 = 0 THEN 'junk'
        |      ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS high,
        |    TRY_CAST(CASE WHEN event_id % 13 = 0 THEN NULL
        |      ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS low,
        |    TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS close,
        |    TRY_CAST(CASE WHEN event_id % 5 = 0 THEN NULL
        |      ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS vwap,
        |    TRY_CAST(CASE WHEN event_id % 3 = 0 THEN NULL
        |      ELSE CAST(event_id % 1000 AS VARCHAR) END AS DOUBLE) AS volume,
        |    TRY_CAST(CASE WHEN event_id % 17 = 0 THEN 'x'
        |      ELSE CAST(event_id % 50 AS VARCHAR) END AS DOUBLE) AS trade_count
        |  FROM events),
        |filled AS (
        |  SELECT ticker, bar_ts, event_id,
        |    coalesce(last_value(open IGNORE NULLS) OVER wp,
        |             first_value(open IGNORE NULLS) OVER wf) AS open,
        |    coalesce(last_value(high IGNORE NULLS) OVER wp,
        |             first_value(high IGNORE NULLS) OVER wf) AS high,
        |    coalesce(last_value(low IGNORE NULLS) OVER wp,
        |             first_value(low IGNORE NULLS) OVER wf) AS low,
        |    coalesce(last_value(close IGNORE NULLS) OVER wp,
        |             first_value(close IGNORE NULLS) OVER wf) AS close,
        |    coalesce(last_value(vwap IGNORE NULLS) OVER wp,
        |             first_value(vwap IGNORE NULLS) OVER wf) AS vwap,
        |    CAST(coalesce(volume, 0) AS BIGINT) AS volume,
        |    CAST(coalesce(trade_count, 0) AS BIGINT) AS trade_count
        |  FROM raw
        |  WINDOW
        |    wp AS (PARTITION BY ticker ORDER BY bar_ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY ticker ORDER BY bar_ts
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT * FROM filled
        |WHERE open IS NOT NULL AND high IS NOT NULL AND low IS NOT NULL
        |  AND close IS NOT NULL AND vwap IS NOT NULL
        |ORDER BY ticker, bar_ts""".stripMargin,
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Q
import graft.core.{Num, Tables}

/** Second wave of relational surface (round 2): exact percentiles,
  * correlated subqueries, lateral explode, PIVOT, the distribution
  * window functions (ntile / percent_rank / cume_dist / first / last /
  * nth), explicit GROUPING SETS, datetime scalars, struct-max argmax,
  * null-handling scalars, histogram bucketing, regex/string scalars,
  * and multiset (ALL) set operations.
  *
  * Everything here follows the same determinism contract as
  * [[Relational]]: exact decimal sums ([[graft.core.Num]]), unique-key
  * tie-breaks on every window order, BIGINT casts on derived ints, and
  * column names aliased identically in both engines.
  *
  * Reference anchors: the ranking/report shapes extend
  * `qa/validate_data_fast.py:119-171` and `sql/ddl_gold.sql:22-62`
  * (PauloZapata/logicash-etl); the rest is beyond-parity breadth over
  * the driver corpus.
  */
object Relational2 {
  import Num._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Exact interpolating percentiles per group (no approx sketch): both
    * engines use the linear-interpolation definition at p·(n−1), and the
    * quantity domain is small integers-as-doubles, so the interpolated
    * values are exact in binary and hash-match bitwise. */
  val q36Percentiles: Q = Q(
    "q36_percentiles",
    "exact p25/p50/p75 per returnflag (interpolating percentile agg)",
    (s, d) =>
      // rebalanced scan, measured (r15): percentile partials are
      // holistic buffers (every value ships either way) and the serial
      // buffer build loses more than the saved exchange (raw 1.30 s vs
      // rebalanced 1.20 s)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("p25_qty"),
          percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
          percentile(col("l_quantity"), lit(0.75)).as("p75_qty"),
          percentile(col("l_extendedprice"), lit(0.5)).as("p50_price"),
          count(lit(1)).as("n_items")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS p25_qty,
             quantile_cont(l_quantity, 0.5)  AS p50_qty,
             quantile_cont(l_quantity, 0.75) AS p75_qty,
             quantile_cont(l_extendedprice, 0.5) AS p50_price,
             COUNT(*) AS n_items
      FROM lineitem
      GROUP BY l_returnflag
      """))

  /** Correlated scalar subquery — the SAME SQL text runs on Spark (which
    * decorrelates it into a join under the hood) and DuckDB. The inner
    * mean is an exact decimal sum / count, so the `>` boundary is
    * identical in both engines. */
  private val q37Sql = """
      SELECT c_custkey, c_name, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
                         FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      """

  val q37CorrelatedSubquery: Q = Q(
    "q37_correlated_subquery",
    "correlated scalar subquery (customers above their nation's mean)",
    (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      s.sql(q37Sql)
    },
    Some(q37Sql))

  /** Lateral explode of split text (flatten + re-aggregate): word
    * frequencies over the documents corpus. Same tokenizer both sides
    * (single-space split, empties dropped by the length filter). */
  val q38WordExplode: Q = Q(
    "q38_word_explode",
    "explode(split(text)) -> word frequency (HAVING count >= 3)",
    (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 5)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") >= 3),
    Some("""
      SELECT word, COUNT(*) AS n_occurrences
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) >= 5
      GROUP BY word
      HAVING COUNT(*) >= 3
      """))

  /** Relational PIVOT (explicit value list — the scale-safe form: no
    * extra distinct-values job, stable output schema). Ref analog: the
    * pivoted daily balance at `sql/ddl_gold.sql:37-47`. */
  val q39Pivot: Q = Q(
    "q39_pivot",
    "groupBy().pivot(status, [F,O,P]).count with explicit values",
    (s, d) =>
      Tables.raw(s, d, "orders")  // agg-first: raw scan (r15)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p")),
    Some("""
      SELECT o_orderpriority,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
             COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      FROM orders
      GROUP BY o_orderpriority
      """))

  /** Distribution window functions: NTILE / PERCENT_RANK / CUME_DIST
    * (default frame) and FIRST/LAST/NTH value over the full-partition
    * frame — last/nth NEED the explicit unbounded-following frame; the
    * default running frame would return the current row instead. */
  val q40WindowSuite: Q = Q(
    "q40_window_suite",
    "ntile/percent_rank/cume_dist + first/last/nth over full frame",
    (s, d) => {
      val w1 = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      val w2 = w1.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "customer").select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w1).cast(LongType).as("quartile"),
        percent_rank().over(w1).as("pct_rank"),
        cume_dist().over(w1).as("cume"),
        first(col("c_custkey")).over(w2).as("richest_cust"),
        last(col("c_custkey")).over(w2).as("poorest_cust"),
        nth_value(col("c_custkey"), 3).over(w2).as("third_cust"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(NTILE(4) OVER w1 AS BIGINT) AS quartile,
             PERCENT_RANK() OVER w1 AS pct_rank,
             CUME_DIST() OVER w1 AS cume,
             FIRST_VALUE(c_custkey) OVER w2 AS richest_cust,
             LAST_VALUE(c_custkey) OVER w2 AS poorest_cust,
             NTH_VALUE(c_custkey, 3) OVER w2 AS third_cust
      FROM customer
      WINDOW w1 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
             w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      """))

  /** Explicit GROUPING SETS (beyond q25's ROLLUP / q28's CUBE): a
    * hand-picked set list incl. the grand total, with GROUPING() markers
    * to disambiguate real NULL groups from subtotal rows. Same SQL text
    * on both engines. */
  private val q41Sql = """
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
      """

  val q41GroupingSets: Q = Q(
    "q41_grouping_sets",
    "explicit GROUPING SETS with GROUPING() subtotal markers",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(q41Sql)
    },
    Some(q41Sql))

  /** Datetime scalar surface: dow/doy/week/quarter extraction, last_day,
    * month truncation, date offset arithmetic, day difference to a fixed
    * pin. DuckDB's dayofweek is 0=Sunday vs Spark's 1=Sunday — the
    * oracle shifts by one to align. */
  val q42DatetimeScalars: Q = Q(
    "q42_datetime_scalars",
    "dayofweek/doy/week/quarter, last_day, trunc month, date_add, datediff",
    (s, d) =>
      // raw scan: cheap map-only scalars, no exchange needed at all (r15)
      Tables.raw(s, d, "orders").select(
        col("o_orderkey"),
        dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
        dayofyear(col("o_orderdate")).cast(LongType).as("doy"),
        weekofyear(col("o_orderdate")).cast(LongType).as("iso_week"),
        quarter(col("o_orderdate")).cast(LongType).as("qtr"),
        last_day(col("o_orderdate")).as("month_end"),
        trunc(col("o_orderdate"), "month").as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(lit("1998-01-01").cast(DateType), to_date(col("o_orderdate")))
          .cast(LongType).as("days_to_98")),
    Some("""
      SELECT o_orderkey,
             CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
             CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
             CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
             CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
             CAST(o_orderdate AS DATE) + 30 AS due_date,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
      FROM orders
      """))

  /** Deterministic argmax via struct-max: latest order per customer in
    * ONE ordinary max aggregate (map-side partial agg, no window shuffle
    * + sort) — the scale-preferred form of the q26/q43 "latest row"
    * pattern. Lexicographic (date, orderkey) max is total because
    * orderkey is unique. */
  val q43ArgmaxStruct: Q = Q(
    "q43_latest_order_argmax",
    "argmax via max(struct(date, key, price)) — one-pass latest-row",
    (s, d) =>
      Tables.raw(s, d, "orders")  // agg-first: raw scan (r15)
        .groupBy(col("o_custkey"))
        .agg(max(struct(
          to_date(col("o_orderdate")).as("d"),
          col("o_orderkey").as("k"),
          col("o_totalprice").as("p"))).as("m"))
        .select(
          col("o_custkey"),
          col("m.d").as("last_order_date"),
          col("m.k").as("last_order_key"),
          col("m.p").as("last_price")),
    Some("""
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS last_order_date,
             o_orderkey AS last_order_key,
             o_totalprice AS last_price
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                         ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC) AS rn
            FROM orders)
      WHERE rn = 1
      """))

  /** Null-handling scalar surface over the events table (user_id and
    * props carry injected NULLs): COALESCE, NULLIF, NVL2-style presence
    * flag, GREATEST/LEAST. */
  val q44NullScalars: Q = Q(
    "q44_null_scalars",
    "coalesce/nullif/presence-flag/greatest/least over nullable columns",
    (s, d) =>
      Tables.raw(s, d, "events").select(  // cheap map-only scalars (r15)
        col("event_id"),
        coalesce(col("user_id"), lit(-1L)).as("user_or_default"),
        expr("nullif(event_type, 'click')").as("type_unless_click"),
        when(col("props").isNotNull, 1L).otherwise(0L).as("has_props"),
        greatest(col("value"), lit(0.5)).as("value_floor"),
        least(col("value"), lit(0.5)).as("value_cap")),
    Some("""
      SELECT event_id,
             COALESCE(user_id, -1) AS user_or_default,
             NULLIF(event_type, 'click') AS type_unless_click,
             CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END AS has_props,
             GREATEST(value, 0.5) AS value_floor,
             LEAST(value, 0.5) AS value_cap
      FROM events
      """))

  /** Fixed-width histogram bucketing (floor division — exact on doubles,
    * no boundary drift): order count + price range per 50k bucket. */
  val q45Histogram: Q = Q(
    "q45_histogram",
    "fixed-width price histogram via floor(price/50000)",
    (s, d) =>
      Tables.raw(s, d, "orders")  // agg-first: raw scan (r15)
        .groupBy(floor(col("o_totalprice") / 50000).cast(LongType).as("price_bin"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("bin_min"),
          max(col("o_totalprice")).as("bin_max")),
    Some("""
      SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bin,
             COUNT(*) AS n_orders,
             MIN(o_totalprice) AS bin_min,
             MAX(o_totalprice) AS bin_max
      FROM orders
      GROUP BY 1
      """))

  /** Regex + string scalar surface: group extraction, global
    * replacement (Spark replaces all matches by default; DuckDB needs
    * the 'g' flag), position, padding, char translation, split-part. */
  val q46RegexStrings: Q = Q(
    "q46_regex_strings",
    "regexp_extract/replace, instr, lpad, translate, substring_index",
    (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
        instr(col("p_name"), "a").cast(LongType).as("first_a"),
        lpad(col("p_brand"), 12, "_").as("brand_padded"),
        translate(col("p_type"), " ", "_").as("type_snake"),
        substring_index(col("p_type"), " ", 1).as("type_head")),
    Some("""
      SELECT p_partkey,
             regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
             CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
             lpad(p_brand, 12, '_') AS brand_padded,
             replace(p_type, ' ', '_') AS type_snake,
             string_split(p_type, ' ')[1] AS type_head
      FROM part
      """))

  /** Multiset set operations (ALL variants — bag semantics, duplicates
    * preserved; q17/q18 cover the DISTINCT forms). */
  val q47IntersectAll: Q = Q(
    "q47_intersect_all",
    "INTERSECT ALL (bag semantics) of nation-key multisets",
    (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
      """))

  val q48ExceptAll: Q = Q(
    "q48_except_all",
    "EXCEPT ALL (bag semantics) of nation-key multisets",
    (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier
      """))

  /** Skew-safe salted equi-join ([[graft.operators.SaltedJoin]]): the
    * hot-key-proof form of the shuffle join — bag-identical to the plain
    * join the oracle runs. */
  val q49SaltedJoin: Q = Q(
    "q49_salted_join",
    "salted equi-join events⋈customer (skew-safe, 8 salts)",
    (s, d) =>
      graft.operators.SaltedJoin.inner(
        Tables.raw(s, d, "events").select(col("event_id"), col("user_id"), col("value")),  // exchange-first (r15)
        t(s, d, "customer").select(
          col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment")),
        keys = Seq("user_id"), salts = 8)
        .select(col("event_id"), col("user_id"), col("c_name"), col("value")),
    Some("""
      SELECT e.event_id AS event_id, e.user_id AS user_id,
             c.c_name AS c_name, e.value AS value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      """))

  /** UNPIVOT / melt (the inverse of q39's PIVOT): wide measure columns
    * to long (metric, value) rows — Spark's native unpivot plans a
    * single Expand (one pass, no self-union re-scan). */
  val q50Unpivot: Q = Q(
    "q50_unpivot",
    "unpivot wide measures to long (metric, metric_value) rows",
    (s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"), col("p_size").cast(DoubleType).as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(
          ids = Array(col("p_partkey")),
          values = Array(col("size"), col("retailprice")),
          variableColumnName = "metric",
          valueColumnName = "metric_value"),
    Some("""
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS metric_value FROM part
      """))

  /** Time-series densification (gap fill): a generated hour × type grid
    * LEFT-joined against the actual hourly aggregate, missing buckets
    * zero-filled. The grid is sequence()-generated — rows the source
    * never had, which no plain GROUP BY can produce. Scale note: the
    * grid side is calendar-bounded (hours × types), tiny next to the
    * fact side, and broadcasts. */
  val q51GapFill: Q = Q(
    "q51_gap_fill",
    "hourly gap-fill: generated time grid left-joined to event counts",
    (s, d) => {
      val startTs = lit("2024-01-08 00:00:00").cast(TimestampType)
      val endTs = lit("2024-01-15 00:00:00").cast(TimestampType)
      val ev = Tables.raw(s, d, "events")  // agg/distinct-first (r15)
      val hours = ev.sparkSession.range(1).select(
        explode(sequence(startTs, endTs, expr("interval 1 hour"))).as("hour_ts"))
      val types = ev.select(col("event_type")).distinct()
      val actual = ev
        .filter(col("ts") >= startTs && col("ts") < endTs)
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsumD(col("value")).as("total"))
      broadcast(hours.crossJoin(types))
        .join(actual, Seq("hour_ts", "event_type"), "left")
        .select(
          col("hour_ts"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("total"), lit(0.0)).as("total_value"))
    },
    Some("""
      WITH hours AS (SELECT ts AS hour_ts
                     FROM generate_series(TIMESTAMP '2024-01-08 00:00:00',
                                          TIMESTAMP '2024-01-15 00:00:00',
                                          INTERVAL 1 HOUR) t(ts)),
      types AS (SELECT DISTINCT event_type FROM events),
      actual AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
                        COUNT(*) AS n,
                        CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total
                 FROM events
                 WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
                   AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-15 00:00:00'
                 GROUP BY 1, 2)
      SELECT h.hour_ts AS hour_ts, ty.event_type AS event_type,
             COALESCE(a.n, 0) AS n_events,
             COALESCE(a.total, 0.0) AS total_value
      FROM hours h CROSS JOIN types ty
      LEFT JOIN actual a ON a.hour_ts = h.hour_ts AND a.event_type = ty.event_type
      """))

  /** Map-type scalar surface: literal map construction, key lookup,
    * cardinality, key listing (scalar outputs only — map-typed columns
    * canonicalize differently across engines' parquet writers). */
  val q52MapOps: Q = Q(
    "q52_map_ops",
    "map construction + element_at + size + map_keys",
    (s, d) => {
      val m = map(
        lit("size"), col("p_size").cast(DoubleType),
        lit("price"), col("p_retailprice"))
      t(s, d, "part").select(
        col("p_partkey"),
        element_at(m, "size").as("size_val"),
        element_at(m, "price").as("price_val"),
        size(m).cast(LongType).as("n_entries"),
        array_join(map_keys(m), ",").as("keys"))
    },
    Some("""
      WITH mm AS (SELECT p_partkey,
                         map(['size','price'],
                             [CAST(p_size AS DOUBLE), p_retailprice]) AS m
                  FROM part)
      SELECT p_partkey,
             m['size'][1] AS size_val,
             m['price'][1] AS price_val,
             CAST(cardinality(m) AS BIGINT) AS n_entries,
             array_to_string(map_keys(m), ',') AS keys
      FROM mm
      """))

  /** Forward fill (LOCF — last observation carried forward): nulls in
    * an ordered series take the most recent non-null value. One
    * partitioned window, running frame, `last(ignoreNulls)` — the same
    * primitive the as-of join (q26) builds on. */
  val q53ForwardFill: Q = Q(
    "q53_forward_fill",
    "LOCF forward fill of null user_id per event_type, event-time order",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.raw(s, d, "events").select(  // window-first (r15)
        col("event_id"),
        col("event_type"),
        col("user_id"),
        last(col("user_id"), ignoreNulls = true).over(w).as("user_filled"))
    },
    Some("""
      SELECT event_id, event_type, user_id,
             last_value(user_id IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS user_filled
      FROM events
      """))

  /** Percent-of-total (ratio_to_report): a whole-partition aggregate
    * window (no ORDER BY ⇒ unbounded frame) dividing each row's measure
    * by its group total. The share is a ratio of two exact-decimal-
    * derived doubles — deterministic on any partitioning. */
  val q54PercentOfTotal: Q = Q(
    "q54_percent_of_total",
    "share of nation total per customer (whole-partition window agg)",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
      t(s, d, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        (dec(col("c_acctbal")).cast(DoubleType) /
          sum(dec(col("c_acctbal"))).over(w).cast(DoubleType)).as("bal_share"))
    },
    Some("""
      SELECT c_custkey, c_nationkey, c_acctbal,
             CAST(CAST(c_acctbal AS DECIMAL(38,4)) AS DOUBLE) /
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) OVER (PARTITION BY c_nationkey) AS DOUBLE)
               AS bal_share
      FROM customer
      """))

  /** RANGE window frame: trailing 90-day order total per customer. The
    * frame is value-based (days), not row-based — all peers of a day are
    * in or out together, so no tie-break is needed for determinism. The
    * order key is a plain BIGINT day number: numeric RANGE frames are the
    * engine-portable form (interval frames differ across engines). */
  val q55TrailingWindow: Q = Q(
    "q55_trailing_window",
    "RANGE BETWEEN 89 PRECEDING: trailing 90-day sum/count per customer",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
        .rangeBetween(-89, Window.currentRow)
      Tables.keyed(s, d, "orders", "o_custkey")  // rebalance = the window exchange (r15)
        .withColumn(
          "day_num",
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast(LongType))
        .select(
          col("o_orderkey"), col("o_custkey"), col("day_num"),
          sum(dec(col("o_totalprice"))).over(w).cast(DoubleType)
            .as("trailing_90d_total"),
          count(lit(1)).over(w).cast(LongType).as("trailing_90d_orders"))
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER w AS DOUBLE) AS trailing_90d_total,
             CAST(COUNT(*) OVER w AS BIGINT) AS trailing_90d_orders
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
      """))

  /** Deterministic hash sampling — the engine-portable TABLESAMPLE.
    * Bernoulli/row-position sampling is engine-private (never
    * reproducible across engines or partitionings); keying the decision
    * on a content hash ([[graft.functions.RollingHash]], oracle-
    * replicable) gives a stable ~5% sample: same rows on any engine, any
    * partition count, any day. The filter is a pushed-down scan predicate
    * — no shuffle, no sort, O(n) scan as TABLESAMPLE would be. */
  val q56HashSample: Q = Q(
    "q56_hash_sample",
    "deterministic ~5% sample via content-hash mod (portable TABLESAMPLE)",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val h = graft.functions.GraftFunctions.rollingHash(
        concat(col("event_id").cast(StringType), lit(":sample")))
      t(s, d, "events")
        .filter(h % 20 === 0)
        .select(col("event_id"), col("event_type"), col("user_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id, event_type, user_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(length(CAST(event_id AS VARCHAR) || ':sample')),
                   i -> CAST(unicode(substr(CAST(event_id AS VARCHAR) || ':sample', CAST(i+1 AS INTEGER), 1)) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM events)
      SELECT event_id, event_type, user_id FROM p WHERE h % 20 = 0
      """))

  /** MERGE upsert ([[graft.operators.MergeUpsert]]): a deterministic
    * change set (updates for keys ≡ 0 mod 7, inserts re-keyed past the
    * base domain for keys ≡ 0 mod 97) applied to orders — update-else-
    * insert with pass-through, tagged per row. */
  val q57MergeUpsert: Q = Q(
    "q57_merge_upsert",
    "MERGE (upsert): full-outer struct-pick apply of a change set",
    (s, d) => {
      val base = Tables.keyed(s, d, "orders", "o_orderkey")  // rebalance = the merge join exchange (r15)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val updates = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + lit(100.0)).as("o_totalprice"),
          lit("U").as("o_orderstatus"))
      val inserts = base.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          lit("N").as("o_orderstatus"))
      graft.operators.MergeUpsert(base, updates.union(inserts), "o_orderkey")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      changes AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice,
               'U' AS o_orderstatus
        FROM base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'N'
        FROM base WHERE o_orderkey % 97 = 0)
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
             CASE WHEN c.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL THEN 'update'
                  WHEN b.o_orderkey IS NULL THEN 'insert'
                  ELSE 'keep' END AS merge_action
      FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
      """))

  /** Correlated LATERAL subquery with per-row LIMIT — the SQL-level
    * top-k-per-group. The SAME SQL text runs on Spark (which decorrelates
    * the lateral into a ranked join) and DuckDB; q32/q43 are the
    * DataFrame-level forms of the same shape. */
  private val q58Sql = """
      SELECT c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey,
             o.o_totalprice AS o_totalprice, o.rn AS rank_pos
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice,
                      ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      WHERE c.c_custkey <= 300
      """

  val q58Lateral: Q = Q(
    "q58_lateral_topk",
    "LATERAL correlated subquery with LIMIT; identical SQL both engines",
    (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(q58Sql)
    },
    Some(q58Sql))

  /** Distinct aggregate over a window: Spark has no COUNT(DISTINCT) OVER,
    * so the idiomatic form is size(collect_set() OVER) — set state is
    * bounded by the distinct-value cardinality of the partition, not its
    * row count. The oracle uses the native COUNT(DISTINCT) OVER. */
  val q59WindowDistinct: Q = Q(
    "q59_window_distinct",
    "distinct count over a window via collect_set (COUNT DISTINCT OVER)",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
      t(s, d, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        size(collect_set(col("c_mktsegment")).over(w)).cast(LongType)
          .as("n_segments_in_nation"))
    },
    Some("""
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(COUNT(DISTINCT c_mktsegment)
                    OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_segments_in_nation
      FROM customer
      """))

  /** Time-series linear interpolation: deterministic nulls are punched
    * into the value series (event_id ≡ 0 mod 5), then each gap is filled
    * linearly between the bracketing known points; edges fall back to
    * nearest-known (LOCF / back-fill). The bracketing (ts, value) pairs
    * travel as single structs under IGNORE NULLS windows — the same
    * whole-row trick as the as-of join, so a gap's anchors are always one
    * consistent row. Extends q53's LOCF to the interpolating resampler of
    * a time-series feature pipeline. */
  val q60Interpolate: Q = Q(
    "q60_interpolate",
    "linear interpolation across punched gaps (IGNORE NULLS windows)",
    (s, d) => {
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val known = when(col("v").isNotNull, struct(col("ts_us"), col("v")))
      val base = Tables.keyed(s, d, "events", "user_id")  // rebalance = the window exchange (r15)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          when(col("event_id") % 5 =!= 0, col("value")).as("v"))
      val prevK = last(known, ignoreNulls = true).over(wPrev)
      val nextK = first(known, ignoreNulls = true).over(wNext)
      base
        .withColumn("p", prevK)
        .withColumn("n", nextK)
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          col("v").isNull.cast(LongType).as("was_null"),
          when(col("v").isNotNull, col("v"))
            .when(col("p").isNotNull && col("n").isNotNull,
              col("p.v") + (col("n.v") - col("p.v")) *
                ((col("ts_us") - col("p.ts_us")).cast(DoubleType) /
                  (col("n.ts_us") - col("p.ts_us")).cast(DoubleType)))
            .when(col("p").isNotNull, col("p.v"))
            .otherwise(col("n.v")).as("v_interp"))
    },
    Some("""
      WITH base AS (
        SELECT event_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CASE WHEN event_id % 5 <> 0 THEN value END AS v
        FROM events),
      anch AS (
        SELECT *,
               last_value(CASE WHEN v IS NOT NULL THEN struct_pack(ts_us := ts_us, v := v) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
               first_value(CASE WHEN v IS NOT NULL THEN struct_pack(ts_us := ts_us, v := v) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n
        FROM base)
      SELECT event_id, user_id, ts_us,
             CAST(v IS NULL AS BIGINT) AS was_null,
             CASE WHEN v IS NOT NULL THEN v
                  WHEN p IS NOT NULL AND n IS NOT NULL
                    THEN p.v + (n.v - p.v) *
                         (CAST(ts_us - p.ts_us AS DOUBLE) / CAST(n.ts_us - p.ts_us AS DOUBLE))
                  WHEN p IS NOT NULL THEN p.v
                  ELSE n.v END AS v_interp
      FROM anch
      """))

  /** Null-safe equality join (`<=>` ↔ IS NOT DISTINCT FROM): NULL keys
    * match each other instead of vanishing — the join form for keys
    * where NULL is a real category (unattributed events, unknown
    * dimensions). Both sides pre-aggregate to one row per key, so the
    * NULL buckets meet 1:1; a plain equi-join would silently drop them.
    * Catalyst still plans a HASH join (null-safe compares lower to a
    * coalesce-keyed equality), not a nested loop. */
  val q61NullSafeJoin: Q = Q(
    "q61_nullsafe_join",
    "null-safe equality join of two aggregates with NULL key buckets",
    (s, d) => {
      val ek = when(col("user_id") % 7 =!= 0, col("user_id") % 100)
      val ok = when(col("o_custkey") % 7 =!= 0, col("o_custkey") % 100)
      val a = Tables.raw(s, d, "events").groupBy(ek.as("k"))  // agg-first (r15)
        .agg(count(lit(1)).as("n_events"))
      val b = Tables.raw(s, d, "orders").groupBy(ok.as("k"))  // agg-first (r15)
        .agg(count(lit(1)).as("n_orders"))
      a.join(b, a("k") <=> b("k"), "full_outer")
        .select(coalesce(a("k"), b("k")).as("k"),
          (a("k").isNull && b("k").isNull).cast(LongType).as("is_null_bucket"),
          col("n_events"), col("n_orders"))
    },
    Some("""
      WITH a AS (
        SELECT CASE WHEN user_id % 7 <> 0 THEN user_id % 100 END AS k,
               COUNT(*) AS n_events
        FROM events GROUP BY 1),
      b AS (
        SELECT CASE WHEN o_custkey % 7 <> 0 THEN o_custkey % 100 END AS k,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1)
      SELECT COALESCE(a.k, b.k) AS k,
             CAST(a.k IS NULL AND b.k IS NULL AS BIGINT) AS is_null_bucket,
             n_events, n_orders
      FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k
      """))

  /** GROUP BY ALL / ORDER BY ALL (the modern SQL ergonomics both Spark 4
    * and DuckDB implement): every non-aggregate select item becomes a
    * group key, and the ordering covers all output columns — the same
    * SQL text runs verbatim on both engines. ORDER BY ALL also makes the
    * result order fully deterministic without naming a tie-break. */
  private val q62Sql = """
      SELECT o_orderstatus, o_orderpriority,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_price
      FROM orders
      GROUP BY ALL
      ORDER BY ALL
      """

  val q62GroupByAll: Q = Q(
    "q62_group_by_all",
    "GROUP BY ALL / ORDER BY ALL; identical SQL text both engines",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(q62Sql)
    },
    Some(q62Sql))

  /** Approximate-quantile sketch surface — the partner of q35's HLL
    * check, same pattern: the sketch internals (GK/KLL-style) are
    * engine-private, so the oracle-checkable output is the EXACT
    * interpolated percentile (quantile_cont parity proven by q36) plus
    * `within_bound`, the in-engine assertion that the
    * `approx_percentile` estimate lands within 1% of the exact value
    * (accuracy 10000 ⇒ rank error ≤ N/10000 — a handful of rows per
    * group at any SF — and the price distribution is dense, so value
    * error is far inside 1%). The oracle emits TRUE: an out-of-spec
    * sketch fails the hash compare. At 100 TB approx_percentile is the
    * one that matters: exact percentile sorts every group, the sketch
    * is one mergeable pass. */
  val q63ApproxQuantiles: Q = Q(
    "q63_approx_quantiles",
    "exact vs approx_percentile (sketch) per returnflag with error bound",
    (s, d) =>
      // REBALANCED, like q36: exact-percentile partial buffers hold every
      // group value, so the per-row partial-agg work wants the 32-way
      // spread. Measured r16 (solo probe, alternating runs, sf0.1):
      // rebalanced 1.77/2.10 s vs raw 2.12/2.15 s — reverts r15's
      // unmeasured raw switch (sweep had shown 1.39 → 1.64 s).
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_extendedprice"), lit(0.5)).as("p50_exact"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("p50_approx"),
          count(lit(1)).as("n_items"))
        .select(
          col("l_returnflag"), col("p50_exact"), col("n_items"),
          (abs(col("p50_approx") - col("p50_exact")) / col("p50_exact") <= 0.01)
            .as("within_bound")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS p50_exact,
             COUNT(*) AS n_items,
             TRUE AS within_bound
      FROM lineitem
      GROUP BY l_returnflag
      """))

  /** SCD-Type-2 construction from a change log — the companion of the
    * reference's SCD1 gold dim (SURVEY §2.4 A9, latest-wins): every
    * change becomes a validity interval [valid_from, valid_to) with an
    * open current row, built with one lead() window per key. One
    * shuffle, keyed on the entity; deterministic tie-break on the
    * orderkey for same-day changes. */
  val q64Scd2: Q = Q(
    "q64_scd2_intervals",
    "SCD-Type-2 validity intervals from the orders change log",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.keyed(s, d, "orders", "o_custkey")  // rebalance = the window exchange (r15)
        .select(
          col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
          col("o_orderstatus").as("status"), col("o_orderdate").as("valid_from"),
          lead(col("o_orderdate"), 1).over(w).as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull.cast(LongType))
    },
    Some("""
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             o_orderstatus AS status,
             o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER w AS valid_to,
             CAST(LEAD(o_orderdate) OVER w IS NULL AS BIGINT) AS is_current
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      """))

  /** Bloom-filter pre-filtered semi-join — the 100 TB shuffle-join
    * accelerator in explicit (non-optimizer) form: build a bloom over
    * the build side's keys (`bloom_filter_agg`, one partial-agged pass,
    * result is one broadcastable binary blob), probe the other side
    * with `might_contain`, and only bloom-hits enter the real join.
    * Complements RuntimeFilterSpec (Catalyst's automatic injection):
    * this is the hand-rolled version a pipeline uses when the filter
    * must cross a stage/job boundary (e.g. persist the bloom, prune
    * tomorrow's scan).
    *
    * Oracle-checkable via the q35 pattern: exact membership counts
    * hash-match DuckDB; the bloom's contract rides as assertions —
    * `false_negatives` must be 0 (bloom guarantee) and the measured
    * false-positive rate must sit under the bound (default
    * bloom_filter_agg sizing gives ~0.03 worst-case; bound at 0.05). */
  val q65BloomSemiJoin: Q = Q(
    "q65_bloom_semijoin",
    "bloom-prefiltered semi-join: exact counts + in-engine FPR bound",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      t(s, d, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        WITH probe AS (
          SELECT c.c_custkey,
                 graft_might_contain(
                   (SELECT graft_bloom_agg(o_custkey) FROM orders_v),
                   c.c_custkey) AS bloom_hit,
                 EXISTS (SELECT 1 FROM orders_v o
                         WHERE o.o_custkey = c.c_custkey) AS exact_hit
          FROM customer_v c)
        SELECT COUNT(*) AS n_customers,
               SUM(CAST(exact_hit AS BIGINT)) AS n_with_orders,
               SUM(CASE WHEN exact_hit AND NOT bloom_hit THEN 1 ELSE 0 END)
                 AS false_negatives,
               (SUM(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END)
                  <= GREATEST(CAST(0.05 * SUM(CASE WHEN NOT exact_hit THEN 1 ELSE 0 END) AS BIGINT), 1))
                 AS fpr_ok
        FROM probe""")
    },
    Some("""
      WITH probe AS (
        SELECT c.c_custkey,
               EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey) AS exact_hit
        FROM customer c)
      SELECT COUNT(*) AS n_customers,
             CAST(SUM(CAST(exact_hit AS BIGINT)) AS BIGINT) AS n_with_orders,
             CAST(0 AS BIGINT) AS false_negatives,
             TRUE AS fpr_ok
      FROM probe
      """))

  /** Z-order pruning, MEASURED: write the same events slice in two
    * layouts — z-ordered on (user_id, value) vs lexicographic
    * (range-clustered on user_id) — then evaluate a predicate on the
    * NON-leading dimension against each file's min/max stats, i.e.
    * exactly what a parquet reader's footer pruning sees (the stats are
    * derived by grouping on `input_file_name()`; a footer index carries
    * the same numbers). Lexicographic files each cover the full `value`
    * range, so a value predicate can skip NOTHING; z-order files cover
    * small hyper-rectangles, so most skip. Both facts ride as graded
    * assertions (q35 pattern — the oracle emits the expected TRUEs), so
    * the z-order claim is measured by the correctness gate rather than
    * asserted in prose. The scalar `.head`/`.count` calls here are
    * metrics-row traffic (the adjudicated-legitimate class), not data
    * collection. */
  val q66ZOrderPruning: Q = Q(
    "q66_zorder_pruning",
    "z-order vs lexicographic file skipping on a non-leading-dim predicate",
    (s, d) => {
      import graft.sources.Clustering
      val ev = t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("value"))
      val base = java.nio.file.Files.createTempDirectory("graft_zprune").toString
      Clustering.writeZOrdered(ev, s"$base/z", Seq("user_id", "value"), nFiles = 16)
      Clustering.writeRangeClustered(ev, s"$base/lin", "user_id", nFiles = 16)
      val mm = ev.agg(min(col("value")), max(col("value"))).head
      val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
      // the middle decile of value: selective, away from either edge
      val (lo, hi) = (mn + 0.45 * (mx - mn), mn + 0.55 * (mx - mn))
      def fileHits(path: String) = s.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("value")).as("vmn"), max(col("value")).as("vmx"),
          count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("files"),
          sum(when(col("vmn") <= hi && col("vmx") >= lo, 1L).otherwise(0L)).as("hits"),
          sum(col("n")).as("rows")).head
      val z = fileHits(s"$base/z")
      val l = fileHits(s"$base/lin")
      val total = ev.count()
      import s.implicits._
      Seq((
        l.getLong(1) == l.getLong(0),
        z.getLong(1) * 2 <= z.getLong(0),
        z.getLong(2) == total && l.getLong(2) == total
      )).toDF("lin_matches_all", "z_skips_half", "totality_ok")
    },
    Some("""
      SELECT TRUE AS lin_matches_all, TRUE AS z_skips_half, TRUE AS totality_ok
      FROM events LIMIT 1
      """))

  /** The commit-log table format ([[graft.sources.SnapshotLog]]) under
    * the correctness gate: materialize orders as a year-partitioned
    * commit-log table (batch 1), apply q57's deterministic change set
    * as a second MERGE batch, and emit the final snapshot read through
    * the manifest. The oracle computes the same two-batch outcome as a
    * single FULL OUTER merge — so manifest bookkeeping, partition-scoped
    * rewrite, and snapshot reads are all hash-graded, not just spec'd.
    * Partitioning by year keeps the per-batch partition loop small (7
    * writes); `o_orderkey` serves as the within-batch order column
    * because each batch carries unique keys. */
  val q67CommitLogUpsert: Q = Q(
    "q67_commitlog_upsert",
    "sequential MERGE batches through the commit-log table format",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base = java.nio.file.Files.createTempDirectory("graft_cl").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(
        s, base, orders, "o_orderkey", "o_orderkey", "o_year", batchId = 1)
      val updates = orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
        .withColumn("o_orderstatus", lit("U"))
      val inserts = orders.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("o_orderstatus", lit("N"))
      SnapshotLog.upsertBatch(
        s, base, updates.union(inserts), "o_orderkey", "o_orderkey", "o_year",
        batchId = 2)
      SnapshotLog.read(s, base).get
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_year")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      changes AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice,
               'U' AS o_orderstatus, o_year
        FROM base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'N', o_year
        FROM base WHERE o_orderkey % 97 = 0)
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_year ELSE b.o_year END AS o_year
      FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
      """))

  /** Full CDC apply ([[graft.operators.MergeUpsert.cdc]]): the
    * change-stream contract with deletes — four disjoint deterministic
    * branches exercise every path: updates (÷7 excl ÷13), inserts
    * (÷97 re-keyed), deletes of live keys (÷13), and deletes of ABSENT
    * keys (÷101 re-keyed past both domains), which must be no-ops —
    * the at-least-once replay requirement. One full-outer struct-pick
    * shuffle with a post-join delete filter; the oracle runs the same
    * shape in SQL. */
  val q68CdcApply: Q = Q(
    "q68_cdc_apply",
    "CDC merge with deletes: update/insert/delete/absent-delete branches",
    (s, d) => {
      // keyed rebalance = the merge join's base-side exchange (r15)
      val base = Tables.keyed(s, d, "orders", "o_orderkey")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val k = col("o_orderkey")
      val updates = base.filter(k % 7 === 0 && k % 13 =!= 0)
        .select(k, col("o_custkey"),
          (col("o_totalprice") + lit(100.0)).as("o_totalprice"),
          lit("U").as("o_orderstatus"), lit("U").as("op"))
      val inserts = base.filter(k % 97 === 0)
        .select((k + lit(100000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), lit("N").as("o_orderstatus"), lit("U").as("op"))
      val deletes = base.filter(k % 13 === 0)
        .select(k, col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), lit("D").as("op"))
      val absentDeletes = base.filter(k % 101 === 0)
        .select((k + lit(200000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"), lit("D").as("op"))
      graft.operators.MergeUpsert.cdc(
        base, updates.union(inserts).union(deletes).union(absentDeletes),
        "o_orderkey", "op")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      changes AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice,
               'U' AS o_orderstatus, 'U' AS op
        FROM base WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'N', 'U'
        FROM base WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 'D'
        FROM base WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey + 200000000, o_custkey, o_totalprice, o_orderstatus, 'D'
        FROM base WHERE o_orderkey % 101 = 0)
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
             CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
             CASE WHEN c.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL THEN 'update'
                  WHEN b.o_orderkey IS NULL THEN 'insert'
                  ELSE 'keep' END AS merge_action
      FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
      WHERE NOT (c.o_orderkey IS NOT NULL AND c.op = 'D')
      """))

  /** Point-in-time dimension lookup — the CONSUMER side of SCD2 (q64
    * builds the validity intervals; this query reads "as of"): for every
    * event, the order-status its user had at the event's date. The
    * classic warehouse correctness pattern (no leakage of future
    * attribute values into historical facts), composed from existing
    * operators: same-day changes collapse to the surviving row
    * (latest orderkey per (custkey, day)), then [[graft.operators.AsOfJoin]]
    * finds the latest change ≤ event date per user — one union + one
    * window sweep, no per-row range scan. The oracle expresses the same
    * lookup as a LATERAL top-1, which Spark-side would plan a per-row
    * correlated sort; the as-of union-sweep is the scalable form. */
  val q69PitLookup: Q = Q(
    "q69_pit_lookup",
    "point-in-time SCD2 lookup: user's order status as of each event",
    (s, d) => {
      // max-orderkey dedup as an ARGMAX aggregate over the keyed scan
      // (same rewrite as q26, r15): o_orderkey is unique so
      // max(struct(o_orderkey, status)) picks the row_number() DESC
      // winner exactly; partial aggregation runs map-side and the
      // custkey-keyed rebalance satisfies the agg's distribution — the
      // window form paid a full-width exchange + sort for the same rows
      val dim = Tables.keyed(s, d, "orders", "o_custkey")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(struct(col("o_orderkey"), col("o_orderstatus"))).as("__top"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("d"),
          col("__top.o_orderstatus").as("status"))
      // raw scan: the event side's first operator is the as-of union's
      // window exchange
      val events = Tables.raw(s, d, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast(DateType).as("event_date"))
        .filter(col("user_id").isNotNull)
      graft.operators.AsOfJoin.leftAsOf(
        events, dim, "user_id", "k", "event_date", "d", Seq("status"))
        .select(col("event_id"), col("user_id"), col("event_date"),
          col("status").as("status_at_event"))
    },
    Some("""
      WITH iv AS (
        SELECT o_custkey AS k, o_orderdate AS d, o_orderstatus AS s,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders),
      ivd AS (SELECT k, d, s FROM iv WHERE rn = 1)
      SELECT e.event_id AS event_id, e.user_id AS user_id,
             CAST(e.ts AS DATE) AS event_date,
             best.s AS status_at_event
      FROM events e
      LEFT JOIN LATERAL (
        SELECT s FROM ivd
        WHERE ivd.k = e.user_id AND ivd.d <= CAST(e.ts AS DATE)
        ORDER BY ivd.d DESC LIMIT 1) best ON TRUE
      WHERE e.user_id IS NOT NULL
      """))

  /** File-level column statistics in the commit-log manifest, MEASURED:
    * the same events slice is committed twice through
    * [[graft.sources.SnapshotLog]] — once z-order-clustered on
    * (user_id, value) via `upsertBatch(clusterBy = …)`, once from the
    * merge's natural hash distribution — both recording per-file value
    * bounds in the manifest. A middle-decile value predicate is then
    * planned from the MANIFEST alone (`filesForRange`): the clustered
    * table skips at least half its files before Spark opens anything,
    * the unclustered control skips ~nothing (every hash-distributed
    * file spans the decile), and the stats-pruned read returns exactly
    * the predicate's rows. q66 proved z-order layouts give tight
    * per-file bounds a parquet FOOTER can use; q70 proves the table
    * format lifts the same bounds into planning metadata — the Iceberg
    * manifest model, where file skipping costs a manifest read, not an
    * open per file. */
  val q70StatsPruning: Q = Q(
    "q70_statslog_pruning",
    "commit-log manifest file bounds prune a value predicate's read set",
    (s, d) => {
      import graft.sources.SnapshotLog
      val ev = t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("value"),
          lit("all").as("day"))
      val baseDir =
        java.nio.file.Files.createTempDirectory("graft_statslog").toString
      val (zt, ht) = (s"$baseDir/z", s"$baseDir/h")
      SnapshotLog.upsertBatch(s, zt, ev, Seq("event_id"), "event_id", "day",
        batchId = 1, maxRetries = 5, statsCols = Seq("user_id", "value"),
        clusterBy = Seq("user_id", "value"), clusterFiles = 16, opCol = None, writeCdf = false)
      SnapshotLog.upsertBatch(s, ht, ev, Seq("event_id"), "event_id", "day",
        batchId = 1, maxRetries = 5, statsCols = Seq("user_id", "value"),
        clusterBy = Nil, clusterFiles = 16, opCol = None, writeCdf = false)
      val mm = ev.agg(min(col("value")), max(col("value"))).head
      val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
      val (lo, hi) = (mn + 0.45 * (mx - mn), mn + 0.55 * (mx - mn))
      val fsys = new org.apache.hadoop.fs.Path(zt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val mz = SnapshotLog.readManifest(fsys, new org.apache.hadoop.fs.Path(zt)).get
      val mh = SnapshotLog.readManifest(fsys, new org.apache.hadoop.fs.Path(ht)).get
      val zHits = SnapshotLog.filesForRange(mz, "value", lo, hi).size
      val hHits = SnapshotLog.filesForRange(mh, "value", lo, hi).size
      val exact = ev.filter(col("value") >= lo && col("value") <= hi).count()
      val pruned = SnapshotLog.readRange(s, zt, "value", lo, hi).get.count()
      import s.implicits._
      Seq((
        zHits * 2 <= mz.allFiles.size,
        hHits * 5 >= mh.allFiles.size * 4,
        pruned == exact && exact > 0L
      )).toDF("z_skips_half", "control_matches_most", "rows_exact")
    },
    Some("""
      SELECT TRUE AS z_skips_half, TRUE AS control_matches_most,
             TRUE AS rows_exact
      FROM events LIMIT 1
      """))

  /** Composite-key MERGE ([[graft.operators.MergeUpsert]] on a column
    * TUPLE): lineitem's natural business key is (l_orderkey,
    * l_linenumber) — neither column alone identifies a row, the shape
    * every real CDC feed has. Updates hit the first two line numbers of
    * ÷7 orders (so other line numbers of the SAME order must pass
    * through untouched — a single-column key would clobber them),
    * inserts re-key past the line-number domain. Same one-shuffle
    * full-outer struct-pick as q57; the oracle joins on both columns. */
  val q71CompositeMerge: Q = Q(
    "q71_composite_merge",
    "MERGE on a two-column business key (composite-key upsert)",
    (s, d) => {
      // keyed on the FULL merge key tuple: the scan's one spread-out
      // exchange is exactly the full-outer join's hash partitioning,
      // so the base side's ENSURE_REQUIREMENTS exchange vanishes (a
      // prefix key is NOT enough for a two-sided join — co-partitioning
      // needs compatible specs, measured r16) (the r15 keyed-scan idea)
      val base = Tables.keyed(s, d, "lineitem", "l_orderkey", "l_linenumber")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      val updates = base
        .filter(col("l_orderkey") % 7 === 0 && col("l_linenumber") <= 2)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + lit(5.0)).as("l_quantity"),
          col("l_extendedprice"))
      val inserts = base.filter(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"),
          (col("l_linenumber") + lit(10)).as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      graft.operators.MergeUpsert(
        base, updates.union(inserts), Seq("l_orderkey", "l_linenumber"))
    },
    Some("""
      WITH base AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem),
      changes AS (
        SELECT l_orderkey, l_linenumber, l_quantity + 5.0 AS l_quantity,
               l_extendedprice
        FROM base WHERE l_orderkey % 7 = 0 AND l_linenumber <= 2
        UNION ALL
        SELECT l_orderkey, l_linenumber + 10, l_quantity, l_extendedprice
        FROM base WHERE l_orderkey % 97 = 0)
      SELECT COALESCE(c.l_orderkey, b.l_orderkey) AS l_orderkey,
             COALESCE(c.l_linenumber, b.l_linenumber) AS l_linenumber,
             CASE WHEN c.l_orderkey IS NOT NULL THEN c.l_quantity ELSE b.l_quantity END AS l_quantity,
             CASE WHEN c.l_orderkey IS NOT NULL THEN c.l_extendedprice ELSE b.l_extendedprice END AS l_extendedprice,
             CASE WHEN c.l_orderkey IS NOT NULL AND b.l_orderkey IS NOT NULL THEN 'update'
                  WHEN b.l_orderkey IS NULL THEN 'insert'
                  ELSE 'keep' END AS merge_action
      FROM base b FULL OUTER JOIN changes c
        ON b.l_orderkey = c.l_orderkey AND b.l_linenumber = c.l_linenumber
      """))

  /** Change-data-feed OUT of the commit log
    * ([[graft.sources.SnapshotLog.diffVersions]]): v1 is orders as a
    * commit-log table, v2 applies q68's full CDC change set (updates,
    * inserts, live deletes, absent-key deletes) THROUGH the log
    * (`upsertBatch(opCol = …)` — deletes remove keys from the table
    * itself), and the emitted rows are the typed diff between the two
    * pinned versions: every update emits BOTH images (Delta CDF row
    * contract — consumers need the pre-image to retract), inserts
    * carry v2 values, deletes v1's last values, absent-key deletes
    * vanish (they changed nothing). No row-level event log exists
    * anywhere — the immutable manifests are the history, so ANY
    * version pair diffs on demand; the oracle constructs the expected
    * feed from the change-set definition directly. */
  val q72VersionDiff: Q = Q(
    "q72_version_diff",
    "change-data-feed between two commit-log versions (CDC in, CDF out)",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_cdf").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders,
        "o_orderkey", "o_orderkey", "o_year", batchId = 1)
      val k = col("o_orderkey")
      val updates = orders.filter(k % 7 === 0 && k % 13 =!= 0)
        .select(k, col("o_custkey"),
          (col("o_totalprice") + lit(100.0)).as("o_totalprice"),
          lit("U").as("o_orderstatus"), col("o_year"), lit("U").as("op"))
      val inserts = orders.filter(k % 97 === 0)
        .select((k + lit(100000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), lit("N").as("o_orderstatus"), col("o_year"),
          lit("U").as("op"))
      val deletes = orders.filter(k % 13 === 0)
        .select(k, col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_year"), lit("D").as("op"))
      val absentDeletes = orders.filter(k % 101 === 0)
        .select((k + lit(200000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"), col("o_year"),
          lit("D").as("op"))
      SnapshotLog.upsertBatch(s, base,
        updates.union(inserts).union(deletes).union(absentDeletes),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = Some("op"), writeCdf = false)
      SnapshotLog.diffVersions(s, base, Seq("o_orderkey"), 1L, 2L).get
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders)
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, o_year,
             'update_preimage' AS change_type
      FROM base WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice + 100.0, 'U', o_year,
             'update_postimage'
      FROM base WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'N', o_year, 'insert'
      FROM base WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, o_year, 'delete'
      FROM base WHERE o_orderkey % 13 = 0
      """))

  /** Incremental view maintenance off the change-data-feed: a per-year
    * (count, exact-decimal sum) aggregate is maintained by DELTA — feed
    * rows contribute +1/+price for insert & update_postimage and
    * −1/−price for delete & update_preimage (this retraction is exactly
    * why the CDF emits pre-images) — and the maintained result is
    * hash-graded against the oracle's FROM-SCRATCH recompute of the v2
    * state. Decimal arithmetic makes the equality exact, not
    * approximate: base + delta ≡ recompute holds bit-for-bit. The
    * at-scale point: the maintenance cost is O(changed rows), not
    * O(table) — the standard streaming-materialized-view contract,
    * here derived from the commit log's manifests alone. */
  val q73IncrementalAgg: Q = Q(
    "q73_incremental_agg",
    "aggregate maintained from the CDF delta == from-scratch recompute",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_ivm").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders,
        "o_orderkey", "o_orderkey", "o_year", batchId = 1)
      val k = col("o_orderkey")
      val updates = orders.filter(k % 7 === 0 && k % 13 =!= 0)
        .select(k, col("o_custkey"),
          (col("o_totalprice") + lit(100.0)).as("o_totalprice"),
          lit("U").as("o_orderstatus"), col("o_year"), lit("U").as("op"))
      val inserts = orders.filter(k % 97 === 0)
        .select((k + lit(100000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), lit("N").as("o_orderstatus"), col("o_year"),
          lit("U").as("op"))
      val deletes = orders.filter(k % 13 === 0)
        .select(k, col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_year"), lit("D").as("op"))
      SnapshotLog.upsertBatch(s, base,
        updates.union(inserts).union(deletes),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = Some("op"), writeCdf = false)
      val dec = DecimalType(38, 4)
      val agg0 = SnapshotLog.readVersion(s, base, 1L).get
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n0"), sum(col("o_totalprice").cast(dec)).as("t0"))
      val feed = SnapshotLog.diffVersions(s, base, Seq("o_orderkey"), 1L, 2L).get
      val sign = when(
        col("change_type").isin("insert", "update_postimage"), 1L).otherwise(-1L)
      val delta = feed.groupBy(col("o_year")).agg(
        sum(sign).as("dn"),
        sum(col("o_totalprice").cast(dec) * sign).as("dt"))
      agg0.join(delta, Seq("o_year"), "full_outer")
        .select(col("o_year"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("t0"), lit(0).cast(dec)) +
            coalesce(col("dt"), lit(0).cast(dec)))
            .cast(dec).cast(DoubleType).as("total_price"))
        .filter(col("n_orders") > 0)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
                    THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM base WHERE o_orderkey % 13 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice, o_year
        FROM base WHERE o_orderkey % 97 = 0)
      SELECT o_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE)
               AS total_price
      FROM v2 GROUP BY o_year
      """))

  /** The streaming close of the CDC loop: the commit log MATERIALIZES
    * each version's change feed at commit time (`_cdf/v*`, the Delta
    * `_change_data` idea — derived from the affected partitions only,
    * published by atomic rename), and a consumer tails it with the
    * BUILT-IN parquet file streaming source — offsets, exactly-once
    * file tracking and replay come from Structured Streaming's
    * checkpoint, not bespoke cursor code. The consumer maintains a
    * per-year aggregate incrementally (q73's signed-retraction deltas)
    * in `foreachBatch`, persisting the running state between
    * micro-batches; because the deltas commute, ANY slicing of the feed
    * into micro-batches converges to the same state, which the oracle
    * grades against a from-scratch recompute of the final version.
    * At scale each micro-batch costs O(changed rows) + a join against
    * the group-count-sized running aggregate. */
  val q74StreamCdfTail: Q = Q(
    "q74_stream_cdf_tail",
    "streaming IVM off the materialized commit-log change feed",
    (s, d) => {
      import graft.sources.SnapshotLog
      val root = java.nio.file.Files.createTempDirectory("graft_tail").toString
      val base = root + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders,
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 1,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = None, writeCdf = true)
      val k = col("o_orderkey")
      val updates = orders.filter(k % 11 === 0 && k % 17 =!= 0)
        .select(k, col("o_custkey"),
          (col("o_totalprice") + lit(50.0)).as("o_totalprice"),
          lit("V").as("o_orderstatus"), col("o_year"), lit("U").as("op"))
      val inserts = orders.filter(k % 89 === 0)
        .select((k + lit(100000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), lit("N").as("o_orderstatus"), col("o_year"),
          lit("U").as("op"))
      val deletes = orders.filter(k % 17 === 0)
        .select(k, col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_year"), lit("D").as("op"))
      SnapshotLog.upsertBatch(s, base,
        updates.union(inserts).union(deletes),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = Some("op"), writeCdf = true)
      val dec = DecimalType(38, 4)
      val schema = SnapshotLog.readCdf(s, base).get.schema
      val feed = SnapshotLog.tailCdf(s, base, schema, maxFilesPerTrigger = 64)
      var lastAgg: Option[String] = None
      val q = feed.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          val sign = when(
            col("change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L)
          val delta = batch.groupBy(col("o_year")).agg(
            sum(sign).as("dn"),
            sum(col("o_totalprice").cast(dec) * sign).as("dt"))
          val acc = lastAgg match {
            case None =>
              delta.select(col("o_year"), col("dn").as("n"),
                col("dt").cast(dec).as("t"))
            case Some(p) =>
              s.read.parquet(p).join(delta, Seq("o_year"), "full_outer")
                .select(col("o_year"),
                  (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                    .as("n"),
                  (coalesce(col("t"), lit(0).cast(dec)) +
                    coalesce(col("dt"), lit(0).cast(dec))).cast(dec).as("t"))
          }
          val out = s"$root/agg_b$bid"
          acc.write.mode("overwrite").parquet(out)
          lastAgg = Some(out)
          ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(lastAgg.get)
        .filter(col("n") > 0)
        .select(col("o_year"),
          col("n").as("n_orders"),
          col("t").cast(dec).cast(DoubleType).as("total_price"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 17 <> 0
                    THEN o_totalprice + 50.0 ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM base WHERE o_orderkey % 17 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice, o_year
        FROM base WHERE o_orderkey % 89 = 0)
      SELECT o_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE)
               AS total_price
      FROM v2 GROUP BY o_year
      """))

  /** The commit log as a FIRST-CLASS streaming source
    * ([[graft.streaming.CommitLogSourceProvider]]): offsets are
    * MANIFEST VERSIONS (the Delta streaming model), so batch
    * boundaries align to commits and a checkpointed restart resumes
    * from a version watermark — q74 tails the same feed through the
    * generic FILE stream source, where offsets are file sets. The
    * maintained aggregate is the identical signed-retraction fold, so
    * the two queries hash-grade the two offset models against the
    * same oracle recompute. In-engine: the stream must deliver
    * exactly the batch CDF's row count (exactly-once of version
    * ranges — determinism, not sink dedup). */
  val q82VersionStream: Q = Q(
    "q82_version_stream",
    "streaming source over the commit log with manifest-version offsets",
    (s, d) => {
      import graft.sources.SnapshotLog
      val root = java.nio.file.Files.createTempDirectory("graft_vstream").toString
      val base = root + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders,
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 1,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = None, writeCdf = true)
      val k = col("o_orderkey")
      val updates = orders.filter(k % 11 === 0 && k % 17 =!= 0)
        .select(k, col("o_custkey"),
          (col("o_totalprice") + lit(50.0)).as("o_totalprice"),
          lit("V").as("o_orderstatus"), col("o_year"), lit("U").as("op"))
      val inserts = orders.filter(k % 89 === 0)
        .select((k + lit(100000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), lit("N").as("o_orderstatus"), col("o_year"),
          lit("U").as("op"))
      val deletes = orders.filter(k % 17 === 0)
        .select(k, col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_year"), lit("D").as("op"))
      SnapshotLog.upsertBatch(s, base,
        updates.union(inserts).union(deletes),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = Some("op"), writeCdf = true)
      val dec = DecimalType(38, 4)
      val feed = s.readStream
        .format(classOf[graft.streaming.CommitLogSourceProvider].getName)
        .option("path", base).load()
      var lastAgg: Option[String] = None
      val rowsSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = feed.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          val sign = when(
            col("change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L)
          rowsSeen.addAndGet(batch.count())
          val delta = batch.groupBy(col("o_year")).agg(
            sum(sign).as("dn"),
            sum(col("o_totalprice").cast(dec) * sign).as("dt"))
          val acc = lastAgg match {
            case None =>
              delta.select(col("o_year"), col("dn").as("n"),
                col("dt").cast(dec).as("t"))
            case Some(p) =>
              s.read.parquet(p).join(delta, Seq("o_year"), "full_outer")
                .select(col("o_year"),
                  (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                    .as("n"),
                  (coalesce(col("t"), lit(0).cast(dec)) +
                    coalesce(col("dt"), lit(0).cast(dec))).cast(dec).as("t"))
          }
          val out = s"$root/agg_b$bid"
          acc.write.mode("overwrite").parquet(out)
          lastAgg = Some(out)
          ()
        }
        .start()
      q.awaitTermination()
      require(rowsSeen.get() == SnapshotLog.readCdf(s, base).get.count(),
        "version-offset stream must deliver exactly the CDF's rows")
      s.read.parquet(lastAgg.get)
        .filter(col("n") > 0)
        .select(col("o_year"),
          col("n").as("n_orders"),
          col("t").cast(dec).cast(DoubleType).as("total_price"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 17 <> 0
                    THEN o_totalprice + 50.0 ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM base WHERE o_orderkey % 17 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice, o_year
        FROM base WHERE o_orderkey % 89 = 0)
      SELECT o_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE)
               AS total_price
      FROM v2 GROUP BY o_year
      """))

  /** DESCRIBE HISTORY over the commit log ([[graft.sources.
    * SnapshotLog.history]]): the audit surface a table format owes its
    * operators — per-version operation names (from the `#op` manifest
    * header), commit timestamps, and metadata-only row accounting.
    * Graded in-engine over a four-operation lifecycle (UPSERT →
    * DELETE_DV → OPTIMIZE → STATS): operations come back newest-first
    * with the right names, the DV version reports its deleted-row
    * count from metadata alone, OPTIMIZE clears it, timestamps are
    * monotone non-decreasing oldest→newest, and every version's
    * metadata row count matches a scan of that version. */
  val q83History: Q = Q(
    "q83_history",
    "DESCRIBE HISTORY: per-version operations + metadata row accounting",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_hist").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val total = orders.count()
      val nDel = orders.filter(col("o_orderkey") % 97 === 0).count()
      SnapshotLog.deleteWhere(s, base, col("o_orderkey") % 97 === 0,
        "o_year", deletionVectors = true)
      SnapshotLog.optimizeTable(s, base, "o_year", statsCols = Seq("o_orderkey"))
      SnapshotLog.computeStats(s, base, Seq("o_totalprice"))

      val h = SnapshotLog.history(s, base)
        .orderBy(desc("version"))
        .collect()
      val ops = h.map(_.getAs[String]("operation")).toSeq
      val rowsByV = h.map(r =>
        r.getAs[Long]("version") -> r.getAs[Long]("n_rows")).toMap
      val delByV = h.map(r =>
        r.getAs[Long]("version") -> r.getAs[Long]("n_deleted_rows")).toMap
      val ts = h.map(_.getAs[java.sql.Timestamp]("timestamp").getTime).reverse
      val scansMatch = rowsByV.forall { case (v, n) =>
        SnapshotLog.readVersion(s, base, v).get.count() == n
      }
      import s.implicits._
      Seq((
        ops == Seq("STATS", "OPTIMIZE", "DELETE_DV", "UPSERT"),
        delByV(2L) == nDel && rowsByV(2L) == total - nDel,
        delByV(3L) == 0L && rowsByV(3L) == total - nDel,
        ts.zip(ts.tail).forall { case (a, b) => a <= b },
        scansMatch
      )).toDF("ops_named", "dv_accounting", "optimize_clears_dv",
        "timestamps_monotone", "metadata_matches_scans")
    },
    Some("""
      SELECT TRUE AS ops_named, TRUE AS dv_accounting,
             TRUE AS optimize_clears_dv, TRUE AS timestamps_monotone,
             TRUE AS metadata_matches_scans
      FROM orders LIMIT 1
      """))

  /** SQL DML on the commit log ([[graft.plans.SnapshotDmlRule]] via
    * [[graft.GraftExtensions]]): a plain `spark.sql("DELETE FROM
    * <view> WHERE …")` routes a row predicate to merge-on-read
    * deletion vectors, a partition predicate to the metadata drop,
    * and `UPDATE … SET …` to the pruned rewrite — each statement
    * re-pins the view so the NEXT SQL statement on the same name
    * reads the committed snapshot. Graded by a three-statement
    * lifecycle whose final SELECT (also SQL, on the view) must
    * hash-match the oracle's recompute, with in-engine proof that
    * the row DELETE rewrote zero files. */
  val q84SqlDml: Q = Q(
    "q84_sql_dml",
    "SQL DELETE (DV + metadata paths) and UPDATE on a commit-log view",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_sqldml84").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q84", "orders", base,
        Some("o_year"))
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get
      val y0 = orders.agg(min(col("o_year"))).first().getString(0)

      s.sql(s"DELETE FROM $view WHERE o_orderkey % 7 = 0")
      val m2 = SnapshotLog.readManifest(fs, bp).get
      require(m2.files == m1.files && m2.dvs.nonEmpty,
        "SQL row DELETE must commit deletion vectors, not rewrites")
      s.sql(s"UPDATE $view SET o_totalprice = o_totalprice * 2 " +
        s"WHERE o_orderkey % 5 = 0")
      // MERGE upsert: %9 keys overwrite (or re-insert, if the %7
      // delete removed them) with a marker price/status
      orders.filter(col("o_orderkey") % 9 === 0)
        .select(col("o_orderkey"), lit(1000.0).as("o_totalprice"),
          lit("M").as("o_orderstatus"), col("o_year"))
        .createOrReplaceTempView("q84_src")
      s.sql(s"""
        MERGE INTO $view t USING q84_src s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
      """)
      s.sql(s"DELETE FROM $view WHERE o_year = '$y0'")
      val m4 = SnapshotLog.readManifest(fs, bp).get
      require(!m4.files.contains(y0) && m4.op.contains("DELETE"),
        "SQL partition DELETE must plan metadata-only")

      s.sql(s"""
        SELECT o_year, o_orderstatus, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view
        GROUP BY o_year, o_orderstatus
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      yr AS (SELECT MIN(o_year) AS y0 FROM base),
      d1 AS (SELECT * FROM base, yr WHERE o_orderkey % 7 <> 0),
      u1 AS (SELECT o_orderkey,
                    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                         ELSE o_totalprice END AS o_totalprice,
                    o_orderstatus, o_year, y0
             FROM d1),
      m1 AS (SELECT * FROM u1 WHERE o_orderkey % 9 <> 0
             UNION ALL
             SELECT o_orderkey, 1000.0 AS o_totalprice,
                    'M' AS o_orderstatus, o_year, y0
             FROM base, yr WHERE o_orderkey % 9 = 0),
      d2 AS (SELECT * FROM m1 WHERE o_year <> y0)
      SELECT o_year, o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM d2
      GROUP BY o_year, o_orderstatus
      """))

  /** CONDITIONAL SQL MERGE — the production MERGE shape q84's
    * unconditional star-form (SET-all + INSERT-all) lifecycle doesn't
    * cover, all through
    * [[graft.plans.SnapshotDmlRule]]'s clause compiler: per-clause
    * `AND` conditions evaluated in clause order (first hit wins),
    * assignment-form UPDATE reading BOTH sides (`t.`/`s.` qualified
    * refs land on the executor's joined frame), column-list INSERT,
    * `WHEN NOT MATCHED BY SOURCE … DELETE`, a fail-fast on duplicate
    * source keys, and genuine ROW MOVES: an UPDATE that changes the
    * partition column rewrites the old partition in the same commit
    * (`extraAffected`), so the moved key exists exactly once after.
    * The oracle recomputes the whole lifecycle relationally (left
    * join + clause-order CASE chain + anti-join inserts); in-engine
    * requires prove the move happened (a year partition that only the
    * move could create) and that no key is duplicated. */
  val q85ConditionalMerge: Q = Q(
    "q85_conditional_merge",
    "SQL MERGE with conditional clauses, NMBS delete, and partition moves",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_sqldml85").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q85", "orders", base,
        Some("o_year"))
      val k = col("o_orderkey")
      // matched side: %3 keys — 'D' for %12, else 'U' with a price the
      // update condition (t < s) accepts only for %6; %21 keys carry a
      // SHIFTED year, so %42 keys (update fires AND year differs) MOVE
      val srcMatched = orders.filter(k % 3 === 0).select(
        k,
        when(k % 6 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice") * 0.5).as("o_totalprice"),
        when(k % 12 === 0, lit("D")).otherwise(lit("U")).as("flag"),
        when(k % 21 === 0,
          (col("o_year").cast(IntegerType) + 1).cast(StringType))
          .otherwise(col("o_year")).as("o_year"))
      val srcNew = orders.filter(k % 50 === 0).select(
        (k + lit(100000000L)).as("o_orderkey"),
        lit(500.0).as("o_totalprice"), lit("I").as("flag"), col("o_year"))
      srcMatched.union(srcNew).createOrReplaceTempView("q85_src")

      s.sql(s"""
        MERGE INTO $view t USING q85_src s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.flag = 'D' THEN DELETE
        WHEN MATCHED AND t.o_totalprice < s.o_totalprice THEN
          UPDATE SET o_totalprice = s.o_totalprice, o_orderstatus = 'U',
                     o_year = s.o_year
        WHEN NOT MATCHED THEN
          INSERT (o_orderkey, o_totalprice, o_orderstatus, o_year)
          VALUES (s.o_orderkey, s.o_totalprice, 'M', s.o_year)
        WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 13 = 0 THEN DELETE
      """)

      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m = SnapshotLog.readManifest(fs, bp).get
      val maxYear = orders.agg(max(col("o_year").cast(IntegerType)))
        .first().getInt(0)
      require(m.files.contains((maxYear + 1).toString),
        "a %42 key in the max year must have MOVED into a new partition")
      val after = SnapshotLog.read(s, base).get
      require(after.groupBy(col("o_orderkey")).count()
        .filter(col("count") > 1).limit(1).count() == 0,
        "no key may be duplicated after a partition-moving MERGE")

      s.sql(s"""
        SELECT o_year, o_orderstatus, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view
        GROUP BY o_year, o_orderstatus
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      src AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice * 0.5 END AS o_totalprice,
               CASE WHEN o_orderkey % 12 = 0 THEN 'D' ELSE 'U' END AS flag,
               CASE WHEN o_orderkey % 21 = 0
                    THEN CAST(CAST(o_year AS INTEGER) + 1 AS VARCHAR)
                    ELSE o_year END AS o_year
        FROM base WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, 500.0, 'I', o_year
        FROM base WHERE o_orderkey % 50 = 0),
      kept AS (
        SELECT b.o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL AND s.flag <> 'D'
                         AND b.o_totalprice < s.o_totalprice
                    THEN s.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
               CASE WHEN s.o_orderkey IS NOT NULL AND s.flag <> 'D'
                         AND b.o_totalprice < s.o_totalprice
                    THEN 'U' ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL AND s.flag <> 'D'
                         AND b.o_totalprice < s.o_totalprice
                    THEN s.o_year ELSE b.o_year END AS o_year
        FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND s.flag = 'D')
          AND NOT (s.o_orderkey IS NULL AND b.o_orderkey % 13 = 0)),
      ins AS (
        SELECT s.o_orderkey, s.o_totalprice, 'M' AS o_orderstatus, s.o_year
        FROM src s LEFT JOIN base b ON s.o_orderkey = b.o_orderkey
        WHERE b.o_orderkey IS NULL),
      final AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT o_year, o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM final GROUP BY o_year, o_orderstatus
      """))

  /** SQL CTAS + INSERT on the engine's own table format — the write
    * verbs a SQL user reaches for before MERGE, completing the DML
    * surface ([[graft.plans.SnapshotDmlRule]]): `CREATE TABLE … USING
    * graft_snapshot PARTITIONED BY … AS SELECT` commits the query
    * result as version 1 of a fresh commit log and registers it for
    * name-based SQL in the same statement (the reference's S9 gold
    * CTAS model, ref sql/ddl_gold.sql:22-23, against the commit log
    * instead of a Redshift table); `INSERT INTO … SELECT` appends new
    * files WITHOUT rewriting any existing one (manifest gains files,
    * never loses them — proven in-engine); a column-list INSERT
    * backfills unnamed columns with NULL. The oracle recomputes the
    * final state as base ∪ both inserted sets. */
  val q86SqlInsertCtas: Q = Q(
    "q86_sql_insert_ctas",
    "SQL CTAS into the commit-log format + appending INSERT INTO",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_sqlins86").toString
      val loc = root + "/orders_ctas"
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
        .createOrReplaceTempView("q86_base")
      s.sql(s"""
        CREATE TABLE q86.orders USING graft_snapshot PARTITIONED BY (o_year)
        LOCATION '$loc'
        AS SELECT o_orderkey, o_totalprice, o_orderstatus, o_year FROM q86_base
      """)
      val bp = new org.apache.hadoop.fs.Path(loc)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get
      s.sql("""
        INSERT INTO q86_orders
        SELECT o_orderkey + 200000000, o_totalprice * 0.25, 'A', o_year
        FROM q86_base WHERE o_orderkey % 40 = 0
      """)
      s.sql("""
        INSERT INTO q86_orders (o_orderkey, o_totalprice, o_year)
        SELECT o_orderkey + 300000000, 250.0, o_year
        FROM q86_base WHERE o_orderkey % 77 = 0
      """)
      val m3 = SnapshotLog.readManifest(fs, bp).get
      require(m3.version == m1.version + 2 && m3.op.contains("APPEND"),
        "two INSERTs must commit two APPEND versions")
      require(m1.allFiles.toSet.subsetOf(m3.allFiles.toSet),
        "INSERT INTO must never rewrite or drop an existing file")
      s.sql("""
        SELECT o_year, COALESCE(o_orderstatus, 'none') AS status,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM q86_orders
        GROUP BY o_year, COALESCE(o_orderstatus, 'none')
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      final AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus, o_year FROM base
        UNION ALL
        SELECT o_orderkey + 200000000, o_totalprice * 0.25, 'A', o_year
        FROM base WHERE o_orderkey % 40 = 0
        UNION ALL
        SELECT o_orderkey + 300000000, 250.0, NULL, o_year
        FROM base WHERE o_orderkey % 77 = 0)
      SELECT o_year, COALESCE(o_orderstatus, 'none') AS status,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM final GROUP BY o_year, COALESCE(o_orderstatus, 'none')
      """))

  /** TIME-TRAVEL SQL over the commit log: `VERSION AS OF n` pins a
    * historical snapshot inside any query (the parser's
    * RelationTimeTravel node, which Spark reserves for DSv2 tables,
    * rewritten by [[graft.plans.SnapshotDmlRule]] onto the pinned
    * manifest's planner-integrated relation — same file skipping as
    * the live read), and `TIMESTAMP AS OF` resolves through manifest
    * publish times. [[graft.sources.SnapshotLog.readVersion]] is the
    * Scala form; this grades the SQL surface: one statement reads
    * versions 1 and 3 of a DELETE→UPDATE lifecycle side by side, and
    * the oracle recomputes both states relationally. In-engine,
    * `TIMESTAMP AS OF` at a far-future instant must agree with the
    * newest version. */
  val q87TimeTravelSql: Q = Q(
    "q87_time_travel_sql",
    "VERSION AS OF / TIMESTAMP AS OF across a DML lifecycle",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_sqltt87").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)                       // v1
      val view = Catalog.registerSnapshotLog(s, "q87", "orders", base,
        Some("o_year"))
      s.sql(s"DELETE FROM $view WHERE o_orderkey % 7 = 0")    // v2 (DVs)
      s.sql(s"UPDATE $view SET o_totalprice = o_totalprice * 2 " +
        s"WHERE o_orderkey % 5 = 0")                          // v3

      val nowCount = s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0)
      require(s.sql(
        s"SELECT COUNT(*) FROM $view TIMESTAMP AS OF '2100-01-01'")
        .head.getLong(0) == nowCount,
        "TIMESTAMP AS OF in the far future must read the newest version")

      s.sql(s"""
        SELECT v, o_year, n, total FROM (
          SELECT 1 AS v, o_year, COUNT(*) AS n,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                      AS DECIMAL(38,4)) AS DOUBLE) AS total
          FROM $view VERSION AS OF 1 GROUP BY o_year
          UNION ALL
          SELECT 3 AS v, o_year, COUNT(*) AS n,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                      AS DECIMAL(38,4)) AS DOUBLE) AS total
          FROM $view VERSION AS OF 3 GROUP BY o_year)
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      v3 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM base WHERE o_orderkey % 7 <> 0)
      SELECT 1 AS v, o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM base GROUP BY o_year
      UNION ALL
      SELECT 3 AS v, o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM v3 GROUP BY o_year
      """))

  /** SHARDED manifests at work across a DML lifecycle — the format's
    * 10⁷-file scale path: past `ShardFileThreshold` live files (here
    * forced by opt-in) the root version file holds one `#shard`
    * pointer per partition (rel path + file/row/DV rollups + content
    * hash) and per-file lines live in immutable side files. The graded
    * requires prove the three scale contracts on REAL commits: (1) a
    * commit touching one partition reuses every other partition's
    * shard file byte-for-byte (O(touched) commit IO, not O(table)),
    * (2) DESCRIBE HISTORY answers from pointer rollups alone and its
    * row counts track the lifecycle exactly, (3) a partition-pruned
    * read through the pruned-manifest path returns precisely that
    * partition. The emitted rows are the final table state per year,
    * recomputed relationally by the oracle. */
  val q88ShardedManifest: Q = Q(
    "q88_sharded_manifest",
    "sharded manifest lifecycle: pointer reuse, rollup history, pruned reads",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_shard88").toString + "/tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      SnapshotLog.enableSharding(fs, bp)
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      val n0 = orders.count()
      val minYear = orders.agg(min(col("o_year"))).head.getString(0)
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)                        // v1
      def ptrs(v: Long): Map[String, String] = {
        val p = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(bp, "_log"), f"v$v%011d.txt")
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        text.split("\n").toSeq.filter(_.startsWith("#shard\t"))
          .map { l => val a = l.split("\t"); (a(1), a(2)) }.toMap
      }
      val p1 = ptrs(1)
      require(p1.size > 1, s"expected a sharded multi-partition root: $p1")

      // v2: double prices in ONE partition (the earliest year)
      SnapshotLog.upsertBatch(s, base,
        orders.filter(col("o_year") === minYear)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Seq("o_orderkey"), clusterBy = Nil,
        clusterFiles = 4, opCol = None, writeCdf = false)
      val p2 = ptrs(2)
      require(p2(minYear) != p1(minYear),
        "the touched partition must get a fresh shard file")
      require((p1.keySet - minYear).forall(y => p2(y) == p1(y)),
        "untouched partitions must reuse their shard files byte-for-byte")

      // v3: merge-on-read DV delete across partitions
      SnapshotLog.deleteWhere(s, base, col("o_orderkey") % 7 === 0,
        "o_year", deletionVectors = true).get
      val nDel = orders.filter(col("o_orderkey") % 7 === 0).count()

      // DESCRIBE HISTORY from pointer rollups alone tracks the
      // lifecycle row-exactly
      val hist = SnapshotLog.history(s, base)
        .select(col("version"), col("n_rows")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(hist(1L) == n0 && hist(2L) == n0 && hist(3L) == n0 - nDel,
        s"history rollups drifted: $hist vs n0=$n0 del=$nDel")

      // partition-pruned read: exactly the min-year rows, post-lifecycle
      val pruned = SnapshotLog.readPartitions(s, base, Seq(minYear)).get
      val wantMin = orders.filter(
        col("o_year") === minYear && col("o_orderkey") % 7 =!= 0).count()
      require(pruned.count() == wantMin, "pruned read drifted")

      // time travel to the sharded v1 sees the pre-lifecycle state
      require(SnapshotLog.readVersion(s, base, 1).get.count() == n0,
        "time travel across sharded versions drifted")

      SnapshotLog.read(s, base).get
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(38, 4)))
            .cast(DecimalType(38, 4)).cast(DoubleType).as("total"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_year = (SELECT MIN(o_year) FROM base)
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM base),
      v3 AS (SELECT * FROM v2 WHERE o_orderkey % 7 <> 0)
      SELECT o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM v3 GROUP BY o_year
      """))

  /** SQL MAINTENANCE verbs — `RESTORE … TO VERSION AS OF`, `OPTIMIZE`,
    * `VACUUM … RETAIN n HOURS` — parsed by the engine's delegating
    * parser extension ([[graft.plans.SnapshotMaintenanceParser]], the
    * Delta/Iceberg model for verbs outside Spark's grammar) and
    * executed over the same primitives as the Scala API. The lifecycle
    * is the production incident drill: a bad UPDATE zeroes a third of
    * the prices → RESTORE rolls back append-only (history keeps the
    * bad version for audit; metadata-only, data files shared) → a DV
    * DELETE trims rows → OPTIMIZE compacts the whole table in ONE
    * transaction, materializing the DVs and re-recording stats bounds
    * → history is expired and VACUUM reclaims the unreferenced files.
    * Every stage is require-graded in-engine (zeroed sum, restored
    * sum, file shrink, DV materialization, reclaim count, stable row
    * set); the emitted rows are the final per-year state, recomputed
    * relationally by the oracle. */
  val q89SqlMaintenance: Q = Q(
    "q89_sql_maintenance",
    "SQL OPTIMIZE / VACUUM / RESTORE verbs via the parser extension",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_maint89").toString + "/tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      val n0 = orders.count()
      val sum0 = orders.agg(sum(col("o_totalprice").cast(DecimalType(38, 4))))
        .head.getDecimal(0)
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)                       // v1
      val view = Catalog.registerSnapshotLog(s, "q89", "orders", base,
        Some("o_year"))

      // the bad deploy: a wrong UPDATE zeroes a third of the prices
      s.sql(s"UPDATE $view SET o_totalprice = 0 WHERE o_orderkey % 3 = 0")
      require(s.sql(s"SELECT COUNT(*) FROM $view WHERE o_totalprice = 0")
        .head.getLong(0) >= n0 / 4, "the bad UPDATE must have landed")

      // RESTORE: append-only rollback, metadata-only
      val r = s.sql(s"RESTORE TABLE $view TO VERSION AS OF 1").collect()
      require(r.head.getString(0) == "RESTORE" && r.head.getLong(2) == 1L)
      val sumBack = s.sql(s"SELECT SUM(CAST(o_totalprice AS DECIMAL(38,4)))" +
        s" FROM $view").head.getDecimal(0)
      require(sumBack.compareTo(sum0) == 0,
        s"RESTORE must recover the exact sum ($sumBack vs $sum0)")
      val ops = SnapshotLog.history(s, base)
        .select("operation").collect().map(_.getString(0)).toSeq
      require(ops.contains("RESTORE") && ops.contains("UPDATE"),
        s"history must keep both the bad version and the rollback: $ops")

      // trim rows merge-on-read, then compact it all away in ONE commit
      s.sql(s"DELETE FROM $view WHERE o_orderkey % 7 = 0")
      require(SnapshotLog.readManifest(fs, bp).get.dvs.nonEmpty,
        "the SQL DELETE must take the deletion-vector path")
      val opt = s.sql(s"OPTIMIZE $view").collect().head
      require(opt.getString(0) == "OPTIMIZE" &&
        opt.getLong(3) < opt.getLong(2),
        s"OPTIMIZE must shrink the file count: $opt")
      val mOpt = SnapshotLog.readManifest(fs, bp).get
      require(mOpt.dvs.isEmpty, "OPTIMIZE must materialize deletion vectors")
      require(mOpt.stats.values.exists(_.contains("o_orderkey")),
        "stats bounds must survive OPTIMIZE")

      // expire history, then SQL VACUUM reclaims the unreferenced files
      SnapshotLog.expireVersions(s, base, keepLast = 1)
      val vac = s.sql(s"VACUUM $view RETAIN 0 HOURS").collect().head
      require(vac.getString(0) == "VACUUM" && vac.getLong(1) > 0L,
        s"post-expiry VACUUM must reclaim files: $vac")

      val nDel = orders.filter(col("o_orderkey") % 7 === 0).count()
      require(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0)
        == n0 - nDel, "the row set must be stable through maintenance")

      s.sql(s"""
        SELECT o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders)
      SELECT o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM base WHERE o_orderkey % 7 <> 0 GROUP BY o_year
      """))

  /** CHANGE DATA FEED AS SQL — `graft_table_changes('view', from, to)`
    * (Delta's `table_changes` table function) through
    * `injectTableFunction`: the per-commit feed the storage layer
    * materializes at commit time (O(changed partitions), never a
    * full-table diff) becomes a plain FROM-clause relation, version-
    * filtered on `_commit_version`. The lifecycle drives one UPDATE
    * batch (feed rows: update_preimage + update_postimage per key,
    * emitted only where values actually changed) and one DV DELETE
    * (typed delete rows carrying the deleted values), then aggregates
    * the feed BY version and change type in SQL — the oracle recomputes
    * the same feed relationally from the base table, so row counts,
    * types, and summed amounts must all match. */
  val q90TableChangesSql: Q = Q(
    "q90_table_changes_sql",
    "CDF as a SQL table function: graft_table_changes(view, from, to)",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_cdf90").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = true)                        // v1
      // v2: UPDATE batch — double the price of every fifth key
      SnapshotLog.upsertBatch(s, base,
        orders.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Seq("o_orderkey"), clusterBy = Nil,
        clusterFiles = 4, opCol = None, writeCdf = true)
      // v3: DV DELETE of every seventh key, feed rows carry the
      // deleted values as of v2
      SnapshotLog.deleteWhere(s, base, col("o_orderkey") % 7 === 0,
        "o_year", deletionVectors = true, writeCdf = true).get
      val view = Catalog.registerSnapshotLog(s, "q90", "orders", base,
        Some("o_year"))

      // full-range and open-ended reads agree (the upper bound is
      // optional, Delta-style)
      require(s.sql(
        s"SELECT COUNT(*) FROM graft_table_changes('$view', 2)")
        .head.getLong(0) ==
        s.sql(s"SELECT COUNT(*) FROM graft_table_changes('$view', 2, 3)")
          .head.getLong(0),
        "open-ended version range must read to the newest feed version")
      // version pruning: the v2-only slice holds no delete rows
      require(s.sql(s"SELECT COUNT(*) FROM graft_table_changes('$view', 2, 2)" +
        s" WHERE change_type = 'delete'").head.getLong(0) == 0L)

      s.sql(s"""
        SELECT _commit_version AS v, change_type, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM graft_table_changes('$view', 2, 3)
        GROUP BY _commit_version, change_type
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      upd AS (SELECT * FROM base WHERE o_orderkey % 5 = 0),
      v2state AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM base),
      feed AS (
        SELECT CAST(2 AS BIGINT) AS v, 'update_preimage' AS change_type,
               o_totalprice FROM upd
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'update_postimage', o_totalprice * 2 FROM upd
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'delete', o_totalprice
        FROM v2state WHERE o_orderkey % 7 = 0)
      SELECT v, change_type, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM feed GROUP BY v, change_type
      """))

  /** METADATA-ONLY SQL introspection — `SHOW PARTITIONS` and
    * `DESCRIBE HISTORY` on commit-log views through the maintenance
    * parser. The scale point: on a SHARDED table both answer from the
    * ROOT manifest's pointer rollups — zero shard opens, zero data IO
    * (`SnapshotLog.partitionSummary` / `history`) — yet the row
    * counts are exact LIVE counts (physical minus deletion-vector
    * cardinality). The lifecycle shards the table, DV-deletes a
    * seventh of the rows via SQL, and emits SHOW PARTITIONS' counts,
    * which the oracle recomputes by actually grouping the base table
    * — the metadata path must match a real scan row-for-row. */
  val q91ShowPartitions: Q = Q(
    "q91_show_partitions",
    "SHOW PARTITIONS / DESCRIBE HISTORY answer from the root manifest",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_parts91").toString + "/tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      SnapshotLog.enableSharding(fs, bp)
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q91", "orders", base,
        Some("o_year"))
      s.sql(s"DELETE FROM $view WHERE o_orderkey % 7 = 0") // DVs

      // DESCRIBE HISTORY via SQL equals the Scala surface exactly
      val viaSql = s.sql(s"DESCRIBE HISTORY $view")
        .select("version", "operation", "n_files", "n_rows").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val viaApi = SnapshotLog.history(s, base)
        .select("version", "operation", "n_files", "n_rows").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      require(viaSql == viaApi && viaSql.size == 2,
        s"SQL history drifted from the API: $viaSql vs $viaApi")

      // the counts below come from pointer rollups with every shard
      // hidden — rename them away, answer, restore (the metadata-only
      // proof, not just a claim)
      val logDir = new org.apache.hadoop.fs.Path(bp, "_log")
      val shards = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("s") && n.endsWith(".txt"))
      require(shards.nonEmpty, "expected a sharded table")
      shards.foreach(n => fs.rename(
        new org.apache.hadoop.fs.Path(logDir, n),
        new org.apache.hadoop.fs.Path(logDir, n + ".bak")))
      val out =
        try s.sql(s"SHOW PARTITIONS $view")
          .select(col("partition").as("o_year"), col("n_rows").as("n"))
          .collect().toSeq
        finally shards.foreach(n => fs.rename(
          new org.apache.hadoop.fs.Path(logDir, n + ".bak"),
          new org.apache.hadoop.fs.Path(logDir, n)))
      require(out.forall(_.getLong(1) >= 0L),
        "every partition must carry a recorded live count")
      import s.implicits._
      out.map(r => (r.getString(0), r.getLong(1))).toDF("o_year", "n")
    },
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
             COUNT(*) AS n
      FROM orders WHERE o_orderkey % 7 <> 0 GROUP BY o_year
      """))

  /** CHECK CONSTRAINTS — `ALTER TABLE … ADD/DROP CONSTRAINT … CHECK`
    * on commit-log tables, versioned IN the manifest (every write op
    * carries them forward; RESTORE rolls them back with the data) and
    * enforced on every write path (INSERT/append, MERGE/upsert,
    * UPDATE) in one aggregation pass with SQL CHECK NULL semantics.
    * The lifecycle: a positivity constraint lands (validating existing
    * data first, Delta-style), a violating INSERT is rejected
    * all-or-nothing, a conforming INSERT passes, a constraint the
    * live data already violates is refused with the violation count,
    * a violating UPDATE is rejected, then DROP re-admits the formerly
    * bad rows — and the final state (base + conforming insert + post-
    * drop insert) is recomputed relationally by the oracle. */
  val q92CheckConstraints: Q = Q(
    "q92_check_constraints",
    "ALTER TABLE ADD/DROP CONSTRAINT CHECK, enforced on every write path",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_check92").toString + "/tbl"
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      orders.createOrReplaceTempView("q92_base")
      val n0 = orders.count()
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q92", "orders", base,
        Some("o_year"))

      def chain(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      def failureOf(body: => Any): String = {
        val r = scala.util.Try(body)
        require(r.isFailure, "expected the statement to be rejected")
        chain(r.failed.get)
      }
      val add = s.sql(s"ALTER TABLE $view ADD CONSTRAINT price_pos " +
        "CHECK (o_totalprice > 0)").collect().head
      require(add.getString(0) == "ADD CONSTRAINT" && add.getLong(1) == 2L)
      require(SnapshotLog.readManifest(fs, bp).get
        .constraints.contains("price_pos"))

      // violating INSERT: rejected all-or-nothing
      val bad = failureOf(s.sql(s"""
        INSERT INTO $view
        SELECT o_orderkey + 10000000, -o_totalprice, o_year
        FROM q92_base WHERE o_orderkey % 97 = 0"""))
      require(bad.contains("CHECK"), s"expected a CHECK violation: $bad")
      require(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == n0,
        "a rejected batch must leave the table untouched")

      // conforming INSERT: passes the gate
      s.sql(s"""
        INSERT INTO $view
        SELECT o_orderkey + 20000000, o_totalprice + 1000, o_year
        FROM q92_base WHERE o_orderkey % 89 = 0""")

      // a constraint the live data violates is refused, with counts
      val refused = failureOf(s.sql(s"ALTER TABLE $view " +
        "ADD CONSTRAINT small CHECK (o_totalprice < 100)"))
      require(refused.contains("CHECK") && refused.contains("row"))

      // violating UPDATE: rejected by the same gate
      val badUpd = failureOf(s.sql(s"UPDATE $view " +
        "SET o_totalprice = -1 WHERE o_orderkey % 13 = 0"))
      require(badUpd.contains("CHECK"))

      // DROP re-admits the formerly bad rows
      s.sql(s"ALTER TABLE $view DROP CONSTRAINT price_pos")
      s.sql(s"""
        INSERT INTO $view
        SELECT o_orderkey + 10000000, -o_totalprice, o_year
        FROM q92_base WHERE o_orderkey % 97 = 0""")
      val ops = SnapshotLog.history(s, base)
        .select("operation").collect().map(_.getString(0)).toSet
      require(Set("ADD_CONSTRAINT", "DROP_CONSTRAINT").subsetOf(ops),
        s"constraint DDL must appear in history: $ops")

      s.sql(s"""
        SELECT o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      finalstate AS (
        SELECT o_totalprice, o_year FROM base
        UNION ALL
        SELECT o_totalprice + 1000, o_year FROM base WHERE o_orderkey % 89 = 0
        UNION ALL
        SELECT -o_totalprice, o_year FROM base WHERE o_orderkey % 97 = 0)
      SELECT o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM finalstate GROUP BY o_year
      """))

  /** SHALLOW CLONE — `CREATE TABLE db.t SHALLOW CLONE v LOCATION …`:
    * a zero-copy fork whose v1 references the source's data files by
    * absolute path (stats, blooms, DVs, constraints carried over,
    * O(manifest) work, zero bytes moved) and then diverges
    * COPY-ON-WRITE — a write rewrites only the touched partitions
    * into the clone's own tree while untouched partitions keep
    * reading the source's files. The lifecycle proves isolation both
    * ways (a clone UPDATE leaves the source byte-identical; a source
    * DELETE leaves the clone untouched) and the zero-copy claim
    * itself (the clone starts with NO data directory, and after its
    * first write still references source files absolutely). Emitted:
    * both tables' per-year states side by side, recomputed
    * relationally by the oracle. */
  val q93ShallowClone: Q = Q(
    "q93_shallow_clone",
    "zero-copy SHALLOW CLONE with copy-on-write divergence",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val root =
        java.nio.file.Files.createTempDirectory("graft_clone93").toString
      val base = s"$root/src"
      val fork = s"$root/fork"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)
      val src = Catalog.registerSnapshotLog(s, "q93", "orders", base,
        Some("o_year"))
      s.sql(s"DELETE FROM $src WHERE o_orderkey % 7 = 0") // DVs pre-clone

      val r = s.sql(s"CREATE TABLE q93.fork SHALLOW CLONE $src " +
        s"LOCATION '$fork'").collect().head
      require(r.getString(0) == "SHALLOW CLONE" && r.getLong(1) == 1L)
      val forkView = r.getString(2)
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$fork/data")),
        "a shallow clone must copy ZERO data files")
      val nLive = s.sql(s"SELECT COUNT(*) FROM $src").head.getLong(0)
      require(s.sql(s"SELECT COUNT(*) FROM $forkView").head.getLong(0)
        == nLive, "the clone must read the source's exact live rows")

      // diverge the CLONE in ONE partition: only it materializes
      val minYear = orders.agg(min(col("o_year"))).head.getString(0)
      s.sql(s"UPDATE $forkView SET o_totalprice = o_totalprice * 3 " +
        s"WHERE o_orderkey % 5 = 0 AND o_year = '$minYear'")
      val mF = SnapshotLog.readManifest(fs,
        new org.apache.hadoop.fs.Path(fork)).get
      require(mF.allFiles.exists(_.startsWith("/")),
        "untouched partitions must still reference the source absolutely")
      require(mF.allFiles.exists(f => !f.startsWith("/")),
        "touched partitions must have materialized into the clone's tree")
      val srcSum = s.sql(s"SELECT SUM(CAST(o_totalprice AS DECIMAL(38,4)))" +
        s" FROM $src").head.getDecimal(0)
      val origSum = orders.filter(col("o_orderkey") % 7 =!= 0)
        .agg(sum(col("o_totalprice").cast(DecimalType(38, 4))))
        .head.getDecimal(0)
      require(srcSum.compareTo(origSum) == 0,
        "the clone's UPDATE must leave the source byte-identical")

      // diverge the SOURCE: the clone must not see it
      s.sql(s"DELETE FROM $src WHERE o_orderkey % 11 = 0")
      require(s.sql(s"SELECT COUNT(*) FROM $forkView").head.getLong(0)
        == nLive, "a source DELETE must be invisible to the clone")

      s.sql(s"""
        SELECT 'src' AS side, o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $src GROUP BY o_year
        UNION ALL
        SELECT 'fork' AS side, o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $forkView GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      live AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
      srcf AS (SELECT * FROM live WHERE o_orderkey % 11 <> 0),
      forkf AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0
                     AND o_year = (SELECT MIN(o_year) FROM base)
                    THEN o_totalprice * 3
                    ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM live)
      SELECT 'src' AS side, o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM srcf GROUP BY o_year
      UNION ALL
      SELECT 'fork' AS side, o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM forkf GROUP BY o_year
      """))

  /** Per-file BLOOM filters in the commit-log manifest — the
    * point-lookup complement to q70's min/max bounds: the layout is
    * range-clustered on `user_id` (so user_id is range-prunable), which
    * makes `event_id` scatter across every file — min/max can prune
    * NOTHING for an event_id equality probe. [[graft.sources.
    * SnapshotLog.buildBlooms]] commits a metadata-only version adding a
    * per-file bloom on event_id (Delta bloom-index / Iceberg puffin
    * model), and the graded assertions measure what planning then
    * skips: 8 present-key lookups touch ≤ ¼ of the file•lookup grid
    * (each key lives in exactly 1 of 16 files; the rest are bloom
    * negatives, which are DEFINITIVE), absent keys prune nearly
    * everything, and every bloom-pruned read equals the full-scan
    * answer (no false negatives — the bloom guarantee, verified not
    * asserted). */
  val q75BloomFileSkip: Q = Q(
    "q75_bloom_file_skip",
    "manifest blooms: point lookups on a non-clustered key skip files",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/tbl"
      val ev = t(s, d, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("part", lit("all"))
      SnapshotLog.upsertBatch(s, base, ev, Seq("event_id"), "event_id", "part",
        batchId = 1, maxRetries = 5, statsCols = Seq("user_id"),
        clusterBy = Seq("user_id"), clusterFiles = 16, opCol = None,
        writeCdf = false)
      SnapshotLog.buildBlooms(s, base, Seq("event_id"), fpp = 0.02)
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val m = SnapshotLog.readManifest(fs, new org.apache.hadoop.fs.Path(base)).get
      val total = m.allFiles.size.toLong
      // 8 deterministic present keys spread across the id domain
      val keys = ev.select(col("event_id")).orderBy(col("event_id")).limit(8)
        .collect().map(_.getLong(0)).toSeq
      val probed = keys.map(k =>
        SnapshotLog.filesForKey(m, "event_id", k).size.toLong).sum
      val full = SnapshotLog.read(s, base).get.persist()
      val correct = keys.forall { k =>
        val viaBloom = SnapshotLog.readPoint(s, base, "event_id", k)
          .map(_.select("event_id", "user_id", "value").collect().toSet)
          .getOrElse(Set.empty)
        val scan = full.filter(col("event_id") === k)
          .select("event_id", "user_id", "value").collect().toSet
        viaBloom == scan
      }
      val absentProbed = (1 to 4).map(i =>
        SnapshotLog.filesForKey(m, "event_id", -1000000L - i).size.toLong).sum
      val n = full.count()
      import s.implicits._
      Seq((n, total >= 2, correct,
        probed <= keys.size * total / 4,
        absentProbed <= 4L * total / 4))
        .toDF("n_events", "multi_file", "lookups_correct",
          "bloom_skips_most", "absent_skips_most")
    },
    Some("""
      SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events,
             TRUE AS multi_file,
             TRUE AS lookups_correct,
             TRUE AS bloom_skips_most,
             TRUE AS absent_skips_most
      FROM events
      WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      """))

  /** Incremental maintenance of a JOIN view off TWO commit-log tables'
    * change feeds — the step past q73 (single-table IVM): the per-nation
    * revenue view V = customer ⋈ orders → groupBy is maintained by the
    * bilinear delta rule over signed multisets,
    *
    *   V(A_new, B_new) = V(A_old, B_old) + V(A_old, ΔB) + V(ΔA, B_new)
    *
    * (updates enter as −pre/+post retraction pairs, so a customer whose
    * nation CHANGES moves its orders' revenue between groups, and the
    * cross-term cancellation — e.g. an order inserted for a customer
    * deleted in the same round — falls out of the algebra, no special
    * cases). Cost is two Δ-sided joins + group-sized combines instead
    * of a full re-join: O(changed rows ⋈ state), the differential-
    * dataflow contract derived purely from the manifests. Decimal
    * arithmetic makes maintained ≡ recomputed EXACT; the oracle grades
    * it by recomputing the final join from scratch. */
  val q76JoinIvm: Q = Q(
    "q76_join_ivm",
    "join-view IVM: two tables' CDFs maintain per-nation revenue exactly",
    (s, d) => {
      import graft.sources.SnapshotLog
      val root = java.nio.file.Files.createTempDirectory("graft_jivm").toString
      val (tc, to) = (root + "/cust", root + "/ord")
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .withColumn("nat", col("c_nationkey").cast(StringType))
      val ords = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, tc, cust, "c_custkey", "c_custkey", "nat", 1)
      SnapshotLog.upsertBatch(s, to, ords, "o_orderkey", "o_orderkey", "o_year", 1)
      val ck = col("c_custkey")
      val custChanges =
        cust.filter(ck % 6 === 0 && ck % 9 =!= 0)
          .withColumn("c_nationkey", (col("c_nationkey") + 1) % 25)
          .withColumn("nat", col("c_nationkey").cast(StringType))
          .withColumn("op", lit("U"))
        .union(cust.filter(ck % 9 === 0).withColumn("op", lit("D")))
      SnapshotLog.upsertBatch(s, tc, custChanges,
        Seq("c_custkey"), "c_custkey", "nat", batchId = 2, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = Some("op"), writeCdf = false)
      val ok = col("o_orderkey")
      val ordChanges =
        ords.filter(ok % 7 === 0 && ok % 13 =!= 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
          .withColumn("op", lit("U"))
        .union(ords.filter(ok % 97 === 0)
          .withColumn("o_orderkey", ok + lit(100000000L))
          .withColumn("op", lit("U")))
        .union(ords.filter(ok % 13 === 0).withColumn("op", lit("D")))
      SnapshotLog.upsertBatch(s, to, ordChanges,
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
        opCol = Some("op"), writeCdf = false)

      val dec = DecimalType(38, 4)
      val sgn = when(
        col("change_type").isin("insert", "update_postimage"), 1L).otherwise(-1L)
      // cached: aOld feeds BOTH the v0 baseline join and the ΔB delta
      // join — one snapshot scan instead of two (guide §5)
      val aOld = graft.core.Caching.cached(
        SnapshotLog.readVersion(s, tc, 1L).get
          .select(col("c_custkey"), col("c_nationkey")))
      val bOld = SnapshotLog.readVersion(s, to, 1L).get
        .select(col("o_custkey"), col("o_totalprice"))
      val bNew = SnapshotLog.read(s, to).get
        .select(col("o_custkey"), col("o_totalprice"))
      val dA = SnapshotLog.diffVersions(s, tc, Seq("c_custkey"), 1L, 2L).get
        .select(col("c_custkey"), col("c_nationkey"), sgn.as("s"))
      val dB = SnapshotLog.diffVersions(s, to, Seq("o_orderkey"), 1L, 2L).get
        .select(col("o_custkey"), col("o_totalprice"), sgn.as("s"))
      def agg(df: DataFrame) = df
        .groupBy(col("c_nationkey"))
        .agg(sum(col("s")).as("dn"),
          sum(col("o_totalprice").cast(dec) * col("s")).as("dt"))
      val v0 = aOld.join(bOld, aOld("c_custkey") === bOld("o_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n0"), sum(col("o_totalprice").cast(dec)).as("t0"))
      val d1 = agg(aOld.join(dB, aOld("c_custkey") === dB("o_custkey")))
      val d2 = agg(dA.join(bNew, dA("c_custkey") === bNew("o_custkey")))
      v0.join(d1, Seq("c_nationkey"), "full_outer")
        .join(d2.withColumnRenamed("dn", "dn2").withColumnRenamed("dt", "dt2"),
          Seq("c_nationkey"), "full_outer")
        .select(col("c_nationkey"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)) +
            coalesce(col("dn2"), lit(0L))).as("n_orders"),
          (coalesce(col("t0"), lit(0).cast(dec)) +
            coalesce(col("dt"), lit(0).cast(dec)) +
            coalesce(col("dt2"), lit(0).cast(dec)))
            .cast(dec).cast(DoubleType).as("total_price"))
        .filter(col("n_orders") > 0)
    },
    Some("""
      WITH cust2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 6 = 0 THEN (c_nationkey + 1) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE c_custkey % 9 <> 0),
      ord2 AS (
        SELECT o_custkey,
               CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
                    THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 13 <> 0
        UNION ALL
        SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 97 = 0)
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE)
               AS total_price
      FROM cust2 JOIN ord2 ON c_custkey = o_custkey
      GROUP BY c_nationkey
      """))

  /** COUNT(*) answered from manifest metadata ALONE — the Iceberg
    * snapshot-summary idea: the stats pass already touches every staged
    * file, so each manifest entry carries its file's row count for
    * free, and a table/partition count plan reads kilobytes of
    * manifest instead of opening data files (at 100 TB: a metadata
    * lookup vs a 10^5-file scan). Totality is the graded edge: counts
    * survive TWO merge batches' bookkeeping (replaced files' entries
    * dropped, staged files' added), per-partition metadata counts
    * equal the scanned groupBy, and the manifest total hash-matches
    * the oracle's recount of the final state. Partial metadata
    * (statsCols-less writes) returns None — degrade to a scan, never
    * to a wrong number (spec-covered). */
  val q77MetadataCount: Q = Q(
    "q77_metadata_count",
    "COUNT(*) and per-partition counts from the manifest, no data files opened",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_mcount").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders,
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 1,
        maxRetries = 5, statsCols = Seq("o_totalprice"), clusterBy = Nil,
        clusterFiles = 16, opCol = None, writeCdf = false)
      val k = col("o_orderkey")
      val changes = orders.filter(k % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
        .union(orders.filter(k % 97 === 0)
          .withColumn("o_orderkey", k + lit(100000000L)))
      SnapshotLog.upsertBatch(s, base, changes,
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Seq("o_totalprice"), clusterBy = Nil,
        clusterFiles = 16, opCol = None, writeCdf = false)
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val m = SnapshotLog.readManifest(fs, new org.apache.hadoop.fs.Path(base)).get
      val metaTotal = SnapshotLog.countRows(m).get
      val metaParts = SnapshotLog.partitionCounts(m).get
      val scanParts = SnapshotLog.read(s, base).get
        .groupBy(col("o_year")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      import s.implicits._
      Seq((metaTotal,
        metaParts == scanParts,
        metaParts.values.sum == metaTotal))
        .toDF("n_orders", "partition_counts_match_scan", "total_is_partition_sum")
    },
    Some("""
      SELECT CAST(COUNT(*) + COUNT(*) FILTER (o_orderkey % 97 = 0) AS BIGINT)
               AS n_orders,
             TRUE AS partition_counts_match_scan,
             TRUE AS total_is_partition_sum
      FROM orders
      """))

  /** Predicate DELETE through the commit log
    * ([[graft.sources.SnapshotLog.deleteWhere]]) — the DML verb the
    * upsert/CDC surface lacked (ref's pipeline only ever upserts;
    * retention/GDPR-style deletion is table stakes for a real table
    * format). Two deletes run back to back and the builder asserts
    * each took the plan it must take at scale:
    *
    *  - a PARTITION predicate (`o_year = <min year>`) plans
    *    METADATA-ONLY: whole partitions drop out of the manifest, zero
    *    data files are read or rewritten, and every surviving partition
    *    keeps its EXACT file list (asserted manifest-to-manifest — at
    *    100 TB this is a kilobyte manifest commit, not a data job);
    *  - a ROW predicate (`o_year = <max year> AND o_totalprice >
    *    300000`) takes the rewrite path, but rewrites ONLY the one
    *    partition holding matching rows (asserted: every other
    *    partition keeps its exact file list) — the matching set found
    *    by one column-pruned scan with parquet footer pushdown.
    *
    * Deleted data still time-travels at the old versions (asserted).
    * Graded: the surviving table re-aggregated per (year, status)
    * hash-equals the oracle's recompute from the predicates'
    * complement — DELETE semantics (TRUE goes, FALSE/NULL stays)
    * composed across both paths. */
  val q78PredicateDelete: Q = Q(
    "q78_predicate_delete",
    "predicate DELETE: metadata-only partition drop + pruned row rewrite",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_del").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders,
        "o_orderkey", "o_orderkey", "o_year", batchId = 1)
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get
      // year bounds derived from data (the synthetic date range is not
      // TPC-H's) — two scalar aggs, same derivation the oracle does
      val Array(y0, y1) = orders
        .agg(min(col("o_year")), max(col("o_year"))).first() match {
          case r => Array(r.getString(0), r.getString(1))
        }

      val o1 = SnapshotLog.deleteWhere(s, base,
        col("o_year") === y0, "o_year").get
      require(o1.metadataOnly && o1.rewrittenPartitions.isEmpty &&
        o1.droppedPartitions == Seq(y0),
        s"partition predicate must plan metadata-only, got $o1")
      val m2 = SnapshotLog.readManifest(fs, bp).get
      require(m2.files == m1.files - y0,
        "surviving partitions must keep their exact file lists")

      val o2 = SnapshotLog.deleteWhere(s, base,
        col("o_year") === y1 && col("o_totalprice") > 300000.0, "o_year").get
      require(!o2.metadataOnly && o2.rewrittenPartitions == Seq(y1) &&
        o2.droppedPartitions.isEmpty,
        s"row predicate must rewrite ONLY the matching partition, got $o2")
      val m3 = SnapshotLog.readManifest(fs, bp).get
      require((m3.files - y1) == (m2.files - y1),
        "partitions with no matching rows must keep their exact file lists")

      // deleted data still time-travels at the pre-delete version
      require(SnapshotLog.readVersion(s, base, m1.version).get.count() ==
        orders.count(), "old version must still hold every pre-delete row")

      val dec = DecimalType(38, 4)
      SnapshotLog.read(s, base).get
        .groupBy(col("o_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast(dec)
            .cast(DoubleType).as("total"))
    },
    Some("""
      WITH base AS (
        SELECT o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      yr AS (SELECT MIN(o_year) AS y0, MAX(o_year) AS y1 FROM base)
      SELECT o_year, o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4))
                  AS DOUBLE) AS total
      FROM base, yr
      WHERE o_year <> y0 AND NOT (o_year = y1 AND o_totalprice > 300000.0)
      GROUP BY o_year, o_orderstatus
      """))

  /** Predicate UPDATE through the commit log
    * ([[graft.sources.SnapshotLog.updateWhere]]) — SET expressions
    * evaluated over the old row, SQL UPDATE semantics, completing the
    * DML triple (MERGE q67/q71, DELETE q78, UPDATE here). Updates are
    * always a rewrite (the partition column is a real column in every
    * data file) but a PRUNED one, and the builder asserts the pruning
    * manifest-to-manifest:
    *
    *  - an in-place update (`o_year = <max> AND o_totalprice >
    *    300000` → halve the price, flag the status) rewrites ONLY the
    *    max-year partition; every other partition keeps its exact
    *    file list;
    *  - a PARTITION-MOVING update (`o_year = <min>` → `SET o_year =
    *    <max>`) migrates every min-year row into the max-year
    *    partition: the source vanishes from the manifest, the
    *    destination absorbs the rows (its non-matching rows
    *    preserved), untouched partitions keep their exact file lists,
    *    and the total row count is conserved.
    *
    * The multiplier is 0.5 (exactly representable in binary) so both
    * engines' doubles stay bit-identical through the arithmetic.
    * Graded: the final state re-aggregated per (year, status)
    * hash-equals the oracle's CASE-WHEN recompute of both updates
    * applied in order. */
  val q79PredicateUpdate: Q = Q(
    "q79_predicate_update",
    "predicate UPDATE: pruned in-place rewrite + partition-moving rows",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_upd").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders,
        "o_orderkey", "o_orderkey", "o_year", batchId = 1)
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get
      val Array(y0, y1) = orders
        .agg(min(col("o_year")), max(col("o_year"))).first() match {
          case r => Array(r.getString(0), r.getString(1))
        }

      // in-place: only the max-year partition rewrites
      val o1 = SnapshotLog.updateWhere(s, base,
        col("o_year") === y1 && col("o_totalprice") > 300000.0,
        Map("o_totalprice" -> (col("o_totalprice") * 0.5),
          "o_orderstatus" -> lit("P")),
        "o_year").get
      require(o1.droppedPartitions.isEmpty && o1.rewrittenPartitions == Seq(y1),
        s"in-place update must rewrite only the matching partition, got $o1")
      val m2 = SnapshotLog.readManifest(fs, bp).get
      require((m2.files - y1) == (m1.files - y1),
        "partitions with no matching rows must keep their exact file lists")

      // partition-moving: every min-year row migrates into max-year
      val o2 = SnapshotLog.updateWhere(s, base,
        col("o_year") === y0, Map("o_year" -> lit(y1)), "o_year").get
      require(o2.droppedPartitions == Seq(y0) &&
        o2.rewrittenPartitions == Seq(y1),
        s"moving update must drop the source and rewrite the destination, got $o2")
      val m3 = SnapshotLog.readManifest(fs, bp).get
      require(!m3.files.contains(y0) &&
        (m3.files - y1) == (m2.files - y0 - y1),
        "only source and destination partitions may change")
      val live = SnapshotLog.read(s, base).get
      require(live.count() == orders.count(),
        "UPDATE must conserve the row count")

      val dec = DecimalType(38, 4)
      live.groupBy(col("o_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast(dec)
            .cast(DoubleType).as("total"))
    },
    Some("""
      WITH base AS (
        SELECT o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      yr AS (SELECT MIN(o_year) AS y0, MAX(o_year) AS y1 FROM base),
      u1 AS (
        SELECT
          CASE WHEN o_year = y1 AND o_totalprice > 300000.0
               THEN o_totalprice * 0.5 ELSE o_totalprice END AS o_totalprice,
          CASE WHEN o_year = y1 AND o_totalprice > 300000.0
               THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
          o_year, y0, y1
        FROM base, yr),
      u2 AS (
        SELECT o_totalprice, o_orderstatus,
               CASE WHEN o_year = y0 THEN y1 ELSE o_year END AS o_year
        FROM u1)
      SELECT o_year, o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4))
                  AS DOUBLE) AS total
      FROM u2
      GROUP BY o_year, o_orderstatus
      """))

  /** Commit-log tables as PLANNER-INTEGRATED relations
    * ([[graft.sources.SnapshotRelation]]): the same manifest metadata
    * q70/q75 consume through explicit read APIs now answers Spark's own
    * `FileIndex.listFiles(partitionFilters, dataFilters)` callback — a
    * PLAIN `df.filter(...)` on the relation skips files from manifest
    * min/max bounds, partition values, and bloom negatives, inside
    * Spark's planning, with parquet pushdown and codegen unchanged
    * below (the Delta `TahoeFileIndex` integration shape). Graded: the
    * value-band scan selects a strict file subset with exact rows, the
    * partition-equality scan selects exactly that partition's files,
    * the bloom point probe (on the NON-clustered key, via the q75
    * metadata-only bloom pass) selects a strict subset with the exact
    * row, and an arithmetic predicate the pruner can't prove degrades
    * to keep-all — never to wrong rows. */
  val q80PlannerScan: Q = Q(
    "q80_planner_scan",
    "plain filters on a commit-log relation prune files inside Spark planning",
    (s, d) => {
      import graft.sources.{SnapshotLog, SnapshotRelation}
      val ev = t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("value"),
          concat(lit("d"), (col("event_id") % 3).cast("string")).as("day"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_planner_scan").toString + "/tbl"
      SnapshotLog.upsertBatch(s, base, ev, Seq("event_id"), "event_id",
        "day", batchId = 1, maxRetries = 5,
        statsCols = Seq("value", "user_id"),
        clusterBy = Seq("value"), clusterFiles = 8, opCol = None,
        writeCdf = false)
      SnapshotLog.buildBlooms(s, base, Seq("event_id"))
      val (df, idx) = SnapshotRelation
        .applyWithIndex(s, base, partCol = Some("day")).get
      val total = idx.manifest.allFiles.size

      val mm = ev.agg(min(col("value")), max(col("value"))).head
      val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
      val (lo, hi) = (mn + 0.45 * (mx - mn), mn + 0.55 * (mx - mn))
      val exact = ev.filter(col("value") >= lo && col("value") <= hi).count()
      val bandRows = df.filter(col("value") >= lo && col("value") <= hi).count()
      val bandSel = idx.lastPruned.get._1

      val partRows = df.filter(col("day") === "d1").count()
      val partExact = ev.filter(col("day") === "d1").count()
      val partSel = idx.lastPruned.get._1
      val partFiles = idx.manifest.files.getOrElse("d1", Nil).size

      val someId = ev.agg(min(col("event_id"))).head.getLong(0)
      val pointRows = df.filter(col("event_id") === someId).count()
      val pointSel = idx.lastPruned.get._1

      val opaqueRows = df.filter(expr("value * 2.0 >= 0.0 OR value < 0.0")).count()
      val opaqueSel = idx.lastPruned.get._1

      import s.implicits._
      Seq((
        bandRows == exact && exact > 0L && bandSel < total,
        partRows == partExact && partSel == partFiles && partSel < total,
        pointRows == 1L && pointSel < total,
        opaqueRows == df.count() && opaqueSel == total
      )).toDF("band_pruned_exact", "part_pruned_exact",
        "bloom_point_pruned", "opaque_keeps_all")
    },
    Some("""
      SELECT TRUE AS band_pruned_exact, TRUE AS part_pruned_exact,
             TRUE AS bloom_point_pruned, TRUE AS opaque_keeps_all
      FROM events LIMIT 1
      """))

  /** Row-level DELETE by DELETION VECTORS (merge-on-read): matching
    * rows' file positions commit as per-file vectors and ZERO data
    * files are rewritten — a 1-row delete in a 10 GB partition costs
    * one manifest commit, not a 10 GB rewrite (Delta DVs / Iceberg
    * positional deletes; `SnapshotLog.deleteWhere(deletionVectors =
    * true)`). Graded in-engine: the file lists of every partition are
    * BYTE-IDENTICAL across both deletes (nothing rewritten), the
    * single-row delete's DV carries exactly one position, metadata
    * COUNT(*) equals the scan count through the DVs, and time travel
    * to the pre-delete version still reads every row. The emitted
    * aggregate hash-matches DuckDB computing the complement. */
  val q81DeletionVectors: Q = Q(
    "q81_deletion_vectors",
    "merge-on-read DELETE: deletion vectors, zero files rewritten",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base =
        java.nio.file.Files.createTempDirectory("graft_dv81").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey", "o_totalprice"),
        clusterBy = Nil, clusterFiles = 16, opCol = None, writeCdf = false)
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get
      val total = orders.count()

      // the 1-row delete that motivates DVs: rewrite-based DML would
      // rewrite the row's whole partition for this
      val k0 = orders.agg(min(col("o_orderkey"))).first().getLong(0)
      val o1 = SnapshotLog.deleteWhere(s, base,
        col("o_orderkey") === k0, "o_year", deletionVectors = true).get
      val m2 = SnapshotLog.readManifest(fs, bp).get
      require(m2.files == m1.files,
        "a DV delete must not add, remove, or replace any data file")
      require(m2.dvs.values.map(_.count).sum == 1L,
        "one matched row must commit exactly one DV position")

      // a broader row delete stacks more DVs — still zero rewrites
      val o2 = SnapshotLog.deleteWhere(s, base,
        col("o_totalprice") > 300000.0, "o_year",
        deletionVectors = true).get
      require(o2.version > o1.version, "second DV delete must commit")
      val m3 = SnapshotLog.readManifest(fs, bp).get
      require(m3.files == m1.files,
        "stacked DV deletes must keep every file list byte-identical")

      val live = SnapshotLog.read(s, base).get
      require(SnapshotLog.countRows(m3).contains(live.count()),
        "metadata COUNT(*) must subtract DV cardinalities exactly")
      require(SnapshotLog.readVersion(s, base, m1.version).get.count() == total,
        "pre-delete version must still time-travel to every row")

      val dec = DecimalType(38, 4)
      live.groupBy(col("o_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast(dec)
            .cast(DoubleType).as("total"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders)
      SELECT o_year, o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4))
                  AS DOUBLE) AS total
      FROM base
      WHERE o_orderkey <> (SELECT MIN(o_orderkey) FROM base)
        AND o_totalprice <= 300000.0
      GROUP BY o_year, o_orderstatus
      """))

  /** Streaming SINK into the commit log ([[graft.streaming.
    * CommitLogSinkProvider]]) — the write half of the streaming story,
    * graded as a full streaming ETL chain: table A's change feed
    * ([[graft.streaming.CommitLogSourceProvider]], q82's source) is
    * streamed into table B through the sink's CDC-upsert mode, so B
    * MATERIALIZES A. Exactly-once comes from (appId, batchId)
    * transaction watermarks in B's manifest (the Delta SetTransaction
    * idea): the checkpointed stream stops, A absorbs another commit,
    * the stream restarts and delivers ONLY the new version; then a
    * replayed stale batchId is fired straight at the sink and must
    * no-op without even committing a version. Graded by B's final
    * state hash-matched against the oracle's relational recompute of
    * A's whole lifecycle (v1 load → v2 CDC update/insert/delete → v3
    * update) at both SFs. */
  val q94StreamSink: Q = Q(
    "q94_stream_sink",
    "streaming sink: CDF source → exactly-once commit-log materialization",
    (s, d) => {
      import graft.sources.SnapshotLog
      import graft.streaming.{CommitLogSinkProvider, CommitLogSourceProvider}
      val root =
        java.nio.file.Files.createTempDirectory("graft_sink94").toString
      val src = s"$root/src"
      val dst = s"$root/dst"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, src, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = true)
      val k = col("o_orderkey")
      // v2: one CDC batch of updates + deletes + inserts
      val updates = orders.filter(k % 13 === 0 && k % 23 =!= 0)
        .select(k, col("o_custkey"),
          (col("o_totalprice") + lit(25.0)).as("o_totalprice"),
          col("o_year"), lit("U").as("op"))
      val deletes = orders.filter(k % 23 === 0)
        .select(k, col("o_custkey"), col("o_totalprice"), col("o_year"),
          lit("D").as("op"))
      val inserts = orders.filter(k % 97 === 0)
        .select((k + lit(200000000L)).as("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_year"), lit("U").as("op"))
      SnapshotLog.upsertBatch(s, src, updates.union(deletes).union(inserts),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 2,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 4,
        opCol = Some("op"), writeCdf = true)

      // the streaming chain: A's CDF → sink CDC-upsert into B.
      // `_commit_version` is the latest-wins order (a key touched by
      // several versions inside one micro-batch resolves to its newest
      // image); preimages are not state.
      def pump(): Unit = {
        val feed = s.readStream
          .format(classOf[CommitLogSourceProvider].getName)
          .option("path", src).load()
          .filter(col("change_type") =!= "update_preimage")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_year"), col("_commit_version"),
            when(col("change_type") === "delete", "D").otherwise("U")
              .as("op"))
        val q = feed.writeStream
          .format(classOf[CommitLogSinkProvider].getName)
          .option("path", dst).option("partCol", "o_year")
          .option("keys", "o_orderkey").option("orderCol", "_commit_version")
          .option("opCol", "op").option("appId", "q94")
          .option("checkpointLocation", s"$root/ckpt")
          .start()
        q.processAllAvailable()
        q.stop()
      }
      pump()

      // v3 lands while the stream is DOWN; the restart below must
      // deliver exactly the missed version
      val state2 = SnapshotLog.read(s, src, Some("o_year")).get
      SnapshotLog.upsertBatch(s, src,
        state2.filter(k % 31 === 0)
          .select(k, col("o_custkey"),
            (col("o_totalprice") + lit(100.0)).as("o_totalprice"),
            col("o_year"), lit("U").as("op")),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 3,
        maxRetries = 5, statsCols = Nil, clusterBy = Nil, clusterFiles = 4,
        opCol = Some("op"), writeCdf = true)
      pump()

      // replay attack: fire an already-absorbed batchId straight at the
      // sink — it must no-op without committing a version
      val fs = new org.apache.hadoop.fs.Path(dst)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val vBefore = SnapshotLog.readManifest(fs,
        new org.apache.hadoop.fs.Path(dst)).get.version
      new CommitLogSinkProvider().createSink(s.sqlContext,
        Map("path" -> dst, "partCol" -> "o_year", "keys" -> "o_orderkey",
          "orderCol" -> "_commit_version", "opCol" -> "op",
          "appId" -> "q94"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
        .addBatch(0, updates.withColumn("_commit_version", lit(999L)))
      require(SnapshotLog.readManifest(fs,
        new org.apache.hadoop.fs.Path(dst)).get.version == vBefore,
        "a replayed (appId, batchId) must not commit")

      val dec = DecimalType(38, 4)
      SnapshotLog.read(s, dst, Some("o_year")).get
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec)).cast(dec).cast(DoubleType)
            .as("total_price"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 25.0
                    ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM base WHERE o_orderkey % 23 <> 0
        UNION ALL
        SELECT o_orderkey + 200000000, o_totalprice, o_year
        FROM base WHERE o_orderkey % 97 = 0),
      v3 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM v2)
      SELECT o_year, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total_price
      FROM v3 GROUP BY o_year
      """))

  /** `COPY INTO` — idempotent file-level ingestion as a SQL verb
    * ([[graft.plans.SnapshotCopyIntoCommand]]), the engine-native form
    * of the reference's bulk COPY load
    * (/root/reference/sql/ddl_staging.sql:40-43) with the guarantee
    * the reference's TRUNCATE+reload pattern exists to fake: each
    * landed file loads AT MOST ONCE (per-file `copy:` watermarks in
    * the manifest), so re-running the loader — on a timer, after a
    * crash, or concurrently — never duplicates rows. Lifecycle: v1
    * direct load of early years → COPY of a two-file landing dir →
    * exact re-run proves 0 files / 0 rows / no version → a third
    * landed file loads ALONE → DESCRIBE DETAIL reports the final
    * version and partition count from metadata. Result hash-matched
    * against the oracle's plain read of the full orders table at both
    * SFs — duplicates or missed files cannot hide. */
  val q95CopyInto: Q = Q(
    "q95_copy_into",
    "COPY INTO: idempotent file-level SQL ingestion + DESCRIBE DETAIL",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val root =
        java.nio.file.Files.createTempDirectory("graft_copy95").toString
      val base = s"$root/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base,
        orders.filter(col("o_year") <= "1995"),
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 1,
        maxRetries = 5, statsCols = Seq("o_orderkey"), clusterBy = Nil,
        clusterFiles = 4, opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q95", "orders", base,
        Some("o_year"))

      // landing zone 1: the 1996–1997 slice as real files on disk
      orders.filter(col("o_year").isin("1996", "1997"))
        .repartition(2).write.parquet(s"$root/land1")
      val r1 = s.sql(s"COPY INTO $view FROM '$root/land1' " +
        "FILEFORMAT = PARQUET").collect().head
      require(r1.getLong(2) == 2L, s"two landed files must load: $r1")

      // the loader re-fires (timer/crash-retry): zero work, zero commit
      val r2 = s.sql(s"COPY INTO $view FROM '$root/land1' " +
        "FILEFORMAT = PARQUET").collect().head
      require(r2.getLong(2) == 0L && r2.getLong(3) == 0L &&
        r2.getLong(1) == r1.getLong(1),
        s"a re-run must be a complete no-op: $r2 vs $r1")

      // landing zone 2 arrives later; only IT loads
      orders.filter(col("o_year") >= "1998")
        .coalesce(1).write.parquet(s"$root/land2")
      val r3 = s.sql(s"COPY INTO $view FROM '$root/land2' " +
        "FILEFORMAT = PARQUET").collect().head
      require(r3.getLong(2) == 1L && r3.getLong(1) == r1.getLong(1) + 1,
        s"exactly the new file, one version later: $r3")

      // DESCRIBE DETAIL: the metadata row agrees with the lifecycle
      val det = s.sql(s"DESCRIBE DETAIL $view").collect().head
      require(det.getString(0) == "graft-snapshot" &&
        det.getLong(2) == r3.getLong(1) &&
        det.getString(8) == "o_year",
        s"DESCRIBE DETAIL must report the committed state: $det")

      val dec = DecimalType(38, 4)
      s.sql(s"SELECT * FROM $view")
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec)).cast(dec).cast(DoubleType)
            .as("total_price"))
    },
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total_price
      FROM orders GROUP BY 1
      """))

  /** Table-property-driven change data feed: `ALTER TABLE … SET
    * TBLPROPERTIES ('graft.enableChangeDataFeed'='true')` (Delta's
    * delta.enableChangeDataFeed re-expressed) makes EVERY subsequent
    * write publish typed feed rows with no per-call opt-in — graded
    * through the SQL verbs end-to-end: INSERT INTO (append), DELETE
    * (deletion vectors), UPDATE (both images), none of which mention
    * CDF anywhere. The feed is then read back through the
    * `graft_table_changes` table function (q90's surface) and
    * aggregated by change type — hash-matched against the oracle's
    * relational recompute of what each verb must have fed, at both
    * SFs. A missing feed version, a mistyped row, or a feed row from
    * the pre-property write would all break the hash. */
  val q96CdfByProperty: Q = Q(
    "q96_cdf_by_property",
    "table property turns on CDF for every SQL write verb",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val root =
        java.nio.file.Files.createTempDirectory("graft_cdfp96").toString
      val base = s"$root/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      // v1: loaded BEFORE the property exists — must never feed
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q96", "orders", base,
        Some("o_year"))
      s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
        s"('${SnapshotLog.CdfProp}' = 'true')")
      orders.createOrReplaceTempView("q96_base")

      // three SQL verbs, zero CDF mentions
      s.sql(s"INSERT INTO $view " +
        "SELECT o_orderkey + 300000000, o_totalprice, o_year " +
        "FROM q96_base WHERE o_orderkey % 89 = 0")
      s.sql(s"DELETE FROM $view WHERE o_orderkey % 23 = 0")
      s.sql(s"UPDATE $view SET o_totalprice = o_totalprice + 10.0 " +
        "WHERE o_orderkey % 13 = 0")

      val dec = DecimalType(38, 4)
      s.sql(s"SELECT * FROM graft_table_changes('$view', 3)")
        .groupBy(col("change_type"), col("o_year"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast(dec).cast(DoubleType)
            .as("total"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      ins AS (
        SELECT o_orderkey + 300000000 AS o_orderkey, o_totalprice, o_year
        FROM base WHERE o_orderkey % 89 = 0),
      t1 AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
      del AS (SELECT * FROM t1 WHERE o_orderkey % 23 = 0),
      t2 AS (SELECT * FROM t1 WHERE o_orderkey % 23 <> 0),
      upd AS (SELECT * FROM t2 WHERE o_orderkey % 13 = 0),
      feed AS (
        SELECT 'insert' AS change_type, o_year, o_totalprice FROM ins
        UNION ALL
        SELECT 'delete', o_year, o_totalprice FROM del
        UNION ALL
        SELECT 'update_preimage', o_year, o_totalprice FROM upd
        UNION ALL
        SELECT 'update_postimage', o_year, o_totalprice + 10.0 FROM upd)
      SELECT change_type, o_year, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM feed GROUP BY 1, 2
      """))

  /** SUBQUERY CONDITIONS in SQL DELETE/UPDATE on a commit-log table —
    * the condition shapes `expr()` cannot carry (`IN (SELECT …)`,
    * correlated `EXISTS`, `NOT IN`), routed by
    * [[graft.plans.SnapshotDmlRule]] through a plan-level
    * [[graft.sources.SnapshotLog.PlanPredicate]]: the condition is
    * re-analyzed as a `Filter` over the live frame, so the analyzer's
    * own `RewritePredicateSubquery` produces the joins — including the
    * null-aware anti join that gives `NOT IN` its three-valued
    * semantics (a NULL in the subquery output makes the DELETE a
    * provable no-op, asserted in-engine by an unchanged version).
    * The lifecycle also proves the planning paths survive: an
    * uncorrelated IN delete commits DELETION VECTORS (files
    * untouched), and an IN on the partition column still takes the
    * metadata-only fast path (the probe reads the analyzed Filter's
    * OUTER references, which a subquery's inner columns never
    * pollute). Oracle: the full lifecycle recomputed relationally
    * with the same subqueries. */
  val q97SubqueryDml: Q = Q(
    "q97_subquery_dml",
    "DELETE/UPDATE with IN / EXISTS / NOT IN subquery conditions",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_sqldml97").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q97", "orders", base,
        Some("o_year"))
      val cust = t(s, d, "customer")
      cust.filter(col("c_mktsegment") === "BUILDING" &&
          col("c_custkey") % 3 === 0)
        .select(col("c_custkey")).createOrReplaceTempView("q97_building")
      cust.filter(col("c_acctbal") > 5000 && col("c_custkey") % 2 === 0)
        .select(col("c_custkey")).createOrReplaceTempView("q97_hot")
      cust.select(when(col("c_custkey") % 10 === 0, lit(null))
          .otherwise(col("c_custkey")).as("k"))
        .createOrReplaceTempView("q97_nullable")
      orders.agg(min(col("o_year")).as("y0"))
        .createOrReplaceTempView("q97_years")
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get

      // 1) uncorrelated IN — row delete, must take the DV path
      s.sql(s"DELETE FROM $view WHERE o_custkey IN " +
        "(SELECT c_custkey FROM q97_building)")
      val m2 = SnapshotLog.readManifest(fs, bp).get
      require(m2.files == m1.files && m2.dvs.nonEmpty,
        "IN-subquery row DELETE must commit deletion vectors, not rewrites")

      // 2) correlated EXISTS — UPDATE (always a pruned rewrite)
      s.sql(s"UPDATE $view SET o_orderstatus = 'X' WHERE EXISTS " +
        "(SELECT 1 FROM q97_hot h WHERE h.c_custkey = o_custkey)")

      // 3) NOT IN against a subquery CONTAINING A NULL: three-valued
      // logic makes the condition never TRUE — a provable no-op
      val vBefore = SnapshotLog.readManifest(fs, bp).get.version
      s.sql(s"DELETE FROM $view WHERE o_custkey NOT IN " +
        "(SELECT k FROM q97_nullable)")
      require(SnapshotLog.readManifest(fs, bp).get.version == vBefore,
        "NOT IN over a null-bearing subquery must delete nothing " +
          "(no new version)")

      // 4) IN on the partition column — still the metadata fast path
      s.sql(s"DELETE FROM $view WHERE o_year IN (SELECT y0 FROM q97_years)")
      val y0 = orders.agg(min(col("o_year"))).first().getString(0)
      val m4 = SnapshotLog.readManifest(fs, bp).get
      require(!m4.files.contains(y0) && m4.op.contains("DELETE"),
        "partition IN-subquery DELETE must plan metadata-only")

      s.sql(s"""
        SELECT o_year, o_orderstatus, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view
        GROUP BY o_year, o_orderstatus
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      d1 AS (
        SELECT * FROM base
        WHERE NOT COALESCE(o_custkey IN (
          SELECT c_custkey FROM customer
          WHERE c_mktsegment = 'BUILDING' AND c_custkey % 3 = 0), FALSE)),
      u1 AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CASE WHEN EXISTS (
                 SELECT 1 FROM customer h
                 WHERE h.c_acctbal > 5000 AND h.c_custkey % 2 = 0
                   AND h.c_custkey = d1.o_custkey)
                 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
               o_year
        FROM d1),
      d2 AS (
        SELECT * FROM u1
        WHERE NOT COALESCE(o_custkey NOT IN (
          SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
                      ELSE c_custkey END FROM customer), FALSE)),
      d3 AS (
        SELECT * FROM d2
        WHERE o_year NOT IN (SELECT MIN(o_year) FROM base))
      SELECT o_year, o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM d3 GROUP BY o_year, o_orderstatus
      """))

  /** COLUMN MAPPING — `ALTER TABLE … RENAME COLUMN / DROP COLUMN` as
    * METADATA-ONLY commits ([[graft.sources.SnapshotLog.renameColumn]],
    * Delta column-mapping semantics): data files keep their PHYSICAL
    * names forever, the manifest maps logical→physical, and every
    * read/write path translates at its chokepoint. The lifecycle
    * proves the three hard guarantees in-engine: a rename touches
    * ZERO files (manifest file lists compared), a DV delete filtered
    * on the RENAMED name still plans merge-on-read, and a DROPPED
    * column re-added under the same name reads NULL everywhere — the
    * tombstoned physical slot can never resurrect the old bytes.
    * Oracle: the same lifecycle recomputed relationally (rename is
    * aliasing; drop+re-add is a NULL column). */
  val q98ColumnMapping: Q = Q(
    "q98_column_mapping",
    "RENAME/DROP COLUMN via column mapping: zero-rewrite schema surgery",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_colmap98").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_totalprice"), clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q98", "orders", base,
        Some("o_year"))
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get

      // 1) metadata-only rename; stats survive under the physical key
      s.sql(s"ALTER TABLE $view RENAME COLUMN o_totalprice TO price")
      val m2 = SnapshotLog.readManifest(fs, bp).get
      require(m2.files == m1.files && m2.stats == m1.stats,
        "RENAME COLUMN must touch zero data files and keep stats live")

      // 2) write through the new name (exact-in-binary doubling)
      s.sql(s"UPDATE $view SET price = price * 2 WHERE o_orderkey % 10 = 0")

      // 3) drop + re-add: the fresh slot reads NULL, never old bytes
      s.sql(s"ALTER TABLE $view DROP COLUMN o_custkey")
      s.sql(s"ALTER TABLE $view ADD COLUMNS (o_custkey BIGINT)")
      val m3 = SnapshotLog.readManifest(fs, bp).get
      require(m3.colmap.get("o_custkey").exists(_ != "o_custkey"),
        "re-added column must map to a fresh physical slot")
      require(s.sql(s"SELECT COUNT(o_custkey) FROM $view").head.getLong(0) == 0,
        "re-added column must read NULL everywhere")
      s.sql(s"UPDATE $view SET o_custkey = o_orderkey % 100 " +
        "WHERE o_orderkey % 2 = 0")

      // 4) DV delete filtered on the RENAMED column
      s.sql(s"DELETE FROM $view WHERE price > 400000")
      val m4 = SnapshotLog.readManifest(fs, bp).get
      require(m4.dvs.nonEmpty,
        "delete on the renamed column must stay merge-on-read")

      s.sql(s"""
        SELECT o_year, COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
               CAST(CAST(SUM(CAST(price AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view
        GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice AS price,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      u1 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN price * 2 ELSE price END
                 AS price,
               o_year
        FROM base),
      u2 AS (
        SELECT o_orderkey, price,
               CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 100
                    ELSE NULL END AS o_custkey,
               o_year
        FROM u1),
      d1 AS (SELECT * FROM u2 WHERE NOT COALESCE(price > 400000, FALSE))
      SELECT o_year, COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
             CAST(CAST(SUM(CAST(price AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM d1 GROUP BY o_year
      """))

  /** SCHEMA AUTO-MERGE (`graft.autoMergeSchema`, Delta's
    * schema.autoMerge) — write-side widening as a table property: an
    * `INSERT … BY NAME` whose source carries an extra column widens
    * the schema (existing rows read NULL), and a MERGE star-action
    * both widens with ITS extra column and applies Delta's `SET *`
    * semantics for source-missing target columns (kept on update,
    * NULL on insert). The lifecycle crosses the two evolutions — the
    * MERGE source lacks the INSERT's new column and vice versa — so
    * the final frame proves per-column provenance. Oracle: the same
    * lifecycle as relational CTEs. */
  val q99AutoMerge: Q = Q(
    "q99_auto_merge",
    "property-driven schema auto-merge on INSERT BY NAME and MERGE *",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_amerge99").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q99", "orders", base,
        Some("o_year"))
      s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
        s"('${SnapshotLog.AutoMergeProp}' = 'true')")

      // INSERT BY NAME widens with `channel`
      orders.filter(col("o_orderkey") % 40 === 0).select(
        (col("o_orderkey") + lit(300000000L)).as("o_orderkey"),
        lit(100.0).as("o_totalprice"), col("o_year"),
        lit("web").as("channel"))
        .createOrReplaceTempView("q99_ins")
      s.sql(s"INSERT INTO $view BY NAME SELECT * FROM q99_ins")
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      require(SnapshotLog.readManifest(fs, bp).get.schema.get
        .fieldNames.contains("channel"),
        "INSERT BY NAME under autoMerge must widen the schema")

      // MERGE star widens with `tier`; its source LACKS `channel`
      orders.filter(col("o_orderkey") % 4 === 0).select(
        col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"),
        col("o_year"), lit("gold").as("tier"))
        .union(orders.filter(col("o_orderkey") % 25 === 0).select(
          (col("o_orderkey") + lit(600000000L)).as("o_orderkey"),
          lit(55.0).as("o_totalprice"), col("o_year"),
          lit("fresh").as("tier")))
        .createOrReplaceTempView("q99_mrg")
      s.sql(s"""
        MERGE INTO $view t USING q99_mrg s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
      """)
      require(SnapshotLog.readManifest(fs, bp).get.schema.get
        .fieldNames.toSeq.takeRight(2) == Seq("channel", "tier"),
        "MERGE star under autoMerge must append the second new column")

      s.sql(s"""
        SELECT o_year, COUNT(*) AS n,
               COUNT(channel) AS n_channel, COUNT(tier) AS n_tier,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view
        GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
               CAST(NULL AS VARCHAR) AS channel
        FROM orders),
      ins AS (
        SELECT o_orderkey + 300000000 AS o_orderkey,
               100.0 AS o_totalprice, o_year, 'web' AS channel
        FROM (SELECT o_orderkey, CAST(EXTRACT(year FROM o_orderdate)
                AS VARCHAR) AS o_year FROM orders WHERE o_orderkey % 40 = 0)),
      t1 AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
      msrc AS (
        SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
               'gold' AS tier
        FROM orders WHERE o_orderkey % 4 = 0
        UNION ALL
        SELECT o_orderkey + 600000000, 55.0,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'fresh'
        FROM orders WHERE o_orderkey % 25 = 0),
      upd AS (
        SELECT t.o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                    ELSE t.o_totalprice END AS o_totalprice,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_year
                    ELSE t.o_year END AS o_year,
               t.channel,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.tier
                    ELSE NULL END AS tier
        FROM t1 t LEFT JOIN msrc s ON t.o_orderkey = s.o_orderkey),
      nw AS (
        SELECT s.o_orderkey, s.o_totalprice, s.o_year,
               CAST(NULL AS VARCHAR) AS channel, s.tier
        FROM msrc s LEFT JOIN t1 t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL),
      fin AS (SELECT * FROM upd UNION ALL SELECT * FROM nw)
      SELECT o_year, COUNT(*) AS n,
             COUNT(channel) AS n_channel, COUNT(tier) AS n_tier,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM fin GROUP BY o_year
      """))

  /** TRUNCATE + reload — the full-refresh staging pattern the
    * reference's TRUNCATE+COPY pipeline runs
    * (`sql/ddl_staging.sql:40-43`), expressed against the commit log:
    * TRUNCATE is ONE metadata-only commit that keeps schema,
    * properties, and exactly-once watermarks while time travel still
    * reads the emptied data; the reload INSERTs into the empty table
    * through the re-pinned view. Oracle: the reload subset. */
  val q100TruncateReload: Q = Q(
    "q100_truncate_reload",
    "TRUNCATE TABLE + reload: the metadata-only full-refresh pattern",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_trunc100").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q100", "orders", base,
        Some("o_year"))
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m1 = SnapshotLog.readManifest(fs, bp).get

      s.sql(s"TRUNCATE TABLE $view")
      val m2 = SnapshotLog.readManifest(fs, bp).get
      require(m2.files.isEmpty && m2.op.contains("TRUNCATE"),
        "TRUNCATE must empty the manifest metadata-only")
      require(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 0,
        "the re-pinned view must read the EMPTY snapshot")
      require(SnapshotLog.readVersion(s, base, m1.version).get.count() ==
        orders.count(), "time travel must still read the pre-truncate data")

      // reload the F subset through the view (full-refresh pattern)
      orders.filter(col("o_orderstatus") === "F")
        .createOrReplaceTempView("q100_reload")
      s.sql(s"INSERT INTO $view SELECT * FROM q100_reload")

      s.sql(s"""
        SELECT o_year, o_orderstatus, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view
        GROUP BY o_year, o_orderstatus
      """)
    },
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
             o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderstatus = 'F'
      GROUP BY 1, 2
      """))

  /** GENERATED COLUMNS (`graft.generated.<col>`, Delta's GENERATED
    * ALWAYS AS) — the classic use: a partition column derived from an
    * event date. After the property is set, every write path computes
    * `o_year` from `o_orderdate` when the batch lacks it, validates
    * provided values, and — the hard case — an UPDATE that shifts the
    * DATE recomputes the generated PARTITION column over the
    * post-assignment row and MOVES the rows into the new year
    * partition (asserted in-engine via a partition only the move
    * could create). Oracle: the same lifecycle relationally. */
  val q101GeneratedCols: Q = Q(
    "q101_generated_cols",
    "generated partition column: computed on write, recomputed on UPDATE",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_gen101").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val view = Catalog.registerSnapshotLog(s, "q101", "orders", base,
        Some("o_year"))
      s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
        s"('${SnapshotLog.GenColPrefix}o_year' = " +
        "'CAST(YEAR(o_orderdate) AS STRING)')")

      // INSERT without the generated column — computed on write
      s.sql(s"INSERT INTO $view (o_orderkey, o_totalprice, o_orderdate) " +
        s"SELECT o_orderkey + 700000000, 77.0, o_orderdate " +
        s"FROM $view WHERE o_orderkey % 50 = 0")

      // UPDATE shifts the DATE; the generated partition column
      // recomputes and the rows MOVE a year forward
      s.sql(s"UPDATE $view SET o_orderdate = o_orderdate + INTERVAL '1' YEAR " +
        "WHERE o_orderkey % 13 = 0")
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val maxYear = orders.agg(max(col("o_year").cast(IntegerType)))
        .first().getInt(0)
      require(SnapshotLog.readManifest(fs, bp).get.files
        .contains((maxYear + 1).toString),
        "a shifted max-year row must have MOVED into a new partition")

      s.sql(s"DELETE FROM $view WHERE o_orderkey % 9 = 0")

      s.sql(s"""
        SELECT o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view
        GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        UNION ALL
        SELECT o_orderkey + 700000000, 77.0, o_orderdate
        FROM orders WHERE o_orderkey % 50 = 0),
      u1 AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_orderkey % 13 = 0
                    THEN o_orderdate + INTERVAL 1 YEAR
                    ELSE o_orderdate END AS o_orderdate
        FROM base),
      d1 AS (SELECT * FROM u1 WHERE o_orderkey % 9 <> 0)
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM d1 GROUP BY 1
      """))

  /** DDL-first lifecycle — empty `CREATE TABLE` (version 1 = schema,
    * zero files), INSERT into the empty table, then
    * `CREATE OR REPLACE TABLE … AS` swapping contents AND schema as a
    * new version of the SAME history (the pre-replace state still
    * time-travels, asserted in-engine). Oracle: the replacement
    * query's result recomputed relationally. */
  val q102CreateReplace: Q = Q(
    "q102_create_replace",
    "empty CREATE TABLE + INSERT + CREATE OR REPLACE AS full refresh",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_ddl102").toString + "/tbl"
      s.sql(s"""
        CREATE TABLE q102.orders (o_orderkey BIGINT, o_totalprice DOUBLE,
                                  o_year STRING)
        USING graft_snapshot PARTITIONED BY (o_year) LOCATION '$base'
      """)
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      require(SnapshotLog.readManifest(fs, bp).exists(m =>
        m.version == 1L && m.files.isEmpty),
        "empty CREATE TABLE must commit v1 with no files")

      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          year(col("o_orderdate")).cast(StringType).as("o_year"))
        .filter(col("o_orderkey") % 2 === 0)
        .createOrReplaceTempView("q102_half")
      s.sql("INSERT INTO q102_orders SELECT * FROM q102_half")
      val vLoaded = SnapshotLog.readManifest(fs, bp).get.version

      // full-refresh replace: different filter AND a new column
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"),
          year(col("o_orderdate")).cast(StringType).as("o_year"))
        .filter(col("o_orderkey") % 3 === 0)
        .createOrReplaceTempView("q102_third")
      s.sql(s"""
        CREATE OR REPLACE TABLE q102.orders USING graft_snapshot
        PARTITIONED BY (o_year) LOCATION '$base'
        AS SELECT * FROM q102_third
      """)
      require(SnapshotLog.readVersion(s, base, vLoaded).get
        .columns.length == 3,
        "the pre-replace snapshot must still time-travel with its schema")

      s.sql(s"""
        SELECT o_year, o_orderstatus, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM q102_orders
        GROUP BY o_year, o_orderstatus
      """)
    },
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
             o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderkey % 3 = 0
      GROUP BY 1, 2
      """))

  /** BUCKETED commit-log tables: `graft.bucket.count/columns`
    * properties make every write stage Spark-bucketed files (murmur3
    * bucket routing + `_NNNNN` file tags), and the planner-integrated
    * read hands the spec to `HadoopFsRelation` — so this fact⋈fact
    * join of two snapshot tables bucketed on the order key plans with
    * ZERO shuffle exchanges (asserted in-engine below, broadcast
    * disabled): the one join the reference must broadcast-engineer
    * around (ref glue_jobs/etl_job.py:68-71) becomes exchange-free at
    * any scale, the shuffle paid once at write. The oracle recomputes
    * the same join + aggregate over the raw tables. */
  val q103BucketedJoin: Q = Q(
    "q103_bucketed_join",
    "co-bucketed snapshot fact join: zero exchanges, shuffle paid at write",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_bkt103").toString
      s.sql(s"""
        CREATE TABLE q103.li (l_orderkey BIGINT, l_quantity DOUBLE,
                              l_year STRING)
        USING graft_snapshot PARTITIONED BY (l_year) LOCATION '$root/li'
      """)
      s.sql(s"""
        CREATE TABLE q103.ord (o_orderkey BIGINT, o_totalprice DOUBLE,
                               o_orderstatus STRING, o_year STRING)
        USING graft_snapshot PARTITIONED BY (o_year) LOCATION '$root/ord'
      """)
      for (v <- Seq("q103_li", "q103_ord"))
        s.sql(s"ALTER TABLE $v SET TBLPROPERTIES " +
          s"('${SnapshotLog.BucketCountProp}' = '8', " +
          s"'${SnapshotLog.BucketColsProp}' = " +
          s"'${if (v.endsWith("li")) "l_orderkey" else "o_orderkey"}')")
      t(s, d, "lineitem").select(col("l_orderkey"),
          col("l_quantity").cast(DoubleType).as("l_quantity"),
          year(col("l_shipdate")).cast(StringType).as("l_year"))
        .createOrReplaceTempView("q103_li_src")
      t(s, d, "orders").select(col("o_orderkey"),
          col("o_totalprice").cast(DoubleType).as("o_totalprice"),
          col("o_orderstatus"),
          year(col("o_orderdate")).cast(StringType).as("o_year"))
        .createOrReplaceTempView("q103_ord_src")
      s.sql("INSERT INTO q103_li SELECT * FROM q103_li_src")
      s.sql("INSERT INTO q103_ord SELECT * FROM q103_ord_src")

      // in-engine plan guard: with broadcast off, the bare fact⋈fact
      // join of the two bucketed snapshot tables plans ZERO shuffles
      val prior = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = s.table("q103_li")
          .join(s.table("q103_ord"),
            col("l_orderkey") === col("o_orderkey"))
        val shuffles = (j.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }).collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }.size
        require(shuffles == 0,
          s"co-bucketed snapshot join must be exchange-free, found $shuffles")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

      s.sql("""
        SELECT o.o_orderstatus AS status, l.l_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS qty,
               CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS price
        FROM q103_li l JOIN q103_ord o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus, l.l_year
      """)
    },
    Some("""
      SELECT o.o_orderstatus AS status,
             CAST(EXTRACT(year FROM l.l_shipdate) AS VARCHAR) AS l_year,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(CAST(l.l_quantity AS DOUBLE) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS qty,
             CAST(CAST(SUM(CAST(CAST(o.o_totalprice AS DOUBLE) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS price
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
      """))

  /** `CONVERT TO graft_snapshot`: in-place adoption of an existing
    * parquet directory — zero files rewritten (verified in-engine:
    * the v1 manifest references exactly the pre-existing files), full
    * verb surface afterwards. The fixture lake is a Hive-partitioned
    * layout whose writer kept the partition column in file contents
    * (the documented layout contract); after conversion a DELETE runs
    * against the adopted files and the oracle recomputes the final
    * state relationally from the raw table. */
  val q104Convert: Q = Q(
    "q104_convert_in_place",
    "CONVERT TO graft_snapshot adopts a parquet lake; DML runs on old files",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_conv104").toString + "/lake"
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"),
          year(col("o_orderdate")).cast(StringType).as("o_year"))
        .withColumn("__p", col("o_year"))
        .repartition(col("__p"))
        .write.partitionBy("__p").parquet(base)
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val pre = fs.listStatus(bp).toSeq // no manifest yet, Hive dirs only
      s.sql(s"CONVERT TO GRAFT_SNAPSHOT '$base' " +
        "PARTITIONED BY (o_year) AS q104.orders")
      val m = SnapshotLog.readManifest(fs, bp).get
      require(m.version == 1L && m.op.contains("CONVERT"),
        "conversion must commit v1 with op CONVERT")
      require(m.allFiles.forall(f => fs.exists(
        new org.apache.hadoop.fs.Path(bp, f))),
        "conversion must reference the pre-existing files in place")
      require(SnapshotLog.countRows(m).isDefined,
        "the conversion scan must harvest metadata row counts")
      // DML straight onto the adopted files
      s.sql("DELETE FROM q104_orders WHERE o_orderkey % 5 = 0")
      s.sql("""
        SELECT o_year, o_orderstatus, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM q104_orders
        GROUP BY o_year, o_orderstatus
      """)
    },
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
             o_orderstatus, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderkey % 5 <> 0
      GROUP BY 1, 2
      """))

  /** Subquery conditions in MERGE WHEN clauses: `WHEN MATCHED AND
    * <IN (subquery)>` and `WHEN MATCHED AND <correlated EXISTS>`
    * (correlated on BOTH the target and source sides) now compile —
    * each condition materializes as a boolean column over the merge
    * join via the same analyzed-plan Filter splice as subquery
    * DELETE/UPDATE (q97), because Spark admits IN/EXISTS only in a
    * Filter, never in the clause chain's projection. Clause order
    * (first-true-wins) and the FALSE/NULL complement are preserved
    * exactly; the oracle recomputes the post-merge state
    * relationally. */
  val q105MergeSubquery: Q = Q(
    "q105_merge_subquery",
    "MERGE with IN + correlated EXISTS clause conditions",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_msub105").toString + "/tbl"
      val orders = t(s, d, "orders").select(col("o_orderkey"),
        col("o_totalprice").cast(DoubleType).as("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Nil, clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)
      graft.sources.Catalog.registerSnapshotLog(
        s, "q105", "orders", base, Some("o_year"))
      orders.filter(col("o_orderkey") % 3 === 0)
        .unionByName(orders.filter(col("o_orderkey") % 50 === 0)
          .select((col("o_orderkey") + 400000000L).as("o_orderkey"),
            lit(100.0).as("o_totalprice"), col("o_year")))
        .createOrReplaceTempView("q105_src")
      orders.filter(col("o_orderkey") % 9 === 0)
        .select(col("o_orderkey").as("k"))
        .createOrReplaceTempView("q105_del")
      orders.filter(col("o_orderkey") % 6 === 0)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") * 2).as("v"))
        .createOrReplaceTempView("q105_flag")
      s.sql("""
        MERGE INTO q105_orders t USING q105_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_orderkey IN (SELECT k FROM q105_del)
          THEN DELETE
        WHEN MATCHED AND EXISTS (SELECT 1 FROM q105_flag f
                                 WHERE f.k = t.o_orderkey
                                   AND f.v > s.o_totalprice)
          THEN UPDATE SET o_totalprice = s.o_totalprice + 1
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 2
        WHEN NOT MATCHED THEN INSERT *
      """)
      s.sql("""
        SELECT o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM q105_orders GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      src AS (
        SELECT o_orderkey, o_totalprice, o_year FROM base
        WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey + 400000000, 100.0, o_year FROM base
        WHERE o_orderkey % 50 = 0),
      kept AS (
        SELECT b.o_orderkey,
               CASE WHEN s.o_orderkey IS NULL THEN b.o_totalprice
                    WHEN b.o_orderkey % 6 = 0 THEN s.o_totalprice + 1
                    ELSE s.o_totalprice + 2 END AS o_totalprice,
               b.o_year
        FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND b.o_orderkey % 9 = 0)),
      final AS (
        SELECT * FROM kept
        UNION ALL
        SELECT s.o_orderkey, s.o_totalprice, s.o_year FROM src s
        WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM base))
      SELECT o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM final GROUP BY o_year
      """))

  /** IDENTITY columns (`graft.identity.<col> = start:step`): append
    * paths allocate values above a manifest high-water mark committed
    * atomically with the data — monotone across batches, contiguous
    * within them, allocated by a sharded row_number (tiny offset
    * collect, never a single-partition window). Which row gets which
    * id is engine-internal, so the oracle checks the SET invariants a
    * sequence must satisfy — count, bounds, distinctness, and the
    * closed-form sum of 1..N — across two successive batches, plus
    * per-partition row counts. */
  val q106Identity: Q = Q(
    "q106_identity",
    "GENERATED ALWAYS AS IDENTITY: monotone contiguous allocation",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base =
        java.nio.file.Files.createTempDirectory("graft_ident106").toString + "/tbl"
      s.sql(s"""
        CREATE TABLE q106.orders (id BIGINT, o_orderkey BIGINT,
                                  o_totalprice DOUBLE, o_year STRING)
        USING graft_snapshot PARTITIONED BY (o_year) LOCATION '$base'
      """)
      s.sql(s"ALTER TABLE q106_orders SET TBLPROPERTIES " +
        s"('${SnapshotLog.IdentityPrefix}id' = '1:1')")
      t(s, d, "orders").select(col("o_orderkey"),
          col("o_totalprice").cast(DoubleType).as("o_totalprice"),
          year(col("o_orderdate")).cast(StringType).as("o_year"))
        .createOrReplaceTempView("q106_src")
      s.sql("""INSERT INTO q106_orders (o_orderkey, o_totalprice, o_year)
               SELECT * FROM q106_src WHERE o_orderkey % 2 = 0""")
      s.sql("""INSERT INTO q106_orders (o_orderkey, o_totalprice, o_year)
               SELECT * FROM q106_src WHERE o_orderkey % 2 = 1""")
      s.sql("""
        SELECT COUNT(*) AS n, COUNT(DISTINCT id) AS nd,
               MIN(id) AS lo, MAX(id) AS hi,
               CAST(SUM(id) AS DOUBLE) AS idsum,
               COUNT(DISTINCT o_year) AS ny
        FROM q106_orders
      """)
    },
    Some("""
      SELECT COUNT(*) AS n, COUNT(*) AS nd,
             CAST(1 AS BIGINT) AS lo, COUNT(*) AS hi,
             CAST(COUNT(*) AS DOUBLE) * (COUNT(*) + 1) / 2 AS idsum,
             COUNT(DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR))
               AS ny
      FROM orders
      """))

  /** RECURSIVE CTE (Spark 4 `WITH RECURSIVE`) — the SAME SQL text on
    * both engines (the q24 pattern): a recursively generated 60-day
    * calendar LEFT-joined to orders, so days with zero orders appear
    * with 0 (the q51 gap-fill shape, expressed the ANSI-recursive
    * way). Depth 60 stays under Spark's default
    * `cteRecursionLevelLimit` (100); the anchor/step are constant
    * dates, so the recursion is calendar-bounded — never
    * data-proportional. */
  private val q107Sql = """
      WITH RECURSIVE cal(d) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT d + INTERVAL 1 DAY FROM cal WHERE d < DATE '1995-03-01'
      )
      SELECT cal.d AS day, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM cal LEFT JOIN orders o ON o.o_orderdate = cal.d
      GROUP BY cal.d
      """

  val q107RecursiveCte: Q = Q(
    "q107_recursive_cte",
    "WITH RECURSIVE calendar gap-fill; identical SQL text on both engines",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(q107Sql)
    },
    Some(q107Sql))

  /** Metadata-only TYPE WIDENING (Delta's type-widening feature):
    * `ALTER COLUMN … TYPE` re-declares a column wider in the schema
    * header — zero files rewritten, old INT32 files upcast on read
    * via Spark 4's parquet type promotion — and the next write lands
    * values only the wider type can hold. The oracle replays the
    * final state relationally (the pre-widen rows plus the wide row),
    * so the check fails unless both the upcast read path and the
    * post-widen write path hold. */
  val q108TypeWidening: Q = Q(
    "q108_type_widening",
    "ALTER COLUMN TYPE widening: upcast reads + beyond-int writes",
    (s0, d) => {
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_widen108").toString + "/tbl"
      t(s, d, "orders").select(
          col("o_orderkey"),
          col("o_custkey").cast(IntegerType).as("cust"),
          year(col("o_orderdate")).cast(StringType).as("o_year"))
        .createOrReplaceTempView("q108_src")
      s.sql(s"""
        CREATE TABLE q108.t (o_orderkey BIGINT, cust INT, o_year STRING)
        USING graft_snapshot PARTITIONED BY (o_year) LOCATION '$base'
      """)
      s.sql("INSERT INTO q108_t SELECT * FROM q108_src")
      s.sql("ALTER TABLE q108_t ALTER COLUMN cust TYPE BIGINT")
      s.sql("""INSERT INTO q108_t VALUES
               (CAST(-1 AS BIGINT), CAST(5000000000 AS BIGINT), 'x')""")
      s.sql("""
        SELECT COUNT(*) AS n, CAST(SUM(cust) AS BIGINT) AS cust_sum,
               MAX(cust) AS cust_max
        FROM q108_t
      """)
    },
    Some("""
      SELECT COUNT(*) + 1 AS n,
             CAST(SUM(o_custkey) + 5000000000 AS BIGINT) AS cust_sum,
             CAST(5000000000 AS BIGINT) AS cust_max
      FROM orders
      """))

  /** DEEP CLONE — `CREATE TABLE db.t DEEP CLONE v LOCATION …`: the
    * materialized fork. Every live data file is COPIED (DVs and
    * sidecars included), so the clone is INDEPENDENT of the source's
    * lifecycle — proven the hard way: the source is `DROP TABLE …
    * PURGE`d (its directory deleted from disk) and the clone must
    * still read every row, including honoring the DV state cloned
    * mid-delete. In-engine guards assert the deep-clone contract
    * shallow clones invert: NO manifest path is absolute (nothing
    * references the source tree) and the clone HAS its own data
    * directory. Emitted: the clone's per-year state after a
    * post-clone divergence UPDATE, recomputed relationally by the
    * oracle. */
  val q109DeepClone: Q = Q(
    "q109_deep_clone",
    "DEEP CLONE: materialized fork surviving source DROP TABLE PURGE",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val root =
        java.nio.file.Files.createTempDirectory("graft_clone109").toString
      val base = s"$root/src"
      val copy = s"$root/copy"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_year", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 4,
        opCol = None, writeCdf = false)
      val src = Catalog.registerSnapshotLog(s, "q109", "orders", base,
        Some("o_year"))
      s.sql(s"DELETE FROM $src WHERE o_orderkey % 7 = 0") // DVs pre-clone

      val r = s.sql(s"CREATE TABLE q109.copy DEEP CLONE $src " +
        s"LOCATION '$copy'").collect().head
      require(r.getString(0) == "DEEP CLONE" && r.getLong(1) == 1L)
      val copyView = r.getString(2)
      val mC = SnapshotLog.readManifest(fs,
        new org.apache.hadoop.fs.Path(copy)).get
      require(mC.allFiles.nonEmpty && mC.allFiles.forall(!_.startsWith("/")),
        "a deep clone must reference NO source path absolutely")
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$copy/data")),
        "a deep clone must own copied data files")
      val nLive = s.sql(s"SELECT COUNT(*) FROM $src").head.getLong(0)
      require(s.sql(s"SELECT COUNT(*) FROM $copyView").head.getLong(0)
        == nLive, "the clone must read the source's exact live rows")

      // the source dies ON DISK; the materialized clone must not care
      s.sql(s"DROP TABLE $src PURGE")
      require(!fs.exists(new org.apache.hadoop.fs.Path(base)),
        "PURGE must have deleted the source tree")
      require(s.sql(s"SELECT COUNT(*) FROM $copyView").head.getLong(0)
        == nLive, "the deep clone must survive the source's deletion")

      s.sql(s"UPDATE $copyView SET o_totalprice = o_totalprice * 2 " +
        s"WHERE o_orderkey % 5 = 0")
      s.sql(s"""
        SELECT o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $copyView GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders),
      live AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
      copyf AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               o_year
        FROM live)
      SELECT o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM copyf GROUP BY o_year
      """))

  /** Spark 4's VARIANT type over semi-structured payloads — the open
    * (schema-on-read) path next to q20's string-function JSON: `props`
    * parses once into a binary VARIANT (`parse_json`), typed fields
    * come out with `variant_get(v, path, type)` (a cast error is LOUD),
    * and absent paths degrade to NULL via `try_variant_get` — the
    * missing-field contract an evolving event schema needs. All three
    * verbs stay codegen'd columnar expressions; at 100 TB a VARIANT
    * column beats per-query string re-parsing (parse once, extract
    * many) and the aggregation shape is q21's bounded-group exchange.
    * The oracle reproduces the same extraction through DuckDB's JSON
    * functions — VARIANT is the representation, JSON the semantics. */
  val q110Variant: Q = Q(
    "q110_variant",
    "VARIANT ingestion: parse_json + typed variant_get + try_variant_get NULLs",
    (s, d) =>
      t(s, d, "events")
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"),
          expr("try_variant_get(v, '$.absent', 'bigint')").as("miss"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          count(col("miss")).as("n_missing")),
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
             CAST(COUNT(CASE WHEN json_extract(props, '$.absent') IS NOT NULL
                             THEN 1 END) AS BIGINT) AS n_missing
      FROM events GROUP BY 1
      """))

  /** Spark 4's SQL PIPE SYNTAX (`|>`) — the linear query form: each
    * stage reads the previous one top-to-bottom (FROM → WHERE →
    * AGGREGATE → ORDER BY), no inside-out nesting. Same Catalyst plan
    * as the ANSI form — the oracle runs the classic SELECT and the
    * results hash-match, proving pipe syntax is pure surface. */
  val q111PipeSyntax: Q = Q(
    "q111_pipe_syntax",
    "SQL pipe syntax: FROM |> WHERE |> AGGREGATE |> ORDER BY",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        FROM lineitem
        |> WHERE l_shipdate < DATE '1998-09-02'
        |> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_shipdate < DATE '1998-09-02'
      GROUP BY 1, 2 ORDER BY 1, 2
      """))

  /** Parameterized execution — `EXECUTE IMMEDIATE … USING` with a SQL
    * session variable (`DECLARE` / `SET VARIABLE`) as one argument and
    * a literal as the other: the injection-safe dynamic-SQL path (the
    * statement text never concatenates values; parameters bind by
    * position). The oracle runs the statement with parameters
    * resolved. */
  val q112ExecImmediate: Q = Q(
    "q112_exec_immediate",
    "EXECUTE IMMEDIATE with USING parameters bound from a session variable",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql("DECLARE OR REPLACE VARIABLE status_v STRING DEFAULT 'F'")
      s.sql("SET VARIABLE status_v = 'O'")
      s.sql("""EXECUTE IMMEDIATE
        'SELECT o_orderpriority, COUNT(*) AS n, MIN(o_orderkey) AS min_key
         FROM orders WHERE o_orderstatus = ? AND o_totalprice > ? GROUP BY 1'
        USING status_v, 1000.0""")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n, MIN(o_orderkey) AS min_key
      FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
      GROUP BY 1
      """))

  /** SQL-language UDFs (Spark 4): a scalar function and a TABLE
    * function declared in SQL (`CREATE TEMPORARY FUNCTION … RETURN`),
    * composed in one query — the portable, optimizer-transparent kind
    * of user function (the body INLINES into the plan, so pushdown,
    * pruning, and codegen all still apply — nothing like the JVM-UDF
    * black box this engine bans). The oracle runs the bodies inlined
    * by hand. */
  val q113SqlUdfs: Q = Q(
    "q113_sql_udfs",
    "SQL scalar UDF + SQL table function composed in one query",
    (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION acct_band(b DOUBLE)
               RETURNS BIGINT RETURN CAST(FLOOR(b / 1000) AS BIGINT)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION big_custs(minbal DOUBLE)
               RETURNS TABLE(ck BIGINT, bal DOUBLE)
               RETURN SELECT c_custkey, CAST(c_acctbal AS DOUBLE)
                      FROM customer WHERE c_acctbal > minbal""")
      s.sql("""SELECT acct_band(bal) AS band, COUNT(*) AS n, MIN(ck) AS min_ck
               FROM big_custs(5000.0) GROUP BY 1""")
    },
    Some("""
      SELECT CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) AS band,
             COUNT(*) AS n, MIN(c_custkey) AS min_ck
      FROM customer WHERE c_acctbal > 5000.0
      GROUP BY 1
      """))

  /** The `try_*` error-safe function family (ANSI mode's escape
    * hatches): division by zero, arithmetic overflow, and failed
    * string casts all degrade to NULL instead of failing the job —
    * the semantics a 100 TB pipeline wants for dirty columns (one
    * poison value must not kill a 6-hour job; NULL-and-count is the
    * production contract, and q4-style null audits then quantify the
    * damage). The oracle states each case's defined result directly
    * (DuckDB raises on bigint overflow rather than NULLing, so the
    * CONTRACT — overflow ⇒ NULL — is the portable thing, not the
    * expression). The testdata contains dirty rows with
    * `l_orderkey = 0` where `Long.MaxValue + 0` legitimately does NOT
    * overflow, so the oracle must state the non-overflow result for
    * those rows rather than a blanket NULL. */
  val q114TryFunctions: Q = Q(
    "q114_try_functions",
    "try_divide/try_add/try_cast: poison values degrade to NULL, not job failure",
    (s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(cast(l_extendedprice as double), " +
            "cast(l_quantity - l_quantity as double))").as("div_by_zero"),
          expr("try_divide(cast(l_extendedprice as double), " +
            "cast(l_quantity as double))").as("unit_price"),
          // overflow_add keeps the try_add CONTRACT (overflow ⇒ NULL)
          // but guards the provably-overflowing branch with when():
          // MAX+k overflows iff k > 0, and TryAdd's per-row
          // catch(ArithmeticException) costs ~9 µs/row — measured 5.6 s
          // over this corpus (vs 0.56 s branched), a JVM exception
          // storm no 100 TB job should pay. try_add still runs on the
          // non-overflowing branch, so the error-safe path stays
          // exercised and the output is bit-identical.
          when(col("l_orderkey") > 0, lit(null).cast(LongType))
            .otherwise(expr("try_add(9223372036854775807L, l_orderkey)"))
            .as("overflow_add"),
          expr("try_cast(concat('x', l_returnflag) as bigint)").as("bad_cast")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(NULL AS DOUBLE) AS div_by_zero,
             CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)
               AS unit_price,
             CASE WHEN l_orderkey > 0 THEN CAST(NULL AS BIGINT)
                  ELSE CAST(9223372036854775807 + l_orderkey AS BIGINT)
             END AS overflow_add,
             CAST(NULL AS BIGINT) AS bad_cast
      FROM lineitem
      """))

  /** FUSED QA SUITE — the reference's "menos roundtrips" idea
    * (ref `qa/validate_data_fast.py:119-170`) at engine grade: the
    * q1 pricing summary AND the q5 range/quality checks computed in
    * ONE lineitem scan. ROLLUP gives detail (`lvl=0`), per-returnflag
    * subtotal (`lvl=1`), and global (`lvl=2`) levels from one pass;
    * q1's ship-date predicate becomes a per-aggregate condition
    * (COUNT/SUM over CASE WHEN) so differently-filtered checks fuse
    * without a second scan. FusedQaSpec proves the lvl=0 slice is
    * row-identical to q1 and the lvl=2 slice to q5, and that the plan
    * reads the table exactly once — at 100 TB this is the difference
    * between one pass over the fact table and one per QA query. */
  val q115FusedQa: Q = Q(
    "q115_fused_qa",
    "fused QA: q1 pricing summary + q5 range checks in one scan (rollup + filtered aggs)",
    (s, d) => {
      val shipOk = col("l_shipdate") < lit(java.sql.Timestamp.valueOf("2001-09-02 00:00:00"))
      // One-pass PARTIAL CASCADE instead of rollup()+countDistinct()
      // (r15): the naive form plans Expand×3 (rollup levels) × Expand×2
      // (distinct rewrite) — six copies of every fact row through the
      // partial aggregate. Instead aggregate ONCE per (returnflag,
      // linestatus, partkey) — all measures are algebraic (exact
      // decimal sums re-sum losslessly, min/max re-min/max, counts
      // re-add) and countDistinct(partkey) becomes a plain row count
      // after the cascade's partkey dedup — then derive each rollup
      // level by re-aggregating the ~|rf×ls×pk| partial table: lvl0
      // regroups it by (rf, ls); collapsing ls gives the (rf, pk)
      // table for lvl1; collapsing rf gives the (pk) table for lvl2.
      // Row-identity to the rollup form is pinned by FusedQaSpec
      // (lvl0 ≡ q1, lvl2 ≡ q5, exactly one scan).
      val p0 = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_partkey"))
        .agg(
          count(lit(1)).as("pn"),
          count(when(shipOk, 1)).as("pco"),
          sum(when(shipOk, dec(col("l_quantity")))).as("psq"),
          sum(when(shipOk, dec(col("l_extendedprice")))).as("psbp"),
          sum(when(shipOk, netD(col("l_extendedprice"), col("l_discount")))).as("psdp"),
          sum(when(shipOk, dec(col("l_discount"), 6))).as("psd6"),
          min(col("l_quantity")).as("pminq"),
          max(col("l_quantity")).as("pmaxq"),
          min(col("l_extendedprice")).as("pminp"),
          max(col("l_extendedprice")).as("pmaxp"),
          count(when(col("l_discount") > 0.05, 1)).as("phd"))
      // re-sum partials under a coarser key (pk dedup for the next level)
      def collapse(df: DataFrame, keys: Column*): DataFrame =
        df.groupBy(keys: _*).agg(
          sum(col("pn")).as("pn"), sum(col("pco")).as("pco"),
          sum(col("psq")).as("psq"), sum(col("psbp")).as("psbp"),
          sum(col("psdp")).as("psdp"), sum(col("psd6")).as("psd6"),
          min(col("pminq")).as("pminq"), max(col("pmaxq")).as("pmaxq"),
          min(col("pminp")).as("pminp"), max(col("pmaxp")).as("pmaxp"),
          sum(col("phd")).as("phd"))
      // one output level: finalize the measures; n_parts = row count of
      // the pk-distinct input slice
      def level(df: DataFrame, rf: Column, ls: Column, lvl: Int, keys: Column*): DataFrame =
        df.groupBy(keys: _*).agg(
          sum(col("pn")).as("n_rows"),
          sum(col("pco")).as("count_order"),
          sum(col("psq")).cast(DoubleType).as("sum_qty"),
          sum(col("psbp")).cast(DoubleType).as("sum_base_price"),
          sum(col("psdp")).cast(DecimalType(38, 4)).cast(DoubleType).as("sum_disc_price"),
          (sum(col("psq")).cast(DoubleType) / sum(col("pco"))).as("avg_qty"),
          (sum(col("psd6")).cast(DoubleType) / sum(col("pco"))).as("avg_disc"),
          min(col("pminq")).as("min_qty"),
          max(col("pmaxq")).as("max_qty"),
          min(col("pminp")).as("min_price"),
          max(col("pmaxp")).as("max_price"),
          sum(col("phd")).as("n_high_discount"),
          count(lit(1)).as("n_parts"))
          .select(
            Seq(rf.as("l_returnflag"), ls.as("l_linestatus"),
              lit(lvl.toLong).as("lvl"), col("n_rows"), col("count_order"),
              col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
              col("avg_qty"), col("avg_disc"), col("min_qty"), col("max_qty"),
              col("min_price"), col("max_price"), col("n_high_discount"),
              col("n_parts")): _*)
      val lvl0 = level(p0, col("l_returnflag"), col("l_linestatus"), 0,
        col("l_returnflag"), col("l_linestatus"))
      val p1 = collapse(p0, col("l_returnflag"), col("l_partkey"))
      val lvl1 = level(p1, col("l_returnflag"), lit(null).cast(StringType), 1,
        col("l_returnflag"))
      val p2 = collapse(p1, col("l_partkey"))
      val lvl2 = level(p2, lit(null).cast(StringType), lit(null).cast(StringType), 2)
      lvl0.unionByName(lvl1).unionByName(lvl2)
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS lvl,
             COUNT(*) AS n_rows,
             COUNT(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN 1 END) AS count_order,
             CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS sum_qty,
             CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN CAST(l_extendedprice AS DECIMAL(38,4)) END) AS DOUBLE) AS sum_base_price,
             CAST(CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6))) END) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE)
               / COUNT(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN 1 END) AS avg_qty,
             CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN CAST(l_discount AS DECIMAL(38,6)) END) AS DOUBLE)
               / COUNT(CASE WHEN l_shipdate < TIMESTAMP '2001-09-02 00:00:00' THEN 1 END) AS avg_disc,
             MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
             COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_high_discount,
             COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      """))

  /** STREAMING SESSIONIZATION AT REGISTRY GRADE — the
    * `transformWithState` sessionizer ([[graft.streaming.EventStreams]],
    * RocksDB state store, event-time timers) run over the events corpus
    * as a real file-source stream, its watermark-closed emissions graded
    * against a DuckDB recompute. q33 grades batch `session_window`; this
    * grades the STREAMING operator itself — same exclusive 30-min gap,
    * out-of-order-safe interval merging, emission only once the
    * watermark (max event time − 2 h, Spark tracks it in ms) passes
    * `last + gap`, so the closed-session set is deterministic and the
    * oracle can state it: gaps-and-islands sessions whose end precedes
    * the final watermark by the gap.
    *
    * Harness notes (not scale-path): the normalized corpus lands once in
    * a temp dir as the stream's source (one file ⇒ one micro-batch ⇒ no
    * admitted event is watermark-late), and results collect through a
    * memory sink — production writes to a real sink; the OPERATOR is
    * the 100 TB path (per-key state bounded by horizon/gap, RocksDB
    * off-heap, timers not per-event polling). Session value totals are
    * graded in exact centi-units: the stream accumulates doubles, so
    * `round(total·100)` is compared (session-bounded float error ≪ 0.5
    * centi) rather than a raw float hash. */
  val q116StreamSessions: Q = Q(
    "q116_stream_sessions",
    "streaming sessionization: transformWithState + RocksDB over the events corpus, watermark-closed sessions",
    (s, d) => {
      import graft.streaming.EventStreams
      val dir = java.nio.file.Files.createTempDirectory("graft_q116_src").toString
      t(s, d, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val stream = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
        .parquet(dir)
        .filter(col("user_id").isNotNull)
        .as(org.apache.spark.sql.Encoders.product[EventStreams.Event])
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val saved = s.conf.getOption(provKey)
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        EventStreams.runToMemory(s,
            EventStreams.sessionizeTws(stream, gapMinutes = 30).toDF(),
            "q116_sessions")
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"),
            round(col("total_value") * 100).cast(LongType).as("total_centi"))
      } finally saved match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
    },
    Some("""
      WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events WHERE user_id IS NOT NULL),
      wm AS (SELECT (epoch_us(MAX(ts)) // 1000 - 7200000) * 1000 AS wm_us FROM o),
      m AS (SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_s
            FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid FROM m),
      sess AS (SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                      COUNT(*) AS n_events,
                      CAST(ROUND(SUM(CAST(value AS DECIMAL(38,4))) * 100) AS BIGINT)
                        AS total_centi
               FROM g GROUP BY user_id, sid)
      SELECT user_id, session_start, session_end, n_events, total_centi
      FROM sess, wm
      WHERE epoch_us(session_end) + 1800000000 <= wm_us
      """))

  /** DSv2 CATALOG NAMESPACE READ — `SELECT … FROM graft_v2.<ns>.<t>`
    * through [[graft.sources.GraftCatalog]]: a commit-log table is
    * materialized from orders, rows are deleted merge-on-read
    * (deletion vectors, zero file rewrites — asserted in-build), and
    * the query reads BOTH the live snapshot and `VERSION AS OF` the
    * pre-delete version through nothing but catalog-qualified SQL
    * names. Graded against DuckDB recomputing each slice from the
    * source table with/without the delete predicate — so the oracle
    * catches a DV bypass (resurrected rows inflate `n`) AND a broken
    * time travel (missing rows deflate the asof slice). The read path
    * under the name is the planner-integrated v1 relation (see the
    * [[graft.sources.GraftCatalog]] finding on why a native DSv2 scan
    * cannot carry DVs). */
  val q117CatalogRead: Q = Q(
    "q117_catalog_read",
    "DSv2 catalog namespace: DV-correct SELECT + VERSION AS OF via graft_v2.db.t",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_cat117").toString
      val base = s"$root/db/orders"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_orderstatus", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val vBefore = SnapshotLog.setProperties(s, base,
        Map(SnapshotLog.PartColProp -> "o_orderstatus"))
      SnapshotLog.deleteWhere(s, base, col("o_orderkey") % 7 === 0,
        "o_orderstatus", deletionVectors = true)
      val bp = new org.apache.hadoop.fs.Path(base)
      val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val m = SnapshotLog.readManifest(fs, bp).get
      require(m.dvs.nonEmpty && m.version == vBefore + 1,
        "the delete must commit deletion vectors")
      s.conf.set("spark.sql.catalog.graft_v2",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_v2.root", root)
      s.sql(s"""
        SELECT 'live' AS src, o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
        FROM graft_v2.db.orders GROUP BY o_orderstatus
        UNION ALL
        SELECT 'asof' AS src, o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
        FROM graft_v2.db.orders VERSION AS OF $vBefore GROUP BY o_orderstatus
      """)
    },
    Some("""
      SELECT 'live' AS src, o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey % 7 <> 0 GROUP BY o_orderstatus
      UNION ALL
      SELECT 'asof' AS src, o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderstatus
      """))

  /** ROW TRACKING end-to-end (Delta's row-id feature on the commit
    * log): a tracked table's `_graft_row_id` must stay UNIQUE and
    * STABLE through the lifecycle — graded here as phase-by-phase
    * counts the oracle can state from the source data alone. The
    * engine computes `n_preserved` as the semi-join of each phase's id
    * set against the previous phase's (via time travel for the
    * baseline), so a DV bypass, an id collision, or an OPTIMIZE that
    * reassigned identity all surface as a count mismatch:
    * after_delete must preserve exactly the surviving rows' ids, and
    * after_optimize (which rewrites the DV-carrying partitions,
    * materializing ids through the rewrite) must preserve ALL of
    * them. See [[graft.sources.SnapshotLog.RowTrackingProp]]. */
  val q118RowTracking: Q = Q(
    "q118_row_tracking",
    "row tracking: id uniqueness + preservation through DV delete and OPTIMIZE",
    (s, d) => {
      import graft.sources.{SnapshotLog, SnapshotRelation}
      val base = java.nio.file.Files
        .createTempDirectory("graft_rt118").toString + "/part"
      val rows = t(s, d, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_brand"))
      SnapshotLog.upsertBatch(s, base, rows, Seq("p_partkey"),
        "p_partkey", "p_brand", batchId = 1, maxRetries = 5,
        statsCols = Seq("p_partkey"), clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      val vEnable = SnapshotLog.setProperties(s, base,
        Map(SnapshotLog.RowTrackingProp -> "true",
          SnapshotLog.PartColProp -> "p_brand"))
      // cached: each phase's id set feeds THREE consumers in the graded
      // plan (its own count/distinct agg, the semi-join probe, and the
      // next phase's `prev` side) — without the persist the snapshot
      // table is re-scanned nine times per run (guide §5 within-query
      // reuse; dropped by Verify/Probe between queries as usual)
      def idsAt(v: Option[Long]) = graft.core.Caching.cached(
        SnapshotRelation.read(s, base, v, Some("p_brand")).get
          .select(col(SnapshotLog.RowIdCol).as("rid")))
      val ids0 = idsAt(Some(vEnable))
      SnapshotLog.deleteWhere(s, base, col("p_partkey") % 4 === 1, "p_brand",
        deletionVectors = true)
      val ids1 = idsAt(None)
      require(SnapshotLog.optimizeTable(s, base, "p_brand", minFiles = 1) > 0,
        "OPTIMIZE must rewrite the DV-carrying partitions")
      val ids2 = idsAt(None)
      def stat(name: String, ids: DataFrame, prev: DataFrame) =
        ids.agg(count(lit(1)).as("n_rows"),
            countDistinct(col("rid")).as("n_distinct_ids"))
          .crossJoin(ids.join(prev, Seq("rid"), "left_semi")
            .agg(count(lit(1)).as("n_preserved")))
          .select(lit(name).as("phase"), col("n_rows"),
            col("n_distinct_ids"), col("n_preserved"))
      stat("initial", ids0, ids0)
        .union(stat("after_delete", ids1, ids0))
        .union(stat("after_optimize", ids2, ids1))
    },
    Some("""
      WITH n AS (SELECT COUNT(*) AS n FROM part),
      m AS (SELECT COUNT(*) AS m FROM part WHERE p_partkey % 4 <> 1)
      SELECT 'initial' AS phase, n AS n_rows, n AS n_distinct_ids,
             n AS n_preserved FROM n
      UNION ALL
      SELECT 'after_delete', m, m, m FROM m
      UNION ALL
      SELECT 'after_optimize', m, m, m FROM m
      """))

  /** STREAM-STREAM INTERVAL JOIN at registry grade — the second
    * streaming operator graded against a DuckDB recompute (q116 grades
    * stateful sessionization; this grades the symmetric-hash join with
    * event-time range bounds): same-user event pairs within a 30-minute
    * tolerance, from two file-source streams of the events corpus. The
    * inner time-interval join emits every match exactly once, and with
    * the corpus landing in one micro-batch no row is watermark-late —
    * so the emitted set equals the batch interval self-join the oracle
    * states. `delta_s` mirrors Spark's timestamp→long cast (per-side
    * floor to seconds) exactly. Scale shape: watermarks bound the
    * join state to the 2 h horizon per side — without them a
    * stream-stream join buffers both streams forever. */
  val q119StreamIntervalJoin: Q = Q(
    "q119_stream_interval_join",
    "stream-stream interval join: same-user pairs within 30 min, DuckDB-graded",
    (s, d) => {
      import graft.streaming.EventStreams
      val dir = java.nio.file.Files.createTempDirectory("graft_q119_src").toString
      t(s, d, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .filter(col("user_id").isNotNull && pmod(col("user_id"), lit(5L)) === 0)
        .coalesce(1).write.mode("overwrite").parquet(dir)
      def src = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
        .parquet(dir)
      EventStreams.runToMemory(s,
        EventStreams.intervalJoin(src, src, toleranceMinutes = 30),
        "q119_pairs")
    },
    Some("""
      WITH e AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
        FROM events
        WHERE user_id IS NOT NULL AND user_id % 5 = 0)
      SELECT l.event_id AS l_id, r.event_id AS r_id,
             l.user_id AS user_id,
             epoch_us(r.ts) // 1000000 - epoch_us(l.ts) // 1000000 AS delta_s
      FROM e l JOIN e r
        ON l.user_id = r.user_id
       AND r.ts >= l.ts
       AND r.ts <= l.ts + INTERVAL 30 MINUTE
       AND l.event_id <> r.event_id
      """))

  /** LISTAGG (Spark 4's ordered string aggregation, SQL:2016
    * `WITHIN GROUP`): per-region, the nation names concatenated in
    * explicit order — deterministic because the within-group ORDER BY
    * is total (unique names). The classic report/export surface; the
    * grouped DISTINCT variant covers the other common call shape.
    * Scale: a plain partial-aggregable shape (per-group buffers carry
    * the group's values — bounded by group payload, the same contract
    * as collect_list; not for billion-row groups). */
  val q120ListAgg: Q = Q(
    "q120_listagg",
    "listagg within group: ordered + distinct string aggregation per region",
    (s, d) => {
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          expr("listagg(n_name, ',') within group (order by n_name)")
            .as("nations_asc"),
          expr("listagg(n_name, '|') within group (order by n_name desc)")
            .as("nations_desc"),
          expr("listagg(distinct substring(n_name, 1, 1), '')" +
            " within group (order by substring(n_name, 1, 1))")
            .as("initials"),
          count(lit(1)).as("n_nations"))
    },
    Some("""
      SELECT r.r_name AS r_name,
             string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_asc,
             string_agg(n.n_name, '|' ORDER BY n.n_name DESC) AS nations_desc,
             string_agg(DISTINCT substring(n.n_name, 1, 1), ''
                        ORDER BY substring(n.n_name, 1, 1)) AS initials,
             COUNT(*) AS n_nations
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name
      """))

  /** REPLACE WHERE end-to-end: the idempotent-backfill primitive
    * ([[graft.sources.SnapshotLog.replaceWhere]]) — one commit deletes
    * the predicate's region and inserts the batch, with Delta's
    * batch-must-match-predicate constraint enforced. Run TWICE with
    * the same slice to grade idempotence (a re-landed backfill must
    * not duplicate), then aggregated per status against DuckDB
    * recomputing the final state from the source table. */
  val q121ReplaceWhere: Q = Q(
    "q121_replace_where",
    "REPLACE WHERE: atomic predicate-region replace, idempotent backfill",
    (s, d) => {
      import graft.sources.SnapshotLog
      val base = java.nio.file.Files
        .createTempDirectory("graft_rw121").toString + "/orders"
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      SnapshotLog.upsertBatch(s, base, orders, Seq("o_orderkey"),
        "o_orderkey", "o_orderstatus", batchId = 1, maxRetries = 5,
        statsCols = Seq("o_orderkey"), clusterBy = Nil, clusterFiles = 8,
        opCol = None, writeCdf = false)
      // the backfill slice: F-status orders with key % 3 = 0, repriced
      val slice = orders.filter(col("o_orderstatus") === "F" &&
          col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"),
          col("o_orderstatus"))
      SnapshotLog.replaceWhere(s, base, slice,
        col("o_orderstatus") === "F", "o_orderstatus",
        statsCols = Seq("o_orderkey"))
      // idempotence: re-land the same slice; the region replaces again
      SnapshotLog.replaceWhere(s, base, slice,
        col("o_orderstatus") === "F", "o_orderstatus")
      SnapshotLog.read(s, base).get
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsumD(col("o_totalprice")).as("total"))
    },
    Some("""
      WITH fin AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderstatus <> 'F'
        UNION ALL
        SELECT o_orderkey, o_totalprice * 2, o_orderstatus
        FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0)
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM fin GROUP BY o_orderstatus
      """))

  /** The WRITE half of the DSv2 surface end-to-end (round-12 headline):
    * `df.write.format("graft")` (fresh-path create, then
    * `option("replaceWhere", …)` overwrite), byte-level parity with the
    * Scala-API-written twin, and CREATE TABLE / INSERT INTO /
    * INSERT OVERWRITE / CTAS through [[graft.sources.GraftCatalog]] —
    * every route funnels into SnapshotLog.tryCommit, and every facet is
    * graded against a DuckDB recompute from the source data alone. */
  val q122DsvWrite: Q = Q(
    "q122_dsv2_write",
    "DSv2 write surface: format save/replaceWhere, API parity, catalog CREATE/INSERT/CTAS",
    (s0, d) => {
      import graft.sources.{SnapshotLog, WriteIntoGraft}
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_w122").toString
      val baseA = s"$root/fmt/orders"
      val baseB = s"$root/api/orders"
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      // the same logical history through BOTH surfaces:
      // v1 = full load, v2 = REPLACE WHERE of the F slice repriced ×2
      val slice = orders.filter(col("o_orderstatus") === "F" &&
          col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"),
          col("o_orderstatus"))
      orders.write.format("graft").partitionBy("o_orderstatus").save(baseA)
      slice.write.format("graft").mode("overwrite")
        .option(WriteIntoGraft.ReplaceWhereOption, "o_orderstatus = 'F'")
        .save(baseA)
      SnapshotLog.appendBatch(s, baseB, orders, "o_orderstatus", batchId = 0L,
        propsAdd = Map(SnapshotLog.PartColProp -> "o_orderstatus"))
      SnapshotLog.replaceWhere(s, baseB, slice,
        col("o_orderstatus") === "F", "o_orderstatus")
      val fmtV1 = s.read.format("graft").option("versionAsOf", "1").load(baseA)
      // cached: fmtLive feeds its facet AND both sides of the parity
      // exceptAll; apiLive the parity pair — without the persist the
      // graded plan re-scans each table per consumer (guide §5)
      val fmtLive = graft.core.Caching.cached(
        s.read.format("graft").load(baseA))
      val apiLive = graft.core.Caching.cached(
        s.read.format("graft").load(baseB))
      // catalog DDL/DML routes
      s.conf.set("spark.sql.catalog.graft_w122",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_w122.root", root)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_w122.db")
      orders.createOrReplaceTempView("q122_src")
      s.sql("""CREATE TABLE graft_w122.db.t1
               (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
               USING graft PARTITIONED BY (o_orderstatus)""")
      s.sql("INSERT INTO graft_w122.db.t1 SELECT * FROM q122_src")
      s.sql("""INSERT OVERWRITE graft_w122.db.t1
               SELECT * FROM q122_src WHERE o_orderkey % 2 = 0""")
      s.sql("""CREATE TABLE graft_w122.db.t2 USING graft
               PARTITIONED BY (o_orderstatus)
               AS SELECT * FROM q122_src WHERE o_orderstatus <> 'O'""")
      def facet(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
          .select(lit(name).as("phase"), col("n"), col("total"))
      // option("mergeSchema","true") — Delta's per-write evolution:
      // without it the widened batch REJECTS (schema enforcement,
      // gated in-engine); with it the new column lands and old rows
      // read NULL. Graded as (n = NULL-backfilled originals,
      // total = sum over evolved table).
      val baseC = s"$root/fmt/merged"
      orders.write.format("graft").partitionBy("o_orderstatus").save(baseC)
      val widened = orders.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 700000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus"))
        .withColumn("note", lit("late"))
      val enforced =
        try {
          widened.write.format("graft").mode("append").save(baseC); false
        } catch { case _: Exception => true }
      require(enforced,
        "a widened batch without mergeSchema must reject (schema enforcement)")
      widened.write.format("graft").mode("append")
        .option(WriteIntoGraft.MergeSchemaOption, "true").save(baseC)
      val evolved = s.read.format("graft").load(baseC)
      val mergeF = evolved
        .agg(sum(when(col("note").isNull, 1L).otherwise(0L)).as("n"),
          dsumD(col("o_totalprice")).as("total"))
        .select(lit("merge_schema").as("phase"), col("n"), col("total"))
      facet("save", fmtV1)
        .union(facet("replace", fmtLive))
        // parity: the format-written twin is row-identical to the
        // API-written one (symmetric difference must be empty)
        .union(fmtLive.exceptAll(apiLive).union(apiLive.exceptAll(fmtLive))
          .agg(count(lit(1)).as("n"))
          .select(lit("parity").as("phase"), col("n"),
            lit(0.0).cast("double").as("total")))
        .union(facet("insert_overwrite", s.table("graft_w122.db.t1")))
        .union(facet("ctas", s.table("graft_w122.db.t2")))
        .union(mergeF)
    },
    Some("""
      WITH repl AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderstatus <> 'F'
        UNION ALL
        SELECT o_orderkey, o_totalprice * 2, o_orderstatus
        FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0)
      SELECT 'save' AS phase, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders
      UNION ALL
      SELECT 'replace', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM repl
      UNION ALL
      SELECT 'parity', 0, 0.0
      UNION ALL
      SELECT 'insert_overwrite', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT 'ctas', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM orders WHERE o_orderstatus <> 'O'
      UNION ALL
      SELECT 'merge_schema', COUNT(*),
             (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
              FROM (SELECT o_totalprice FROM orders
                    UNION ALL
                    SELECT o_totalprice FROM orders WHERE o_orderkey % 13 = 0) u)
      FROM orders
      """))

  /** `spark.readStream.format("graft")` — the streaming read unified
    * under the format name (the legacy `graft-commitlog` provider's
    * source, same commit-version offsets), graded in BOTH modes
    * against a DuckDB recompute: `readChangeFeed` streams the CDF tail
    * (insert and delete facets), the default ROW feed streams append
    * commits only (`skipChangeCommits` drops the delete commit whole).
    * In-engine gate: the streamed CDF row count must equal the batch
    * change feed's (exactly-once of version ranges). Restart-from-
    * checkpoint is spec-graded (FormatStreamSpec). */
  val q123FormatStream: Q = Q(
    "q123_format_stream",
    "readStream.format(\"graft\"): CDF tail + row feed vs batch recompute",
    (s, d) => {
      import graft.sources.SnapshotLog
      val root = java.nio.file.Files.createTempDirectory("graft_fs123").toString
      val base = s"$root/orders"
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      SnapshotLog.appendBatch(s, base, orders, "o_orderstatus", batchId = 1,
        writeCdf = true,
        propsAdd = Map(SnapshotLog.PartColProp -> "o_orderstatus"))
      val slice = orders.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus"))
      SnapshotLog.appendBatch(s, base, slice, "o_orderstatus", batchId = 2,
        writeCdf = true)
      // 100000000 % 5 == 0, so the delete set is {k, k+1e8 : k%5=0}
      SnapshotLog.deleteWhere(s, base, col("o_orderkey") % 5 === 0,
        "o_orderstatus", writeCdf = true)
      def drain(reader: org.apache.spark.sql.streaming.DataStreamReader,
          outDir: String, ckpt: String): Unit = {
        val q = reader.load(base).writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              b.write.mode("append").parquet(outDir); ()
          }
          .start()
        q.awaitTermination()
      }
      drain(s.readStream.format("graft").option("readChangeFeed", "true"),
        s"$root/cdf_out", s"$root/ck1")
      drain(s.readStream.format("graft").option("skipChangeCommits", "true"),
        s"$root/row_out", s"$root/ck2")
      val cdf = s.read.parquet(s"$root/cdf_out")
      require(cdf.count() == SnapshotLog.readCdf(s, base).get.count(),
        "streamed CDF tail must deliver exactly the batch feed's rows")
      // the BATCH readChangeFeed option (Delta's spelling) must agree
      // with both the stream and the API read — and range correctly
      val s2 = graft.GraftSessions.withExtensions(s)
      require(s2.read.format("graft").option("readChangeFeed", "true")
          .load(base).count() == cdf.count(),
        "batch readChangeFeed == streamed feed")
      require(s2.read.format("graft").option("readChangeFeed", "true")
          .option("startingVersion", "3").option("endingVersion", "3")
          .load(base).filter(col("change_type") =!= "delete").count() == 0,
        "ranged readChangeFeed isolates the delete commit")
      val rowFeed = s.read.parquet(s"$root/row_out")
      // snapshot+tail bootstrap on a CDF-LESS table (the row feed's
      // home turf): a fresh initialSnapshot stream delivers the
      // snapshot as of start; a restart from the same checkpoint after
      // a new append delivers ONLY the tail — together they must equal
      // the batch recompute of the final table
      val baseR = s"$root/orders_nocdf"
      SnapshotLog.appendBatch(s, baseR, orders, "o_orderstatus", batchId = 1,
        propsAdd = Map(SnapshotLog.PartColProp -> "o_orderstatus"))
      def drainSnap(): Unit = {
        val q = s.readStream.format("graft")
          .option("initialSnapshot", "true").load(baseR)
          .writeStream
          .option("checkpointLocation", s"$root/ck3")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              b.write.mode("append").parquet(s"$root/snap_out"); ()
          }
          .start()
        q.awaitTermination()
      }
      drainSnap()
      SnapshotLog.appendBatch(s, baseR, slice, "o_orderstatus", batchId = 2)
      drainSnap()
      val snapTail = s.read.parquet(s"$root/snap_out")
      def facet(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
          .select(lit(name).as("phase"), col("n"), col("total"))
      facet("cdf_insert", cdf.filter(col("change_type") === "insert"))
        .union(facet("cdf_delete", cdf.filter(col("change_type") === "delete")))
        .union(facet("row_feed", rowFeed))
        .union(facet("snapshot_tail", snapTail))
    },
    Some("""
      WITH appended AS (
        SELECT o_orderkey, o_totalprice FROM orders
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 0)
      SELECT 'cdf_insert' AS phase, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM appended
      UNION ALL
      SELECT 'cdf_delete', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM appended WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT 'row_feed', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM appended
      UNION ALL
      SELECT 'snapshot_tail', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM appended
      """))

  /** `ALTER TABLE graft.ns.t` through the DSv2 catalog, graded by what
    * a reader sees afterwards: ADD COLUMNS backfills NULL on existing
    * rows, RENAME COLUMN re-points the name with ZERO files rewritten
    * (column mapping — the file-set identity is asserted in-engine),
    * DROP COLUMN tombstones, and a post-ALTER write lands values into
    * the renamed/added columns. The oracle recomputes the final state
    * from the source data alone. */
  val q124CatalogAlter: Q = Q(
    "q124_catalog_alter",
    "catalog ALTER TABLE: add/rename/drop column + post-ALTER write, reader-visible",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_a124").toString
      s.conf.set("spark.sql.catalog.graft_a124",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_a124.root", root)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_a124.db")
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .createOrReplaceTempView("a124_src")
      s.sql("""CREATE TABLE graft_a124.db.t USING graft
               PARTITIONED BY (o_orderstatus)
               AS SELECT * FROM a124_src WHERE o_orderkey % 2 = 0""")
      val base = s"$root/db/t"
      val filesBefore = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
          .allFiles.toSet
      }
      s.sql("ALTER TABLE graft_a124.db.t ADD COLUMNS (note STRING)")
      s.sql("ALTER TABLE graft_a124.db.t RENAME COLUMN o_totalprice TO price")
      val filesAfter = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
          .allFiles.toSet
      }
      require(filesAfter == filesBefore,
        "ADD COLUMNS + RENAME COLUMN must not rewrite a single data file")
      // post-ALTER write: odd keys land with the NEW names
      s.sql("""INSERT INTO graft_a124.db.t
               SELECT o_orderkey, o_totalprice, o_orderstatus, 'late' AS note
               FROM a124_src WHERE o_orderkey % 2 = 1""")
      s.sql("ALTER TABLE graft_a124.db.t DROP COLUMN o_orderkey")
      s.sql("""
        SELECT o_orderstatus, coalesce(note, 'backfilled') AS note,
               COUNT(*) AS n,
               CAST(SUM(CAST(price AS DECIMAL(38,4))) AS DOUBLE) AS total
        FROM graft_a124.db.t GROUP BY o_orderstatus, coalesce(note, 'backfilled')
      """)
    },
    Some("""
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 2 = 1 THEN 'late' ELSE 'backfilled' END AS note,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2
      """))

  /** Row-level SQL DML addressed by the THREE-PART catalog name —
    * `DELETE FROM graft.ns.t` / `UPDATE` / `MERGE INTO` / `TRUNCATE`
    * with no per-session view registration anywhere — graded against a
    * DuckDB recompute of the same edits. The TRUNCATE facet also
    * proves history survives (time travel back to the pre-truncate
    * version). */
  val q125CatalogDml: Q = Q(
    "q125_catalog_dml",
    "DELETE/UPDATE/MERGE/TRUNCATE on graft.ns.t catalog names",
    (s0, d) => {
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_d125").toString
      s.conf.set("spark.sql.catalog.graft_d125",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_d125.root", root)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_d125.db")
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .createOrReplaceTempView("d125_src")
      s.sql("""CREATE TABLE graft_d125.db.t USING graft
               PARTITIONED BY (o_orderstatus)
               AS SELECT * FROM d125_src""")
      s.sql("DELETE FROM graft_d125.db.t WHERE o_orderkey % 7 = 0")
      s.sql("""UPDATE graft_d125.db.t SET o_totalprice = o_totalprice * 2
               WHERE o_orderstatus = 'O' AND o_orderkey % 5 = 0""")
      s.sql("""MERGE INTO graft_d125.db.t t USING
                 (SELECT o_orderkey + 900000000 AS o_orderkey,
                         o_totalprice, o_orderstatus
                  FROM d125_src WHERE o_orderkey % 97 = 0) s
               ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      // re-run the identical MERGE: now every source row MATCHES (the
      // first run inserted them) and updates to the same values —
      // exercises the matched branch and proves upsert idempotence
      s.sql("""MERGE INTO graft_d125.db.t t USING
                 (SELECT o_orderkey + 900000000 AS o_orderkey,
                         o_totalprice, o_orderstatus
                  FROM d125_src WHERE o_orderkey % 97 = 0) s
               ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      // TRUNCATE on a second table: live = 0, history intact
      s.sql("""CREATE TABLE graft_d125.db.tt USING graft
               PARTITIONED BY (o_orderstatus)
               AS SELECT * FROM d125_src""")
      s.sql("TRUNCATE TABLE graft_d125.db.tt")
      val nLive = s.sql("SELECT COUNT(*) FROM graft_d125.db.tt")
        .head.getLong(0)
      // atomic CTAS (StagingTableCatalog): schema + data land as ONE
      // commit — version 1 IS the full snapshot
      val nBack = s.sql("SELECT COUNT(*) FROM graft_d125.db.tt VERSION AS OF 1")
        .head.getLong(0)
      s.sql(s"""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
        FROM graft_d125.db.t GROUP BY o_orderstatus
        UNION ALL
        SELECT 'truncated', $nLive, CAST($nBack AS DOUBLE)
      """)
    },
    Some("""
      WITH edited AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' AND o_orderkey % 5 = 0
                    THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey + 900000000, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 97 = 0)
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM edited GROUP BY o_orderstatus
      UNION ALL
      SELECT 'truncated', 0, (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders)
      """))

  /** UNPARTITIONED graft tables (the round-12 verdict's top gap) —
    * Delta's default table shape run through the WHOLE lifecycle with
    * no partition column anywhere: fresh `save(path)` with no
    * partitionBy, append, `replaceWhere` on a data predicate (no
    * partition to scope it), DELETE/UPDATE/MERGE by catalog name, and
    * OPTIMIZE folding the single hidden partition. In-engine gates pin
    * the layout (manifest key = the one [[SnapshotLog.SinglePart]]
    * bucket, `PartColProp` = the explicit "" marker) and that OPTIMIZE
    * compacts; the oracle recomputes every phase from `orders` alone. */
  val q126Unpartitioned: Q = Q(
    "q126_unpartitioned",
    "unpartitioned table lifecycle: save/append/replaceWhere/DML/OPTIMIZE",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_u126").toString
      val base = s"$root/db/t"
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      def manifest() = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
      }
      // v1: full load, NO partitioning declared anywhere
      orders.write.format("graft").save(base)
      require(manifest().props.get(SnapshotLog.PartColProp)
          .contains(SnapshotLog.NoPartCol),
        "first write must stamp the explicit unpartitioned marker")
      // v2: append a shifted slice (9e8 ≡ 0 mod 3, keeps the oracle's
      // mod arithmetic aligned)
      orders.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus"))
        .write.format("graft").mode("append").save(base)
      val appended = s.read.format("graft").load(base)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      // v3: replaceWhere over a DATA predicate — an unpartitioned
      // table has nothing else to scope the backfill by
      appended.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 3).as("o_totalprice"),
          col("o_orderstatus"))
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "o_orderkey % 3 = 0").save(base)
      require(manifest().files.keySet == Set(SnapshotLog.SinglePart),
        "every write routes to the single hidden partition")
      def facet(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
          .select(lit(name).as("phase"), col("n"), col("total"))
      val saveF = facet("save",
        s.read.format("graft").option("versionAsOf", "1").load(base))
      val appendF = facet("append",
        s.read.format("graft").option("versionAsOf", "2").load(base))
      val replaceF = facet("replace", s.read.format("graft").load(base))
      // row-level DML by THREE-PART catalog name, partition column
      // resolved as "" from the manifest — no view registration
      s.conf.set("spark.sql.catalog.graft_u126",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_u126.root", root)
      orders.createOrReplaceTempView("u126_src")
      s.sql("DELETE FROM graft_u126.db.t WHERE o_orderkey % 7 = 0")
      s.sql("""UPDATE graft_u126.db.t SET o_totalprice = o_totalprice + 1
               WHERE o_orderstatus = 'F' AND o_orderkey % 5 = 0""")
      s.sql("""MERGE INTO graft_u126.db.t t USING
                 (SELECT o_orderkey + 800000000 AS o_orderkey,
                         o_totalprice, o_orderstatus
                  FROM u126_src WHERE o_orderkey % 97 = 0) s
               ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      // OPTIMIZE folds the DML's accumulated files of the one bucket
      val filesBefore = manifest().allFiles.size
      s.sql("OPTIMIZE graft_u126.db.t")
      require(manifest().allFiles.size <= filesBefore &&
          manifest().allFiles.nonEmpty,
        "OPTIMIZE must compact the single hidden partition")
      saveF.union(appendF).union(replaceF)
        .union(facet("final", s.sql("SELECT * FROM graft_u126.db.t")))
    },
    Some("""
      WITH appended AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        UNION ALL
        SELECT o_orderkey + 900000000, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 101 = 0),
      replaced AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 3
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM appended),
      edited AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' AND o_orderkey % 5 = 0
                    THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM replaced WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey + 800000000, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 97 = 0)
      SELECT 'save' AS phase, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders
      UNION ALL
      SELECT 'append', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM appended
      UNION ALL
      SELECT 'replace', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM replaced
      UNION ALL
      SELECT 'final', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM edited
      """))

  /** The REMAINING custom SQL verbs addressed by THREE-PART catalog
    * name — zero view registrations anywhere (the round-12 verdict's
    * item 2): ADD/DROP CONSTRAINT, ANALYZE, CREATE BLOOMFILTER INDEX,
    * ALTER COLUMN TYPE, FSCK, SYNC IDENTITY, GENERATE, EXPIRE
    * VERSIONS. Structural effects gate in-engine (constraint rejects a
    * bad batch, stats/bloom land in the manifest, widening is
    * reader-visible, expiry severs time travel); the data facets grade
    * against a DuckDB recompute. */
  /** Dynamic partition pruning on a graft fact⋈dim join — the 100 TB
    * fact-join-date-dim pattern. [[graft.sources.SnapshotRelation]]'s
    * typed partition exposure makes the commit-log partition column a
    * REAL Spark partition column, so Spark's own DPP plants a runtime
    * IN-subquery partition filter fed from the dim's broadcast (Delta's
    * dynamic file pruning behavior): only the dim-selected months'
    * files are read, no engine-side read API in the loop. Structural
    * gate in-engine (the scan must carry a DynamicPruningExpression);
    * row correctness is the oracle's. */
  val q128DppJoin: Q = Q(
    "q128_dpp_join",
    "dynamic partition pruning: month-partitioned fact ⋈ filtered month dim",
    (s, d) => {
      val root =
        java.nio.file.Files.createTempDirectory("graft_dpp128").toString
      val base = s"$root/fact"
      val fact = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("omonth"))
      graft.sources.SnapshotLog.appendBatch(s, base, fact, "omonth",
        batchId = 1)
      // file-backed month dim (an in-memory dim would constant-fold its
      // filter away and give DPP nothing to latch onto)
      val dimPath = s"$root/dim"
      fact.select("omonth").distinct()
        .withColumn("yr", substring(col("omonth"), 1, 4).cast("int"))
        .withColumn("qtr",
          expr("(cast(substring(omonth, 6, 2) as int) + 2) div 3"))
        .write.parquet(dimPath)
      val dim = s.read.parquet(dimPath)
      val rel = graft.sources.SnapshotRelation
        .read(s, base, partCol = Some("omonth")).get
      def joined = rel.join(dim, Seq("omonth"))
        .filter(col("yr") === 1995 && col("qtr") === 2)
      val probe = joined
      probe.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(sc)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scans(q.plan)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scans(a.executedPlan)
        }.flatten
      val graftScan = scans(probe.queryExecution.executedPlan)
        .find(_.relation.location
          .isInstanceOf[graft.sources.SnapshotFileIndex])
        .getOrElse(sys.error("no graft scan in the DPP join plan"))
      require(graftScan.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
          .DynamicPruningExpression])),
        s"expected a dynamic partition-pruning filter on the graft " +
          s"scan, got: ${graftScan.partitionFilters}")
      joined.groupBy("omonth")
        .agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
        .orderBy("omonth")
    },
    Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS omonth, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders
      WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 2
      GROUP BY 1 ORDER BY 1
      """))

  /** Metadata-only aggregates ([[graft.plans.MetadataAggRewrite]]):
    * COUNT(*) and MIN/MAX of the exposed partition column over a graft
    * table fold to a LocalRelation computed from the manifest — the
    * executed plan contains NO file scan (gated structurally below).
    * At 100 TB: `SELECT COUNT(*) FROM t` is a kilobyte metadata lookup
    * instead of a 10^5-file scan. Requires the statsCols/ANALYZE
    * write path (per-file row counts recorded) and the typed partition
    * exposure; anything unproven keeps a normal scanning plan
    * (MetadataAggSpec grades the refusal cases). */
  val q129MetadataAgg: Q = Q(
    "q129_metadata_agg",
    "COUNT(*)/MIN/MAX(partition) folded to manifest metadata, scan-free plan",
    (s0, d) => {
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_magg129").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
        // a genuinely NULLABLE column so COUNT(col) != COUNT(*): the
        // per-file NON-NULL counts recorded with the stats let it fold
        .withColumn("o_price_n",
          when(col("o_orderkey") % 10 === 0, lit(null))
            .otherwise(col("o_totalprice")))
      graft.sources.SnapshotLog.upsertBatch(s, base, orders,
        Seq("o_orderkey"), "o_orderkey", "o_year", batchId = 1,
        maxRetries = 5,
        statsCols = Seq("o_totalprice", "o_orderkey", "o_price_n"),
        clusterBy = Nil,
        clusterFiles = 8, opCol = None, writeCdf = false)
      val rel = graft.sources.SnapshotRelation
        .read(s, base, partCol = Some("o_year")).get
      // partition extremes fold from partition keys; the DATA-column
      // extremes fold from the per-file stats bounds (exact full-value
      // strings, round-trip-proven) — still zero files read
      val q = rel.agg(count(lit(1)).as("n"),
        count(col("o_price_n")).as("n_priced"),
        min(col("o_year")).as("first_year"),
        max(col("o_year")).as("last_year"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      q.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(sc)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scans(qs.plan)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scans(a.executedPlan)
        }.flatten
      require(scans(q.queryExecution.executedPlan).isEmpty,
        "metadata aggregate must plan WITHOUT a file scan:\n" +
          q.queryExecution.executedPlan.treeString)
      q
    },
    Some("""
      SELECT COUNT(*) AS n,
             COUNT(CASE WHEN o_orderkey % 10 = 0 THEN NULL
                        ELSE o_totalprice END) AS n_priced,
             MIN(CAST(year(o_orderdate) AS VARCHAR)) AS first_year,
             MAX(CAST(year(o_orderdate) AS VARCHAR)) AS last_year,
             MIN(o_orderkey) AS min_key,
             MAX(o_orderkey) AS max_key
      FROM orders
      """))

  /** Partition pruning THROUGH generated columns
    * ([[graft.plans.DerivePartitionFilter]], Delta's generated-column
    * partition filters): the fact is partitioned by
    * `omonth GENERATED ALWAYS AS date_format(o_orderdate, 'yyyy-MM')`
    * and the query filters the raw TIMESTAMP — the rule derives the
    * implied month bounds, the typed exposure prunes partitions, and
    * the in-engine gate asserts files were actually skipped. The
    * natural 100 TB layout: events partitioned by a date derived from
    * their timestamp, pruned by timestamp predicates with no query
    * rewrite. */
  val q130GeneratedPruning: Q = Q(
    "q130_generated_pruning",
    "ts-range filter prunes generated month partitions, oracle-graded",
    (s0, d) => {
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_gen130").toString + "/tbl"
      val fact = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .withColumn("omonth", date_format(col("o_orderdate"), "yyyy-MM"))
      graft.sources.SnapshotLog.appendBatch(s, base, fact, "omonth",
        batchId = 1,
        propsAdd = Map(
          graft.sources.SnapshotLog.PartColProp -> "omonth",
          graft.sources.SnapshotLog.GenColPrefix + "omonth" ->
            "date_format(o_orderdate, 'yyyy-MM')"))
      val (rel, idx) = graft.sources.SnapshotRelation
        .applyWithIndex(s, base).get
      val lo = java.sql.Timestamp.valueOf("1995-03-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
      val q = rel
        .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
        .groupBy("omonth")
        .agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
        .orderBy("omonth")
      val out = q.collect()
      val (sel, tot) = idx.lastPruned.get
      require(sel < tot && sel > 0,
        s"generated-column derivation must prune partitions, kept $sel/$tot")
      q
    },
    Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS omonth, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
      GROUP BY 1 ORDER BY 1
      """))

  /** NESTED COLUMN MAPPING (round-14 verdict item #2), graded at the
    * oracle: a struct field RENAMES as a metadata-only commit (gated:
    * zero files rewritten — the dotted colmap entry re-points the
    * logical name at the unchanged physical subfield), old and new
    * shape slices append, a subfield is DROPPED and a same-name field
    * RE-ADDED — the re-add maps to a FRESH physical slot (gated), so
    * the dropped bytes can never resurrect: the oracle's
    * `n_flagged = 0` would MISMATCH if any old value leaked through.
    * A row DELETE then rewrites across every shape boundary. At
    * 100 TB: renaming/dropping a field inside an event-payload struct
    * without rewriting exabytes — Delta gates the same ops behind
    * column mapping. */
  val q136NestedMapping: Q = Q(
    "q136_nested_mapping",
    "nested column mapping: metadata-only subfield rename/drop, resurrection-proof re-add, DML across shapes",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_nm136").toString + "/tbl"
      val orders = t(s, d, "orders")
      def shaped(df: org.apache.spark.sql.DataFrame, amtName: String) =
        df.select(col("o_orderkey").as("id"),
          struct(col("o_orderstatus").as("status"),
            col("o_totalprice").as(amtName)).as("meta"),
          (col("o_orderkey") % 4).cast("string").as("p"))
      shaped(orders.filter(col("o_orderkey") % 2 === 0), "price")
        .write.format("graft").partitionBy("p").save(base)
      def manifest() = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
      }
      // metadata-only nested RENAME: price -> amt
      val filesBefore = manifest().allFiles
      SnapshotLog.renameNestedColumn(s, base, Seq("meta", "price"), "amt")
      require(manifest().allFiles == filesBefore,
        "nested RENAME must rewrite zero files")
      require(manifest().colmap == Map("meta.amt" -> "price"),
        s"dotted colmap entry expected, got ${manifest().colmap}")
      // a NEW-shape slice appends under the renamed name
      shaped(orders.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 900000000L), "amt")
        .write.format("graft").mode("append").save(base)
      // flag lifecycle: add, populate via one slice, DROP, re-ADD —
      // the re-added slot must be fresh (resurrection-proof)
      SnapshotLog.addNestedColumn(s, base, Seq("meta", "flag"),
        org.apache.spark.sql.types.StructField("flag",
          org.apache.spark.sql.types.IntegerType))
      orders.filter(col("o_orderkey") % 103 === 0)
        .select((col("o_orderkey") + 800000000L).as("id"),
          struct(col("o_orderstatus").as("status"),
            col("o_totalprice").as("amt"),
            (col("o_orderkey") % 7).cast("int").as("flag")).as("meta"),
          ((col("o_orderkey") + 800000000L) % 4).cast("string").as("p"))
        .write.format("graft").mode("append").save(base)
      SnapshotLog.dropNestedColumn(s, base, Seq("meta", "flag"))
      SnapshotLog.addNestedColumn(s, base, Seq("meta", "flag"),
        org.apache.spark.sql.types.StructField("flag",
          org.apache.spark.sql.types.IntegerType))
      require(manifest().colmap.get("meta.flag").exists(_ != "flag"),
        "re-added subfield must map to a fresh physical slot")
      // a row DELETE rewrites across every shape boundary
      SnapshotLog.deleteWhere(s, base,
        col("meta.status") === "F" && col("id") % 5 === 0, "p")
      s.read.format("graft").load(base)
        .groupBy(col("meta.status").as("status"))
        .agg(count(lit(1)).as("n"),
          dsumD(col("meta.amt")).as("total"),
          count(col("meta.flag")).as("n_flagged"))
        .orderBy(col("status"))
    },
    Some("""
      WITH appended AS (
        SELECT o_orderkey AS id, o_orderstatus AS status,
               o_totalprice AS amt
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey + 900000000, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 101 = 0
        UNION ALL
        SELECT o_orderkey + 800000000, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 103 = 0),
      kept AS (
        SELECT * FROM appended WHERE NOT (status = 'F' AND id % 5 = 0))
      SELECT status, COUNT(*) AS n,
             CAST(SUM(CAST(amt AS DECIMAL(38,4))) AS DOUBLE) AS total,
             CAST(0 AS BIGINT) AS n_flagged
      FROM kept GROUP BY 1 ORDER BY 1
      """))

  /** COMPOUND generated partitioning (round-14 verdict item #7): a
    * `(oy, om)` layout where BOTH columns are GENERATED from the same
    * timestamp (`year(o_orderdate)`, `date_format(o_orderdate,
    * 'yyyy-MM')`), queried with a raw o_orderdate range — the
    * derivation rule must plant conjuncts on BOTH partition columns
    * (gated by inspecting the optimized filter's references) and the
    * typed exposure must prune to the touched cells (gated by
    * lastPruned). The oracle recomputes from `orders` with the bare
    * timestamp predicate. At 100 TB this is the canonical
    * year/month event layout: every ts-range query prunes at both
    * levels with no query rewrite. */
  val q135CompoundGenerated: Q = Q(
    "q135_compound_generated",
    "(y, m) both GENERATED from one timestamp: a raw ts range derives and prunes on both",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_cg135").toString + "/tbl"
      val fact = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .withColumn("oy", year(col("o_orderdate")))
        .withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
      SnapshotLog.appendBatch(s, base, fact, "oy,om", batchId = 1,
        propsAdd = Map(
          SnapshotLog.PartColProp -> "oy,om",
          SnapshotLog.GenColPrefix + "oy" -> "year(o_orderdate)",
          SnapshotLog.GenColPrefix + "om" ->
            "date_format(o_orderdate, 'yyyy-MM')"))
      val (rel, idx) = graft.sources.SnapshotRelation
        .applyWithIndex(s, base).get
      require(idx.partitionSchema.fieldNames.toSeq == Seq("oy", "om"),
        "both generated columns must typed-expose")
      val lo = java.sql.Timestamp.valueOf("1995-03-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
      val q = rel
        .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
        .groupBy(col("oy"), col("om"))
        .agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
        .orderBy(col("om"))
      // BOTH components must appear in the derived filter
      val refs = q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.references.map(_.name).toSet
      }.flatten.toSet
      require(refs.contains("oy") && refs.contains("om"),
        s"derivation must plant conjuncts on both components, got $refs")
      q.collect()
      val (sel, tot) = idx.lastPruned.get
      require(sel < tot && sel > 0 && sel <= tot / 10,
        s"3 months of ~7 years must prune hard, kept $sel/$tot")
      q
    },
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS oy,
             strftime(o_orderdate, '%Y-%m') AS om, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
      GROUP BY 1, 2 ORDER BY om
      """))

  /** Dynamic partition overwrite
    * ([[graft.sources.WriteIntoGraft.PartitionOverwriteModeOption]],
    * Spark's `partitionOverwriteMode=dynamic`): `mode("overwrite")`
    * replaces ONLY the partitions the batch writes — the standard
    * daily-backfill shape (recompute one day, leave seven years
    * untouched) with no predicate to spell. In-engine gate: untouched
    * partitions keep their EXACT file lists (a metadata proof that no
    * unrelated data was rewritten — at 100 TB this is a one-partition
    * data job plus a kilobyte commit); rows are the oracle's. */
  val q131DynamicOverwrite: Q = Q(
    "q131_dynamic_overwrite",
    "partitionOverwriteMode=dynamic: overwrite replaces only written partitions",
    (s0, d) => {
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_dpo131").toString + "/tbl"
      val orders3 = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      orders3.write.format("graft").partitionBy("o_orderstatus").save(base)
      def manifest() = {
        val bp = new org.apache.hadoop.fs.Path(base)
        graft.sources.SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
      }
      val before = manifest()
      // recompute ONLY the 'O' partition: halved keys, adjusted totals
      orders3.filter(col("o_orderstatus") === "O" &&
          col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 5).as("o_totalprice"),
          col("o_orderstatus"))
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").save(base)
      val after = manifest()
      require(after.files.view.filterKeys(_ != "O").toMap ==
          before.files.view.filterKeys(_ != "O").toMap,
        "dynamic overwrite must leave untouched partitions' file " +
          "lists byte-identical")
      s.read.format("graft").load(base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },
    Some("""
      WITH finalt AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderstatus <> 'O'
        UNION ALL
        SELECT o_orderkey, o_totalprice + 5, o_orderstatus
        FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 2 = 0)
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM finalt GROUP BY 1 ORDER BY 1
      """))

  /** MULTI-COLUMN identity partitioning (`PARTITIONED BY (status,
    * priority)` — Delta/Hive's compound layout, the round-13 verdict's
    * top gap) run through the WHOLE lifecycle: save with two partition
    * columns, append, replaceWhere scoping ONE cell, dynamic overwrite
    * replacing one status's cells, a metadata-only DELETE on one
    * component, and a partition-PRUNED read. In-engine gates pin the
    * layout (PartColProp = the comma-joined list, manifest keys =
    * `/`-joined composites), that untouched cells keep exact file
    * lists across the dynamic overwrite, that the component DELETE is
    * metadata-only, and that a one-column filter actually prunes files
    * (`lastPruned`); the oracle recomputes every phase from `orders`
    * alone. At 100 TB this is the year/month fact layout: month-scoped
    * backfills rewrite one month, year-level queries read one year. */
  val q132MultiPartition: Q = Q(
    "q132_multi_partition",
    "two-column identity partitioning lifecycle: save/append/replaceWhere/dynamic/DELETE/prune",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_mp132").toString + "/tbl"
      val orders4 = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      def manifest() = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
      }
      // v1: compound layout, declaration order is part of the contract
      orders4.write.format("graft")
        .partitionBy("o_orderstatus", "o_orderpriority").save(base)
      require(manifest().props.get(SnapshotLog.PartColProp)
          .contains("o_orderstatus,o_orderpriority"),
        "first write must stamp the comma-joined layout")
      require(manifest().files.keySet.forall(_.count(_ == '/') == 1),
        "manifest keys are two-component composites")
      // v2: append a shifted slice (no partitionBy needed — the layout
      // is the table's)
      orders4.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus"), col("o_orderpriority"))
        .write.format("graft").mode("append").save(base)
      // v3: replaceWhere scoping ONE cell — both components named
      s.read.format("graft").load(base)
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderpriority") === "5-LOW")
        .select(col("o_orderkey"), (col("o_totalprice") * 3).as("o_totalprice"),
          col("o_orderstatus"), col("o_orderpriority"))
        .write.format("graft").mode("overwrite")
        .option("replaceWhere",
          "o_orderstatus = 'F' AND o_orderpriority = '5-LOW'").save(base)
      // v4: dynamic overwrite recomputing ONE status's cells; every
      // other cell must keep its exact file list
      val before = manifest()
      s.read.format("graft").load(base)
        .filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), (col("o_totalprice") + 10).as("o_totalprice"),
          col("o_orderstatus"), col("o_orderpriority"))
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").save(base)
      val after = manifest()
      require(after.files.view.filterKeys(!_.startsWith("P/")).toMap ==
          before.files.view.filterKeys(!_.startsWith("P/")).toMap,
        "dynamic overwrite must leave non-'P' cells' file lists " +
          "byte-identical")
      // metadata-only DELETE on ONE component: whole cells drop with
      // zero data files read or rewritten
      val delOut = SnapshotLog.deleteWhere(s, base,
        col("o_orderpriority") === "4-NOT SPECIFIED",
        "o_orderstatus,o_orderpriority").get
      require(delOut.metadataOnly,
        "a one-component partition predicate must take the metadata path")
      // partition-PRUNED read on ONE column: the typed exposure must
      // skip the other statuses' files
      val (rel, idxF) = graft.sources.SnapshotRelation
        .applyWithIndex(s, base).get
      val oOnly = rel.filter(col("o_orderstatus") === "O")
      oOnly.write.mode("overwrite").format("noop").save()
      val (sel, tot) = idxF.lastPruned.get
      require(sel < tot && sel > 0,
        s"a one-column filter must prune the other statuses ($sel/$tot)")
      s.read.format("graft").load(base)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      WITH appended AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
        FROM orders
        UNION ALL
        SELECT o_orderkey + 900000000, o_totalprice, o_orderstatus,
               o_orderpriority
        FROM orders WHERE o_orderkey % 101 = 0),
      replaced AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' AND o_orderpriority = '5-LOW'
                    THEN o_totalprice * 3 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus, o_orderpriority
        FROM appended),
      dyn AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 10
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus, o_orderpriority
        FROM replaced),
      finalt AS (
        SELECT * FROM dyn WHERE o_orderpriority <> '4-NOT SPECIFIED')
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM finalt GROUP BY 1 ORDER BY 1
      """))

  /** NESTED add-column evolution (round-13 verdict gap #3), graded
    * end-to-end at the oracle: a struct-carrying table gets
    * `ADD COLUMNS (meta.flag INT)` as a METADATA-ONLY commit (gated:
    * zero files rewritten), a new-shape slice appends WITH the field,
    * an old-shape slice appends WITHOUT it (the schema header must
    * keep the evolved struct — no legacy degradation, gated), a
    * nested-predicate DELETE rewrites across the shape boundary
    * (conform fills the missing subfield), and the output flattens the
    * struct so the oracle recomputes every phase from `orders` with
    * plain scalars. At 100 TB: evolving event payload structs without
    * rewriting exabytes is table stakes for a training-data log. */
  val q133NestedEvolution: Q = Q(
    "q133_nested_evolution",
    "nested ADD COLUMNS lifecycle: metadata-only evolve/append both shapes/DML across the boundary",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_ne133").toString + "/tbl"
      val orders = t(s, d, "orders")
      def shaped(df: org.apache.spark.sql.DataFrame) = df.select(
        col("o_orderkey").as("id"),
        struct(col("o_orderstatus").as("status"),
          col("o_totalprice").as("price")).as("meta"),
        (col("o_orderkey") % 4).cast("string").as("p"))
      shaped(orders).write.format("graft").partitionBy("p").save(base)
      def manifest() = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
      }
      val filesBefore = manifest().allFiles
      SnapshotLog.addNestedColumn(s, base, Seq("meta", "flag"),
        org.apache.spark.sql.types.StructField("flag",
          org.apache.spark.sql.types.IntegerType))
      require(manifest().allFiles == filesBefore,
        "nested ADD must be metadata-only — zero files rewritten")
      // new-shape slice (carries flag), keys shifted +9e8 (≡0 mod 4
      // and mod 7, keeping the oracle's arithmetic aligned)
      orders.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + 900000000L).as("id"),
          struct(col("o_orderstatus").as("status"),
            col("o_totalprice").as("price"),
            (col("o_orderkey") % 7).cast("int").as("flag")).as("meta"),
          ((col("o_orderkey") + 900000000L) % 4).cast("string").as("p"))
        .write.format("graft").mode("append").save(base)
      // old-shape slice (no flag): must append AND keep the evolved header
      shaped(orders.filter(col("o_orderkey") % 103 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 800000000L))
        .write.format("graft").mode("append").save(base)
      require(manifest().schema.exists(_("meta").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.sameElements(Array("status", "price", "flag"))),
        "an old-shape append must not degrade the evolved schema header")
      // nested-predicate DELETE rewrites across the shape boundary
      SnapshotLog.deleteWhere(s, base,
        col("meta.status") === "F" && col("id") % 5 === 0, "p")
      s.read.format("graft").load(base)
        .groupBy(col("meta.status").as("status"))
        .agg(count(lit(1)).as("n"),
          dsumD(col("meta.price")).as("total"),
          count(col("meta.flag")).as("n_flagged"),
          sum(col("meta.flag")).as("flag_sum"))
        .orderBy(col("status"))
    },
    Some("""
      WITH appended AS (
        SELECT o_orderkey AS id, o_orderstatus AS status,
               o_totalprice AS price, CAST(NULL AS INT) AS flag
        FROM orders
        UNION ALL
        SELECT o_orderkey + 900000000, o_orderstatus, o_totalprice,
               CAST(o_orderkey % 7 AS INT)
        FROM orders WHERE o_orderkey % 101 = 0
        UNION ALL
        SELECT o_orderkey + 800000000, o_orderstatus, o_totalprice,
               CAST(NULL AS INT)
        FROM orders WHERE o_orderkey % 103 = 0),
      kept AS (
        SELECT * FROM appended WHERE NOT (status = 'F' AND id % 5 = 0))
      SELECT status, COUNT(*) AS n,
             CAST(SUM(CAST(price AS DECIMAL(38,4))) AS DOUBLE) AS total,
             COUNT(flag) AS n_flagged,
             CAST(SUM(flag) AS BIGINT) AS flag_sum
      FROM kept GROUP BY status ORDER BY status
      """))

  /** PARTITION EVOLUTION lifecycle (round-14 verdict item #1), graded
    * at the oracle: an o_orderstatus-partitioned table repartitions to
    * o_orderpriority as a METADATA-ONLY commit (gated: zero files
    * moved), a post-evolution slice appends under the NEW layout, the
    * mixed manifest prunes per-key under each key's OWN layout
    * (gated), a row DELETE crosses the layout boundary (matching rows
    * live in both generations), and OPTIMIZE migrates every legacy
    * partition (gated) before the final read. The oracle recomputes
    * the surviving content from `orders` directly — the layout must
    * never change results. At 100 TB: re-partitioning by rewrite is a
    * full-table shuffle; this is ONE manifest write, with migration
    * amortized into rewrites that were going to happen anyway
    * (Iceberg spec-v2 semantics). */
  val q134PartitionEvolution: Q = Q(
    "q134_partition_evolution",
    "partition evolution: metadata-only repartition / mixed-layout reads+pruning / DML across the boundary / OPTIMIZE migration",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_pe134").toString + "/tbl"
      val orders4 = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      def manifest() = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
      }
      // v1: status layout
      orders4.write.format("graft").partitionBy("o_orderstatus").save(base)
      val mBefore = manifest()
      // v2: REPARTITION to priority — metadata-only, gated
      SnapshotLog.repartitionTable(s, base, "o_orderpriority")
      val mEvo = manifest()
      require(mEvo.files == mBefore.files,
        "partition evolution must move ZERO data files")
      require(mEvo.op.contains("REPARTITION") &&
        mEvo.legacyKeys == mBefore.files.keySet,
        "every pre-evolution key is tagged legacy")
      require(mEvo.readerFeatures.contains("partitionEvolution"),
        "the mixed state must gate evolution-unaware readers out")
      // v3: append routes under the NEW layout
      orders4.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus"), col("o_orderpriority"))
        .write.format("graft").mode("append").save(base)
      require(manifest().files.keySet.exists(k => !mBefore.files.contains(k)),
        "appended rows must land under priority keys")
      // mixed-manifest pruning: a status predicate prunes the OTHER
      // legacy statuses; priority-layout files keep (their keys say
      // nothing about status)
      val (rel, idx) = graft.sources.SnapshotRelation
        .applyWithIndex(s, base).get
      rel.filter(col("o_orderstatus") === "O")
        .write.mode("overwrite").format("noop").save()
      val (sel, tot) = idx.lastPruned.get
      require(sel < tot && sel > 0,
        s"per-layout pruning must fire on the mixed manifest ($sel/$tot)")
      // v4: a row DELETE whose matches live in BOTH layout generations
      val delOut = SnapshotLog.deleteWhere(s, base,
        col("o_orderstatus") === "F" && col("o_orderkey") % 5 === 0,
        "o_orderpriority").get
      require(!delOut.metadataOnly, "mixed layout forces the row path")
      // v5: OPTIMIZE migrates the remaining legacy partitions
      SnapshotLog.optimizeTable(s, base, "o_orderpriority")
      val mFinal = manifest()
      require(mFinal.legacyKeys.isEmpty,
        "OPTIMIZE must migrate every legacy key to the current layout")
      require(!mFinal.readerFeatures.contains("partitionEvolution"),
        "a fully-migrated table stops demanding the feature")
      s.read.format("graft").load(base)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH appended AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
        FROM orders
        UNION ALL
        SELECT o_orderkey + 900000000, o_totalprice, o_orderstatus,
               o_orderpriority
        FROM orders WHERE o_orderkey % 101 = 0),
      kept AS (
        SELECT * FROM appended
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0))
      SELECT o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM kept GROUP BY 1 ORDER BY 1
      """))

  val q127CatalogVerbs: Q = Q(
    "q127_catalog_verbs",
    "constraint/ANALYZE/bloom/widen/FSCK/EXPIRE lifecycle on graft.ns.t names",
    (s0, d) => {
      import graft.sources.SnapshotLog
      val s = graft.GraftSessions.withExtensions(s0)
      val root = java.nio.file.Files.createTempDirectory("graft_v127").toString
      s.conf.set("spark.sql.catalog.graft_v127",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_v127.root", root)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_v127.db")
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .createOrReplaceTempView("v127_src")
      s.sql("""CREATE TABLE graft_v127.db.t USING graft
               PARTITIONED BY (o_orderstatus)
               AS SELECT * FROM v127_src WHERE o_orderkey % 2 = 0""")
      val base = s"$root/db/t"
      def manifest() = {
        val bp = new org.apache.hadoop.fs.Path(base)
        SnapshotLog.readManifest(
          bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
      }
      def facet(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("total"))
          .select(lit(name).as("phase"), col("n"), col("total"))
      val ctasF = facet("ctas", s.sql("SELECT * FROM graft_v127.db.t"))
      // ADD CONSTRAINT on the dotted name gates every later write
      s.sql("ALTER TABLE graft_v127.db.t ADD CONSTRAINT pos_price " +
        "CHECK (o_totalprice > 0)")
      val rejected =
        try {
          s.sql("""INSERT INTO graft_v127.db.t
                   SELECT o_orderkey + 500000000, -1.0, o_orderstatus
                   FROM v127_src WHERE o_orderkey % 2 = 1""")
          false
        } catch { case _: Exception => true }
      require(rejected, "the dotted-name CHECK constraint must gate inserts")
      s.sql("""INSERT INTO graft_v127.db.t
               SELECT o_orderkey, o_totalprice + 10, o_orderstatus
               FROM v127_src WHERE o_orderkey % 2 = 1""")
      // ANALYZE + bloom index: metadata-only, manifest-visible
      s.sql("ANALYZE TABLE graft_v127.db.t COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderkey")
      require(manifest().stats.values.exists(_.contains("o_orderkey")),
        "ANALYZE on the dotted name must land per-file bounds")
      s.sql("CREATE BLOOMFILTER INDEX ON graft_v127.db.t (o_orderkey)")
      require(manifest().blooms.nonEmpty,
        "bloom index on the dotted name must land in the manifest")
      // widening retype through the intercepted dotted verb
      s.sql("ALTER TABLE graft_v127.db.t ADD COLUMNS (flag INT)")
      s.sql("ALTER TABLE graft_v127.db.t ALTER COLUMN flag TYPE BIGINT")
      require(s.sql("SELECT * FROM graft_v127.db.t").schema("flag")
          .dataType == org.apache.spark.sql.types.LongType,
        "ALTER COLUMN TYPE on the dotted name must widen reader-visibly")
      s.sql("ALTER TABLE graft_v127.db.t DROP COLUMN flag")
      // repair/maintenance verbs: FSCK dry-run clean, SYNC no-op (no
      // identity columns), GENERATE exports the symlink manifest
      assert(s.sql("FSCK REPAIR TABLE graft_v127.db.t DRY RUN")
        .head.getLong(1) == 0L)
      s.sql("ALTER TABLE graft_v127.db.t SYNC IDENTITY")
      s.sql("GENERATE symlink_format_manifest FOR TABLE graft_v127.db.t")
      require(new java.io.File(s"$base/_symlink_format_manifest").exists(),
        "GENERATE on the dotted name must export the symlink manifest")
      // EXPIRE severs time travel to all but the newest version
      val vNow = manifest().version
      s.sql("EXPIRE VERSIONS ON graft_v127.db.t KEEP LAST 1")
      val bp = new org.apache.hadoop.fs.Path(base)
      val hfs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      require(SnapshotLog.readManifestAt(hfs, bp, 1L).isEmpty,
        "EXPIRE VERSIONS must delete the expired manifests")
      require(SnapshotLog.readManifestAt(hfs, bp, vNow).isDefined,
        "the retained newest version survives expiry")
      // DROP CONSTRAINT closes the loop: the once-rejected batch lands
      s.sql("ALTER TABLE graft_v127.db.t DROP CONSTRAINT pos_price")
      s.sql("""INSERT INTO graft_v127.db.t
               SELECT o_orderkey + 500000000, -1.0, o_orderstatus
               FROM v127_src WHERE o_orderkey % 97 = 0""")
      ctasF.union(facet("final", s.sql("SELECT * FROM graft_v127.db.t")))
    },
    Some("""
      WITH finalt AS (
        SELECT o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_totalprice + 10, o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 1
        UNION ALL
        SELECT -1.0, o_orderstatus FROM orders WHERE o_orderkey % 97 = 0)
      SELECT 'ctas' AS phase, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT 'final', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      FROM finalt
      """))

  /** REFRESH TABLE — the staleness contract of registered views and
    * its standard SQL remedy. `Catalog.registerSnapshotLog` PINS a
    * snapshot (the temp view stores the analyzed plan); view-routed
    * SQL DML re-pins, but a write through any other surface — the
    * Scala API, `df.write.format("graft")`, another engine, an
    * out-of-band partition evolution — leaves the view serving the
    * pinned version. `REFRESH [TABLE] view`
    * ([[graft.plans.SnapshotRefreshCommand]]) re-pins at the LIVE
    * committed version and re-resolves the partition layout from the
    * manifest, healing DML routing after evolution. The lifecycle:
    * v1 = odd orderkeys; out-of-band append of the evens (view still
    * counts the odds — require-graded); REFRESH (view counts all);
    * out-of-band REPARTITION to o_orderstatus + REFRESH; view-routed
    * DELETE on the now-mixed manifest stays exact. The emitted rows
    * are the surviving per-year state, recomputed relationally by
    * the oracle. */
  val q137RefreshPin: Q = Q(
    "q137_refresh_pin",
    "REFRESH TABLE re-pins a registered view at the live version",
    (s0, d) => {
      import graft.sources.{Catalog, SnapshotLog}
      val s = graft.GraftSessions.withExtensions(s0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_refresh137").toString + "/tbl"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        year(col("o_orderdate")).cast(StringType).as("o_year"))
      val odd = orders.filter(col("o_orderkey") % 2 === 1)
      val nOdd = odd.count()
      val nAll = orders.count()
      SnapshotLog.appendBatch(s, base, odd, "o_year", batchId = 1,
        propsAdd = Map(SnapshotLog.PartColProp -> "o_year"))
      val view = Catalog.registerSnapshotLog(s, "q137", "orders", base,
        Some("o_year"))
      // out-of-band append (Scala API): the registered view must NOT
      // move — registration pins a snapshot by design
      SnapshotLog.appendBatch(s, base,
        orders.filter(col("o_orderkey") % 2 === 0), "o_year", batchId = 2)
      require(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == nOdd,
        "a registered view must keep serving its pinned snapshot")
      val r = s.sql(s"REFRESH TABLE $view").collect().head
      require(r.getString(0) == "REFRESH",
        s"REFRESH must route through the snapshot command: $r")
      require(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == nAll,
        "REFRESH must re-pin the view at the live version")
      // out-of-band partition evolution; REFRESH re-resolves the
      // layout so view-routed DML routes by the NEW layout and stays
      // exact on the mixed (legacy o_year keys + current) manifest
      SnapshotLog.repartitionTable(s, base, "o_orderstatus")
      s.sql(s"REFRESH $view").collect()
      s.sql(s"DELETE FROM $view WHERE o_orderkey % 7 = 0")
      val nDel = orders.filter(col("o_orderkey") % 7 === 0).count()
      require(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0)
        == nAll - nDel, "post-evolution DML through the refreshed view " +
        "must stay exact across the layout boundary")
      s.sql(s"""
        SELECT o_year, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS DOUBLE) AS total
        FROM $view GROUP BY o_year
      """)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year
        FROM orders)
      SELECT o_year, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM base WHERE o_orderkey % 7 <> 0 GROUP BY o_year
      """))

  val all: Seq[Q] = Seq(
    q103BucketedJoin, q104Convert, q105MergeSubquery, q106Identity,
    q107RecursiveCte, q108TypeWidening, q109DeepClone, q110Variant,
    q111PipeSyntax, q112ExecImmediate, q113SqlUdfs, q114TryFunctions,
    q115FusedQa, q116StreamSessions, q117CatalogRead, q118RowTracking,
    q119StreamIntervalJoin, q120ListAgg, q121ReplaceWhere, q122DsvWrite,
    q123FormatStream, q124CatalogAlter, q125CatalogDml, q126Unpartitioned,
    q132MultiPartition, q133NestedEvolution, q134PartitionEvolution,
    q135CompoundGenerated, q136NestedMapping, q137RefreshPin,
    q127CatalogVerbs, q128DppJoin, q129MetadataAgg, q130GeneratedPruning,
    q131DynamicOverwrite,
    q36Percentiles, q37CorrelatedSubquery, q38WordExplode, q39Pivot,
    q40WindowSuite, q41GroupingSets, q42DatetimeScalars, q43ArgmaxStruct,
    q44NullScalars, q45Histogram, q46RegexStrings, q47IntersectAll,
    q48ExceptAll, q49SaltedJoin, q50Unpivot, q51GapFill, q52MapOps,
    q53ForwardFill, q54PercentOfTotal, q55TrailingWindow, q56HashSample,
    q57MergeUpsert, q58Lateral, q59WindowDistinct, q60Interpolate,
    q61NullSafeJoin, q62GroupByAll, q63ApproxQuantiles, q64Scd2,
    q65BloomSemiJoin, q66ZOrderPruning, q67CommitLogUpsert, q68CdcApply,
    q69PitLookup, q70StatsPruning, q71CompositeMerge, q72VersionDiff,
    q73IncrementalAgg, q74StreamCdfTail, q75BloomFileSkip, q76JoinIvm,
    q77MetadataCount, q78PredicateDelete, q79PredicateUpdate,
    q80PlannerScan, q81DeletionVectors, q82VersionStream, q83History,
    q84SqlDml, q85ConditionalMerge, q86SqlInsertCtas, q87TimeTravelSql,
    q88ShardedManifest, q89SqlMaintenance, q90TableChangesSql,
    q91ShowPartitions, q92CheckConstraints, q93ShallowClone, q94StreamSink,
    q95CopyInto, q96CdfByProperty, q97SubqueryDml, q98ColumnMapping,
    q99AutoMerge, q100TruncateReload, q101GeneratedCols, q102CreateReplace)
}

"""DuckDB oracle SQL per hash-checkable Qkey (SURVEY.md §2 contract).

Each statement is the ANSI-SQL twin of the same-named entry in
``mini_sql_engine_spark.queries``: identical column names, identical
value discipline (decimal-exact sums, CAST AS DOUBLE — never ``*1.0``,
which is DECIMAL math in DuckDB — and the same rounding at the same
decimals). Integer outputs are BIGINT on both sides.

Keys intentionally ABSENT (rows-only contract — no faithful DuckDB
twin; validated instead by pytest numpy/python oracles, see tests/):
dedup_near, dedup_simhash, dedup_embed (xxhash64/LSH-seeded),
sim_topk, sim_ann, sim_ivf (float dot-product accumulation order),
multimodal_features (binary UDF path), user_ewma (order-dependent
recurrence), corpus_clean (contains the LSH stage), corpus_sample
(Spark-RNG ``sampleBy``).

HUGEINT discipline (the round-2 seq_pack lesson): DuckDB widens
``sum(BIGINT)`` — including window sums and ``sum(CASE …)`` — to
HUGEINT, whose values the driver's hasher renders differently from
Spark's BIGINT. Every integer OUTPUT column derived from a sum is
``CAST(... AS BIGINT)``; sums used only as grouping keys or in
comparisons don't need it.

DOUBLE-conversion discipline (round 8, found by the first full ~sf1
cross-engine sweep): once an exact sum carries more than 53
significant bits (cents² power sums at sf0.1, money sums at ~sf1),
DuckDB's direct HUGEINT/DECIMAL→DOUBLE cast double-rounds — 1 ulp
off Spark's correctly-rounded DECIMAL→DOUBLE (observed:
sum_charge 27864155010.941590 → DuckDB 2786...93, Spark/python
2786...9). Every ``sum`` that feeds a DOUBLE therefore converts via
``CAST(CAST(sum(...) AS VARCHAR) AS DOUBLE)`` — DuckDB's string
parse is correctly rounded, restoring bit-equality at ANY scale.
Spark sides stay untouched (their conversion is already correct).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["scan_table"] = "SELECT * FROM lineitem"

ORACLES["project_cols"] = (
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
)

ORACLES["project_expr"] = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0::DOUBLE - l_discount) AS revenue
FROM lineitem
"""

ORACLES["filter_cmp"] = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity > 30
"""

ORACLES["filter_colcmp"] = """
SELECT l_orderkey, l_linenumber, l_tax, l_discount
FROM lineitem WHERE l_tax > l_discount
"""

ORACLES["filter_and"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
"""

ORACLES["filter_or"] = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem WHERE l_returnflag = 'R' OR l_quantity <= 5
"""

ORACLES["cross_join"] = """
SELECT r_regionkey, r_name, n_nationkey, n_name FROM region, nation
"""

ORACLES["equi_join"] = """
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""

ORACLES["join3"] = """
SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice, c_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

ORACLES["theta_join"] = """
SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
FROM customer JOIN supplier
  ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
"""

ORACLES["left_join"] = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""

ORACLES["semi_join"] = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""

ORACLES["anti_join"] = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

ORACLES["agg_scalar"] = """
SELECT max(l_quantity) AS max_qty,
       min(l_quantity) AS min_qty,
       sum(l_quantity) AS sum_qty,
       sum(l_quantity) / count(l_quantity) AS avg_qty,
       count(l_quantity) AS count_qty,
       count(*) AS count_star
FROM lineitem
"""

ORACLES["distinct_cols"] = (
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"
)

ORACLES["count_distinct"] = (
    "SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem"
)

ORACLES["group_agg"] = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["group_having"] = """
SELECT o_custkey, count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_spend
FROM orders GROUP BY o_custkey HAVING count(*) >= 12
"""

ORACLES["rollup_agg"] = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLES["range_join"] = """
WITH w AS (
  SELECT event_id AS wid,
         ts - INTERVAL 30 MINUTE AS lo,
         ts + INTERVAL 30 MINUTE AS hi
  FROM events WHERE event_type = 'purchase'
  ORDER BY value DESC, event_id LIMIT 20
)
SELECT e.event_id, w.wid
FROM events e JOIN w ON e.ts BETWEEN w.lo AND w.hi
"""

ORACLES["asof_join"] = """
WITH p AS (
  SELECT user_id, ts, max(value) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.value, p.pvalue AS asof_pvalue
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
"""

ORACLES["q3_topk"] = """
SELECT l_orderkey,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < '1995-03-15'
  AND l_shipdate > '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ORACLES["q5_local_suppliers"] = """
SELECT n_name,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""

ORACLES["group_collect"] = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

ORACLES["array_hof"] = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       len(embedding) AS dim
FROM embeddings
"""

ORACLES["cube_agg"] = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLES["pivot_agg"] = """
SELECT o_orderpriority,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS VARCHAR) AS DOUBLE) AS spend_f,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS VARCHAR) AS DOUBLE) AS spend_o,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS VARCHAR) AS DOUBLE) AS spend_p
FROM orders GROUP BY o_orderpriority
"""

ORACLES["percentiles"] = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_cont(l_extendedprice, 0.5) AS p50_price
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["win_range_frame"] = """
SELECT event_id, user_id,
       round(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE), 6)
         AS trailing_1h_value,
       count(*) OVER w AS trailing_1h_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""
# floor(epoch()) matches Spark's whole-second unix_timestamp;
# fractional epoch() would shift RANGE boundaries on sub-second data


ORACLES["win_dist"] = """
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
"""

ORACLES["set_intersect_all"] = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
"""

ORACLES["set_except_all"] = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
"""

ORACLES["order_by"] = """
SELECT o_orderkey, o_totalprice,
       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
FROM orders
"""

ORACLES["top_k"] = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""

ORACLES["set_union"] = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""

ORACLES["set_intersect"] = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""

ORACLES["set_except"] = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""

ORACLES["str_funcs"] = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       length(p_name) AS name_len,
       substring(p_type, 1, 5) AS type_prefix,
       p_brand || '#' || p_type AS brand_type,
       trim('  pad  ') AS trimmed,
       p_type LIKE 'PROMO%' AS is_promo,
       replace(p_name, ' ', '_') AS name_snake
FROM part
"""

ORACLES["date_funcs"] = """
SELECT o_orderkey,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       dayofmonth(o_orderdate) AS o_day,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       strftime(o_orderdate, '%Y-%m') AS o_yearmonth
FROM orders
"""

ORACLES["math_funcs"] = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))
            AS DOUBLE) AS price_tenth,
       abs(l_quantity - 25) AS qty_dev,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       sqrt(l_extendedprice) AS price_sqrt,
       round(ln(l_extendedprice), 4) AS price_ln,
       round(power(l_quantity, 2), 4) AS qty_sq
FROM lineitem
"""

ORACLES["case_when"] = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_resolved
FROM orders
"""

ORACLES["array_funcs"] = """
SELECT vec_id,
       len(embedding) AS emb_dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(embedding[-1] AS DOUBLE) AS last_val,
       label
FROM embeddings
"""

ORACLES["json_funcs"] = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
"""

ORACLES["json_typed"] = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_map,
       CAST(len(json_keys(props)) AS INT) AS n_keys
FROM events
"""

ORACLES["win_rank"] = """
SELECT o_orderkey, o_custkey,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
FROM orders
"""

ORACLES["win_lag"] = """
SELECT event_id, user_id,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS value_delta
FROM events
"""

ORACLES["win_running_sum"] = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_value
FROM events
"""

ORACLES["win_tumbling"] = """
SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS ws,
       event_type,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

ORACLES["win_sliding"] = """
SELECT strftime(time_bucket(INTERVAL '6 hours', ts) - i * INTERVAL '6 hours',
                '%Y-%m-%d %H:%M:%S') AS ws,
       event_type,
       count(*) AS n_events
FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) g
GROUP BY 1, 2
"""

# Spark session_window(gap) ≡ gaps-and-islands: a new session starts when
# the gap from the previous event is ≥ the session gap (session windows
# are half-open [start, last+gap)).
ORACLES["win_session"] = """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, sid
"""

ORACLES["dedup_exact"] = """
SELECT lang, count(*) AS n_unique_docs
FROM (SELECT DISTINCT text, lang FROM documents)
GROUP BY lang
"""

ORACLES["text_stats"] = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       length(text) AS text_len
FROM documents WHERE lang = 'en'
"""

ORACLES["tfidf"] = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
  HAVING count(*) >= 2
),
df AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks)
  GROUP BY term
),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
SELECT tf.doc_id, tf.term, tf.tf,
       round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN n
"""

ORACLES["token_counts"] = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens
FROM documents
"""

ORACLES["term_counts"] = """
SELECT term, count(*) AS term_count
FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents)
GROUP BY term
"""

ORACLES["text_quality"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
)
SELECT doc_id,
       len(tk) AS n_tokens,
       len(list_filter(tk, t -> t IN ('the', 'a'))) AS n_stopwords,
       round(CAST(len(list_filter(tk, t -> t IN ('the', 'a'))) AS DOUBLE)
             / len(tk), 6) AS stop_ratio,
       round(CAST(list_aggregate(list_transform(tk, t -> length(t)), 'sum')
                  AS DOUBLE) / len(tk), 6) AS mean_token_len
FROM toks
"""

ORACLES["dedup_ngram"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), sh AS (
  -- mirror ngram_jaccard_pairs_capped's max_df=1000 cap (ADVICE r4):
  -- Spark and oracle stay definitionally identical at every SF
  SELECT doc_id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) >= 0.6
"""

# ── round-continuation batch: skew-safe agg, stats, reshaping, ──
# ── window dedup, regex, and SQL-front-door subqueries ──────────

# Salted two-stage aggregation is semantics-preserving ⇒ same oracle.
ORACLES["group_agg_salted"] = ORACLES["group_agg"]

ORACLES["stats_agg"] = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0 AS covar_qty_price
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows, sum(l_quantity) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLES["unpivot_metrics"] = """
SELECT p_partkey, 'p_retailprice' AS metric,
       CAST(p_retailprice AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
"""

# DuckDB regexp_replace replaces the FIRST match unless the 'g'
# option is passed; Spark's replaces all — 'g' aligns them.
ORACLES["regex_funcs"] = """
SELECT p_partkey,
       regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_consonants,
       regexp_matches(p_name, 'red') AS has_red
FROM part
"""

ORACLES["latest_per_key"] = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""

# §2.11 subqueries: these three strings are ALSO the Spark-side
# implementation — queries.py runs the identical text via spark.sql,
# so the front doors are verified to agree on correlated-subquery
# semantics, not just on hand-matched plans.
ORACLES["exists_subquery"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000.0)
"""

ORACLES["in_subquery"] = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_name LIKE 'NATION_1%')
"""

ORACLES["scalar_subquery"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (
  SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR(64)) AS DOUBLE) / count(*)
  FROM orders)
"""

# Argmax via exact pair encoding: cents*10^10 + orderkey, plain MAX,
# decode. Integer-exact in both engines; ties impossible (orderkey
# unique), unlike bare max_by/arg_max whose ties are engine-defined.
ORACLES["arg_max"] = """
SELECT o_custkey,
       m % 10000000000 AS best_orderkey,
       CAST(m // 10000000000 AS DOUBLE) / 100.0 AS best_price
FROM (
  SELECT o_custkey,
         max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             * 10000000000 + o_orderkey) AS m
  FROM orders GROUP BY o_custkey
)
"""

ORACLES["full_join"] = """
WITH c AS (
  SELECT c_nationkey, count(*) AS n_rich_cust
  FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey, count(*) AS n_rich_supp
  FROM supplier WHERE s_acctbal > 6000 GROUP BY s_nationkey
)
SELECT c_nationkey, n_rich_cust, s_nationkey, n_rich_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
"""

# ───────────── round-2 surface extensions (§2.12) ─────────────

ORACLES["q7_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= '1995-01-01' AND l_shipdate <= '1996-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""

ORACLES["q10_returned"] = """
SELECT c_custkey, c_name, n_name,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLES["q14_promo"] = """
SELECT CAST(100 AS DOUBLE)
       * CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(3,2))
                               - CAST(l_discount AS DECIMAL(4,2))) END) AS VARCHAR) AS DOUBLE)
       / CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2))
                     - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1995-09-01' AND l_shipdate < '1995-10-01'
"""

ORACLES["q18_large_orders"] = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

ORACLES["listagg"] = """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       count(DISTINCT c_mktsegment) AS n_segments
FROM customer GROUP BY c_nationkey
"""

ORACLES["gap_fill"] = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY user_id),
days AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
       coalesce(daily.cnt, 0) AS n_events
FROM days d LEFT JOIN daily ON d.user_id = daily.user_id AND d.day = daily.day
"""

ORACLES["median_agg"] = """
SELECT l_returnflag,
       median(l_quantity) AS med_qty,
       median(l_linenumber) AS med_line,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["null_safe_join"] = """
SELECT c_custkey, n_name
FROM customer JOIN nation
  ON nullif(c_nationkey, 0) IS NOT DISTINCT FROM nullif(n_nationkey, 0)
"""

ORACLES["win_first_last"] = """
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price,
       nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

# Packing/chunking share the whitespace tokenizer with token_counts.
ORACLES["seq_pack"] = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
       CAST((cum - n_tokens) % 512 AS BIGINT) AS pack_offset
FROM c
"""

ORACLES["doc_chunks"] = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
n AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens <= 32 THEN 1
              ELSE (n_tokens - 32 + 24 - 1) // 24 + 1 END AS n_chunks
  FROM t
)
SELECT doc_id, n_tokens,
       unnest(generate_series(0, n_chunks - 1)) AS chunk_id,
       unnest(generate_series(0, n_chunks - 1)) * 24 AS chunk_start,
       least(unnest(generate_series(0, n_chunks - 1)) * 24 + 32, n_tokens)
         AS chunk_end
FROM n
"""

# ───────────── round-3 surface extensions (§2.13) ─────────────
# The remaining TPC-H shapes adapted to this schema (no partsupp /
# l_shipmode / l_commitdate / c_phone), plus sessionization, PII
# scrubbing, histogram, and repetition-quality gates.

ORACLES["percentiles_approx"] = """
SELECT l_returnflag, count(*) AS n_rows,
       TRUE AS ok_p50, TRUE AS ok_p99
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["pq_encode"] = """
SELECT vec_id,
       CAST(8 AS BIGINT) AS n_codes,
       TRUE AS codes_in_range,
       TRUE AS err_match,
       TRUE AS err_le_code0
FROM embeddings
"""

ORACLES["winsorize_approx"] = """
SELECT l_returnflag, count(*) AS n_rows,
       CAST(1 AS BIGINT) AS ok_lo,
       CAST(1 AS BIGINT) AS ok_hi,
       CAST(1 AS BIGINT) AS ok_sum
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["q2_min_cost"] = """
WITH offers AS (
  SELECT p_partkey, p_name, l_suppkey,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size <= 10
),
best AS (
  SELECT p_partkey AS bk, min(unit_price) AS best_price
  FROM offers GROUP BY p_partkey
)
SELECT DISTINCT p_partkey, p_name, s_name, n_name, best_price
FROM offers
JOIN best ON p_partkey = bk AND unit_price = best_price
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""

ORACLES["q4_priority"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""

ORACLES["q6_forecast"] = """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["q8_market_share"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(3,2))
                             - CAST(l_discount AS DECIMAL(4,2))) END) AS VARCHAR) AS DOUBLE)
       / CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2))
                     - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= '1995-01-01' AND o_orderdate <= '1996-12-31'
GROUP BY year(o_orderdate)
"""

ORACLES["q9_profit"] = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""

ORACLES["q11_top_value"] = """
WITH base AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS val_dec
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 1
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM base
WHERE val_dec > (SELECT sum(val_dec) FROM base) * CAST('0.002' AS DECIMAL(6,3))
"""

ORACLES["q12_shipmode"] = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
GROUP BY l_returnflag
"""

ORACLES["q13_cust_orders"] = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '5-LOW') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""

ORACLES["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""

ORACLES["q17_small_qty"] = """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
  AND l_quantity < 0.5 * (
    SELECT sum(l2.l_quantity) / count(*)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""

ORACLES["q19_disc_revenue"] = """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""

ORACLES["q20_excess"] = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey = 2
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'LARGE')
      AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 60
  )
"""

ORACLES["q21_waiting"] = """
SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN orders ON l1.l_orderkey = o_orderkey
WHERE s_nationkey = 0 AND o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""

ORACLES["q22_idle"] = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND c_acctbal > (
    SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01')
GROUP BY c_nationkey
"""

ORACLES["sessionize"] = """
WITH marked AS (
  -- gap on FLOORED SECONDS, matching the Spark side's
  -- unix_timestamp arithmetic (a raw INTERVAL comparison diverges
  -- when a sub-second-fractional gap floors to exactly 1800 —
  -- surfaced at sf0.1)
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w))
                      >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS session_seq
FROM marked
"""

ORACLES["pii_scrub"] = """
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._]+@[A-Za-z0-9.]+'))
            + len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}')) AS BIGINT)
         AS n_pii,
       regexp_replace(
         regexp_replace(raw, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
         '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
FROM d
"""

ORACLES["histogram"] = """
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000 AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_spend
FROM orders
GROUP BY floor(o_totalprice / 50000.0)
"""

ORACLES["repetition_filter"] = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                            x -> x <> ''))) AS BIGINT)
           AS n_distinct
  FROM documents
)
SELECT doc_id, n_tokens, n_distinct,
       1.0::DOUBLE - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS dup_ratio,
       (1.0::DOUBLE - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         <= 0.8 AS keep
FROM t
"""

# ───────────── round-4 surface extensions (§2.14) ─────────────
# Transitive dedup closure, corpus hygiene (contamination / mixing),
# MERGE/SCD, rank-filter top-k, distributed exact ntile, HLL sketch
# certificate.

ORACLES["dedup_cc"] = """
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), sh AS (
  -- mirror ngram_jaccard_pairs_capped's max_df=1000 cap (ADVICE r4):
  -- Spark and oracle stay definitionally identical at every SF
  SELECT doc_id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges0 AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) >= 0.6
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM edges0
  UNION ALL
  SELECT doc_b, doc_a FROM edges0
), reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_rep
FROM reach GROUP BY node
"""

ORACLES["contamination"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
FROM sh c JOIN bench b USING (shingle)
WHERE c.doc_id % 97 <> 0
GROUP BY c.doc_id
"""

ORACLES["corpus_mix"] = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(text), 1, 8) <
      CASE lang WHEN 'en' THEN '20000000'
                WHEN 'zh' THEN '80000000'
                ELSE 'g' END
"""

ORACLES["merge_upsert"] = """
WITH upd AS (
  SELECT CASE WHEN o_custkey % 3 = 0 THEN o_custkey + 10000000
              ELSE o_custkey END AS c_custkey,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS c_acctbal
  FROM orders
  WHERE o_orderdate >= '1998-01-01'
  GROUP BY 1
)
SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
       COALESCE(b.c_name, 'new customer') AS c_name,
       COALESCE(b.c_nationkey, -1) AS c_nationkey,
       COALESCE(u.c_acctbal, b.c_acctbal) AS c_acctbal,
       COALESCE(b.c_mktsegment, 'UNKNOWN') AS c_mktsegment
FROM customer b
FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
"""

ORACLES["scd2_history"] = """
SELECT o_custkey, o_orderkey, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(COALESCE(lead(o_orderdate) OVER w,
                         TIMESTAMP '9999-12-31 00:00:00'),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

ORACLES["topk_per_group"] = """
WITH ranked AS (
  SELECT n_name, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, rnk, c_custkey, c_acctbal FROM ranked WHERE rnk <= 3
"""

ORACLES["ntile_bucket"] = """
WITH t AS (
  SELECT o_totalprice,
         ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM t GROUP BY bucket
"""

ORACLES["hll_distinct"] = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_cnt,
       TRUE AS ok
FROM lineitem GROUP BY l_returnflag
"""

# ── rows-only → hash-checked conversions (round 4) ──────────────
# lang_id's scoring is pure marker-set arithmetic and doc_fingerprint
# now hashes with an md5 hex prefix — both exactly replicable in SQL.

from mini_sql_engine_spark.functions.text import LANG_MARKERS  # noqa: E402

# argmax with the SAME total order as functions.text.lang_id:
# (score, rank, code) struct max, rank giving the alphabetically-first
# code the win on score ties. Struct comparison is field-order
# lexicographic in both engines.
_rank = {c: i for i, c in enumerate(sorted(LANG_MARKERS, reverse=True))}
_structs = ",\n    ".join(
    "struct_pack(score := len(list_filter(tk, t -> list_contains([{m}], t))), "
    "rank := {r}, code := '{c}')".format(
        m=", ".join(f"'{t}'" for t in LANG_MARKERS[c]), r=_rank[c], c=c
    )
    for c in sorted(LANG_MARKERS)
)
ORACLES["lang_id"] = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
)
SELECT doc_id, lang,
       list_aggregate([
    {_structs}
  ], 'max').code AS lang_pred
FROM t
"""
del _rank, _structs

ORACLES["doc_fingerprint"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh AS (
  SELECT doc_id, i - 1 AS pos,
         substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 16) AS h
  FROM toks, (SELECT unnest(generate_series(1, len(tk) - 2)) AS i)
  WHERE len(tk) >= 3
), framed AS (
  SELECT doc_id, pos, h,
         count(*) OVER (PARTITION BY doc_id) AS n,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min
  FROM sh
), mins AS (
  SELECT DISTINCT doc_id, win_min FROM framed
  WHERE pos <= n - 4 OR pos = 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
       min(win_min) AS min_fingerprint
FROM mins GROUP BY doc_id
"""

ORACLES["q16_supplier_cnt"] = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLES["right_join"] = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM (SELECT o_custkey, o_orderkey, o_totalprice FROM orders) o
RIGHT JOIN customer ON o_custkey = c_custkey
"""

ORACLES["table_checks"] = """
WITH dup AS (
  SELECT CAST(count(*) AS BIGINT) AS n_dup_orderkeys
  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
), orph AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orphan_orders
  FROM orders WHERE NOT EXISTS
    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
), nl AS (
  SELECT CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT)
    AS n_null_totalprice FROM orders
), rg AS (
  SELECT CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    AS n_nonpositive_totalprice FROM orders
)
SELECT n_dup_orderkeys, n_orphan_orders, n_null_totalprice,
       n_nonpositive_totalprice,
       n_dup_orderkeys = 0 AND n_orphan_orders = 0
         AND n_null_totalprice = 0 AND n_nonpositive_totalprice = 0
         AS all_passed
FROM dup, orph, nl, rg
"""

ORACLES["retention_cohorts"] = """
WITH acts AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM acts GROUP BY user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       strftime(week, '%Y-%m-%d') AS active_week,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM acts JOIN cohorts USING (user_id)
GROUP BY 1, 2
"""

ORACLES["funnel"] = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
       (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked_after_view,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased_after_click
"""

ORACLES["mode_agg"] = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY n DESC, o_orderpriority) AS rnk
  FROM counts
)
SELECT o_orderstatus, o_orderpriority AS mode_priority,
       n AS n_occurrences
FROM ranked WHERE rnk = 1
"""

ORACLES["sample_k"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
LIMIT 100
"""

ORACLES["cdc_apply"] = """
WITH chg AS (
  SELECT CASE WHEN o_custkey % 5 = 0 THEN o_custkey
              WHEN o_custkey % 3 = 0 THEN o_custkey + 10000000
              ELSE o_custkey END AS c_custkey,
         CASE WHEN o_custkey % 5 = 0 THEN 'D'
              WHEN o_custkey % 3 = 0 THEN 'I' ELSE 'U' END AS op,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS c_acctbal
  FROM orders WHERE o_orderdate >= '1998-01-01'
  GROUP BY 1, 2
), ups AS (
  SELECT c_custkey, c_acctbal FROM chg WHERE op <> 'D'
), surv AS (
  SELECT * FROM customer
  WHERE c_custkey NOT IN (SELECT c_custkey FROM chg WHERE op = 'D')
)
SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
       COALESCE(b.c_name, 'new customer') AS c_name,
       COALESCE(b.c_nationkey, -1) AS c_nationkey,
       COALESCE(u.c_acctbal, b.c_acctbal) AS c_acctbal,
       COALESCE(b.c_mktsegment, 'UNKNOWN') AS c_mktsegment
FROM surv b
FULL OUTER JOIN ups u ON b.c_custkey = u.c_custkey
"""

# The oracle recomputes from scratch — the WHOLE POINT of the Qkey is
# that Spark's state ⊕ delta merge must equal this exactly (count and
# decimal-sum are algebraic/mergeable).
ORACLES["incremental_agg"] = """
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_spend
FROM orders GROUP BY o_custkey
"""

ORACLES["rollup_gid"] = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_returnflag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_linestatus
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLES["locf_fill"] = """
WITH r AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type <> 'error' THEN value END AS reading
  FROM events
)
SELECT event_id, user_id, reading,
       last_value(reading IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS reading_filled
FROM r
"""

ORACLES["win_count_distinct"] = """
WITH d AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         dense_rank() OVER (PARTITION BY l_returnflag
                            ORDER BY l_partkey) AS dr
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(max(dr) OVER (PARTITION BY l_returnflag) AS BIGINT)
         AS n_distinct_parts
FROM d
"""

ORACLES["win_time_range"] = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE)
         AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""

# ─────────────── §2.15 round-5 additions ───────────────

ORACLES["bitwise_funcs"] = """
SELECT o_orderkey,
       o_orderkey & 1023 AS key_and,
       o_orderkey | 16 AS key_or,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 2 AS key_shl,
       o_orderkey >> 3 AS key_shr,
       CAST(bit_count(o_orderkey) AS BIGINT) AS key_bits
FROM orders
"""

ORACLES["filtered_agg"] = """
SELECT l_returnflag, l_linestatus,
       CAST(count_if(l_quantity > 30) AS BIGINT) AS n_bulk,
       CAST(CAST(sum(CASE WHEN l_discount < 0.05
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS qty_low_disc,
       CAST(bool_and(l_tax >= 0) AS BIGINT) AS all_taxed,
       CAST(bool_or(l_discount > 0.09) AS BIGINT) AS any_deep_disc
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

ORACLES["regr_agg"] = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0 AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) + 0.0 AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["levenshtein_pairs"] = """
SELECT a.doc_id AS id1, b.doc_id AS id2,
       CAST(levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60))
            AS BIGINT) AS edit_dist
FROM documents a, documents b
WHERE a.doc_id < 30 AND b.doc_id < 30 AND a.doc_id < b.doc_id
"""

# same raw-URL synthesis + same normalization chain as the Spark side;
# DuckDB regexp_replace needs the explicit 'g' flag to mirror Spark's
# replace-all default
ORACLES["url_normalize"] = """
WITH raw AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
         || '.Example.COM/docs/' || CAST(doc_id % 40 AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 3 = 0
                  THEN '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)
                  WHEN doc_id % 5 = 0 THEN '?utm_campaign=x'
                  ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0
                  THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
                  ELSE '' END) AS u
  FROM documents
), steps AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(u, '#.*', '', 'g'),
               'utm_[a-z]+=[^&]*&', '', 'g'),
             '[?&]utm_[a-z]+=[^&]*', '', 'g'),
           '[?&]$', '', 'g') AS u
  FROM raw
), canon AS (
  SELECT doc_id,
         regexp_replace(
           lower(regexp_extract(u, '^[A-Za-z]+://[^/?#]+'))
           || regexp_replace(u, '^[A-Za-z]+://[^/?#]+', '', 'g'),
           '/$', '', 'g') AS url
  FROM steps
)
SELECT url, CAST(count(*) AS BIGINT) AS n_variants,
       min(doc_id) AS first_doc
FROM canon GROUP BY url
"""

ORACLES["ngram_top"] = """
WITH toks AS (
  SELECT string_split(text, ' ') AS l FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS bigram
  FROM toks
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 20
"""

ORACLES["posexplode_split"] = """
SELECT doc_id,
       unnest(range(0, len(string_split(text, ' ')))) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents WHERE doc_id < 50
"""

ORACLES["weighted_avg"] = """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
       / CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         AS w_avg_price,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["entropy_agg"] = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0 AS entropy,
       CAST(sum(c) AS BIGINT) AS n_events
FROM c GROUP BY user_id
"""

# coalesce: DuckDB's array_to_string([]) is NULL; Spark's
# array_join(array()) is '' — '' is the semantic we want
ORACLES["array_set_funcs"] = """
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_distinct(list_intersect(
         string_split(text, ' '), ['the', 'a', 'data', 'row']))), ','), '')
         AS stop_hits,
       coalesce(array_to_string(list_sort(list_distinct(list_filter(
         string_split(text, ' '),
         t -> NOT list_contains(['the', 'a', 'data', 'row'], t)))), ','), '')
         AS content_toks,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         AS n_unique
FROM documents
"""

ORACLES["ohlc_bars"] = """
WITH b AS (
  SELECT user_id,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, hour,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       max(value) AS high, min(value) AS low,
       CAST(count(*) AS BIGINT) AS n_events
FROM b GROUP BY user_id, hour
"""

ORACLES["rolling_wau"] = """
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), mx AS (
  SELECT max(day) AS max_day FROM ud
), ex AS (
  SELECT day + CAST(t.i AS INTEGER) AS d, user_id
  FROM ud, unnest(range(0, 7)) AS t(i)
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM ex, mx WHERE d <= mx.max_day GROUP BY d
"""

# same pair graph + recursive closure as dedup_cc, then keep-best
ORACLES["cluster_canonical"] = """
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), sh AS (
  -- mirror ngram_jaccard_pairs_capped's max_df=1000 cap (ADVICE r4):
  -- Spark and oracle stay definitionally identical at every SF
  SELECT doc_id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges0 AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) >= 0.6
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM edges0
  UNION ALL
  SELECT doc_b, doc_a FROM edges0
), reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
), reps AS (
  SELECT node AS doc_id, min(lab) AS cluster_rep FROM reach GROUP BY node
), lab AS (
  SELECT d.doc_id, coalesce(r.cluster_rep, d.doc_id) AS cluster, d.n_chars
  FROM documents d LEFT JOIN reps r USING (doc_id)
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY cluster
                               ORDER BY n_chars DESC, doc_id) AS rnk
  FROM lab
)
SELECT cluster,
       max(CASE WHEN rnk = 1 THEN doc_id END) AS canonical_doc,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(n_chars) AS max_chars
FROM rk GROUP BY cluster
"""

ORACLES["percentile_disc"] = """
WITH d AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey,
                                     l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       max(CASE WHEN rn = (n + 1) // 2 THEN l_extendedprice END) AS p50_disc,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN l_extendedprice END)
         AS p90_disc,
       CAST(count(*) AS BIGINT) AS n_rows
FROM d GROUP BY l_returnflag
"""

ORACLES["kv_parse"] = """
WITH kv AS (
  SELECT o_orderkey,
         'status=' || o_orderstatus
         || '&prio=' || replace(o_orderpriority, ' ', '+')
         || '&bucket=' || CAST(o_orderkey % 16 AS VARCHAR) AS s
  FROM orders
)
SELECT o_orderkey,
       regexp_extract(s, 'status=([^&]*)', 1) AS status,
       regexp_extract(s, 'prio=([^&]*)', 1) AS prio,
       CAST(regexp_extract(s, 'bucket=([^&]*)', 1) AS BIGINT) AS bucket
FROM kv
"""

ORACLES["union_by_name"] = """
(SELECT o_orderkey, o_totalprice, o_orderstatus
 FROM orders WHERE o_orderstatus = 'O')
UNION ALL BY NAME
(SELECT o_orderkey, o_orderpriority, o_orderstatus
 FROM orders WHERE o_orderstatus = 'F')
"""

# ─────────────── §2.16 round-6 additions ───────────────

# Portable MinHash: identical md5-prefix hash family both engines;
# lexicographic min on fixed-width lowercase hex == numeric min.
ORACLES["minhash_sig"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 2)) AS i
        FROM toks WHERE len(w) >= 3)
), seeds AS (SELECT unnest(generate_series(0, 7)) AS seed)
SELECT doc_id,
       CAST(seed AS BIGINT) AS seed,
       min(substr(md5(CAST(seed AS VARCHAR) || ':' || shingle), 1, 16))
         AS minhash
FROM sh, seeds
GROUP BY doc_id, seed
"""

ORACLES["lsh_candidates"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 2)) AS i
        FROM toks WHERE len(w) >= 3)
), seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
sig AS (
  SELECT doc_id, seed,
         min(substr(md5(CAST(seed AS VARCHAR) || ':' || shingle), 1, 16))
           AS minhash
  FROM sh, seeds
  GROUP BY doc_id, seed
), banded AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sig
  GROUP BY doc_id, seed // 2
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_bands
FROM banded a
JOIN banded b
  ON a.band = b.band AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
"""

ORACLES["embed_centroid"] = """
SELECT label, CAST(i - 1 AS BIGINT) AS dim,
       round(CAST(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE)
                           AS DECIMAL(27,10))) AS VARCHAR) AS DOUBLE)
             / count(*), 4) + 0.0 AS centroid
FROM (SELECT label, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings)
GROUP BY label, dim
"""

ORACLES["embed_cosine_adj"] = """
WITH p AS (
  SELECT a.vec_id, a.embedding AS ea, b.embedding AS eb
  FROM embeddings a
  JOIN embeddings b ON b.vec_id = a.vec_id + 1
), terms AS (
  SELECT vec_id,
         CAST(ea[i] AS DOUBLE) AS x, CAST(eb[i] AS DOUBLE) AS y
  FROM (SELECT vec_id, ea, eb,
               unnest(generate_series(1, len(ea))) AS i
        FROM p)
)
SELECT vec_id,
       round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
       + 0.0 AS cos_next
FROM terms
GROUP BY vec_id
"""

ORACLES["dup_ngram_frac"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
), pairs AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
           || ' ' || w[i+4] AS shingle
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 4)) AS i
        FROM toks WHERE len(w) >= 5)
), dfreq AS (
  SELECT shingle, count(*) AS df FROM pairs GROUP BY shingle
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       round(CAST(CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS VARCHAR) AS DOUBLE)
             / count(*), 4) AS dup_frac
FROM pairs p JOIN dfreq d ON p.shingle = d.shingle
GROUP BY p.doc_id
"""

ORACLES["incremental_dedup"] = """
WITH batch AS (
  SELECT doc_id, lang, md5(text) AS h
  FROM documents WHERE doc_id % 5 = 0
), corpus AS (
  SELECT DISTINCT md5(text) AS h
  FROM documents WHERE doc_id % 5 <> 0
), first_in_batch AS (
  SELECT doc_id, lang, h,
         row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM batch
)
SELECT doc_id, lang
FROM first_in_batch
WHERE rn = 1 AND h NOT IN (SELECT h FROM corpus)
"""

# Front-door SQL (identical text on Spark): NOT IN three-valued logic.
ORACLES["not_in_nulls"] = """
SELECT
  CAST((SELECT count(*) FROM orders
        WHERE o_custkey NOT IN
          (SELECT nullif(c_custkey, 7) FROM customer)) AS BIGINT)
    AS cnt_with_null,
  CAST((SELECT count(*) FROM orders
        WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer WHERE c_custkey <> 7)) AS BIGINT)
    AS cnt_clean,
  CAST((SELECT count(*) FROM orders
        WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer
           WHERE c_mktsegment = 'BUILDING')) AS BIGINT)
    AS cnt_not_building
"""

ORACLES["order_gaps"] = """
WITH seq AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         lag(CAST(o_orderdate AS DATE)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_d
  FROM orders
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(max(date_diff('day', prev_d, d)) AS BIGINT) AS max_gap_days,
       round(avg(CAST(date_diff('day', prev_d, d) AS DOUBLE)), 2)
         AS avg_gap_days
FROM seq
WHERE prev_d IS NOT NULL
GROUP BY o_custkey
"""

ORACLES["share_of_total"] = """
WITH rev AS (
  SELECT n_name, r_name AS region_name,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY n_name, r_name
)
SELECT n_name, region_name, revenue,
       round(revenue / sum(revenue) OVER (), 6) AS share_total,
       round(revenue / sum(revenue) OVER (PARTITION BY region_name), 6)
         AS share_region
FROM rev
"""

ORACLES["ts_funcs"] = """
SELECT event_id,
       CAST(hour(ts) AS BIGINT) AS h,
       CAST(minute(ts) AS BIGINT) AS m,
       CAST(date_part('second', ts) AS BIGINT) AS s,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ts_hour,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
       CAST(weekofyear(ts) AS BIGINT) AS iso_week,
       CAST(isodow(ts) AS BIGINT) AS iso_dow
FROM events
"""

ORACLES["str_funcs2"] = """
SELECT p_partkey,
       lpad(p_brand, 12, '*') AS brand_lpad,
       rpad(p_type, 10, '.') AS type_rpad,
       reverse(p_name) AS name_rev,
       repeat(p_brand, 2) AS brand_twice,
       translate(p_type, 'AEIOU', 'aeiou') AS type_folded,
       CAST(strpos(p_name, 'red') AS BIGINT) AS red_pos,
       CAST(ascii(substr(p_name, 1, 1)) AS BIGINT) AS first_ascii,
       split_part(p_name, ' ', 2) AS name_word2
FROM part
"""

# ─────────────── §2.17 round-7 additions ───────────────

ORACLES["group_split"] = """
WITH s AS (
  SELECT CASE WHEN substr(md5(source), 1, 8) < 'cc000000' THEN 'train'
              WHEN substr(md5(source), 1, 8) < 'e6000000' THEN 'val'
              ELSE 'test' END AS split,
         lang, source, n_chars
  FROM documents
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM s GROUP BY split, lang
"""

ORACLES["label_balance"] = """
WITH m AS (
  SELECT min(n) AS m FROM (
    SELECT count(*) AS n FROM documents GROUP BY lang)
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang FROM r WHERE rn <= (SELECT m FROM m)
"""

ORACLES["zscore_outliers"] = """
WITH st AS (
  SELECT l_returnflag,
         CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT l_returnflag,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS x
        FROM lineitem)
  GROUP BY l_returnflag
)
SELECT l_orderkey, l_linenumber, l.l_returnflag,
       round((CAST(l_extendedprice AS DOUBLE) - s1 / n)
             / sqrt((s2 - s1 * s1 / n) / (n - 1.0)), 4) + 0.0 AS z
FROM lineitem l JOIN st ON l.l_returnflag = st.l_returnflag
WHERE abs(round((CAST(l_extendedprice AS DOUBLE) - s1 / n)
                / sqrt((s2 - s1 * s1 / n) / (n - 1.0)), 4)) > 1.6
"""

ORACLES["winsorize"] = """
WITH lim AS (
  SELECT l_returnflag,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.01) AS lo,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       min(lo) AS lo,
       min(hi) AS hi,
       CAST(count(*) FILTER (CAST(l_extendedprice AS DOUBLE) < lo)
            AS BIGINT) AS n_lo,
       CAST(count(*) FILTER (CAST(l_extendedprice AS DOUBLE) > hi)
            AS BIGINT) AS n_hi,
       CAST(CAST(sum(CASE WHEN CAST(l_extendedprice AS DOUBLE) >= lo
                      AND CAST(l_extendedprice AS DOUBLE) <= hi
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
       + CAST(count(*) FILTER (CAST(l_extendedprice AS DOUBLE) < lo)
              AS DOUBLE) * min(lo)
       + CAST(count(*) FILTER (CAST(l_extendedprice AS DOUBLE) > hi)
              AS DOUBLE) * min(hi) AS winsorized_sum
FROM lineitem l JOIN lim ON l.l_returnflag = lim.l_returnflag
GROUP BY l.l_returnflag
"""

ORACLES["corr_matrix"] = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 5) + 0.0 AS corr_qty_price,
       round(corr(l_quantity, l_discount), 5) + 0.0 AS corr_qty_disc,
       round(corr(l_extendedprice, l_tax), 5) + 0.0 AS corr_price_tax,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["moments_agg"] = """
WITH a AS (
  SELECT l_returnflag,
         CAST(CAST(sum(q) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(sum(q * q) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(sum(q * q * q) AS VARCHAR) AS DOUBLE) AS s3,
         CAST(CAST(sum(q * q * q * q) AS VARCHAR) AS DOUBLE) AS s4,
         CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
  GROUP BY l_returnflag
), mm AS (
  SELECT l_returnflag, n,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n)
           + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4.0 * (s1 / n) * (s3 / n)
           + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM a
)
SELECT l_returnflag,
       round(m3 / (m2 * sqrt(m2)), 6) + 0.0 AS skewness,
       round(m4 / (m2 * m2) - 3.0, 6) + 0.0 AS kurtosis,
       CAST(n AS BIGINT) AS n
FROM mm
"""

ORACLES["explode_outer_toks"] = """
WITH t AS (
  SELECT p_partkey,
         list_filter(string_split(p_name, ' '),
                     x -> length(x) > 6) AS l
  FROM part
)
SELECT p_partkey,
       unnest(CASE WHEN len(l) = 0 THEN [NULL]::VARCHAR[] ELSE l END)
         AS token
FROM t
"""

ORACLES["kl_divergence"] = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), src AS (
  SELECT source, w, count(*) AS c_sw FROM tok GROUP BY source, w
), st AS (
  SELECT source, w, c_sw,
         CAST(CAST(sum(c_sw) OVER (PARTITION BY source) AS VARCHAR) AS DOUBLE) AS t_s
  FROM src
), corp AS (
  SELECT w, count(*) AS c_w FROM tok GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS t_c FROM tok
)
SELECT source,
       round(sum((c_sw / t_s) * ln((c_sw / t_s) / (c_w / t_c))), 6)
       + 0.0 AS kl,
       CAST(max(t_s) AS BIGINT) AS n_tokens
FROM st JOIN corp USING (w) CROSS JOIN tot
GROUP BY source
"""

ORACLES["anomaly_mad"] = """
WITH med AS (
  SELECT l_returnflag,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
), mad AS (
  SELECT l.l_returnflag, min(med) AS med,
         quantile_cont(abs(CAST(l_extendedprice AS DOUBLE) - med), 0.5)
           AS mad
  FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
  GROUP BY l.l_returnflag
)
SELECT l.l_returnflag,
       min(m.med) AS med,
       min(m.mad) AS mad,
       CAST(count(*) FILTER (abs(CAST(l_extendedprice AS DOUBLE) - m.med)
                             > 3.0 * 1.4826 * m.mad) AS BIGINT)
         AS n_outliers,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem l JOIN mad m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag
"""

ORACLES["boilerplate_strip"] = """
WITH seg_rows AS (
  SELECT doc_id,
         CAST(gs.i AS BIGINT) AS seg_pos,
         array_to_string(toks[i * 2 + 1 : i * 2 + 2], ' ') AS seg
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(0, (len(toks) - 1) // 2 + 1)) AS i) gs
), df AS (
  SELECT seg, count(DISTINCT doc_id) AS df FROM seg_rows GROUP BY seg
), nd AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN df <= 0.02 * nd THEN seg END,
                           ' ' ORDER BY seg_pos), '') AS clean_text,
       CAST(count(*) FILTER (df <= 0.02 * nd) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (df > 0.02 * nd) AS BIGINT) AS n_dropped
FROM seg_rows JOIN df USING (seg) CROSS JOIN nd
GROUP BY doc_id
"""

ORACLES["rolling_median"] = """
WITH b AS (
  SELECT o_orderkey, o_custkey,
         list_sort(list(CAST(o_totalprice AS DOUBLE))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS l
  FROM orders
)
SELECT o_orderkey, o_custkey,
       CASE WHEN len(l) % 2 = 1 THEN l[(len(l) + 1) // 2]
            ELSE (l[len(l) // 2] + l[len(l) // 2 + 1]) / 2.0 END
         AS rolling_med,
       CAST(len(l) AS BIGINT) AS frame_n
FROM b
"""

ORACLES["lm_score"] = """
WITH bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(1, greatest(len(toks), 1))) AS i) gs
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
)
SELECT doc_id,
       round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6)
       + 0.0 AS avg_logprob,
       CAST(count(*) AS BIGINT) AS n_bigrams
FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY doc_id
"""

# ─────────────── §2.18 round-8 additions ───────────────

# The kNN witness cap lives in ONE place (queries.py) and is
# interpolated here so the two engines cannot desynchronize
# (ADVICE r8: a hardcoded LIMIT 128 would silently diverge if
# KNN_QUERY_CAP ever changed).  Safe import: queries.py only pulls
# ORACLES inside a function body, so there is no import cycle.
from mini_sql_engine_spark.queries import KNN_QUERY_CAP  # noqa: E402

ORACLES["knn_label"] = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
  WHERE vec_id % 10 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {KNN_QUERY_CAP}
), c AS (
  SELECT vec_id AS c_id, embedding AS cv, label FROM embeddings
  WHERE vec_id % 10 <> 0
), terms AS (
  SELECT q_id, c_id, label,
         CAST(qv[i] AS DOUBLE) AS x, CAST(cv[i] AS DOUBLE) AS y
  FROM (SELECT q_id, c_id, label, qv, cv,
               unnest(generate_series(1, len(qv))) AS i
        FROM c CROSS JOIN q)
), sims AS (
  SELECT q_id, c_id, label,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
           AS sim
  FROM terms GROUP BY q_id, c_id, label
), top AS (
  SELECT q_id, label,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, c_id) AS rn
  FROM sims
), votes AS (
  SELECT q_id, label, count(*) AS votes FROM top
  WHERE rn <= 3 GROUP BY q_id, label
)
SELECT q_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
FROM (SELECT q_id, label, votes,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY votes DESC, label) AS r
      FROM votes)
WHERE r = 1
"""

ORACLES["nearest_centroid"] = """
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
  WHERE vec_id < 8
), pts AS (
  SELECT vec_id, embedding AS pv FROM embeddings WHERE vec_id >= 8
), terms AS (
  SELECT vec_id, cent_id,
         CAST(pv[i] AS DOUBLE) AS x, CAST(cv[i] AS DOUBLE) AS y
  FROM (SELECT vec_id, cent_id, pv, cv,
               unnest(generate_series(1, len(pv))) AS i
        FROM pts CROSS JOIN cent)
), sims AS (
  SELECT vec_id, cent_id,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
           AS sim
  FROM terms GROUP BY vec_id, cent_id
), best AS (
  SELECT vec_id, cent_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cent_id) AS r
  FROM sims
)
SELECT CAST(cent_id AS BIGINT) AS cent_id,
       CAST(count(*) AS BIGINT) AS n_assigned,
       round(avg(sim), 4) AS avg_sim
FROM best WHERE r = 1 GROUP BY cent_id
"""

ORACLES["bm25_score"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         avg(CAST(dl AS DOUBLE)) AS avgdl
  FROM dl
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM toks
  WHERE w IN ('table', 'data', 'row') GROUP BY doc_id, w
), df AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w
)
SELECT doc_id,
       round(sum(
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         * CAST(tf AS DOUBLE) * (1.2 + 1.0)
         / (CAST(tf AS DOUBLE)
            + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
       ), 6) AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN corpus
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 50
"""

ORACLES["inverted_index"] = """
WITH tf AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY term, doc_id
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       array_to_string((list_sort(list(doc_id)))[1:5], ',') AS postings_head
FROM tf GROUP BY term
"""

ORACLES["inline_values"] = """
SELECT user_id,
       CAST(CAST(sum(w) AS VARCHAR(64)) AS DOUBLE) AS engagement,
       CAST(count(*) AS BIGINT) AS n_weighted
FROM events
JOIN (VALUES ('view', CAST(1.0 AS DECIMAL(4,1))),
             ('click', CAST(2.0 AS DECIMAL(4,1))),
             ('signup', CAST(5.0 AS DECIMAL(4,1))),
             ('purchase', CAST(10.0 AS DECIMAL(4,1)))
     ) AS wt(t, w)
  ON event_type = t
GROUP BY user_id
"""

ORACLES["safe_cast"] = """
WITH r AS (
  SELECT lang,
         CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id * 7 AS VARCHAR)
              ELSE 'x' || CAST(doc_id AS VARCHAR) END AS raw
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(try_cast(raw AS BIGINT)) AS BIGINT) AS n_parsed,
       CAST(sum(try_cast(raw AS BIGINT)) AS BIGINT) AS sum_parsed
FROM r GROUP BY lang
"""

ORACLES["interval_arith"] = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH,
                '%Y-%m-%d') AS plus_3m,
       strftime(CAST(o_orderdate AS DATE) - INTERVAL 10 DAY,
                '%Y-%m-%d') AS minus_10d,
       strftime(last_day(CAST(o_orderdate AS DATE)),
                '%Y-%m-%d') AS month_end,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      DATE '1998-12-31') AS BIGINT) AS days_to_98end
FROM orders
"""

ORACLES["attribution"] = """
WITH w AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS attributed_click,
         last_value(CASE WHEN event_type = 'click' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cts
  FROM events
)
SELECT event_id, user_id, attributed_click,
       CAST(floor(epoch(ts)) - floor(epoch(cts)) AS BIGINT) AS gap_sec
FROM w WHERE event_type = 'purchase'
"""

ORACLES["compact_runs"] = """
WITH r AS (
  SELECT event_id, user_id, round(value, 0) AS v,
         lag(round(value, 0))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_id, user_id, v
FROM r WHERE prev IS NULL OR v <> prev
"""

# ── round-9 batch: sketches, set-similarity joins, time-weighted ─
# ── and co-occurrence statistics, occupancy sweep, null surface ──

# Bitmap distinct is EXACT, so the oracle is plain COUNT(DISTINCT).
ORACLES["bitmap_distinct"] = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""

# Certificate contract: exact weekly count + TRUE (the Spark side
# carries the HLL-union estimate and asserts it lands within 5%).
ORACLES["sketch_rollup"] = """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS ok
FROM events GROUP BY 1
"""

# Prefix filtering is exact (zero false negatives by the SSJoin
# prefix theorem), so the oracle IS the naive all-pairs join.
ORACLES["setsim_join"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 2),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' ||
                                    tk[i+2] || ' ' || tk[i+3]))
           AS shingle
  FROM toks WHERE len(tk) >= 4
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
         AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) >= 0.5
"""

ORACLES["containment_dup"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 2),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' ||
                                    tk[i+2] || ' ' || tk[i+3]))
           AS shingle
  FROM toks WHERE len(tk) >= 4
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), dirs AS (
  SELECT doc_a AS doc_id, doc_b AS container_id,
         round(CAST(n_common AS DOUBLE) / sa.n, 6) AS containment
  FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS container_id,
         round(CAST(n_common AS DOUBLE) / sb.n, 6) AS containment
  FROM pairs JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT * FROM dirs WHERE containment >= 0.6
"""

ORACLES["event_transitions"] = """
WITH p AS (
  SELECT lag(event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
), c AS (
  SELECT src, dst, count(*) AS n FROM p WHERE src IS NOT NULL
  GROUP BY 1, 2
)
SELECT src, dst, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
         / CAST(CAST(sum(n) OVER (PARTITION BY src) AS VARCHAR) AS DOUBLE) AS p
FROM c
"""

ORACLES["twap_agg"] = """
WITH g AS (
  SELECT user_id, value,
         CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)))
              - floor(epoch(ts)) AS BIGINT) AS dt
  FROM events
)
SELECT user_id,
       CAST(sum(dt) AS BIGINT) AS active_sec,
       CAST(CAST(sum(CAST(CAST(value AS DECIMAL(18,6))
                     * CAST(dt AS DECIMAL(18,0)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE) AS twap
FROM g WHERE dt IS NOT NULL
GROUP BY user_id
"""

ORACLES["max_concurrency"] = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS s
  FROM marked
), sess AS (
  SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
  FROM sid GROUP BY user_id, s
), clipped AS (
  SELECT user_id, unnest(generate_series(CAST(s_start AS DATE),
                                         CAST(s_end AS DATE),
                                         INTERVAL 1 DAY)) AS day,
         s_start, s_end
  FROM sess
), spans AS (
  SELECT user_id, CAST(day AS DATE) AS day,
         greatest(CAST(floor(epoch(s_start)) AS BIGINT),
                  CAST(floor(epoch(CAST(day AS TIMESTAMP))) AS BIGINT))
           AS cs,
         least(CAST(floor(epoch(s_end)) AS BIGINT),
               CAST(floor(epoch(CAST(day AS TIMESTAMP)
                                + INTERVAL 1 DAY)) AS BIGINT) - 1)
           AS ce
  FROM clipped
), deltas AS (
  SELECT day, cs AS t, 1 AS d, user_id FROM spans
  UNION ALL
  SELECT day, ce + 1 AS t, -1 AS d, user_id FROM spans
), running AS (
  SELECT day,
         sum(d) OVER (PARTITION BY day ORDER BY t, d DESC, user_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cur
  FROM deltas
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(max(cur) AS BIGINT) AS max_concurrent
FROM running GROUP BY day
"""

ORACLES["dict_encode"] = """
WITH dom AS (
  SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand
), codes AS (
  SELECT p_brand,
         CAST(row_number() OVER (ORDER BY n DESC, p_brand) - 1 AS BIGINT)
           AS brand_code
  FROM dom
)
SELECT p_partkey, p.p_brand, brand_code
FROM part p JOIN codes USING (p_brand)
"""

ORACLES["null_funcs"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(nullif(o_orderstatus, 'O')) AS BIGINT) AS n_closed,
       CAST(count(big) AS BIGINT) AS n_big,
       CAST(CAST(sum(CAST(big AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         / count(big) AS avg_big,
       min(big) AS min_big,
       CAST(CAST(sum(coalesce(CAST(big AS DECIMAL(18,2)),
                         CAST(0 AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE)
         AS total_big
FROM (
  SELECT o_orderpriority, o_orderstatus,
         CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big
  FROM orders
)
GROUP BY o_orderpriority
"""

ORACLES["pmi_pairs"] = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), nu AS (
  SELECT count(DISTINCT user_id) AS n FROM ut
), marg AS (
  SELECT event_type, count(*) AS c FROM ut GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT t1, t2, CAST(n_both AS BIGINT) AS n_both,
       round(ln(CAST(n_both AS DOUBLE) * CAST(nu.n AS DOUBLE)
                / (CAST(ma.c AS DOUBLE) * CAST(mb.c AS DOUBLE))), 6)
       + 0.0 AS pmi
FROM pairs, nu
JOIN marg ma ON ma.event_type = t1
JOIN marg mb ON mb.event_type = t2
"""

# ── round-10 batch: graph triangles, nearest join, map surface, ──
# ── multi-agg pivot, interval union ─────────────────────────────

# Same synthesized deterministic edge set as pagerank_iter.
ORACLES["triangle_count"] = """
WITH n AS (
  SELECT count(*) AS n_docs FROM documents
), directed AS (
  SELECT doc_id AS src, (doc_id + 1) % n.n_docs AS dst
  FROM documents, n
  UNION ALL
  SELECT doc_id AS src, (doc_id + 2) % n.n_docs AS dst
  FROM documents, n
  UNION ALL
  SELECT doc_id AS src, (doc_id * 7 + 1) % n.n_docs AS dst
  FROM documents, n
), edges AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM directed WHERE src <> dst
), tris AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u AND e1.u < e2.v
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.u = e1.u AND e3.v = e2.v)
), corners AS (
  SELECT a AS doc_id FROM tris
  UNION ALL SELECT b FROM tris
  UNION ALL SELECT c FROM tris
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY doc_id
"""

ORACLES["nearest_join"] = """
WITH w AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pid,
         last_value(CASE WHEN event_type = 'click'
                         THEN CAST(floor(epoch(ts)) AS BIGINT) END
                    IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pts,
         first_value(CASE WHEN event_type = 'click' THEN event_id END
                     IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nid,
         first_value(CASE WHEN event_type = 'click'
                          THEN CAST(floor(epoch(ts)) AS BIGINT) END
                     IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nts
  FROM events
)
SELECT event_id, user_id,
       CASE WHEN pts IS NULL AND nts IS NULL THEN NULL
            WHEN pts IS NULL THEN nid
            WHEN nts IS NULL OR t - pts <= nts - t THEN pid
            ELSE nid END AS nearest_click,
       CAST(CASE WHEN pts IS NULL AND nts IS NULL THEN NULL
                 WHEN pts IS NULL THEN nts - t
                 WHEN nts IS NULL OR t - pts <= nts - t THEN t - pts
                 ELSE nts - t END AS BIGINT) AS gap_sec
FROM w WHERE event_type = 'purchase'
"""

# The map stays Spark-internal; the oracle reproduces the scalar
# lookups with conditional aggregates and a sorted key list.
ORACLES["map_funcs"] = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN n END), 0)
            AS BIGINT) AS n_clicks,
       CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN n END), 0)
            AS BIGINT) AS n_errors,
       string_agg(event_type, ',' ORDER BY event_type) AS types_csv
FROM c GROUP BY user_id
"""

ORACLES["pivot_multi"] = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
         AS o_cnt,
       CAST(CAST(sum(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS o_total,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS f_cnt,
       CAST(CAST(sum(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS f_total,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
         AS p_cnt,
       CAST(CAST(sum(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS p_total
FROM orders GROUP BY o_orderpriority
"""

ORACLES["interval_union"] = """
WITH spans AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
  FROM events
), flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN max(e) OVER
                (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              IS NULL
              OR s > max(e) OVER
                (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_isl
  FROM spans
), islands AS (
  SELECT user_id, s, e,
         sum(new_isl) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl
  FROM flagged
), merged AS (
  SELECT user_id, isl, min(s) AS ms, max(e) AS me
  FROM islands GROUP BY user_id, isl
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(me - ms) AS BIGINT) AS covered_sec
FROM merged GROUP BY user_id
"""

# ── round-11 batch: lateral / decorrelation stress / GROUP BY ALL ─
# ── front-door SQL (identical text both engines) + samplers ──────

ORACLES["lateral_topn"] = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) t
"""

ORACLES["exists_ineq"] = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_quantity > 45
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
"""

ORACLES["group_by_all"] = """
SELECT year(o_orderdate) AS yr, o_orderstatus,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR(64)) AS DOUBLE)
         AS total,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY ALL
"""

# Exact-integer systematic weighted sampling: same hash order, same
# running total, same stride crossings — no RNG, no libm.
ORACLES["weighted_sample"] = """
WITH h AS (
  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
), cum AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY hx, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS c
  FROM h
), tot AS (
  SELECT sum(n_chars) AS w FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       CAST(c // (tot.w // 20) AS BIGINT) AS bucket
FROM cum, tot
WHERE (c - n_chars) // (tot.w // 20) <> c // (tot.w // 20)
"""

ORACLES["time_split_leakage"] = """
WITH per_user AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END)
           AS tr,
         sum(CASE WHEN ts >= TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END)
           AS ev
  FROM events GROUP BY user_id
)
SELECT CAST(sum(tr) AS BIGINT) AS n_train_events,
       CAST(sum(ev) AS BIGINT) AS n_eval_events,
       CAST(sum(CASE WHEN tr > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train_users,
       CAST(sum(CASE WHEN ev > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_eval_users,
       CAST(sum(CASE WHEN tr > 0 AND ev > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaky_users
FROM per_user
"""

# ── round-12 batch: OR-join rewrite, grouped sampling, bursts, ──
# ── relational division, streak islands ─────────────────────────

ORACLES["or_join_union"] = """
WITH pairs AS (
  SELECT DISTINCT s_suppkey, c_custkey
  FROM supplier s JOIN customer c
    ON s.s_nationkey = c.c_nationkey
    OR floor(s.s_acctbal / 100) = floor(c.c_acctbal / 100)
)
SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_matches
FROM pairs GROUP BY s_suppkey
"""

ORACLES["sample_k_grouped"] = """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang FROM r WHERE rn <= 10
"""

ORACLES["burst_detect"] = """
WITH w AS (
  SELECT event_id, user_id,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
           AS n_recent_errors
  FROM events
)
SELECT event_id, user_id, CAST(n_recent_errors AS BIGINT)
         AS n_recent_errors
FROM w WHERE n_recent_errors >= 5
"""

ORACLES["rel_division"] = """
WITH hv AS (
  SELECT user_id, event_type FROM events WHERE value > 100
), nt AS (
  SELECT count(DISTINCT event_type) AS n FROM hv
), per_user AS (
  SELECT user_id, count(DISTINCT event_type) AS k
  FROM hv GROUP BY user_id
)
SELECT user_id, CAST(k AS BIGINT) AS n_types
FROM per_user, nt WHERE k = nt.n
"""

ORACLES["streaks"] = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), isl AS (
  SELECT user_id,
         day - CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY day) AS INTEGER)
           AS anchor
  FROM days
), lens AS (
  SELECT user_id, anchor, count(*) AS len
  FROM isl GROUP BY user_id, anchor
)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
FROM lens GROUP BY user_id
"""

# ── round-13 batch: MoM growth, conversion latency, profiler, ──
# ── portable SimHash witness ────────────────────────────────────

ORACLES["mom_growth"] = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT strftime(month, '%Y-%m') AS month, o_orderpriority,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(revenue - lag(revenue) OVER w AS DOUBLE)
         / CAST(lag(revenue) OVER w AS DOUBLE) * 100 AS growth_pct
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
"""

ORACLES["conversion_latency"] = """
WITH v AS (
  SELECT user_id, min(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT e.user_id,
         CAST(floor(epoch(min(e.ts))) - floor(epoch(min(v.tv)))
              AS BIGINT) AS lat
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.tv
  GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       quantile_cont(lat, 0.5) AS p50_sec,
       quantile_cont(lat, 0.9) AS p90_sec
FROM p
"""

ORACLES["profile_table"] = """
SELECT 'o_orderstatus' AS col_name,
       CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
       CAST(min(o_orderstatus) AS VARCHAR) AS min_val,
       CAST(max(o_orderstatus) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(count(*) - count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       CAST(min(o_orderpriority) AS VARCHAR),
       CAST(max(o_orderpriority) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(count(*) - count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS VARCHAR),
       CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice',
       CAST(count(*) - count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
FROM orders
"""


def _simhash_chunk_sql(k: int) -> str:
    """16-bit chunk k of the md5-vote SimHash, as DuckDB SQL over the
    per-doc shingle list ``shs`` — generated from the same bit layout
    as pipeline.dedup.simhash_md5_chunks."""
    terms = []
    for b in range(16):
        j = k * 16 + b
        pos, shift = j // 4 + 1, 3 - j % 4
        dig = (f"(CASE WHEN ascii(substr(md5(s),{pos},1)) <= 57 "
               f"THEN ascii(substr(md5(s),{pos},1)) - 48 "
               f"ELSE ascii(substr(md5(s),{pos},1)) - 87 END)")
        bit = f"(({dig} // {1 << shift}) % 2)"
        vote = f"list_sum(list_transform(shs, s -> {bit} * 2 - 1))"
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << (15 - b)} "
                     f"ELSE 0 END)")
    return " + ".join(terms)


ORACLES["simhash_sig"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), shl AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shs
  FROM toks WHERE len(tk) >= 3
)
SELECT doc_id,
       CAST({c0} AS BIGINT) AS c0,
       CAST({c1} AS BIGINT) AS c1,
       CAST({c2} AS BIGINT) AS c2,
       CAST({c3} AS BIGINT) AS c3
FROM shl WHERE len(shs) > 0
""".format(c0=_simhash_chunk_sql(0), c1=_simhash_chunk_sql(1),
           c2=_simhash_chunk_sql(2), c3=_simhash_chunk_sql(3))

# ── round-14 batch: adoption curve, Pareto/ABC ──────────────────

ORACLES["adoption_curve"] = """
WITH first_day AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS day
  FROM events GROUP BY user_id
), daily AS (
  SELECT day, count(*) AS new_users FROM first_day GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
         AS total_users
FROM daily
"""

ORACLES["pareto_abc"] = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS revenue
  FROM orders GROUP BY o_custkey
), cum AS (
  SELECT o_custkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS c
  FROM rev
), tot AS (
  SELECT CAST(sum(revenue) AS DECIMAL(18,2)) AS t FROM rev
)
SELECT o_custkey, CAST(revenue AS DOUBLE) AS revenue,
       CAST(c AS DOUBLE) / CAST(tot.t AS DOUBLE) AS cum_share,
       CASE WHEN CAST(c AS DOUBLE) / CAST(tot.t AS DOUBLE) <= 0.80
              THEN 'A'
            WHEN CAST(c AS DOUBLE) / CAST(tot.t AS DOUBLE) <= 0.95
              THEN 'B'
            ELSE 'C' END AS abc_class
FROM cum, tot
"""

# ── round-15 batch: RFM segmentation, market-basket pairs ───────

ORACLES["rfm_quintiles"] = """
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_d,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS revenue
  FROM orders GROUP BY o_custkey
), anchor AS (
  SELECT max(o_orderdate) AS a FROM orders
), base AS (
  SELECT o_custkey,
         CAST(datediff('day', last_d, anchor.a) AS BIGINT) AS r_days,
         n_orders, revenue
  FROM per_cust, anchor
), th AS (
  SELECT quantile_cont(CAST(r_days AS DOUBLE), 0.2) AS r_q1,
         quantile_cont(CAST(r_days AS DOUBLE), 0.4) AS r_q2,
         quantile_cont(CAST(r_days AS DOUBLE), 0.6) AS r_q3,
         quantile_cont(CAST(r_days AS DOUBLE), 0.8) AS r_q4,
         quantile_cont(CAST(n_orders AS DOUBLE), 0.2) AS f_q1,
         quantile_cont(CAST(n_orders AS DOUBLE), 0.4) AS f_q2,
         quantile_cont(CAST(n_orders AS DOUBLE), 0.6) AS f_q3,
         quantile_cont(CAST(n_orders AS DOUBLE), 0.8) AS f_q4,
         quantile_cont(CAST(revenue AS DOUBLE), 0.2) AS m_q1,
         quantile_cont(CAST(revenue AS DOUBLE), 0.4) AS m_q2,
         quantile_cont(CAST(revenue AS DOUBLE), 0.6) AS m_q3,
         quantile_cont(CAST(revenue AS DOUBLE), 0.8) AS m_q4
  FROM base
)
SELECT o_custkey, r_days, n_orders,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(6 - (1 + CAST(CAST(r_days AS DOUBLE) > th.r_q1 AS INT)
                   + CAST(CAST(r_days AS DOUBLE) > th.r_q2 AS INT)
                   + CAST(CAST(r_days AS DOUBLE) > th.r_q3 AS INT)
                   + CAST(CAST(r_days AS DOUBLE) > th.r_q4 AS INT))
            AS BIGINT) AS r_q,
       CAST(1 + CAST(CAST(n_orders AS DOUBLE) > th.f_q1 AS INT)
              + CAST(CAST(n_orders AS DOUBLE) > th.f_q2 AS INT)
              + CAST(CAST(n_orders AS DOUBLE) > th.f_q3 AS INT)
              + CAST(CAST(n_orders AS DOUBLE) > th.f_q4 AS INT)
            AS BIGINT) AS f_q,
       CAST(1 + CAST(CAST(revenue AS DOUBLE) > th.m_q1 AS INT)
              + CAST(CAST(revenue AS DOUBLE) > th.m_q2 AS INT)
              + CAST(CAST(revenue AS DOUBLE) > th.m_q3 AS INT)
              + CAST(CAST(revenue AS DOUBLE) > th.m_q4 AS INT)
            AS BIGINT) AS m_q
FROM base, th
"""

ORACLES["basket_pairs"] = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS support
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, support
FROM pairs ORDER BY support DESC, brand_a, brand_b LIMIT 20
"""

# ── round-16 batch: linear interpolation, chi-square cells, ─────
# ── position-based attribution ──────────────────────────────────

ORACLES["linear_interp"] = """
WITH r AS (
  SELECT event_id, user_id,
         CASE WHEN event_type <> 'error' THEN value END AS reading,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         last_value(CASE WHEN event_type <> 'error' THEN value END
                    IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN event_type <> 'error'
                         THEN CAST(floor(epoch(ts)) AS BIGINT) END
                    IGNORE NULLS) OVER wp AS pt,
         first_value(CASE WHEN event_type <> 'error' THEN value END
                     IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN event_type <> 'error'
                          THEN CAST(floor(epoch(ts)) AS BIGINT) END
                     IGNORE NULLS) OVER wn AS nt
  FROM events
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, reading,
       CASE WHEN reading IS NOT NULL THEN reading
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
                                   / CAST(nt - pt AS DOUBLE))
       END AS reading_filled
FROM r
"""

ORACLES["chi_square_cells"] = """
WITH obs AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
), rowm AS (
  SELECT lang, count(*) AS r FROM documents GROUP BY lang
), colm AS (
  SELECT source, count(*) AS c FROM documents GROUP BY source
), tot AS (
  SELECT count(*) AS n FROM documents
)
SELECT obs.lang, obs.source, CAST(o AS BIGINT) AS observed,
       round(CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
             / CAST(tot.n AS DOUBLE), 6) AS expected,
       round(pow(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                   / CAST(tot.n AS DOUBLE), 2)
             / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                / CAST(tot.n AS DOUBLE)), 6) AS chi2_contrib
FROM obs
JOIN rowm ON rowm.lang = obs.lang
JOIN colm ON colm.source = obs.source
CROSS JOIN tot
"""

ORACLES["utouch_attribution"] = """
WITH marked AS (
  SELECT event_id, user_id, event_type,
         first_value(CASE WHEN event_type = 'click' THEN event_id END
                     IGNORE NULLS) OVER wp AS fc,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER wp AS lc
  FROM events
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), purchases AS (
  SELECT fc, lc FROM marked
  WHERE event_type = 'purchase' AND fc IS NOT NULL
), credits AS (
  SELECT fc AS click_id,
         CASE WHEN fc = lc THEN 1.0 ELSE 0.5 END AS credit
  FROM purchases
  UNION ALL
  SELECT lc, 0.5 FROM purchases WHERE fc <> lc
)
SELECT click_id, CAST(CAST(sum(credit) AS VARCHAR) AS DOUBLE) AS total_credit,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM credits GROUP BY click_id
"""

# -- round-17 batch: cluster-size histogram, new-vs-returning --

# The dedup_cc recursive CTE with the histogram aggregation on top.
ORACLES["cluster_sizes"] = """
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), sh AS (
  -- mirror ngram_jaccard_pairs_capped's max_df=1000 document-frequency
  -- cap, so Spark and oracle are definitionally identical at EVERY
  -- scale factor, not just ones where no shingle exceeds the cap
  SELECT doc_id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges0 AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) >= 0.6
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM edges0
  UNION ALL
  SELECT doc_b, doc_a FROM edges0
), reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
)
, labels AS (
  SELECT node, min(lab) AS rep FROM reach GROUP BY node
), per_cluster AS (
  SELECT rep, count(*) AS cluster_size FROM labels GROUP BY rep
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM per_cluster GROUP BY cluster_size
"""

ORACLES["dau_new_returning"] = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
  SELECT user_id, min(day) AS fd FROM days GROUP BY user_id
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN day <> fd THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM days JOIN first USING (user_id)
GROUP BY day
"""

# ── round-18 batch: grouped vocabulary heads, trigram paths, ────
# ── snapshot diff ───────────────────────────────────────────────

ORACLES["terms_per_lang"] = """
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS term
  FROM documents
), counts AS (
  SELECT lang, term, count(*) AS n FROM toks GROUP BY lang, term
), ranked AS (
  SELECT lang, term, CAST(n AS BIGINT) AS n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, term) AS r
  FROM counts
)
SELECT lang, term, n FROM ranked WHERE r <= 5
"""

ORACLES["event_trigrams"] = """
WITH p AS (
  SELECT lag(event_type, 2) OVER w AS s1,
         lag(event_type, 1) OVER w AS s2,
         event_type AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
FROM p WHERE s1 IS NOT NULL
GROUP BY s1, s2, s3
ORDER BY n DESC, s1, s2, s3 LIMIT 20
"""

ORACLES["snapshot_diff"] = """
WITH a AS (
  SELECT doc_id, md5(text) AS ha FROM documents
), b AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
                  ELSE text END) AS hb
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, md5(text) AS hb
  FROM documents WHERE doc_id % 19 = 0
), j AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, ha, hb
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT CASE WHEN ha IS NULL THEN 'added'
            WHEN hb IS NULL THEN 'removed'
            WHEN ha <> hb THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1
"""


# ── round-19 batch: Benford audit, weekday seasonality, MinHash ──
# ── estimator quality ────────────────────────────────────────────

ORACLES["benford_digits"] = """
WITH per AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit,
         count(*) AS n_orders
  FROM orders GROUP BY 1
), tot AS (
  SELECT sum(n_orders) AS t FROM per
), exp AS (
  SELECT * FROM (VALUES
         (1, CAST('0.30103' AS DOUBLE)),
         (2, CAST('0.176091' AS DOUBLE)),
         (3, CAST('0.124939' AS DOUBLE)),
         (4, CAST('0.09691' AS DOUBLE)),
         (5, CAST('0.079181' AS DOUBLE)),
         (6, CAST('0.066947' AS DOUBLE)),
         (7, CAST('0.057992' AS DOUBLE)),
         (8, CAST('0.051153' AS DOUBLE)),
         (9, CAST('0.045757' AS DOUBLE)))
    AS e(digit, benford)
), shared AS (
  SELECT p.digit, p.n_orders,
         CAST(p.n_orders AS DOUBLE) / CAST(t.t AS DOUBLE) AS share,
         e.benford
  FROM per p, tot t JOIN exp e ON e.digit = p.digit
)
SELECT digit, CAST(n_orders AS BIGINT) AS n_orders, share, benford,
       (share - benford) * (share - benford) / benford AS chi_cell
FROM shared
"""

ORACLES["dow_seasonality"] = """
WITH per AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         count(*) AS n
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, sum(n) AS t FROM per GROUP BY 1
)
SELECT p.event_type, p.dow, CAST(p.n AS BIGINT) AS n_events,
       7.0 * CAST(p.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS lift
FROM per p JOIN tot t USING (event_type)
"""

ORACLES["minhash_est_quality"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
), sh AS (
  -- NO DISTINCT here, deliberately: this sh only feeds sig's min()
  -- aggregate, which is idempotent over duplicate shingles — and the
  -- all-docs hash-DISTINCT was the 100x blow-up's largest spill
  -- contributor (60+ GB). Set semantics live in shc below, which is
  -- candidate-bounded.
  SELECT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 2)) AS i
        FROM toks WHERE len(w) >= 3)
), seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
sig AS (
  SELECT doc_id, seed,
         min(substr(md5(CAST(seed AS VARCHAR) || ':' || shingle), 1, 16))
           AS minhash
  FROM sh, seeds
  GROUP BY doc_id, seed
), banded AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sig
  GROUP BY doc_id, seed // 2
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS n_shared_bands
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), est AS (
  SELECT c.doc_a, c.doc_b, c.n_shared_bands,
         CAST(CAST(sum(CASE WHEN sa.minhash = sb.minhash
                       THEN 1 ELSE 0 END) AS VARCHAR) AS DOUBLE) / 8.0 AS est_sim
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
  GROUP BY 1, 2, 3
), cdocs AS (
  -- bound the exact-Jaccard verify to candidate docs, mirroring the
  -- Spark plan's semi-join (queries.py minhash_est_quality): only
  -- candidate pairs are ever looked up below, so restricting the
  -- shingle self-join's input is value-identical — and it is what
  -- makes the oracle feasible at the 100x blow-up (the all-docs
  -- self-join spilled >43 GB there; VERDICT r11 #1)
  SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand
), shc AS (
  -- candidate-doc shingles REDERIVED from documents rather than
  -- reusing sh/toks: keeps both single-referenced so DuckDB streams
  -- them into sig instead of materializing the all-docs shingle set
  -- (measured 58+ GB of spill at 100x when sh was referenced twice)
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM (SELECT d.doc_id,
                     list_filter(string_split(d.text, ' '),
                                 t -> t <> '') AS w
              FROM documents d JOIN cdocs USING (doc_id))
        WHERE len(w) >= 3)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM shc GROUP BY 1
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT e.doc_a, e.doc_b,
       CAST(e.n_shared_bands AS BIGINT) AS n_shared_bands,
       e.est_sim,
       coalesce(round(CAST(c.n_common AS DOUBLE)
                      / (sa.n + sb.n - c.n_common), 6), 0.0) AS jaccard
FROM est e
JOIN sizes sa ON sa.doc_id = e.doc_a
JOIN sizes sb ON sb.doc_id = e.doc_b
LEFT JOIN common c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
"""


# ── round-19 batch 2: time-series autocorr, cohort LTV, text ─────
# ── readability, skew diagnosis, Bloom prefilter ─────────────────

ORACLES["autocorr_daily"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
       round(corr(a.n, b.n), 6) + 0.0 AS autocorr
FROM daily a JOIN daily b ON b.d = a.d + 1
UNION ALL
SELECT CAST(7 AS BIGINT), CAST(count(*) AS BIGINT),
       round(corr(a.n, b.n), 6) + 0.0
FROM daily a JOIN daily b ON b.d = a.d + 7
"""

ORACLES["cohort_revenue"] = """
WITH om AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
         CAST(o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders
), first AS (
  SELECT o_custkey, min(m) AS cohort FROM om GROUP BY 1
)
SELECT strftime(cohort, '%Y-%m') AS cohort_month,
       CAST(datediff('month', cohort, m) AS BIGINT) AS age_months,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS revenue
FROM om JOIN first USING (o_custkey)
GROUP BY 1, 2
"""

ORACLES["readability"] = """
WITH c AS (
  SELECT doc_id,
         greatest(1, len(list_filter(string_split(text, ' '),
                                     t -> t <> ''))) AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))
           AS sy
  FROM documents
)
SELECT doc_id, CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(sy AS BIGINT) AS n_syllables,
       CAST('206.835' AS DOUBLE)
       - CAST('1.015' AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
       - CAST('84.6' AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE))
         AS flesch
FROM c
"""

ORACLES["heavy_hitters"] = """
WITH per AS (
  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1
), tot AS (
  SELECT sum(n) AS t FROM per
), top AS (
  SELECT l_partkey, n FROM per ORDER BY n DESC, l_partkey LIMIT 20
)
SELECT l_partkey, CAST(n AS BIGINT) AS n_rows,
       CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS share
FROM top, tot
"""

ORACLES["bloom_prefilter"] = """
WITH keys AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM keys) AS n_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_probed,
       (SELECT CAST(count(*) AS BIGINT) FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM keys))
         AS n_true_matches,
       CAST(1 AS BIGINT) AS ok_no_false_neg,
       CAST(1 AS BIGINT) AS ok_fp_bounded
"""


ORACLES["name_blocking_pairs"] = """
WITH kept AS (
  SELECT p_partkey, p_name, substr(p_name, 1, 4) AS blk
  FROM part
  QUALIFY row_number() OVER (PARTITION BY substr(p_name, 1, 4)
                             ORDER BY p_partkey) <= 50
)
SELECT a.blk AS block, a.p_partkey AS partkey_a,
       b.p_partkey AS partkey_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM kept a
JOIN kept b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""

ORACLES["weighted_median"] = """
WITH d AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(l_quantity AS BIGINT) AS q,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag, CAST(max(tot) AS BIGINT) AS total_qty,
       min(CASE WHEN 2 * cum >= tot THEN l_extendedprice END)
         AS w_median
FROM d GROUP BY l_returnflag
"""

ORACLES["selfjoin_skew"] = """
WITH per AS (
  SELECT user_id, count(*) AS c FROM events GROUP BY 1
)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c * c) AS BIGINT) AS selfjoin_rows,
       CAST(CAST(sum(c * c) AS VARCHAR) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         / (CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE))
         AS skew_factor
FROM per
"""


ORACLES["quality_gate"] = """
WITH c AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), f AS (
  SELECT doc_id,
         len(tk) AS n,
         len(list_distinct(tk)) AS nd,
         len(list_filter(tk,
             t -> list_contains(['the', 'a', 'is', 'of'], t))) AS ns
  FROM c
)
SELECT doc_id,
       CAST(n < 5 AS BIGINT) AS too_short,
       CAST((n - nd) * 10 > n * 4 AS BIGINT) AS too_repetitive,
       CAST(ns * 10 > n * 4 AS BIGINT) AS stopword_skew,
       CAST(NOT (n < 5) AND NOT ((n - nd) * 10 > n * 4)
            AND NOT (ns * 10 > n * 4) AS BIGINT) AS keep
FROM f
"""

ORACLES["welch_ttest"] = """
WITH c AS (
  -- cents discipline: scale-0 decimal sums, ONE decimal->double
  -- conversion, divide by the power of ten in IEEE afterwards
  -- (a scaled DECIMAL(38,4)->DOUBLE double-rounds here but not in
  -- Spark — 1-ULP divergence)
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(20,0)) AS cents
  FROM lineitem
), sums AS (
  SELECT
    count_if(l_returnflag = 'A') AS n_a,
    count_if(l_returnflag = 'R') AS n_r,
    CAST(CAST(sum(CASE WHEN l_returnflag = 'A' THEN cents END) AS VARCHAR) AS DOUBLE)
      AS s1a,
    CAST(CAST(sum(CASE WHEN l_returnflag = 'R' THEN cents END) AS VARCHAR) AS DOUBLE)
      AS s1r,
    CAST(CAST(sum(CASE WHEN l_returnflag = 'A'
             THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS VARCHAR) AS DOUBLE)
      AS s2a,
    CAST(CAST(sum(CASE WHEN l_returnflag = 'R'
             THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS VARCHAR) AS DOUBLE)
      AS s2r
  FROM c
), agg AS (
  -- sample variance from EXACT cents power sums: identical IEEE
  -- expression tree as the Spark side, no accumulation-order noise
  SELECT n_a, n_r,
         s1a / n_a / 100.0 AS mean_a,
         s1r / n_r / 100.0 AS mean_r,
         round(((s2a - s1a * s1a / n_a) / (n_a - 1)) / 10000.0, 6)
           AS var_a,
         round(((s2r - s1r * s1r / n_r) / (n_r - 1)) / 10000.0, 6)
           AS var_r
  FROM sums
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_r AS BIGINT) AS n_r,
       mean_a, mean_r, var_a, var_r,
       round((mean_a - mean_r)
             / sqrt(var_a / n_a + var_r / n_r), 6) + 0.0 AS t_stat,
       round((var_a / n_a + var_r / n_r) * (var_a / n_a + var_r / n_r)
             / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                + (var_r / n_r) * (var_r / n_r) / (n_r - 1)), 2)
         AS welch_df
FROM agg
"""

ORACLES["topn_others"] = """
WITH per AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1
), lab AS (
  SELECT CASE WHEN row_number() OVER (ORDER BY n DESC, event_type) <= 3
              THEN event_type ELSE 'other' END AS label, n
  FROM per
), tot AS (SELECT sum(n) AS t FROM per)
SELECT label, CAST(sum(n) AS BIGINT) AS n_events,
       CAST(CAST(sum(n) AS VARCHAR) AS DOUBLE) / CAST(max(t) AS DOUBLE) AS share
FROM lab, tot GROUP BY label
"""

ORACLES["impute_mean"] = """
WITH means AS (
  SELECT c_nationkey,
         CASE WHEN count(CASE WHEN c_acctbal >= 0 THEN 1 END) > 0
              THEN CAST(CAST(sum(CASE WHEN c_acctbal >= 0
                       THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
                   / count(CASE WHEN c_acctbal >= 0 THEN 1 END)
         END AS m
  FROM customer GROUP BY 1
)
SELECT c_custkey, c_nationkey,
       CAST(c_acctbal < 0 AS BIGINT) AS was_null,
       CASE WHEN c_acctbal >= 0
            THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
            ELSE m END AS acctbal_filled
FROM customer JOIN means USING (c_nationkey)
"""


ORACLES["pack_stats"] = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM t
), packs AS (
  SELECT (cum - n_tokens) // 512 AS pack_id,
         count(*) AS docs, sum(n_tokens) AS toks
  FROM c GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(docs) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       CAST(CAST(sum(toks) AS VARCHAR) AS DOUBLE) / count(*) AS avg_fill,
       CAST(max(docs) AS BIGINT) AS max_docs_per_pack
FROM packs
"""

ORACLES["rate_limit_audit"] = """
WITH per AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_user_days,
       CAST(count_if(n > 5) AS BIGINT) AS n_violating,
       CAST(sum(greatest(0, n - 5)) AS BIGINT) AS total_excess
FROM per GROUP BY day
"""

ORACLES["dup_threshold_sweep"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), sh AS (
  SELECT doc_id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jac AS (
  SELECT round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
           AS j
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
        >= 0.5
)
-- threshold cast to DOUBLE: Spark's literal array is double, and the
-- engine-side checksum canon is type-faithful (a DECIMAL(2,1) 0.5
-- renders '0.5' while a DOUBLE renders its mantissa form)
SELECT CAST(t.threshold AS DOUBLE) AS threshold,
       CAST(count_if(j >= t.threshold) AS BIGINT) AS n_pairs
FROM jac, (SELECT unnest([0.5, 0.6, 0.7, 0.8]) AS threshold) t
GROUP BY t.threshold
"""

ORACLES["funnel_windowed"] = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL 1 HOUR
  GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t_buy
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL 24 HOURS
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_view,
       CAST(count(c.t_click) AS BIGINT) AS n_click_1h,
       CAST(count(p.t_buy) AS BIGINT) AS n_purchase_24h
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""

ORACLES["churn_labels"] = """
WITH um AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
)
SELECT u.user_id, strftime(u.w, '%Y-%m-%d') AS week,
       CAST(n.user_id IS NULL AS BIGINT) AS churned
FROM um u
LEFT JOIN um n ON n.user_id = u.user_id
              AND n.w = u.w + INTERVAL 7 DAYS
WHERE u.w < (SELECT max(w) FROM um)
"""


ORACLES["coverage_90"] = """
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), tf AS (
  SELECT lang, t, count(*) AS c FROM tok GROUP BY 1, 2
), cum AS (
  SELECT lang, c,
         sum(c) OVER (PARTITION BY lang ORDER BY c DESC, t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY lang) AS tot
  FROM tf
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(max(tot) AS BIGINT) AS n_tokens,
       CAST(count_if(10 * (cum - c) < 9 * tot) AS BIGINT)
         AS n_terms_90pct
FROM cum GROUP BY lang
"""

ORACLES["domain_cap"] = """
WITH r AS (
  SELECT source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count_if(rn <= 15) AS BIGINT) AS n_kept,
       CAST(count_if(rn > 15) AS BIGINT) AS n_dropped
FROM r GROUP BY source
"""


ORACLES["asof_tolerance"] = """
WITH p AS (
  SELECT user_id, ts, max(value) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id,
       CASE WHEN p.ts IS NOT NULL
             AND p.ts >= c.ts - INTERVAL 2 HOURS
            THEN p.pvalue END AS pvalue_2h,
       CAST(coalesce(p.ts IS NOT NULL
                     AND p.ts >= c.ts - INTERVAL 2 HOURS, FALSE)
            AS BIGINT) AS matched
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
"""

ORACLES["recon_totals"] = """
WITH per AS (
  SELECT l_orderkey,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2))
                     - CAST(l_discount AS DECIMAL(4,2)))
                  * (CAST(1 AS DECIMAL(3,2))
                     + CAST(l_tax AS DECIMAL(4,2)))
                  AS DECIMAL(22,6))) AS DECIMAL(22,6)) AS computed
  FROM lineitem GROUP BY 1
), d AS (
  SELECT CAST(abs(CAST(o_totalprice AS DECIMAL(22,6)) - computed)
              AS DECIMAL(22,6)) AS absdiff
  FROM per JOIN orders ON l_orderkey = o_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count_if(absdiff > 1.0) AS BIGINT) AS n_mismatch_over_1,
       CAST(CAST(sum(absdiff) AS VARCHAR) AS DOUBLE) / count(*) AS mean_abs_diff
FROM d
"""


ORACLES["pareto_frontier"] = """
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
)
"""

ORACLES["regr_residuals"] = """
WITH cts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS xq,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(20,0)) AS yc
  FROM lineitem
), sums AS (
  -- exact power sums (order-free) in integer cents, ONE
  -- decimal->double conversion each, ÷10^k in IEEE afterwards:
  -- identical model/variance trees as the Spark side, no
  -- merge-order noise and no double-rounded scaled-decimal casts
  SELECT l_returnflag,
         count(*) AS n,
         CAST(CAST(sum(xq) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(sum(xq * xq) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(sum(yc) AS VARCHAR) AS DOUBLE) / 100.0 AS sy,
         CAST(CAST(sum(CAST(yc AS DECIMAL(38,0)) * yc) AS VARCHAR) AS DOUBLE) / 10000.0
           AS syy,
         CAST(CAST(sum(yc * xq) AS VARCHAR) AS DOUBLE) / 100.0 AS sxy
  FROM cts GROUP BY 1
), model AS (
  SELECT l_returnflag,
         round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) + 0.0 AS b,
         round(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                        * (sx / n), 6) AS a,
         round((syy - sy * sy / n) / (n - 1), 4) AS vy,
         round((sxy - sx * sy / n) / (n - 1), 4) AS cv,
         round((sxx - sx * sx / n) / (n - 1), 4) AS vx
  FROM sums
), m2 AS (
  SELECT l_returnflag, a, b,
         round(2 * sqrt(greatest(0.0, vy - 2 * b * cv + b * b * vx)), 4)
           AS thr
  FROM model
)
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(b) AS slope,
       min(thr) AS outlier_cut,
       CAST(count_if(abs(CAST(l_extendedprice AS DOUBLE)
                         - (a + b * CAST(l_quantity AS DOUBLE))) > thr)
            AS BIGINT) AS n_outliers
FROM lineitem l JOIN m2 USING (l_returnflag)
GROUP BY 1
"""


ORACLES["join_advisor"] = """
WITH per AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
), s AS (
  SELECT sum(n) AS n_left, count(*) AS n_keys, max(n) AS max_key_rows,
         sum(n * n) AS sq
  FROM per
), r AS (
  SELECT count(*) AS n_right FROM customer
)
SELECT CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(max_key_rows AS BIGINT) AS max_key_rows,
       CAST(n_right * 120 AS BIGINT) AS est_build_bytes,
       round(CAST(sq AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / (CAST(n_left AS DOUBLE) * CAST(n_left AS DOUBLE)), 4)
         AS skew_factor,
       CASE WHEN n_right * 120 <= 10 * 1024 * 1024 THEN 'broadcast'
            WHEN CAST(sq AS DOUBLE) * CAST(n_keys AS DOUBLE)
                 / (CAST(n_left AS DOUBLE) * CAST(n_left AS DOUBLE))
                 > 4.0 THEN 'shuffle_hash_salted'
            ELSE 'shuffle_hash' END AS strategy
FROM s, r
"""

ORACLES["zipf_alpha"] = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), tf AS (
  SELECT t, count(*) AS c FROM tok GROUP BY 1
), top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rnk
  FROM tf ORDER BY c DESC, t LIMIT 1000
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(-regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))),
             4) + 0.0 AS alpha
FROM top
"""

ORACLES["corpus_card"] = """
WITH base AS (
  SELECT count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
         count(DISTINCT source) AS n_sources, sum(n_chars) AS n_chars,
         count_if(lang = 'en') AS en
  FROM documents
), t AS (
  SELECT sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
    AS n_tokens
  FROM documents
), dup AS (
  SELECT sum(n - 1) AS n_exact_dups
  FROM (SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY 1)
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_langs AS BIGINT) AS n_langs,
       CAST(n_sources AS BIGINT) AS n_sources,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(en AS DOUBLE) / CAST(n_docs AS DOUBLE) AS frac_en,
       CAST(n_exact_dups AS BIGINT) AS n_exact_dups,
       CAST(n_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_chars
FROM base, t, dup
"""


ORACLES["scd2_asof"] = """
WITH hist AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         o_orderdate AS valid_from,
         coalesce(lead(o_orderdate) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                  TIMESTAMP '9999-12-31 00:00:00') AS valid_to
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice
FROM hist
WHERE valid_from <= TIMESTAMP '1997-01-01 00:00:00'
  AND valid_to > TIMESTAMP '1997-01-01 00:00:00'
"""

ORACLES["dedup_graph_stats"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
           AS shingle
  FROM toks WHERE len(tk) >= 3
), sh AS (
  SELECT doc_id, shingle FROM sh0
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
        >= 0.6
), deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT doc_a AS v FROM edges
        UNION ALL SELECT doc_b FROM edges)
  GROUP BY 1
)
-- scalar subqueries, not a deg × e cross join: with ZERO edges the
-- cross join is empty and max(n_edges) would be NULL while Spark's
-- aggregate-of-empty emits n_edges=0 — counts must stay counts
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
       (SELECT CAST(CAST(sum(d) AS VARCHAR) AS DOUBLE) / count(*) FROM deg)
         AS mean_degree
"""

ORACLES["feature_hashing"] = """
SELECT doc_id,
       CAST(strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS t
      FROM documents)
GROUP BY 1, 2
"""


ORACLES["corpus_drift"] = """
WITH per AS (
  SELECT lang,
         count_if((strpos('0123456789abcdef',
                          substr(md5(text), 4, 1)) - 1) % 2 = 0) AS a,
         count_if((strpos('0123456789abcdef',
                          substr(md5(text), 4, 1)) - 1) % 2 = 1) AS b
  FROM documents GROUP BY 1
), tot AS (
  SELECT sum(a) AS ta, sum(b) AS tb FROM per
)
SELECT lang,
       CAST(a AS BIGINT) AS n_a, CAST(b AS BIGINT) AS n_b,
       CAST(a AS DOUBLE) / CAST(ta AS DOUBLE) AS share_a,
       CAST(b AS DOUBLE) / CAST(tb AS DOUBLE) AS share_b,
       CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)
       - CAST(b AS DOUBLE) / CAST(tb AS DOUBLE) AS share_delta
FROM per, tot
"""

ORACLES["mutual_info"] = """
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), joint AS (
  SELECT CAST(strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1
              AS BIGINT) AS b,
         lang, count(*) AS n
  FROM tok GROUP BY 1, 2
), mb AS (SELECT b, sum(n) AS nb FROM joint GROUP BY 1),
ml AS (SELECT lang, sum(n) AS nl FROM joint GROUP BY 1),
tot AS (SELECT sum(n) AS t FROM joint)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(max(t) AS BIGINT) AS n_tokens,
       round(sum((CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                 * ln(CAST(n AS DOUBLE) * CAST(t AS DOUBLE)
                      / (CAST(nb AS DOUBLE) * CAST(nl AS DOUBLE)))), 6)
       + 0.0 AS mi_nats
FROM joint JOIN mb USING (b) JOIN ml USING (lang), tot
"""


ORACLES["media_manifest"] = """
WITH m AS (
  SELECT doc_id AS media_id, text, length(text) AS n
  FROM documents
), c AS (
  SELECT media_id, text, n,
         unnest(range(0, greatest(1, CAST(ceil(n / 64.0) AS BIGINT))))
           AS chunk_id
  FROM m
)
SELECT media_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * 64 AS BIGINT) AS offset,
       CAST(least(64, n - chunk_id * 64) AS BIGINT) AS n_bytes,
       md5(substr(text, CAST(chunk_id * 64 + 1 AS BIGINT), 64))
         AS chunk_md5
FROM c
"""


ORACLES["score_calibration"] = """
WITH bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(1, greatest(len(toks), 1))) AS i) gs
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), scores AS (
  SELECT doc_id,
         round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6)
         + 0.0 AS s
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY doc_id
), gate AS (
  SELECT doc_id,
         CAST(NOT (n < 5) AND NOT ((n - nd) * 10 > n * 4)
              AND NOT (ns * 10 > n * 4) AS BIGINT) AS keep
  FROM (
    SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
           len(list_filter(tk,
               t -> list_contains(['the', 'a', 'is', 'of'], t))) AS ns
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents))
), ranked AS (
  SELECT s.doc_id, s.s, g.keep,
         row_number() OVER (ORDER BY s.s, s.doc_id) AS pos,
         count(*) OVER () AS n
  FROM scores s JOIN gate g USING (doc_id)
)
SELECT CAST((pos - 1) * 10 // n + 1 AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_keep,
       CAST(CAST(sum(keep) AS VARCHAR) AS DOUBLE) / count(*) AS keep_rate,
       CAST(CAST(sum(CAST(s AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*)
         AS mean_score
FROM ranked GROUP BY 1
"""

# ─────────── §2.30 round-20 additions ───────────

ORACLES["dedup_time_window"] = """
WITH b AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS hb
  FROM events
), r AS (
  SELECT user_id, event_type, hb, event_id,
         row_number() OVER (PARTITION BY user_id, event_type, hb
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type, hb) AS n
  FROM b
)
SELECT user_id, event_type,
       CAST(hb AS BIGINT) AS window_start,
       CAST(event_id AS BIGINT) AS kept_event_id,
       CAST(n AS BIGINT) AS n_in_window
FROM r WHERE rn = 1
"""

ORACLES["vocab_coverage"] = """
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS tok
  FROM documents
), cnt AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), vocab AS (
  SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT 1000
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count_if(v.tok IS NULL) AS BIGINT) AS n_oov,
       CAST(count_if(v.tok IS NULL) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY lang
"""

ORACLES["char_entropy"] = """
WITH chars AS (
  SELECT doc_id, unnest(list_transform(range(1, len(text) + 1),
                                       i -> text[i:i])) AS ch
  FROM documents
), per AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
), p AS (
  SELECT doc_id, c,
         CAST(c AS DOUBLE)
           / CAST(CAST(sum(c) OVER (PARTITION BY doc_id) AS VARCHAR) AS DOUBLE) AS pr
  FROM per
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       round(sum(-pr * log2(pr)), 6) + 0.0 AS entropy_bits
FROM p GROUP BY doc_id
"""

ORACLES["iqr_scale"] = """
WITH th AS (
  SELECT l_returnflag,
         quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS med,
         quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS q3
  FROM lineitem GROUP BY 1
)
SELECT l_orderkey, l_linenumber, l.l_returnflag,
       CAST(l_quantity AS BIGINT) AS qty,
       CASE WHEN q3 <> q1
            THEN (CAST(l_quantity AS DOUBLE) - med) / (q3 - q1)
       END AS qty_scaled
FROM lineitem l JOIN th USING (l_returnflag)
"""

ORACLES["vec_stats"] = """
WITH terms AS (
  SELECT vec_id, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
), agg AS (
  SELECT vec_id, count(*) AS dim, sum(x) AS s, sum(x * x) AS sq,
         max(x) AS mx
  FROM terms GROUP BY vec_id
), med AS (
  SELECT vec_id,
         CASE WHEN len(srt) % 2 = 1
              THEN CAST(srt[(len(srt) + 1) // 2] AS DOUBLE)
              ELSE (CAST(srt[len(srt) // 2] AS DOUBLE)
                    + CAST(srt[len(srt) // 2 + 1] AS DOUBLE)) / 2
         END AS median_val
  FROM (SELECT vec_id,
               list_sort(list_transform(embedding,
                                        x -> CAST(x AS DOUBLE))) AS srt
        FROM embeddings)
)
SELECT a.vec_id,
       CAST(dim AS BIGINT) AS dim,
       round(sqrt(sq), 6) AS l2_norm,
       round(s / dim, 6) + 0.0 AS mean_val,
       median_val,
       mx AS max_val
FROM agg a JOIN med USING (vec_id)
"""

ORACLES["revenue_bridge"] = """
WITH per AS (
  SELECT o_custkey,
         coalesce(sum(CASE WHEN year(o_orderdate) = 1995
                      THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS p,
         coalesce(sum(CASE WHEN year(o_orderdate) = 1996
                      THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS c
  FROM orders
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY o_custkey
), cls AS (
  SELECT CASE WHEN p = 0 THEN 'new'
              WHEN c = 0 THEN 'churned'
              WHEN c > p THEN 'expanded'
              WHEN c < p THEN 'contracted'
              ELSE 'flat' END AS bridge_class, p, c
  FROM per
)
SELECT bridge_class,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(CAST(sum(p) AS VARCHAR) AS DOUBLE) AS rev_prev,
       CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) AS rev_curr,
       CAST(CAST(sum(c) - sum(p) AS VARCHAR) AS DOUBLE) AS delta
FROM cls GROUP BY bridge_class
"""

ORACLES["top_paths"] = """
WITH marked AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w))
                      >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS s
  FROM marked
), pos AS (
  SELECT user_id, s, event_type,
         row_number() OVER (PARTITION BY user_id, s
                            ORDER BY ts, event_id) AS p
  FROM sid
), paths AS (
  SELECT user_id, s,
         string_agg(event_type, '>' ORDER BY p) AS path
  FROM pos WHERE p <= 3 GROUP BY user_id, s
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 20
"""

ORACLES["gini_index"] = """
WITH rev AS (
  SELECT o_custkey,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                   AS DECIMAL(20,0)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), seg AS (
  SELECT r.o_custkey, r.cents, c.c_mktsegment
  FROM rev r JOIN customer c ON c.c_custkey = r.o_custkey
), ranked AS (
  SELECT c_mktsegment, cents,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY cents, o_custkey) AS rk
  FROM seg
), agg AS (
  SELECT c_mktsegment,
         count(*) AS n,
         CAST(CAST(sum(CAST(rk AS DECIMAL(19,0))
                  * CAST(cents AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(sum(CAST(cents AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS s
  FROM ranked GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n_customers,
       (2.0 * s1 - (n + 1) * s) / (n * s) AS gini
FROM agg
"""

ORACLES["order_aging"] = """
WITH anchor AS (
  SELECT max(o_orderdate) AS a FROM orders
)
SELECT o_orderstatus AS status,
       CASE WHEN datediff('day', o_orderdate, anchor.a) <= 30
              THEN '0-30'
            WHEN datediff('day', o_orderdate, anchor.a) <= 90
              THEN '31-90'
            WHEN datediff('day', o_orderdate, anchor.a) <= 365
              THEN '91-365'
            ELSE '365+' END AS age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         AS open_value
FROM orders, anchor
WHERE o_orderstatus <> 'F'
GROUP BY 1, 2
"""

ORACLES["label_noise"] = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
  WHERE vec_id % 10 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {KNN_QUERY_CAP}
), c AS (
  SELECT vec_id AS c_id, embedding AS cv, label FROM embeddings
  WHERE vec_id % 10 <> 0
), terms AS (
  SELECT q_id, c_id, label,
         CAST(qv[i] AS DOUBLE) AS x, CAST(cv[i] AS DOUBLE) AS y
  FROM (SELECT q_id, c_id, label, qv, cv,
               unnest(generate_series(1, len(qv))) AS i
        FROM c CROSS JOIN q)
), sims AS (
  SELECT q_id, c_id, label,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
           AS sim
  FROM terms GROUP BY q_id, c_id, label
), top AS (
  SELECT q_id, label,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, c_id) AS rn
  FROM sims
), votes AS (
  SELECT q_id, label, count(*) AS votes FROM top
  WHERE rn <= 3 GROUP BY q_id, label
), pred AS (
  SELECT q_id, label AS pred_label
  FROM (SELECT q_id, label, votes,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY votes DESC, label) AS r
        FROM votes)
  WHERE r = 1
), own AS (
  SELECT vec_id AS q_id, label AS true_label FROM embeddings
  WHERE vec_id % 10 = 0
)
SELECT true_label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(count_if(pred_label <> true_label) AS BIGINT) AS n_disagree,
       CAST(count_if(pred_label <> true_label) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS noise_rate
FROM own JOIN pred USING (q_id)
GROUP BY true_label
"""

ORACLES["score_auc"] = """
WITH bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(1, greatest(len(toks), 1))) AS i) gs
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), scores AS (
  SELECT doc_id,
         round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6)
         + 0.0 AS s
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY doc_id
), gate AS (
  SELECT doc_id,
         CAST(NOT (n < 5) AND NOT ((n - nd) * 10 > n * 4)
              AND NOT (ns * 10 > n * 4) AS BIGINT) AS keep
  FROM (
    SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
           len(list_filter(tk,
               t -> list_contains(['the', 'a', 'is', 'of'], t))) AS ns
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents))
), per AS (
  SELECT s.s AS score,
         count_if(g.keep = 1) AS np,
         count_if(g.keep = 0) AS nn
  FROM scores s JOIN gate g USING (doc_id)
  GROUP BY s.s
), cum AS (
  SELECT score, np, nn,
         sum(nn) OVER (ORDER BY score
                       ROWS UNBOUNDED PRECEDING) AS cnn
  FROM per
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nn) AS BIGINT) AS n_neg,
       CAST(CAST(sum(CAST(np AS DECIMAL(19,0))
                * CAST(2 * (cnn - nn) + nn AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
         / (2.0 * CAST(CAST(sum(np) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(nn) AS VARCHAR) AS DOUBLE))
         AS auc
FROM cum
"""

ORACLES["ks_test"] = """
WITH per AS (
  SELECT CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(20,0)) AS BIGINT) AS v,
         count_if(l_returnflag = 'A') AS ca,
         count_if(l_returnflag = 'R') AS cr
  FROM lineitem WHERE l_returnflag IN ('A', 'R')
  GROUP BY 1
), tot AS (
  SELECT sum(ca) AS na, sum(cr) AS nr FROM per
), pre AS (
  -- window over the two SMALL bigint counts and multiply OUTSIDE the
  -- frame: the cumulative counts are <= n_a/n_r, so the cross
  -- products are bounded by n_a*n_r (~1e15 at the 100x blow-up) and
  -- everything stays exact integer.  The previous form windowed the
  -- per-row DECIMAL(38,0) signed term directly; at lineitem 60M rows
  -- DuckDB's segment-tree window accumulator produced HUGEINT
  -- intermediates past 1.7e38 and aborted (Overflow in HUGEINT
  -- addition) even though every true prefix is <= n_a*n_r.
  SELECT v,
         sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
         sum(cr) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_r
  FROM per
), cum AS (
  SELECT v,
         CAST(CAST(cum_a AS DECIMAL(19,0)) * CAST(tot.nr AS DECIMAL(19,0))
              - CAST(cum_r AS DECIMAL(19,0)) * CAST(tot.na AS DECIMAL(19,0))
              AS DECIMAL(38,0)) AS c
  FROM pre, tot
), dm AS (
  SELECT max(abs(c)) AS dnum FROM cum
), at AS (
  SELECT min(v) AS ks_at FROM cum, dm WHERE abs(c) = dm.dnum
)
SELECT CAST(tot.na AS BIGINT) AS n_a,
       CAST(tot.nr AS BIGINT) AS n_r,
       CAST(dm.dnum AS DOUBLE)
         / (CAST(tot.na AS DOUBLE) * CAST(tot.nr AS DOUBLE)) AS ks_stat,
       CAST(at.ks_at AS BIGINT) AS ks_at_cents
FROM tot, dm, at
"""

ORACLES["psi_drift"] = """
WITH per AS (
  SELECT lang,
         count_if((strpos('0123456789abcdef', md5(text)[4:4]) - 1) % 2
                  = 0) AS a,
         count_if((strpos('0123456789abcdef', md5(text)[4:4]) - 1) % 2
                  = 1) AS b
  FROM documents GROUP BY lang
), tot AS (
  SELECT sum(a) AS ta, sum(b) AS tb, count(*) AS k FROM per
), terms AS (
  SELECT ((CAST(a AS DOUBLE) + 0.5)
          / (CAST(tot.ta AS DOUBLE) + 0.5 * tot.k)
          - (CAST(b AS DOUBLE) + 0.5)
            / (CAST(tot.tb AS DOUBLE) + 0.5 * tot.k))
         * ln(((CAST(a AS DOUBLE) + 0.5)
               / (CAST(tot.ta AS DOUBLE) + 0.5 * tot.k))
              / ((CAST(b AS DOUBLE) + 0.5)
                 / (CAST(tot.tb AS DOUBLE) + 0.5 * tot.k))) AS t
  FROM per, tot
)
SELECT CAST(count(*) AS BIGINT) AS n_langs,
       round(sum(t), 6) + 0.0 AS psi,
       CAST(sum(t) > 0.2 AS BIGINT) AS drift_flag
FROM terms
"""

ORACLES["fk_orphans"] = """
SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count_if(o.o_orderkey IS NULL) AS BIGINT) AS n_orphans,
       CAST(count_if(o.o_orderkey IS NULL) AS DOUBLE) / count(*)
         AS orphan_rate
FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
  ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST(count(*) AS BIGINT),
       CAST(count_if(p.p_partkey IS NULL) AS BIGINT),
       CAST(count_if(p.p_partkey IS NULL) AS DOUBLE) / count(*)
FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
  ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST(count(*) AS BIGINT),
       CAST(count_if(s.s_suppkey IS NULL) AS BIGINT),
       CAST(count_if(s.s_suppkey IS NULL) AS DOUBLE) / count(*)
FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
  ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(count(*) AS BIGINT),
       CAST(count_if(c.c_custkey IS NULL) AS BIGINT),
       CAST(count_if(c.c_custkey IS NULL) AS DOUBLE) / count(*)
FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
  ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST(count(*) AS BIGINT),
       CAST(count_if(n.n_nationkey IS NULL) AS BIGINT),
       CAST(count_if(n.n_nationkey IS NULL) AS DOUBLE) / count(*)
FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
  ON c.c_nationkey = n.n_nationkey
"""

# ────────────── round-7 additions ──────────────────

ORACLES["token_len_buckets"] = """
WITH n AS (
  SELECT len(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::BIGINT AS nt
  FROM documents
)
SELECT (1::BIGINT << (length(bin(nt)) - 1)) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS sum_tokens
FROM n GROUP BY 1
"""

ORACLES["smoothed_rates"] = """
WITH per AS (
  SELECT event_type, count(*) AS n, count_if(value > 100.0) AS h
  FROM events GROUP BY 1
), g AS (
  SELECT count(*) AS gn, count_if(value > 100.0) AS gh FROM events
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       CAST(h AS BIGINT) AS n_high,
       CAST(h AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate,
       (CAST(h AS DOUBLE)
        + 5.0 * (CAST(gh AS DOUBLE) / CAST(gn AS DOUBLE)))
       / (CAST(n AS DOUBLE) + 5.0) AS smoothed_rate
FROM per CROSS JOIN g
"""

ORACLES["order_interarrival"] = """
WITH gaps AS (
  SELECT o_orderdate::DATE - lag(o_orderdate::DATE) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS gap
  FROM orders
)
SELECT CASE WHEN gap = 0 THEN '0'
            WHEN gap <= 7 THEN '1-7'
            WHEN gap <= 30 THEN '8-30'
            WHEN gap <= 90 THEN '31-90'
            WHEN gap <= 365 THEN '91-365'
            ELSE '365+' END AS gap_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(CAST(sum(gap) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS avg_gap_days
FROM gaps WHERE gap IS NOT NULL
GROUP BY 1
"""

ORACLES["crosstab_counts"] = """
SELECT o_orderpriority AS priority,
       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS n_p,
       CAST(count(*) AS BIGINT) AS n_total
FROM orders GROUP BY 1
"""

ORACLES["herfindahl"] = """
WITH per_cust AS (
  SELECT c_mktsegment, c_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS r
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), agg AS (
  SELECT c_mktsegment, count(*) AS k, sum(r) AS s, sum(r * r) AS s2
  FROM per_cust GROUP BY 1
)
SELECT c_mktsegment,
       CAST(k AS BIGINT) AS n_customers,
       CAST(s2 AS DOUBLE) / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         AS hhi,
       1.0::DOUBLE
         / (CAST(s2 AS DOUBLE) / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
         AS effective_customers
FROM agg
"""

ORACLES["jaccard_event_types"] = """
WITH s AS (
  SELECT DISTINCT event_type, user_id, strftime(ts, '%Y-%m-%d') AS d
  FROM events
), sizes AS (
  SELECT event_type, count(*) AS n FROM s GROUP BY 1
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS i
  FROM s a JOIN s b
    ON a.user_id = b.user_id AND a.d = b.d
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b,
       CAST(i AS BIGINT) AS n_common,
       CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes na ON na.event_type = type_a
JOIN sizes nb ON nb.event_type = type_b
"""

ORACLES["skew_profile"] = """
WITH f1 AS (SELECT count(*) AS f FROM lineitem GROUP BY l_partkey),
     f2 AS (SELECT count(*) AS f FROM lineitem GROUP BY l_suppkey),
     f3 AS (SELECT count(*) AS f FROM orders GROUP BY o_custkey),
     f4 AS (SELECT count(*) AS f FROM events GROUP BY user_id)
SELECT 'lineitem.l_partkey' AS key_col,
       CAST(sum(f) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(f) AS BIGINT) AS max_freq,
       quantile_cont(CAST(f AS DOUBLE), 0.99) AS p99_freq,
       CAST(max(f) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         / CAST(CAST(sum(f) AS VARCHAR) AS DOUBLE) AS skew_ratio
FROM f1
UNION ALL
SELECT 'lineitem.l_suppkey', CAST(sum(f) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(max(f) AS BIGINT),
       quantile_cont(CAST(f AS DOUBLE), 0.99),
       CAST(max(f) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         / CAST(CAST(sum(f) AS VARCHAR) AS DOUBLE)
FROM f2
UNION ALL
SELECT 'orders.o_custkey', CAST(sum(f) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(max(f) AS BIGINT),
       quantile_cont(CAST(f AS DOUBLE), 0.99),
       CAST(max(f) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         / CAST(CAST(sum(f) AS VARCHAR) AS DOUBLE)
FROM f3
UNION ALL
SELECT 'events.user_id', CAST(sum(f) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(max(f) AS BIGINT),
       quantile_cont(CAST(f AS DOUBLE), 0.99),
       CAST(max(f) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         / CAST(CAST(sum(f) AS VARCHAR) AS DOUBLE)
FROM f4
"""

ORACLES["cuped_adjust"] = """
WITH j AS (
  SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') AS treated,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         CAST(round(c_acctbal * 100) AS BIGINT) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
), g AS (
  SELECT count(*) AS gn,
         CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy
  FROM j
), per AS (
  SELECT treated, count(*) AS pn,
         CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS py,
         CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS px
  FROM j GROUP BY 1
)
SELECT treated,
       CAST(pn AS BIGINT) AS n_orders,
       py / pn / 100.0 AS mean_value,
       px / pn / 100.0 AS mean_covariate,
       (sxy - sx * sy / CAST(gn AS DOUBLE))
         / (sxx - sx * sx / CAST(gn AS DOUBLE)) AS theta,
       py / pn / 100.0
         - (sxy - sx * sy / CAST(gn AS DOUBLE))
           / (sxx - sx * sx / CAST(gn AS DOUBLE))
           * (px / pn / 100.0 - sx / CAST(gn AS DOUBLE) / 100.0)
         AS cuped_mean
FROM per CROSS JOIN g
"""

ORACLES["cramers_v"] = """
WITH obs AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS o
  FROM orders GROUP BY 1, 2
), rowm AS (
  SELECT o_orderpriority, count(*) AS r FROM orders GROUP BY 1
), colm AS (
  SELECT o_orderstatus, count(*) AS c FROM orders GROUP BY 1
), tot AS (SELECT count(*) AS n FROM orders),
cells AS (
  SELECT n,
         o_orderpriority, o_orderstatus,
         CAST(round(
           ((CAST(o AS DOUBLE)
             - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
            ^ 2)
           / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           * 1e6) AS BIGINT) AS mu
  FROM obs JOIN rowm USING (o_orderpriority)
           JOIN colm USING (o_orderstatus)
           CROSS JOIN tot
), agg AS (
  SELECT max(n) AS n,
         count(DISTINCT o_orderpriority) AS nr,
         count(DISTINCT o_orderstatus) AS nc,
         sum(mu) AS summu
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(least(nr - 1, nc - 1) AS BIGINT) AS min_dim,
       CAST(summu AS DOUBLE) / 1e6 AS chi2,
       sqrt((CAST(summu AS DOUBLE) / 1e6)
            / (CAST(n AS DOUBLE) * CAST(least(nr - 1, nc - 1) AS DOUBLE)))
         AS cramers_v
FROM agg
"""

ORACLES["decile_lift"] = """
WITH bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(1, greatest(len(toks), 1))) AS i) gs
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), scores AS (
  SELECT doc_id,
         round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6)
         + 0.0 AS s
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY doc_id
), gate AS (
  SELECT doc_id,
         CAST(NOT (n < 5) AND NOT ((n - nd) * 10 > n * 4)
              AND NOT (ns * 10 > n * 4) AS BIGINT) AS keep
  FROM (
    SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
           len(list_filter(tk,
               t -> list_contains(['the', 'a', 'is', 'of'], t))) AS ns
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents))
), j AS (
  SELECT s.doc_id, s.s, g.keep
  FROM scores s JOIN gate g USING (doc_id)
), t AS (
  SELECT keep, ntile(10) OVER (ORDER BY s, doc_id) AS decile FROM j
), g AS (SELECT count(*) AS gn, sum(keep) AS gk FROM j)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_keep,
       CAST(CAST(sum(keep) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_rate,
       (CAST(CAST(sum(keep) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         / (CAST(max(gk) AS DOUBLE) / CAST(max(gn) AS DOUBLE)) AS lift
FROM t CROSS JOIN g
GROUP BY decile
"""

ORACLES["spearman_corr"] = """
WITH f AS (
  SELECT l_returnflag AS g,
         CAST(l_quantity AS BIGINT) AS xv,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS yv
  FROM lineitem
), xc AS (SELECT g, xv, count(*) AS c FROM f GROUP BY 1, 2),
xr AS (
  SELECT g, xv,
         2 * sum(c) OVER (PARTITION BY g ORDER BY xv
                          ROWS UNBOUNDED PRECEDING) - c + 1 AS r2x
  FROM xc
), yc AS (SELECT g, yv, count(*) AS c FROM f GROUP BY 1, 2),
yr AS (
  SELECT g, yv,
         2 * sum(c) OVER (PARTITION BY g ORDER BY yv
                          ROWS UNBOUNDED PRECEDING) - c + 1 AS r2y
  FROM yc
), ranked AS (
  SELECT f.g, r2x, r2y
  FROM f JOIN xr ON f.g = xr.g AND f.xv = xr.xv
         JOIN yr ON f.g = yr.g AND f.yv = yr.yv
), s AS (
  SELECT g, count(*) AS n,
         CAST(CAST(sum(r2x) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(sum(r2y) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(sum(r2x * r2x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(sum(r2y * r2y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(sum(r2x * r2y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM ranked GROUP BY g
)
SELECT g AS l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
       + 0.0 AS spearman_rho
FROM s
"""

ORACLES["iqr_scale_approx"] = """
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(l_quantity AS BIGINT) AS qty,
       TRUE AS ok_scaled
FROM lineitem
"""


# The readStream twin must reproduce the batch tumbling result
# bit-for-bit (availableNow drain, in-order data): same oracle.
ORACLES["stream_tumbling"] = ORACLES["win_tumbling"]


# ───────────── round-7 cycle-3 oracles (§2.32) ─────────────
# Shared CTE snippets: the lm_score / quality_gate / readability
# sub-queries reused by the fusion/eval/calibration oracles (kept
# textually identical to their standalone oracles above).

_SC_CTE = """
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(range(1, greatest(len(toks), 1))) AS i) gs
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), sc AS (
  SELECT doc_id,
         round(avg(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6)
         + 0.0 AS avg_logprob
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY doc_id
)"""

_KP_CTE = """
qt AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), qf AS (
  SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
         len(list_filter(tk,
             t -> list_contains(['the', 'a', 'is', 'of'], t))) AS ns
  FROM qt
), kp AS (
  SELECT doc_id,
         CAST(NOT (n < 5) AND NOT ((n - nd) * 10 > n * 4)
              AND NOT (ns * 10 > n * 4) AS BIGINT) AS keep
  FROM qf
)"""

_RD_CTE = """
rc AS (
  SELECT doc_id,
         greatest(1, len(list_filter(string_split(text, ' '),
                                     t -> t <> ''))) AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))
           AS sy
  FROM documents
), rd AS (
  SELECT doc_id,
         CAST('206.835' AS DOUBLE)
         - CAST('1.015' AS DOUBLE)
           * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
         - CAST('84.6' AS DOUBLE)
           * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)) AS flesch
  FROM rc
)"""

ORACLES["yoy_growth"] = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(cur.m, '%Y-%m') AS month,
       CAST(cur.rev AS DOUBLE) AS revenue,
       CAST(prev.rev AS DOUBLE) AS prev_year_revenue,
       CAST(cur.rev - prev.rev AS DOUBLE)
         / CAST(prev.rev AS DOUBLE) * 100 AS yoy_pct
FROM monthly cur
LEFT JOIN monthly prev ON cur.m = prev.m + INTERVAL 12 MONTH
"""

ORACLES["rank_change"] = """
WITH yb AS (
  SELECT year(l_shipdate) AS year, p_brand AS brand,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT year, brand, c,
         row_number() OVER (PARTITION BY year
                            ORDER BY c DESC, brand) AS rnk
  FROM yb
)
SELECT CAST(year AS BIGINT) AS year, brand,
       CAST(c AS DOUBLE) / 100 AS revenue,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(lag(rnk) OVER (PARTITION BY brand ORDER BY year)
            AS BIGINT) AS prev_rnk,
       CAST(lag(rnk) OVER (PARTITION BY brand ORDER BY year) - rnk
            AS BIGINT) AS rank_gain
FROM ranked
"""

ORACLES["mk_trend"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r
  FROM orders GROUP BY 1
), s AS (
  SELECT sum(CASE WHEN b.r > a.r THEN 1
                  WHEN b.r < a.r THEN -1 ELSE 0 END) AS s
  FROM daily a JOIN daily b ON a.d < b.d
), nn AS (
  SELECT count(*) AS n FROM daily
), tie AS (
  SELECT sum(t * (t - 1) * (2 * t + 5)) AS tie
  FROM (SELECT count(*) AS t FROM daily GROUP BY r)
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(s AS BIGINT) AS s_stat,
       CAST(n * (n - 1) * (2 * n + 5) - tie AS DOUBLE) / 18 AS var_s,
       CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                 / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie AS DOUBLE) / 18)
            WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                 / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie AS DOUBLE) / 18)
            ELSE 0.0 END AS z,
       CASE WHEN (CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie
                                   AS DOUBLE) / 18)
                       WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie
                                   AS DOUBLE) / 18)
                       ELSE 0.0 END) > 1.959964 THEN 'increasing'
            WHEN (CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie
                                   AS DOUBLE) / 18)
                       WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie
                                   AS DOUBLE) / 18)
                       ELSE 0.0 END) < -1.959964 THEN 'decreasing'
            ELSE 'no trend' END AS trend
FROM s CROSS JOIN nn CROSS JOIN tie
"""

ORACLES["cusum_shift"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS x FROM events GROUP BY 1
), seq AS (
  SELECT d, x, row_number() OVER (ORDER BY d) AS t,
         sum(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily
), tot AS (
  SELECT sum(x) AS total, count(*) AS n FROM daily
), scored AS (
  SELECT d, t, cum, n, total, abs(n * cum - t * total) AS absc
  FROM seq CROSS JOIN tot
  WHERE t < n
)
SELECT CAST(n AS BIGINT) AS n_days,
       strftime(d, '%Y-%m-%d') AS shift_day,
       CAST(absc AS DOUBLE) / CAST(n AS DOUBLE) AS max_abs_cusum,
       CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) AS pre_mean,
       CAST(total - cum AS DOUBLE) / CAST(n - t AS DOUBLE) AS post_mean
FROM scored
ORDER BY absc DESC, d LIMIT 1
"""

ORACLES["rrf_fusion"] = f"""
WITH {_SC_CTE}, {_RD_CTE},
r1 AS (
  SELECT doc_id, row_number() OVER (ORDER BY avg_logprob DESC, doc_id)
         AS rank_lm
  FROM sc
), r2 AS (
  SELECT doc_id, row_number() OVER (ORDER BY flesch DESC, doc_id)
         AS rank_read
  FROM rd
)
SELECT doc_id,
       CAST(rank_lm AS BIGINT) AS rank_lm,
       CAST(rank_read AS BIGINT) AS rank_read,
       1.0 / (60.0 + rank_lm) + 1.0 / (60.0 + rank_read) AS rrf
FROM r1 JOIN r2 USING (doc_id)
"""

ORACLES["ndcg_eval"] = f"""
WITH {_SC_CTE}, {_KP_CTE},
j AS (
  SELECT sc.doc_id, avg_logprob, keep, lang
  FROM sc JOIN kp USING (doc_id)
  JOIN documents USING (doc_id)
), rankd AS (
  SELECT lang, keep,
         row_number() OVER (PARTITION BY lang
                            ORDER BY avg_logprob DESC, doc_id) AS r1,
         row_number() OVER (PARTITION BY lang
                            ORDER BY keep DESC, avg_logprob DESC,
                                     doc_id) AS r2
  FROM j
), scored AS (
  SELECT lang, keep,
         CASE WHEN r1 <= 20
              THEN CAST(round(1000000.0 * keep / log2(r1 + 1))
                        AS BIGINT) ELSE 0 END AS g,
         CASE WHEN r2 <= 20
              THEN CAST(round(1000000.0 * keep / log2(r2 + 1))
                        AS BIGINT) ELSE 0 END AS ig
  FROM rankd
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CAST(sum(g) AS VARCHAR) AS DOUBLE) / 1000000.0 AS dcg20,
       CAST(CAST(sum(ig) AS VARCHAR) AS DOUBLE) / 1000000.0 AS idcg20,
       CASE WHEN sum(ig) > 0
            THEN CAST(CAST(sum(g) AS VARCHAR) AS DOUBLE) / CAST(CAST(sum(ig) AS VARCHAR) AS DOUBLE)
            END AS ndcg20
FROM scored GROUP BY lang
"""

ORACLES["calibration_ece"] = f"""
WITH {_SC_CTE}, {_KP_CTE},
j AS (
  SELECT sc.doc_id, avg_logprob, keep FROM sc JOIN kp USING (doc_id)
), mm AS (
  SELECT min(avg_logprob) AS mn, max(avg_logprob) AS mx FROM j
), pu AS (
  SELECT CAST(round(1000000.0 * (avg_logprob - mn) / (mx - mn))
              AS BIGINT) AS pu,
         keep
  FROM j CROSS JOIN mm
)
SELECT CAST(least(floor(pu / 100000), 9) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CAST(sum(pu) AS VARCHAR) AS DOUBLE) / 1000000.0
         / CAST(count(*) AS DOUBLE) AS avg_conf,
       CAST(CAST(sum(keep) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_rate,
       abs(CAST(CAST(sum(keep) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           - CAST(CAST(sum(pu) AS VARCHAR) AS DOUBLE) / 1000000.0
             / CAST(count(*) AS DOUBLE)) AS gap
FROM pu GROUP BY 1
"""

ORACLES["partial_corr"] = """
WITH e AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(round(l_discount * 10000) AS BIGINT) AS z
  FROM lineitem
), s AS (
  SELECT count(*) AS n,
         CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx, CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(sum(z) AS VARCHAR) AS DOUBLE) AS sz,
         CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(sum(y * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(sum(z * z) AS VARCHAR) AS DOUBLE) AS szz,
         CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(sum(x * z) AS VARCHAR) AS DOUBLE) AS sxz,
         CAST(CAST(sum(y * z) AS VARCHAR) AS DOUBLE) AS syz
  FROM e
), r AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - sx * sy)
         / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                * (CAST(n AS DOUBLE) * syy - sy * sy)) AS r_xy,
         (CAST(n AS DOUBLE) * sxz - sx * sz)
         / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                * (CAST(n AS DOUBLE) * szz - sz * sz)) AS r_xz,
         (CAST(n AS DOUBLE) * syz - sy * sz)
         / sqrt((CAST(n AS DOUBLE) * syy - sy * sy)
                * (CAST(n AS DOUBLE) * szz - sz * sz)) AS r_yz
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_rows,
       round(r_xy, 6) AS r_xy, round(r_xz, 6) AS r_xz,
       round(r_yz, 6) AS r_yz,
       round((r_xy - r_xz * r_yz)
             / sqrt((1 - r_xz * r_xz) * (1 - r_yz * r_yz)), 6)
         AS r_xy_given_z
FROM r
"""

ORACLES["srm_check"] = """
WITH u AS (
  SELECT DISTINCT user_id,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant
  FROM events
), c AS (
  SELECT count_if(variant = 'A') AS na,
         count_if(variant = 'B') AS nb
  FROM u
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST((na - nb) * (na - nb) AS DOUBLE)
         / CAST(na + nb AS DOUBLE) AS chi2,
       CAST((na - nb) * (na - nb) AS DOUBLE)
         / CAST(na + nb AS DOUBLE) > 3.841459 AS srm_detected
FROM c
"""

ORACLES["km_survival"] = """
WITH gaps AS (
  SELECT CAST(o_orderdate AS DATE)
         - lag(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS t
  FROM orders
), obs AS (
  SELECT t, 1 AS d FROM gaps WHERE t IS NOT NULL
), cens AS (
  SELECT (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)
         - max(CAST(o_orderdate AS DATE)) AS t,
         0 AS d
  FROM orders GROUP BY o_custkey
), allt AS (
  SELECT * FROM obs UNION ALL SELECT * FROM cens
), at_t AS (
  SELECT t, count(*) AS c, sum(d) AS d FROM allt GROUP BY t
), risk AS (
  SELECT t, d,
         sum(c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n
  FROM at_t
), ev AS (
  SELECT t, d, n,
         CASE WHEN n > d
              THEN CAST(round(1000000.0
                   * ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)))
                   AS BIGINT)
              ELSE 0 END AS lu,
         min(n - d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
           AS minleft
  FROM risk WHERE d > 0
)
SELECT CAST(t AS BIGINT) AS gap_days,
       CAST(n AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CASE WHEN minleft = 0 THEN 0.0
            ELSE round(exp(CAST(CAST(sum(lu) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE)
                 / 1000000.0), 6) + 0.0 END AS survival
FROM ev
"""

ORACLES["poisson_rate_test"] = """
WITH span AS (
  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
  FROM events
), m AS (
  SELECT lo, hi,
         lo + CAST(floor((hi - lo) / 2) AS INTEGER) AS mid
  FROM span
), c AS (
  SELECT count_if(CAST(ts AS DATE) <= mid) AS n1,
         count_if(CAST(ts AS DATE) > mid) AS n2
  FROM events CROSS JOIN m
)
SELECT CAST((mid - lo) + 1 AS BIGINT) AS days_1,
       CAST(hi - mid AS BIGINT) AS days_2,
       CAST(n1 AS BIGINT) AS n_1,
       CAST(n2 AS BIGINT) AS n_2,
       CAST(n1 AS DOUBLE) / CAST((mid - lo) + 1 AS DOUBLE) AS rate_1,
       CAST(n2 AS DOUBLE) / CAST(hi - mid AS DOUBLE) AS rate_2,
       (CAST(n1 AS DOUBLE) / CAST((mid - lo) + 1 AS DOUBLE)
        - CAST(n2 AS DOUBLE) / CAST(hi - mid AS DOUBLE))
       / sqrt(CAST(n1 AS DOUBLE)
                / CAST(((mid - lo) + 1) * ((mid - lo) + 1) AS DOUBLE)
              + CAST(n2 AS DOUBLE)
                / CAST((hi - mid) * (hi - mid) AS DOUBLE)) AS z
FROM c CROSS JOIN m
"""

ORACLES["session_depth_hist"] = """
WITH marked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w))
                      >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
), depth AS (
  SELECT user_id, session_seq, count(*)::BIGINT AS depth
  FROM sess GROUP BY 1, 2
)
SELECT (1::BIGINT << (length(bin(depth)) - 1)) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(depth) AS BIGINT) AS sum_events,
       CAST(max(depth) AS BIGINT) AS max_depth
FROM depth GROUP BY 1
"""

# The readStream twin must reproduce the batch sliding result
# bit-for-bit (availableNow drain, in-order data): same oracle.
ORACLES["stream_sliding"] = ORACLES["win_sliding"]


# ───────────── round-7 cycle-4 oracles (§2.33) ─────────────

ORACLES["ses_forecast"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r
  FROM orders GROUP BY 1
), seq AS (
  SELECT r, row_number() OVER (ORDER BY d) AS i FROM daily
), nn AS (
  SELECT count(*) AS n FROM daily
)
SELECT CAST(max(n) AS BIGINT) AS n_days,
       CAST(max(CASE WHEN i = n THEN r END) AS DOUBLE) / 100
         AS last_revenue,
       CAST(CAST(sum(CAST(round(
             (CASE WHEN i = 1 THEN power(0.7, n - 1)
                   ELSE 0.3 * power(0.7, n - i) END) * r)
           AS BIGINT)) AS VARCHAR) AS DOUBLE) / 100 AS ses_level
FROM seq CROSS JOIN nn
"""

ORACLES["theil_sen"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r
  FROM orders GROUP BY 1
), d0 AS (
  SELECT min(d) AS d0 FROM daily
), idx AS (
  SELECT d - d0 AS x, r FROM daily CROSS JOIN d0
), sl AS (
  SELECT count(*) AS n_pairs,
         quantile_cont(CAST(b.r - a.r AS DOUBLE)
                       / CAST(b.x - a.x AS DOUBLE), 0.5) AS m
  FROM idx a JOIN idx b ON a.x < b.x
)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       m AS slope_cents_per_day,
       quantile_cont(CAST(r AS DOUBLE) - m * x, 0.5) AS intercept_cents
FROM idx CROSS JOIN sl
GROUP BY n_pairs, m
"""

ORACLES["bootstrap_ci"] = """
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_orderkey, b
  FROM orders CROSS JOIN (SELECT unnest(range(1, 21)) AS b) g
), wt AS (
  SELECT b, c,
         CASE
           WHEN substring(md5(concat_ws(':',
                CAST(o_orderkey AS VARCHAR), CAST(b AS VARCHAR))),
                1, 15) < '5e2d58d8b3bce00' THEN 0
           WHEN substring(md5(concat_ws(':',
                CAST(o_orderkey AS VARCHAR), CAST(b AS VARCHAR))),
                1, 15) < 'bc5ab1b16779c00' THEN 1
           WHEN substring(md5(concat_ws(':',
                CAST(o_orderkey AS VARCHAR), CAST(b AS VARCHAR))),
                1, 15) < 'eb715e1dc158300' THEN 2
           WHEN substring(md5(concat_ws(':',
                CAST(o_orderkey AS VARCHAR), CAST(b AS VARCHAR))),
                1, 15) < 'fb23979734a2580' THEN 3
           WHEN substring(md5(concat_ws(':',
                CAST(o_orderkey AS VARCHAR), CAST(b AS VARCHAR))),
                1, 15) < 'ff1025f59174e00' THEN 4
           ELSE 5 END AS w
  FROM base
), per_b AS (
  SELECT b, sum(w * c) AS s, sum(w) AS n FROM wt GROUP BY b
), boots AS (
  SELECT count(*) AS n_boot,
         quantile_cont(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100,
                       0.025) AS ci_lo,
         quantile_cont(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100,
                       0.975) AS ci_hi
  FROM per_b
), point AS (
  SELECT CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 100 AS mean_price
  FROM orders
)
SELECT mean_price, ci_lo, ci_hi, CAST(n_boot AS BIGINT) AS n_boot
FROM point CROSS JOIN boots
"""

ORACLES["power_analysis"] = """
WITH e AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
), s AS (
  SELECT count(*) AS n,
         CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(sum(c * c) AS VARCHAR) AS DOUBLE) AS s2
  FROM e
)
SELECT CAST(n AS BIGINT) AS n_orders,
       (s / CAST(n AS DOUBLE)) / 100 AS mean_price,
       sqrt((s2 - s * s / CAST(n AS DOUBLE))
            / (CAST(n AS DOUBLE) - 1)) / 100 AS sd_price,
       (0.05 * (s / CAST(n AS DOUBLE))) / 100 AS mde_price,
       CAST(ceil(2.801585 * 2.801585 * 2
                 * ((s2 - s * s / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1))
                 / ((0.05 * (s / CAST(n AS DOUBLE)))
                    * (0.05 * (s / CAST(n AS DOUBLE)))))
            AS BIGINT) AS n_per_arm
FROM s
"""

ORACLES["degree_hist"] = """
WITH deg AS (
  SELECT o_custkey, count(*)::BIGINT AS deg FROM (
    SELECT DISTINCT o_custkey, l_partkey
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  ) GROUP BY 1
)
SELECT (1::BIGINT << (length(bin(deg)) - 1)) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(deg) AS BIGINT) AS sum_degree,
       CAST(max(deg) AS BIGINT) AS max_degree
FROM deg GROUP BY 1
"""

ORACLES["lsh_tuning_curve"] = """
WITH g AS (
  SELECT unnest(range(1, 20)) AS id
), c AS (
  SELECT CAST(id AS DOUBLE) * 0.05 AS s FROM g
), e AS (
  SELECT s, 1.0 - s * s * s * s AS inr FROM c
), e2 AS (
  SELECT s, inr * inr AS i2 FROM e
), e4 AS (
  SELECT s, i2 * i2 AS i4 FROM e2
)
SELECT s, 1.0 - i4 * i4 AS p_candidate,
       8::BIGINT AS bands, 4::BIGINT AS rows_per_band
FROM e4
"""

# Third readStream twin: session windows, sharing the batch oracle.
ORACLES["stream_session"] = ORACLES["win_session"]


# ───────────── round-7 cycle-5 oracles (§2.34) ─────────────

ORACLES["shingle_novelty"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh0 AS (
  SELECT doc_id,
         concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]) AS sh
  FROM t, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 1, 1)))
                   AS i) g
), sh AS (
  SELECT DISTINCT doc_id, sh FROM sh0
), own AS (
  SELECT sh, min(doc_id) AS own FROM sh GROUP BY sh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count_if(own = doc_id) AS BIGINT) AS n_novel,
       CAST(count_if(own = doc_id) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novelty_frac
FROM sh JOIN own USING (sh)
GROUP BY doc_id
"""

ORACLES["lateness_profile"] = """
WITH l AS (
  SELECT CAST(max(floor(epoch(ts))) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING)
         - floor(epoch(ts)) AS BIGINT) AS late
  FROM events
)
SELECT CASE WHEN late = 0 THEN CAST(-1 AS BIGINT)
            ELSE (1::BIGINT << (length(bin(late)) - 1)) END
         AS bucket_lo_sec,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(late) AS BIGINT) AS max_lateness_sec
FROM l GROUP BY 1
"""

ORACLES["neyman_alloc"] = """
WITH e AS (
  SELECT c_mktsegment, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
), per AS (
  SELECT c_mktsegment, count(*) AS n,
         CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(sum(c * c) AS VARCHAR) AS DOUBLE) AS s2
  FROM e GROUP BY 1
), w AS (
  SELECT c_mktsegment, n,
         sqrt((s2 - s * s / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1)) AS sd,
         CAST(round(CAST(n AS DOUBLE)
              * sqrt((s2 - s * s / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1))) AS BIGINT) AS u
  FROM per
), tot AS (
  SELECT sum(u) AS tot FROM w
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n_rows,
       sd / 100 AS sd_price,
       CAST(round(10000.0 * CAST(u AS DOUBLE) / CAST(tot AS DOUBLE))
            AS BIGINT) AS alloc_rows
FROM w CROSS JOIN tot
"""

ORACLES["seasonal_index"] = """
WITH per AS (
  SELECT month(o_orderdate) AS month,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r,
         count(DISTINCT CAST(o_orderdate AS DATE)) AS days
  FROM orders GROUP BY 1
), g AS (
  SELECT sum(r) AS gr, sum(days) AS gd FROM per
)
SELECT CAST(month AS BIGINT) AS month,
       CAST(days AS BIGINT) AS n_days,
       (CAST(r AS DOUBLE) / CAST(days AS DOUBLE)) / 100
         AS avg_daily_revenue,
       (CAST(r AS DOUBLE) / CAST(days AS DOUBLE))
         / (CAST(gr AS DOUBLE) / CAST(gd AS DOUBLE)) AS seasonal_index
FROM per CROSS JOIN g
"""

ORACLES["share_of_parent"] = """
WITH agg AS (
  SELECT r_name AS region, n_name AS nation,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       CAST(c AS DOUBLE) / 100 AS revenue,
       CAST(c AS DOUBLE)
         / CAST(CAST(sum(c) OVER (PARTITION BY region) AS VARCHAR) AS DOUBLE)
         AS share_of_region
FROM agg
"""

ORACLES["fulfillment_latency"] = """
WITH l AS (
  SELECT o_orderpriority AS priority,
         CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS lat
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(CAST(sum(lat) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_days,
       quantile_cont(CAST(lat AS DOUBLE), 0.5) AS p50_days,
       quantile_cont(CAST(lat AS DOUBLE), 0.9) AS p90_days,
       CAST(max(lat) AS BIGINT) AS max_days
FROM l GROUP BY 1
"""


# ───────────── round-7 cycle-6 oracles (§2.35) ─────────────

ORACLES["target_encode_loo"] = """
WITH e AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), g AS (
  SELECT o_orderpriority, sum(c) AS s, count(*) AS n
  FROM e GROUP BY 1
)
SELECT o_orderkey, o_orderpriority,
       CAST(c AS DOUBLE) / 100 AS price,
       CASE WHEN n > 1
            THEN (CAST(s AS DOUBLE) - CAST(c AS DOUBLE))
                 / CAST(n - 1 AS DOUBLE) / 100 END AS loo_mean_price
FROM e JOIN g USING (o_orderpriority)
"""

ORACLES["session_conversion"] = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w))
                      >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), per AS (
  SELECT user_id, sid,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM sess GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(v) AS BIGINT) AS n_view_sessions,
       CAST(sum(v * p) AS BIGINT) AS n_converted,
       CAST(CAST(sum(v * p) AS VARCHAR) AS DOUBLE) / CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE)
         AS conversion_rate
FROM per
"""

ORACLES["hour_dow_heatmap"] = """
WITH per AS (
  SELECT dayofweek(ts) AS dow, hour(ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(hour AS BIGINT) AS hour,
       CAST(n AS BIGINT) AS n_events,
       CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER () AS VARCHAR) AS DOUBLE) AS share
FROM per
"""

ORACLES["col_entropy_profile"] = """
WITH
p1 AS (SELECT o_orderpriority AS v FROM orders),
p2 AS (SELECT o_orderstatus AS v FROM orders),
p3 AS (SELECT c_mktsegment AS v FROM customer),
p4 AS (SELECT n_name AS v FROM nation),
p5 AS (SELECT event_type AS v FROM events)
SELECT 'orders.o_orderpriority' AS column_name,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0
         AS entropy_nats
FROM (SELECT v, count(*) AS c FROM p1 GROUP BY v)
UNION ALL
SELECT 'orders.o_orderstatus', CAST(sum(c) AS BIGINT),
       CAST(count(*) AS BIGINT),
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0
FROM (SELECT v, count(*) AS c FROM p2 GROUP BY v)
UNION ALL
SELECT 'customer.c_mktsegment', CAST(sum(c) AS BIGINT),
       CAST(count(*) AS BIGINT),
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0
FROM (SELECT v, count(*) AS c FROM p3 GROUP BY v)
UNION ALL
SELECT 'nation.n_name', CAST(sum(c) AS BIGINT),
       CAST(count(*) AS BIGINT),
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0
FROM (SELECT v, count(*) AS c FROM p4 GROUP BY v)
UNION ALL
SELECT 'events.event_type', CAST(sum(c) AS BIGINT),
       CAST(count(*) AS BIGINT),
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) + 0.0
FROM (SELECT v, count(*) AS c FROM p5 GROUP BY v)
"""

ORACLES["quantile_normalize"] = """
WITH v AS (
  SELECT l_orderkey, l_linenumber, l_returnflag AS g,
         CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem
), rg AS (
  SELECT l_orderkey, l_linenumber, g, v,
         row_number() OVER (PARTITION BY g
                            ORDER BY v, l_orderkey, l_linenumber) AS r
  FROM v
), cnt AS (
  SELECT g, count(*) AS ng FROM v GROUP BY g
), nn AS (
  SELECT count(*) AS nt FROM v
), gv AS (
  SELECT v AS qnorm_v,
         row_number() OVER (ORDER BY v, l_orderkey, l_linenumber) AS ri
  FROM v
), idx AS (
  -- materialize the integer index BEFORE the lookup join: an ON
  -- clause that computes the key from three relations inline makes
  -- DuckDB fall back to a nested-loop join (O(N²) — ~an hour at
  -- sf0.1); on a plain column equality it hash-joins (linear)
  SELECT a.l_orderkey, a.l_linenumber, a.g, a.v,
         CAST(round(
             (CASE WHEN ng > 1
                   THEN CAST(a.r - 1 AS DOUBLE) / CAST(ng - 1 AS DOUBLE)
                   ELSE 0.0 END) * CAST(nt - 1 AS DOUBLE)) AS BIGINT)
           + 1 AS _idx
  FROM rg a JOIN cnt USING (g) CROSS JOIN nn
)
SELECT i.l_orderkey, i.l_linenumber, i.g, i.v, gv.qnorm_v
FROM idx i JOIN gv ON gv.ri = i._idx
"""


# ───────────── round-7 cycle-7 oracles (§2.36) ─────────────

ORACLES["lang_confusion"] = f"""
SELECT lang, lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS DOUBLE)
         / CAST(CAST(sum(count(*)) OVER (PARTITION BY lang) AS VARCHAR) AS DOUBLE)
         AS row_share
FROM ({ORACLES['lang_id']}) L
GROUP BY lang, lang_pred
"""

ORACLES["heaps_curve"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), per_doc AS (
  SELECT doc_id, len(toks)::BIGINT AS nt FROM t
), tok AS (
  SELECT DISTINCT doc_id, tk
  FROM (SELECT doc_id, unnest(toks) AS tk FROM t)
), own AS (
  SELECT tk, min(doc_id) AS doc_id FROM tok GROUP BY tk
), own_cnt AS (
  SELECT doc_id, count(*) AS nv FROM own GROUP BY doc_id
), ranked AS (
  SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS decile
  FROM documents
), per_dec AS (
  SELECT decile, count(*) AS n_docs, sum(nt) AS td,
         sum(coalesce(nv, 0)) AS vd
  FROM ranked JOIN per_doc USING (doc_id)
  LEFT JOIN own_cnt USING (doc_id)
  GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(sum(td) OVER w AS BIGINT) AS tokens_cum,
       CAST(sum(vd) OVER w AS BIGINT) AS vocab_cum,
       round(ln(CAST(CAST(sum(vd) OVER w AS VARCHAR) AS DOUBLE))
             / ln(CAST(CAST(sum(td) OVER w AS VARCHAR) AS DOUBLE)), 6) + 0.0
         AS heaps_ratio
FROM per_dec
WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
"""

ORACLES["xyz_class"] = """
WITH span AS (
  SELECT min(CAST(l_shipdate AS DATE)) AS d0,
         max(CAST(l_shipdate AS DATE)) AS d1
  FROM lineitem
), weekly AS (
  SELECT l_partkey,
         floor((CAST(l_shipdate AS DATE) - d0) / 7.0) AS wk,
         sum(CAST(round(l_quantity) AS BIGINT)) AS q,
         max(floor((d1 - d0) / 7.0) + 1) AS w
  FROM lineitem CROSS JOIN span
  GROUP BY 1, 2
), per AS (
  SELECT l_partkey, CAST(max(w) AS DOUBLE) AS W,
         CAST(CAST(sum(q) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(sum(q * q) AS VARCHAR) AS DOUBLE) AS s2
  FROM weekly GROUP BY 1
), cv AS (
  SELECT CASE WHEN sqrt((s2 - s * s / W) / (W - 1)) / (s / W) < 0.5
              THEN 'X'
              WHEN sqrt((s2 - s * s / W) / (W - 1)) / (s / W) < 1.0
              THEN 'Y'
              ELSE 'Z' END AS xyz_class,
         CAST(round((sqrt((s2 - s * s / W) / (W - 1)) / (s / W))
                    * 1000000.0) AS BIGINT) AS cvu
  FROM per
)
SELECT xyz_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(CAST(sum(cvu) AS VARCHAR) AS DOUBLE) / 1000000.0
         / CAST(count(*) AS DOUBLE) AS avg_cv
FROM cv GROUP BY 1
"""

ORACLES["pareto_knee"] = """
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS c
  FROM lineitem GROUP BY 1
), r AS (
  SELECT l_partkey, c,
         row_number() OVER (ORDER BY c DESC, l_partkey) AS i,
         sum(c) OVER (ORDER BY c DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM rev
), t AS (
  SELECT sum(c) AS tot, count(*) AS n FROM rev
)
SELECT CAST(n AS BIGINT) AS n_parts,
       CAST(i AS BIGINT) AS knee_rank,
       CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS knee_cum_share,
       CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
         - CAST(i AS DOUBLE) / CAST(n AS DOUBLE) AS knee_gap
FROM r CROSS JOIN t
ORDER BY (CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
          - CAST(i AS DOUBLE) / CAST(n AS DOUBLE)) DESC, i
LIMIT 1
"""

ORACLES["wilson_daily_error"] = """
WITH per AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         count(*) AS n, count_if(event_type = 'error') AS e
  FROM events GROUP BY 1
)
SELECT day,
       CAST(n AS BIGINT) AS n_events,
       CAST(e AS BIGINT) AS n_errors,
       CAST(e AS DOUBLE) / CAST(n AS DOUBLE) AS err_rate,
       (CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
        + 1.959964 * 1.959964 / (2 * CAST(n AS DOUBLE)))
       / (1 + 1.959964 * 1.959964 / CAST(n AS DOUBLE))
       - 1.959964 * sqrt(
           CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
           * (1 - CAST(e AS DOUBLE) / CAST(n AS DOUBLE))
           / CAST(n AS DOUBLE)
           + 1.959964 * 1.959964
             / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         / (1 + 1.959964 * 1.959964 / CAST(n AS DOUBLE)) AS ci_lo,
       (CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
        + 1.959964 * 1.959964 / (2 * CAST(n AS DOUBLE)))
       / (1 + 1.959964 * 1.959964 / CAST(n AS DOUBLE))
       + 1.959964 * sqrt(
           CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
           * (1 - CAST(e AS DOUBLE) / CAST(n AS DOUBLE))
           / CAST(n AS DOUBLE)
           + 1.959964 * 1.959964
             / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         / (1 + 1.959964 * 1.959964 / CAST(n AS DOUBLE)) AS ci_hi
FROM per
"""


# ───────────── round-7 cycle-8 oracles (§2.37) ─────────────

ORACLES["returns_impact"] = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_returned,
       CAST(count_if(l_returnflag = 'R') AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS return_rate,
       CAST(CAST(sum(CASE WHEN l_returnflag = 'R'
                     THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE) AS returned_revenue_share
FROM lineitem GROUP BY 1
"""

ORACLES["discount_bands"] = """
SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS VARCHAR) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_qty,
       CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 100 AS avg_line_revenue
FROM lineitem GROUP BY 1
"""

ORACLES["clv_summary"] = """
WITH e AS (
  SELECT c_mktsegment, c_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
), per AS (
  SELECT c_mktsegment, count(DISTINCT c_custkey) AS nc,
         count(*) AS no, CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) AS s
  FROM e GROUP BY 1
)
SELECT c_mktsegment,
       CAST(nc AS BIGINT) AS n_customers,
       CAST(no AS BIGINT) AS n_orders,
       s / CAST(no AS DOUBLE) / 100 AS aov,
       CAST(no AS DOUBLE) / CAST(nc AS DOUBLE) AS orders_per_customer,
       (s / CAST(no AS DOUBLE) / 100)
         * (CAST(no AS DOUBLE) / CAST(nc AS DOUBLE)) * 0.3
         AS clv_margin30
FROM per
"""

ORACLES["max_drawdown"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r
  FROM orders GROUP BY 1
), seq AS (
  SELECT d, sum(r) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
         count(*) OVER () AS n
  FROM daily
), scored AS (
  SELECT d, n, cum,
         max(cum) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) - cum
           AS dd
  FROM seq
)
SELECT CAST(n AS BIGINT) AS n_days,
       strftime(d, '%Y-%m-%d') AS trough_day,
       CAST(dd AS DOUBLE) / 100 AS max_drawdown,
       CAST(cum AS DOUBLE) / 100 AS cum_at_trough
FROM scored ORDER BY dd DESC, d LIMIT 1
"""

ORACLES["supply_risk"] = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_quantity) AS BIGINT)) AS q
  FROM lineitem GROUP BY 1, 2
), per AS (
  SELECT l_partkey, count(*) AS k, sum(q) AS s, sum(q * q) AS s2
  FROM ps GROUP BY 1
), h AS (
  SELECT k,
         CAST(round((CAST(s2 AS DOUBLE)
              / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
              * 1000000.0) AS BIGINT) AS hu
  FROM per
)
SELECT CAST(k AS BIGINT) AS n_suppliers,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(CAST(sum(hu) AS VARCHAR) AS DOUBLE) / 1000000.0
         / CAST(count(*) AS DOUBLE) AS avg_hhi
FROM h GROUP BY 1
"""


# ───────────── round-7 cycle-9 oracles (§2.38) ─────────────

ORACLES["orders_per_customer_hist"] = """
WITH per AS (
  SELECT o_custkey, count(*)::BIGINT AS k FROM orders GROUP BY 1
)
SELECT (1::BIGINT << (length(bin(k)) - 1)) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(k) AS BIGINT) AS n_orders,
       CAST(count_if(k >= 2) AS BIGINT) AS n_repeat
FROM per GROUP BY 1
"""

ORACLES["price_dispersion"] = """
WITH e AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)
           AS u
  FROM lineitem
), per AS (
  SELECT l_partkey, count(*) AS n,
         CAST(CAST(sum(u) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(sum(u * u) AS VARCHAR) AS DOUBLE) AS s2
  FROM e GROUP BY 1
  HAVING count(*) >= 2
), cv AS (
  SELECT sqrt((s2 - s * s / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1))
         / (s / CAST(n AS DOUBLE)) AS cv
  FROM per
)
SELECT CASE WHEN cv < 0.01 THEN 'stable'
            WHEN cv < 0.10 THEN 'minor'
            WHEN cv < 0.25 THEN 'loose'
            ELSE 'erratic' END AS dispersion_band,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(CAST(sum(CAST(round(cv * 1000000.0) AS BIGINT)) AS VARCHAR) AS DOUBLE)
         / 1000000.0 / CAST(count(*) AS DOUBLE) AS avg_cv
FROM cv GROUP BY 1
"""

ORACLES["part_introduction"] = """
WITH first AS (
  SELECT l_partkey, min(year(l_shipdate)) AS y
  FROM lineitem GROUP BY 1
), per AS (
  SELECT CAST(y AS BIGINT) AS year, count(*) AS new
  FROM first GROUP BY 1
)
SELECT year,
       CAST(new AS BIGINT) AS n_new_parts,
       CAST(sum(new) OVER (ORDER BY year ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS catalog_cum
FROM per
"""

ORACLES["lines_per_order_trend"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) AS DOUBLE)
         / CAST(count(DISTINCT o_orderkey) AS DOUBLE)
         AS lines_per_order
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""

ORACLES["region_share_trend"] = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year, r_name AS region,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT year, region,
       CAST(c AS DOUBLE) / 100 AS revenue,
       CAST(c AS DOUBLE)
         / CAST(CAST(sum(c) OVER (PARTITION BY year) AS VARCHAR) AS DOUBLE)
         AS share_of_year
FROM agg
"""

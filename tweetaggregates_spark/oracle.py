"""DuckDB oracle twins for every ``__spark_entry__.queries()`` entry.

Factored out of the entry file (VERDICT r11 #8 — pure refactor): the
driver still calls ``__spark_entry__.oracle_sql()``, which re-exports
``oracle_sql`` from here unchanged. Twin-building conventions
(determinism contract, aliasing, DECIMAL routing) are documented in
the entry file's module docstring; the shared SQL fragments below are
generated from the SAME constants the Spark operators use
(functions/textstats, functions/hashing) so the engines cannot drift.
"""

from __future__ import annotations

from tweetaggregates_spark.functions.textstats import (
    LANG_PRED_THRESHOLD,
    LANG_STOPWORDS,
)
from tweetaggregates_spark.plans import events as ev

# DuckDB fragment: explode each event into the 10 hopping windows
# (10 min size / 1 min hop) covering it; window_time = window end.
_HOP = """
  SELECT e.*, date_trunc('minute', e.ts) - (g.k * INTERVAL '1 minute')
              + INTERVAL '10 minutes' AS window_time
  FROM events e CROSS JOIN (SELECT unnest(range(10)) AS k) g
"""

# DuckDB twins of the portable text/hash primitives
# (functions/hashing.py, functions/textstats.py — verified identical).
_D_HASH = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
_D_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_D_SH3 = "[array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]"
_D_SH4 = "[array_to_string(toks[i:i+3], ' ') for i in range(1, len(toks) - 2)]"

_D_SHINGLES = f"""
  WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
  sh AS (SELECT doc_id, unnest(list_distinct({_D_SH3})) AS shingle FROM toksrc)
"""

# multi-language lang-id fragments, generated from the SAME stopword
# sets the Spark operator uses (functions/textstats.LANG_STOPWORDS)
_LANG_RATIO_COLS = ",\n".join(
    "round(len(list_filter(toks, x -> list_contains(["
    + ",".join(f"'{w}'" for w in words)
    + f"], x))) / greatest(len(toks), 1), 6) AS {lang}_stop_ratio"
    for lang, words in LANG_STOPWORDS.items()
)
_LANG_RATIO_NAMES = ", ".join(f"{lang}_stop_ratio" for lang in LANG_STOPWORDS)
_LANG_BEST = "greatest(" + _LANG_RATIO_NAMES + ")"
_LANG_PRED_WHENS = "\n".join(
    f"WHEN {lang}_stop_ratio = {_LANG_BEST} THEN '{lang}'"
    for lang in LANG_STOPWORDS
)

# two 60-bit hashes per md5 (hex chars [1,15] and [16,30]) — mirrors
# functions.hashing.seeded_hash64_pair
_MINHASH_MINS = ",\n".join(
    f"min((('0x' || substr(md5(concat('{i // 2}:', shingle)), "
    f"{1 if i % 2 == 0 else 16}, 15))::BIGINT)) AS mh{i}"
    for i in range(16)
)
_BAND_SELECTS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band_id, concat_ws(':', "
    + ", ".join(f"mh{b * 4 + r}" for r in range(4))
    + ") AS band_key FROM sig"
    for b in range(4)
)

_SIMHASH_SUMS = ",\n".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(16)
)
_SIMHASH_VAL = " + ".join(
    f"(CASE WHEN s{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
)

# production-width twin: 32-bit fingerprint (max value 2^32-1, well
# inside BIGINT) for the banded entry's oracle
_SIMHASH_SUMS32 = ",\n".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(32)
)
_SIMHASH_VAL32 = " + ".join(
    f"(CASE WHEN s{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
)

_D_COS = (
    "round(list_dot_product(q.v, c.v) / "
    "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)"
)

# the 'lshaudit' 20% hash-sample predicate (operators/sampling.
# hash_sample replayed) — shared by every sampled-audit twin
_LSHAUDIT_PRED = (
    "("
    + _D_HASH.format(x="concat('lshaudit:', CAST(doc_id AS VARCHAR))")
    + " % 1000000) < 200000"
)


def _logreg_sql(
    n_buckets: int = 256,
    iters: int = 8,
    lr: float = 500.0,
    thr: float = 0.5,
    train_where: str = "",
) -> str:
    """DuckDB twin of plans/llm.quality_classifier_docs — replays the
    full-batch GD training step by step: the hashed uni+bigram+bias
    features, the length-normalized decimal-exact margin, the 9dp
    sigmoid round (JVM vs libm exp 1-ulp noise absorbed), the
    DECIMAL(28,12) gradient sums, and the 6dp weight updates. All
    per-doc/per-bucket sums are order-free decimals, so plain GROUP BY
    replays them (no unrolled chains needed, unlike the PCA twin).

    ``train_where``: optional SQL suffix after ``FROM lab`` restricting
    the TRAINING set — a 'WHERE ...' filter (the fraction-sampled
    variant, quality_classifier_sampled_docs) or an
    'ORDER BY ... LIMIT k' selection (the fixed-size bottom-k variant,
    quality_classifier_bottomk_docs); gradients and n come only from
    the selected docs, and the final scoring pass always covers the
    full corpus."""
    bigrams = (
        "[array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))]"
    )
    parts = [
        f"""
        WITH toksrc AS MATERIALIZED (
          SELECT doc_id, {_D_TOKS} AS toks FROM documents
        ),
        lab AS MATERIALIZED (
          SELECT doc_id, toks,
                 CASE WHEN 2 * coalesce(list_aggregate(
                          [length(x) for x in toks], 'sum'), 0)
                      >= 9 * len(toks)
                      THEN 1.0 ELSE 0.0 END AS y
          FROM toksrc
        ),
        fb AS MATERIALIZED (
          SELECT doc_id, y,
                 ({_D_HASH.format(x="f")}) % {n_buckets} AS b
          FROM (SELECT doc_id, y,
                       unnest(list_concat(toks, {bigrams})) AS f
                FROM lab)
          UNION ALL
          SELECT doc_id, y, {n_buckets} AS b FROM lab
        ),
        fl AS MATERIALIZED (
          SELECT doc_id, count(*) AS flen FROM fb GROUP BY 1
        ),
        trd AS MATERIALIZED (
          SELECT doc_id FROM lab {train_where}
        ),
        nn AS MATERIALIZED (
          SELECT CAST(count(*) AS DOUBLE) AS n FROM trd
        ),
        w0 AS MATERIALIZED (
          SELECT unnest(range(0, {n_buckets + 1})) AS b, 0.0 AS w
        )"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
        z{t} AS MATERIALIZED (
          SELECT fb.doc_id, fl.flen,
                 CAST(sum(CAST(coalesce(w.w, 0.0) AS DECIMAL(18,6)))
                   AS DOUBLE) / fl.flen AS z
          FROM fb JOIN trd USING (doc_id) JOIN fl USING (doc_id)
          LEFT JOIN w{t - 1} w USING (b)
          GROUP BY fb.doc_id, fl.flen
        ),
        s{t} AS MATERIALIZED (
          SELECT doc_id, round(1.0/(1.0+exp(-z)), 9) AS s FROM z{t}
        ),
        g{t} AS MATERIALIZED (
          SELECT fb.b,
                 CAST(sum(CAST((s.s - fb.y) / fl.flen
                   AS DECIMAL(28,12))) AS DOUBLE) AS g
          FROM fb JOIN s{t} s USING (doc_id) JOIN fl USING (doc_id)
          GROUP BY fb.b
        ),
        w{t} AS MATERIALIZED (
          SELECT g.b,
                 round(coalesce(wp.w, 0.0) - {lr!r} * g.g / nn.n, 6) AS w
          FROM g{t} g LEFT JOIN w{t - 1} wp USING (b) CROSS JOIN nn
        )"""
        )
    parts.append(
        f""",
        zf AS (
          SELECT fb.doc_id,
                 CAST(sum(CAST(coalesce(w.w, 0.0) AS DECIMAL(18,6)))
                   AS DOUBLE) / fl.flen AS z
          FROM fb JOIN fl USING (doc_id)
          LEFT JOIN w{iters} w USING (b)
          GROUP BY fb.doc_id, fl.flen
        )
        SELECT lab.doc_id, CAST(lab.y AS INTEGER) AS label,
               round(1.0/(1.0+exp(-zf.z)), 6) AS quality_prob,
               (round(1.0/(1.0+exp(-zf.z)), 6) >= {thr!r}) AS clf_keep
        FROM lab JOIN zf USING (doc_id)
    """
    )
    return "".join(parts)


def _pca_sql(dim: int = 64, iters: int = 10) -> str:
    """DuckDB twin of plans/llm.pca_embeddings — recomputes the whole
    fit independently: the DECIMAL(28,12)-routed covariance (rounded
    6 dp — the k-means absorption convention), the fixed power
    iterations with UNROLLED left-associative sum chains (DuckDB's
    list_reduce/list_sum have batch-dependent reduction order, so a
    fold expression must be spelled out term by term to match the
    driver's left-to-right IEEE arithmetic bit for bit), deflation,
    and the centered projection. Mirrors operators/pca.pca_power_fit
    expression for expression."""
    d1 = dim + 1

    def mv(mm: str, vv: str) -> str:
        chain = " + ".join(
            f"{mm}[i][{j}]*{vv}[{j}]" for j in range(1, d1)
        )
        return f"[round({chain}, 9) for i in range(1, {d1})]"

    def dot(a: str, b: str) -> str:
        return " + ".join(f"{a}[{j}]*{b}[{j}]" for j in range(1, d1))

    parts = [
        f"""
        WITH base AS MATERIALIZED (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        nn AS MATERIALIZED (SELECT count(*) AS n FROM base),
        dx AS MATERIALIZED (SELECT unnest(range(1, {d1})) AS i),
        sx AS MATERIALIZED (
          SELECT dx.i AS i,
                 CAST(sum(CAST(v[dx.i] AS DECIMAL(28,12))) AS DOUBLE) AS s
          FROM base, dx GROUP BY 1
        ),
        mu AS MATERIALIZED (SELECT i, round(s / n, 6) AS m FROM sx, nn),
        mul AS MATERIALIZED (SELECT list(m ORDER BY i) AS ml FROM mu),
        pij AS MATERIALIZED (SELECT a.i AS i, b.i AS j FROM dx a, dx b WHERE b.i >= a.i),
        sxx AS MATERIALIZED (
          SELECT p.i AS i, p.j AS j,
                 CAST(sum(CAST(v[p.i] * v[p.j] AS DECIMAL(28,12)))
                   AS DOUBLE) AS s
          FROM base, pij p GROUP BY 1, 2
        ),
        cov0 AS MATERIALIZED (
          SELECT s.i, s.j, round(s.s / n - mi.m * mj.m, 6) AS c
          FROM sxx s, nn, mu mi, mu mj
          WHERE mi.i = s.i AND mj.i = s.j
        ),
        covf1 AS MATERIALIZED (
          SELECT i, j, c FROM cov0
          UNION ALL
          SELECT j AS i, i AS j, c FROM cov0 WHERE i <> j
        ),
        cm1 AS MATERIALIZED (SELECT i, list(c ORDER BY j) AS crow FROM covf1 GROUP BY i),
        cmat1 AS MATERIALIZED (SELECT list(crow ORDER BY i) AS mm FROM cm1),
        v1_0 AS MATERIALIZED (SELECT [round(1.0/sqrt({dim}), 9)
                         for i in range(1, {d1})] AS vv)"""
    ]
    for c in (1, 2):
        for t in range(1, iters + 1):
            parts.append(
                f""",
        w{c}_{t} AS MATERIALIZED (SELECT {mv('mm', 'vv')} AS w
                     FROM cmat{c}, v{c}_{t - 1}),
        v{c}_{t} AS MATERIALIZED (SELECT [round(w[i] / sqrt({dot('w', 'w')}), 9)
                             for i in range(1, {d1})] AS vv
                     FROM w{c}_{t})"""
            )
        if c == 1:
            # deflate: C2 = round(C1 - lam1 * v_i * v_j, 9)
            parts.append(
                f""",
        wf1 AS MATERIALIZED (SELECT {mv('mm', 'vv')} AS w FROM cmat1, v1_{iters}),
        lam1 AS MATERIALIZED (SELECT round({dot('vv', 'w')}, 9) AS l
                 FROM v1_{iters}, wf1),
        covf2 AS MATERIALIZED (
          SELECT a.i AS i, b.i AS j,
                 round(cm.mm[a.i][b.i] - l.l * vv[a.i] * vv[b.i], 9) AS c
          FROM dx a, dx b, cmat1 cm, lam1 l, v1_{iters}
        ),
        cm2 AS MATERIALIZED (SELECT i, list(c ORDER BY j) AS crow FROM covf2 GROUP BY i),
        cmat2 AS MATERIALIZED (SELECT list(crow ORDER BY i) AS mm FROM cm2),
        v2_0 AS MATERIALIZED (SELECT vv FROM v1_0)"""
            )
    proj1 = " + ".join(
        f"(b.v[{j}] - mu.ml[{j}]) * c1.vv[{j}]" for j in range(1, d1)
    )
    proj2 = " + ".join(
        f"(b.v[{j}] - mu.ml[{j}]) * c2.vv[{j}]" for j in range(1, d1)
    )
    parts.append(
        f"""
        SELECT b.vec_id,
               round({proj1}, 6) AS pc1,
               round({proj2}, 6) AS pc2
        FROM base b, mul mu, v1_{iters} c1, v2_{iters} c2
    """
    )
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    sql = {
        "tumbling_counts": """
            SELECT time_bucket(INTERVAL '10 minutes', ts)
                     + INTERVAL '10 minutes' AS window_time,
                   count(*) AS cnt
            FROM events GROUP BY 1
        """,
        "hopping_counts": f"""
            WITH hop AS ({_HOP})
            SELECT window_time, count(*) AS cnt FROM hop GROUP BY 1
        """,
        "top_users_hopping": f"""
            WITH hop AS ({_HOP}),
            s1 AS (
              SELECT window_time, user_id AS entity,
                     count(*) AS tweet_count,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM hop GROUP BY 1, 2
            ),
            r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS rnk
              FROM s1
            )
            SELECT window_time, entity, tweet_count,
                   CAST(vs AS DOUBLE) AS follower_count_sum,
                   CAST(rnk AS INTEGER) AS rank
            FROM r WHERE rnk <= 10
        """,
        "top_event_types_tumbling": """
            WITH s1 AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts)
                       + INTERVAL '10 minutes' AS window_time,
                     event_type AS entity,
                     count(*) AS tweet_count,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS rnk
              FROM s1
            )
            SELECT window_time, entity, tweet_count,
                   CAST(vs AS DOUBLE) AS follower_count_sum,
                   CAST(rnk AS INTEGER) AS rank
            FROM r WHERE rnk <= 5
        """,
        "top_users_with_examples": f"""
            WITH hop AS ({_HOP}),
            s1 AS (
              SELECT window_time, user_id AS entity,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM hop GROUP BY 1, 2
            ),
            top AS (
              SELECT window_time, entity,
                     CAST(row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS INTEGER) AS rank
              FROM s1 QUALIFY rank <= 10
            ),
            -- per (window, user): rank examples by value desc, event_id desc
            ex AS (
              SELECT window_time, user_id AS entity, event_id, event_type,
                     CAST(value AS DECIMAL(18,6)) AS w,
                     row_number() OVER (
                       PARTITION BY window_time, user_id
                       ORDER BY CAST(value AS DECIMAL(18,6)) DESC,
                                event_id DESC) AS ex_rnk
              FROM hop QUALIFY ex_rnk <= 3
            ),
            -- D3 dedupe: within the k examples keep first per event_type
            dd AS (
              SELECT *, row_number() OVER (
                       PARTITION BY window_time, entity, event_type
                       ORDER BY ex_rnk ASC) AS dd_rnk
              FROM ex QUALIFY dd_rnk = 1
            ),
            renum AS (
              SELECT window_time, entity, event_id, w,
                     CAST(row_number() OVER (
                       PARTITION BY window_time, entity
                       ORDER BY ex_rnk ASC) AS INTEGER) AS example_rank
              FROM dd
            )
            SELECT t.window_time, t.entity, t.rank, r.example_rank,
                   r.event_id, CAST(r.w AS DOUBLE) AS example_value
            FROM top t JOIN renum r
              ON t.window_time = r.window_time AND t.entity = r.entity
        """,
        "events_summary": """
            WITH counts AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts)
                       + INTERVAL '10 minutes' AS window_time,
                     count(*) AS cnt
              FROM events GROUP BY 1
            )
            SELECT min(window_time) AS min_date, max(window_time) AS max_date,
                   count(*) AS window_count,
                   CAST(sum(cnt) AS BIGINT) AS number_of_tweets,
                   date_diff('second', min(window_time), max(window_time))
                     AS duration_seconds
            FROM counts
        """,
        "counts_range": """
            SELECT time_bucket(INTERVAL '10 minutes', ts)
                     + INTERVAL '10 minutes' AS window_time,
                   count(*) AS cnt
            FROM events GROUP BY 1
            HAVING window_time >= TIMESTAMP '2024-01-05 00:00:00'
               AND window_time <  TIMESTAMP '2024-01-12 00:00:00'
        """,
        "top_users_for_entity": f"""
            WITH hop AS ({_HOP})
            SELECT window_time, user_id AS entity,
                   count(*) AS tweet_count,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS follower_count_sum
            FROM hop WHERE user_id = 0
            GROUP BY 1, 2
            HAVING window_time >= TIMESTAMP '2024-01-05 00:00:00'
               AND window_time <  TIMESTAMP '2024-01-12 00:00:00'
        """,
        "recent_counts": """
            SELECT time_bucket(INTERVAL '10 minutes', ts)
                     + INTERVAL '10 minutes' AS window_time,
                   count(*) AS cnt
            FROM events GROUP BY 1
            ORDER BY window_time DESC LIMIT 5
        """,
        "running_total_counts": """
            WITH counts AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts)
                       + INTERVAL '10 minutes' AS window_time,
                     count(*) AS cnt
              FROM events GROUP BY 1
            )
            SELECT window_time, cnt,
                   CAST(sum(cnt) OVER (ORDER BY window_time
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS running_total
            FROM counts
        """,
        "top_retweets_shape": f"""
            WITH hop AS ({_HOP}),
            s1 AS (
              SELECT window_time, event_type AS entity,
                     max(props) AS representative,
                     count(*) AS tweet_count,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM hop GROUP BY 1, 2
            ),
            top AS (
              SELECT window_time, entity, representative, tweet_count,
                     CAST(vs AS DOUBLE) AS follower_count_sum,
                     CAST(row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS INTEGER) AS rank
              FROM s1 QUALIFY rank <= 3
            ),
            users AS (
              SELECT window_time, event_type AS entity, user_id,
                     CAST(row_number() OVER (
                       PARTITION BY window_time, event_type
                       ORDER BY CAST(value AS DECIMAL(18,6)) DESC,
                                event_id DESC) AS INTEGER) AS user_rank
              FROM hop QUALIFY user_rank <= 3
            )
            SELECT t.window_time, t.entity, t.rank, t.representative,
                   t.tweet_count, t.follower_count_sum,
                   u.user_rank, u.user_id
            FROM top t JOIN users u
              ON t.window_time = u.window_time AND t.entity = u.entity
        """,
        "json_props_daily": """
            SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                     AS window_time,
                   event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS BIGINT) AS k_sum,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY n_name
        """,
        "revenue_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   count(*) AS cnt
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "revenue_cube": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   count(*) AS cnt
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT')
        """,
        "customers_with_orders_semi": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "brand_supplier_stats": """
            SELECT p_brand,
                   count(DISTINCT l_suppkey) AS n_suppliers,
                   count(DISTINCT l_partkey) AS n_parts,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "order_status_pivot": """
            SELECT o_orderpriority,
                   count(*) FILTER (o_orderstatus = 'O') AS n_o,
                   count(*) FILTER (o_orderstatus = 'F') AS n_f,
                   count(*) FILTER (o_orderstatus = 'P') AS n_p,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                     FILTER (o_orderstatus = 'O') AS DOUBLE) AS total_o,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                     FILTER (o_orderstatus = 'F') AS DOUBLE) AS total_f,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                     FILTER (o_orderstatus = 'P') AS DOUBLE) AS total_p
            FROM orders GROUP BY o_orderpriority
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
                     AS INTEGER) AS order_rank
            FROM orders
            QUALIFY order_rank <= 3
        """,
        "exact_dedup_docs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents
              WHERE doc_id % 5 = 0
            )
            SELECT {_D_HASH.format(x="text")} AS content_hash,
                   min(doc_id) AS canonical_id,
                   count(*) AS n_copies
            FROM corpus GROUP BY 1 HAVING count(*) > 1
        """,
        "minhash_lsh_docs": f"""
            {_D_SHINGLES},
            sig AS (
              SELECT doc_id, {_MINHASH_MINS}
              FROM sh GROUP BY doc_id
            ),
            bands AS ({_BAND_SELECTS})
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        """,
        "ngram_jaccard_docs": f"""
            {_D_SHINGLES},
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS n_inter
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, n_inter,
                   round(n_inter / (sa.n + sb.n - n_inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.3
        """,
        "simhash_docs": f"""
            WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
            tok AS (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM toksrc),
            h AS (SELECT doc_id, {_D_HASH.format(x="t")} AS h FROM tok),
            sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM h GROUP BY doc_id)
            SELECT doc_id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash
            FROM sums
        """,
        "knn_cosine": f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            s AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     {_D_COS} AS cos_sim
              FROM e q JOIN e c
                ON q.vec_id < 20 AND q.vec_id <> c.vec_id
            )
            SELECT query_id, neighbor_id, cos_sim,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id ASC)
                     AS INTEGER) AS knn_rank
            FROM s QUALIFY knn_rank <= 5
        """,
        "knn_cosine_bucketed": f"""
            WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            s AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     {_D_COS} AS cos_sim
              FROM e q JOIN e c
                ON q.vec_id < 20 AND q.label = c.label
               AND q.vec_id <> c.vec_id
            )
            SELECT query_id, neighbor_id, cos_sim,
                   CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id ASC)
                     AS INTEGER) AS knn_rank
            FROM s QUALIFY knn_rank <= 3
        """,
        "lang_id_docs": f"""
            WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
            r AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
                         {_LANG_RATIO_COLS}
                  FROM t)
            SELECT doc_id, n_tokens, {_LANG_RATIO_NAMES},
                   CASE WHEN {_LANG_BEST} < {LANG_PRED_THRESHOLD}
                        THEN 'unknown'
                        {_LANG_PRED_WHENS}
                        END AS lang_pred
            FROM r
        """,
        "quality_docs": f"""
            WITH t AS (SELECT doc_id, text, {_D_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   CAST(length(text) AS INTEGER) AS n_chars,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   round(list_sum(list_transform(toks, x -> length(x)))
                     / greatest(len(toks), 1), 6) AS mean_token_len,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                     / greatest(length(text), 1), 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                     / greatest(length(text), 1), 6) AS punct_ratio,
                   round((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                     / greatest(length(text), 1)) * 0.5
                     + least(len(toks) / 100.0, 1.0) * 0.5, 6) AS quality_score
            FROM t
        """,
        "token_counts_docs": """
            SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '')) AS INTEGER) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER)
                     AS n_bpe_pieces
            FROM documents
        """,
        "fingerprint_docs": f"""
            WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
            w AS (SELECT doc_id, unnest({_D_SH4}) AS win FROM toksrc),
            h AS (SELECT doc_id, {_D_HASH.format(x="win")} AS h FROM w)
            SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max,
                   count(DISTINCT h) AS n_windows
            FROM h GROUP BY doc_id
        """,
        "lsh_verified_pairs": f"""
            {_D_SHINGLES},
            sig AS (
              SELECT doc_id, {_MINHASH_MINS}
              FROM sh GROUP BY doc_id
            ),
            bands AS ({_BAND_SELECTS}),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
            ),
            shs AS (
              SELECT doc_id, text,
                     list_distinct({_D_SH3}) AS shingles
              FROM toksrc JOIN documents USING (doc_id)
            )
            SELECT c.doc_a, c.doc_b,
                   round(len(list_intersect(x.shingles, y.shingles)) /
                     (len(x.shingles) + len(y.shingles)
                      - len(list_intersect(x.shingles, y.shingles))), 6)
                     AS jaccard,
                   CAST(levenshtein(x.text, y.text) AS INTEGER) AS lev_dist
            FROM cand c
            JOIN shs x ON c.doc_a = x.doc_id
            JOIN shs y ON c.doc_b = y.doc_id
        """,
        # sessions: gaps-and-islands; break when gap >= 6h (Spark session
        # windows have exclusive ends, so an exact-6h gap starts a new
        # session); session_end = last event + gap
        "session_windows": """
            WITH g AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL '6 hours' OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS brk
              FROM events
            ),
            isl AS (
              SELECT *, sum(brk) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sess
              FROM g
            )
            SELECT user_id, min(ts) AS session_start,
                   max(ts) + INTERVAL '6 hours' AS session_end,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS value_sum
            FROM isl GROUP BY user_id, sess
        """,
        "throughput_5min": """
            SELECT time_bucket(INTERVAL '5 minutes', ts)
                     + INTERVAL '5 minutes' AS window_time,
                   CAST(sum(length(props)) AS BIGINT) AS bytes_read
            FROM events GROUP BY 1
        """,
        "distinct_users_daily": """
            SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                     AS window_time,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "clickers_without_purchase": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
            EXCEPT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'
              AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
        """,
        "cosine_near_dups": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v) /
                    (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
        """,
        "clickers_who_purchased": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
            INTERSECT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'
              AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
        """,
        "viewers_never_erroring": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'view'
              AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
            EXCEPT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'error'
              AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
        """,
        "revenue_grouping_sets": """
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_value,
                   CAST(GROUPING(event_type, day) AS INTEGER) AS gid
            FROM events
            GROUP BY GROUPING SETS ((event_type, day), (event_type))
        """,
        "dense_tumbling_counts": """
            WITH counts AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts)
                       + INTERVAL '10 minutes' AS window_time,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1
            ),
            b AS (SELECT min(window_time) AS lo, max(window_time) AS hi
                  FROM counts),
            grid AS (
              SELECT unnest(generate_series(b.lo, b.hi,
                       INTERVAL '10 minutes')) AS window_time
              FROM b
            )
            SELECT g.window_time,
                   coalesce(c.cnt, 0) AS cnt,
                   c.cnt IS NULL AS gap_filled
            FROM grid g LEFT OUTER JOIN counts c
              ON g.window_time = c.window_time
        """,
        "daily_count_anomalies": """
            WITH daily AS (
              SELECT event_type,
                     CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1, 2
            ),
            m AS (
              SELECT event_type AS m_type,
                     CAST(count(*) AS BIGINT) AS n_days,
                     CAST(sum(cnt) AS BIGINT) AS sum_cnt,
                     CAST(sum(cnt * cnt) AS BIGINT) AS sumsq_cnt
              FROM daily GROUP BY 1
            )
            SELECT event_type, day, cnt, mean_cnt, z_score,
                   abs(z_score) >= 2.0 AS is_anomaly
            FROM (
              SELECT d.event_type, d.day, d.cnt,
                     round(CAST(m.sum_cnt AS DOUBLE) / m.n_days, 6)
                       AS mean_cnt,
                     CASE WHEN CAST(m.sumsq_cnt AS DOUBLE) / m.n_days
                               - (CAST(m.sum_cnt AS DOUBLE) / m.n_days)
                                 * (CAST(m.sum_cnt AS DOUBLE) / m.n_days)
                               > 0
                     THEN
                     round((d.cnt - CAST(m.sum_cnt AS DOUBLE) / m.n_days)
                           / sqrt(CAST(m.sumsq_cnt AS DOUBLE) / m.n_days
                                  - (CAST(m.sum_cnt AS DOUBLE)
                                     / m.n_days)
                                    * (CAST(m.sum_cnt AS DOUBLE)
                                       / m.n_days)), 6)
                     END AS z_score
              FROM daily d JOIN m ON d.event_type = m.m_type
            )
        """,
        "events_profile": """
            WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows
                       FROM events)
            SELECT 'event_id' AS column, 'bigint' AS dtype, n.n_rows,
                   CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
                   min(CAST(event_id AS DOUBLE)) AS min_num,
                   max(CAST(event_id AS DOUBLE)) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str
            FROM events, n GROUP BY n.n_rows
            UNION ALL
            SELECT 'ts', 'timestamp_ntz', n.n_rows,
                   CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT),
                   CAST(count(DISTINCT ts) AS BIGINT),
                   min(CAST(date_diff('second', TIMESTAMP '1970-01-01',
                     ts) AS DOUBLE)),
                   max(CAST(date_diff('second', TIMESTAMP '1970-01-01',
                     ts) AS DOUBLE)),
                   NULL, NULL
            FROM events, n GROUP BY n.n_rows
            UNION ALL
            SELECT 'user_id', 'bigint', n.n_rows,
                   CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT),
                   CAST(count(DISTINCT user_id) AS BIGINT),
                   min(CAST(user_id AS DOUBLE)),
                   max(CAST(user_id AS DOUBLE)), NULL, NULL
            FROM events, n GROUP BY n.n_rows
            UNION ALL
            SELECT 'event_type', 'string', n.n_rows,
                   CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0
                     END) AS BIGINT),
                   CAST(count(DISTINCT event_type) AS BIGINT),
                   NULL, NULL, min(event_type), max(event_type)
            FROM events, n GROUP BY n.n_rows
            UNION ALL
            SELECT 'value', 'double', n.n_rows,
                   CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT),
                   CAST(count(DISTINCT value) AS BIGINT),
                   min(value), max(value), NULL, NULL
            FROM events, n GROUP BY n.n_rows
            UNION ALL
            SELECT 'props', 'string', n.n_rows,
                   CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT),
                   CAST(count(DISTINCT props) AS BIGINT),
                   NULL, NULL, min(props), max(props)
            FROM events, n GROUP BY n.n_rows
        """,
        "value_quantiles_by_type": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   count(*) AS cnt
            FROM events GROUP BY event_type
        """,
        "purchase_asof_click": """
            WITH p AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ),
            c AS (
              SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
              FROM events WHERE event_type = 'click'
              GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_event_id,
                   epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.click_ts
        """,
        "simhash_pairs_docs": f"""
            WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
            tok AS (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM toksrc),
            h AS (SELECT doc_id, {_D_HASH.format(x="t")} AS h FROM tok),
            sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM h GROUP BY doc_id),
            fp AS (SELECT doc_id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash
                   FROM sums)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                     AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        """,
    }
    sql["normalize_docs"] = r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                 AS norm_text,
               CAST(length(trim(regexp_replace(lower(text), '\s+', ' ',
                 'g'))) AS INTEGER) AS n_chars_norm
        FROM documents
    """
    _email = r'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'
    _url = 'https?://[^ \t\n]+'
    _phone = '\\+?[0-9][0-9()\\- ]{6,}[0-9]'
    sql["pii_mask_docs"] = f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '{_email}', '<EMAIL>', 'g'),
                 '{_url}', '<URL>', 'g'),
                 '{_phone}', '<PHONE>', 'g') AS masked_text,
               CAST(len(regexp_extract_all(text, '{_email}')) AS INTEGER)
                 AS n_emails,
               CAST(len(regexp_extract_all(text, '{_url}')) AS INTEGER)
                 AS n_urls,
               CAST(len(regexp_extract_all(text, '{_phone}')) AS INTEGER)
                 AS n_phones
        FROM documents
    """
    # KMV sketch: estimate is a pure function of the distinct key set
    # via the portable hash, so the APPROXIMATION itself hash-matches
    _kmv_h = _D_HASH.format(x="CAST(user_id AS VARCHAR)")
    sql["kmv_users_daily"] = f"""
        WITH h AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_time,
                 {_kmv_h} AS h
          FROM events
        ),
        g AS (
          SELECT window_time,
                 (list_sort(list_distinct(list(h))))[1:64] AS mink,
                 CAST(count(DISTINCT h) AS BIGINT) AS n_exact
          FROM h GROUP BY 1
        )
        SELECT window_time,
               CASE WHEN len(mink) < 64 THEN n_exact
                    ELSE CAST(round(63 * 1152921504606846976.0 / mink[64])
                              AS BIGINT) END AS n_users_kmv,
               n_exact AS n_users_exact
        FROM g
    """
    sql["kmv_users_monthly_rollup"] = f"""
        WITH h AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS day_end,
                 {_kmv_h} AS h
          FROM events
        ),
        daily AS (
          SELECT day_end,
                 (list_sort(list_distinct(list(h))))[1:64] AS mink
          FROM h GROUP BY 1
        ),
        x AS (
          SELECT CAST(date_trunc('month', day_end - INTERVAL 1 SECOND)
                   AS TIMESTAMP) AS month,
                 unnest(mink) AS h
          FROM daily
        ),
        m AS (
          SELECT month,
                 (list_sort(list_distinct(list(h))))[1:64] AS mink,
                 CAST(count(DISTINCT h) AS BIGINT) AS n_merged
          FROM x GROUP BY 1
        )
        SELECT month,
               CASE WHEN len(mink) < 64 THEN n_merged
                    ELSE CAST(round(63 * 1152921504606846976.0 / mink[64])
                              AS BIGINT) END AS n_users_kmv,
               CAST(len(mink) AS INTEGER) AS sketch_size
        FROM m
    """
    # deterministic HLL twins: every constant (alpha numerator, the
    # linear-counting table) comes from plans.events so both engines
    # share literally the same floats; rho is an integer CASE chain
    _rho_sql = "CASE " + " ".join(
        f"WHEN w >= {1 << (51 - k)} THEN {k}" for k in range(1, 52)
    ) + " ELSE 52 END"
    _lc_sql = "[" + ", ".join(repr(x) for x in ev.HLL_LC) + "]"
    _hll_m = ev.HLL_M
    _hll_numer = repr(ev.HLL_NUMER)

    def _hll_twin(day_expr: str, month: bool) -> str:
        grp = (
            "CAST(date_trunc('month', day_end - INTERVAL 1 SECOND) "
            "AS TIMESTAMP)"
            if month
            else "day_end"
        )
        out_time = "month" if month else "window_time"
        return f"""
        WITH h AS (
          SELECT {day_expr} AS day_end,
                 {_kmv_h} AS h, user_id
          FROM events
        ),
        b AS (
          SELECT day_end, h % {_hll_m} AS bucket,
                 h // {_hll_m} AS w
          FROM h
        ),
        r AS (
          SELECT day_end, bucket, max({_rho_sql}) AS reg
          FROM b GROUP BY 1, 2
        ),
        rg AS (
          SELECT {grp} AS g, bucket, max(reg) AS reg
          FROM r GROUP BY 1, 2
        ),
        a AS (
          SELECT g,
                 CAST(sum(1::BIGINT << (52 - reg)) AS BIGINT)
                   AS sum_present,
                 CAST(count(*) AS BIGINT) AS n_buckets
          FROM rg GROUP BY 1
        ),
        e AS (
          SELECT g, {_hll_m} - n_buckets AS v_zero,
                 {_hll_numer}
                   / CAST(sum_present
                          + ({_hll_m} - n_buckets) * (1::BIGINT << 52)
                       AS DOUBLE) AS raw
          FROM a
        ),
        x AS (
          SELECT g,
                 CASE WHEN v_zero > 0 AND raw <= {2.5 * _hll_m!r}
                      THEN ({_lc_sql})[greatest(v_zero, 1)]
                      ELSE round(raw, 6) END AS n_users_hll
          FROM e
        ),
        ex AS (
          SELECT {grp.replace("day_end", day_expr)
                  if month else day_expr} AS g,
                 CAST(count(DISTINCT user_id) AS BIGINT)
                   AS n_users_exact
          FROM events GROUP BY 1
        )
        SELECT x.g AS {out_time}, x.n_users_hll, ex.n_users_exact
        FROM x JOIN ex ON x.g = ex.g
        """

    _day_end = "time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'"
    sql["hll_users_daily"] = _hll_twin(_day_end, month=False)
    sql["hll_users_monthly_rollup"] = _hll_twin(_day_end, month=True)
    _rs_h = _D_HASH.format(x="CAST(event_id AS VARCHAR)")
    # deterministic-KLL daily sketch (operators/kllsketch closed form:
    # sorted positions divisible by 2^lstar + odd-quotient remainders;
    # exact integer arithmetic, so the twin replays it verbatim)
    sql["kll_value_daily"] = f"""
        WITH ev AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_time,
                 {_rs_h} AS h, value
          FROM events
        ),
        r AS (
          SELECT window_time, value, h,
                 row_number() OVER (
                   PARTITION BY window_time ORDER BY value ASC, h ASC
                 ) AS p,
                 CAST(count(*) OVER (PARTITION BY window_time) AS BIGINT)
                   AS n
          FROM ev
        ),
        ls AS (
          SELECT *, ((CASE WHEN n // 1 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 64 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 128 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 256 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 512 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1024 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2048 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4096 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8192 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16384 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32768 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 65536 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 131072 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 262144 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 524288 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1048576 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2097152 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4194304 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8388608 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16777216 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 33554432 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 67108864 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 134217728 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 268435456 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 536870912 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1073741824 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2147483648 > 64 THEN 1 ELSE 0 END)) AS lstar,
                 least(((CASE WHEN p % 2 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 4 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 8 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 16 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 32 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 64 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 128 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 256 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 512 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 1024 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 2048 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 4096 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 8192 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 16384 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 32768 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 65536 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 131072 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 262144 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 524288 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 1048576 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 2097152 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 4194304 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 8388608 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 16777216 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 33554432 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 67108864 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 134217728 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 268435456 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 536870912 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 1073741824 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 2147483648 = 0 THEN 1 ELSE 0 END)), ((CASE WHEN n // 1 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 64 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 128 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 256 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 512 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1024 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2048 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4096 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8192 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16384 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32768 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 65536 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 131072 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 262144 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 524288 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1048576 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2097152 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4194304 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8388608 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16777216 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 33554432 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 67108864 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 134217728 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 268435456 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 536870912 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1073741824 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2147483648 > 64 THEN 1 ELSE 0 END))) AS v
          FROM r
        ),
        kept AS (
          SELECT * FROM (
            SELECT window_time, value, h, n, lstar, CASE
              WHEN p % CAST(power(2, lstar) AS BIGINT) = 0
                THEN CAST(power(2, lstar) AS BIGINT)
              WHEN v < lstar
                   AND p = CAST(power(2, v) AS BIGINT)
                           * (n // CAST(power(2, v) AS BIGINT))
                THEN CAST(power(2, v) AS BIGINT)
            END AS w
            FROM ls
          ) WHERE w IS NOT NULL
        ),
        cw AS (
          SELECT *, sum(w) OVER (
            PARTITION BY window_time ORDER BY value ASC, h ASC
            ROWS UNBOUNDED PRECEDING) AS cwv
          FROM kept
        )
        SELECT window_time,
               max(n) AS n_events,
               CAST(count(*) AS BIGINT) AS sketch_size,
               max(CAST(power(2, lstar) AS BIGINT) - 1)
                 AS err_bound_ranks,
               round(min(CASE WHEN cwv >= ceil(0.5 * n) THEN value END), 6)
                 AS p50_est,
               round(min(CASE WHEN cwv >= ceil(0.9 * n) THEN value END), 6)
                 AS p90_est
        FROM cw GROUP BY window_time
    """
    # monthly rollup: union the daily weighted items (associative
    # multiset fold), PRUNE to k+1 items (first row crossing each
    # ceil(W/k) weight step + the last row, re-weighted by the gap to
    # the previous kept row), estimate from the pruned bag; the carried
    # bound composes: sum of daily (2^lstar - 1) + the prune step
    sql["kll_value_monthly_rollup"] = f"""
        WITH ev AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_time,
                 {_rs_h} AS h, value
          FROM events
        ),
        r AS (
          SELECT window_time, value, h,
                 row_number() OVER (
                   PARTITION BY window_time ORDER BY value ASC, h ASC
                 ) AS p,
                 CAST(count(*) OVER (PARTITION BY window_time) AS BIGINT)
                   AS n
          FROM ev
        ),
        ls AS (
          SELECT *, ((CASE WHEN n // 1 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 64 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 128 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 256 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 512 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1024 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2048 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4096 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8192 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16384 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32768 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 65536 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 131072 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 262144 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 524288 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1048576 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2097152 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4194304 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8388608 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16777216 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 33554432 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 67108864 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 134217728 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 268435456 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 536870912 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1073741824 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2147483648 > 64 THEN 1 ELSE 0 END)) AS lstar,
                 least(((CASE WHEN p % 2 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 4 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 8 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 16 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 32 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 64 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 128 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 256 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 512 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 1024 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 2048 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 4096 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 8192 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 16384 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 32768 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 65536 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 131072 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 262144 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 524288 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 1048576 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 2097152 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 4194304 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 8388608 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 16777216 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 33554432 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 67108864 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 134217728 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 268435456 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 536870912 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 1073741824 = 0 THEN 1 ELSE 0 END) + (CASE WHEN p % 2147483648 = 0 THEN 1 ELSE 0 END)), ((CASE WHEN n // 1 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 64 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 128 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 256 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 512 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1024 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2048 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4096 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8192 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16384 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 32768 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 65536 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 131072 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 262144 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 524288 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1048576 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2097152 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 4194304 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 8388608 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 16777216 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 33554432 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 67108864 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 134217728 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 268435456 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 536870912 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 1073741824 > 64 THEN 1 ELSE 0 END) + (CASE WHEN n // 2147483648 > 64 THEN 1 ELSE 0 END))) AS v
          FROM r
        ),
        kept AS (
          SELECT * FROM (
            SELECT window_time, value, h, n, lstar, CASE
              WHEN p % CAST(power(2, lstar) AS BIGINT) = 0
                THEN CAST(power(2, lstar) AS BIGINT)
              WHEN v < lstar
                   AND p = CAST(power(2, v) AS BIGINT)
                           * (n // CAST(power(2, v) AS BIGINT))
                THEN CAST(power(2, v) AS BIGINT)
            END AS w
            FROM ls
          ) WHERE w IS NOT NULL
        ),
        mmeta AS (
          SELECT CAST(date_trunc('month', window_time - INTERVAL 1 second)
                   AS TIMESTAMP) AS month,
                 CAST(sum(dn) AS BIGINT) AS mn,
                 CAST(sum(derr) AS BIGINT) AS merr
          FROM (SELECT window_time, max(n) AS dn,
                       max(CAST(power(2, lstar) AS BIGINT) - 1) AS derr
                FROM kept GROUP BY window_time)
          GROUP BY 1
        ),
        merged AS (
          SELECT CAST(date_trunc('month', window_time - INTERVAL 1 second)
                   AS TIMESTAMP) AS month, value, h, w
          FROM kept
        ),
        cwm AS (
          SELECT month, value, h, w, mn, merr,
                 sum(w) OVER (
                   PARTITION BY m.month ORDER BY value ASC, h ASC
                   ROWS UNBOUNDED PRECEDING) AS cwv,
                 ceil(mn / 64.0) AS step
          FROM merged m JOIN mmeta USING (month)
        ),
        crossed AS (
          SELECT *, lag(cwv, 1, CAST(0 AS HUGEINT)) OVER (
                   PARTITION BY month ORDER BY value ASC, h ASC)
                   AS prev_cwv
          FROM cwm
        ),
        pruned AS (
          SELECT month, value, h, mn, merr, step, cwv
          FROM crossed
          WHERE ceil(cwv / step) > ceil(prev_cwv / step) OR cwv = mn
        )
        SELECT month,
               max(mn) AS n_events,
               CAST(count(*) AS BIGINT) AS sketch_size,
               max(merr + CAST(step AS BIGINT)) AS err_bound_ranks,
               round(min(CASE WHEN cwv >= ceil(0.5 * mn) THEN value END), 6)
                 AS p50_est,
               round(min(CASE WHEN cwv >= ceil(0.9 * mn) THEN value END), 6)
                 AS p90_est
        FROM pruned GROUP BY month
    """
    sql["value_quantile_sketch_daily"] = f"""
        WITH h AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_time,
                 {_rs_h} AS h, value
          FROM events
        ),
        r AS (
          SELECT window_time, h, value,
                 row_number() OVER (
                   PARTITION BY window_time ORDER BY h ASC, value ASC
                 ) AS rn
          FROM h
        ),
        g AS (
          SELECT window_time, list(value ORDER BY value ASC) AS vals
          FROM r WHERE rn <= 256 GROUP BY 1
        ),
        n AS (
          SELECT window_time, CAST(count(*) AS BIGINT) AS n_events
          FROM h GROUP BY 1
        )
        SELECT g.window_time, n.n_events,
               CAST(len(vals) AS INTEGER) AS sketch_size,
               round(vals[greatest(1,
                 CAST(ceil(0.5 * len(vals)) AS INTEGER))], 6) AS p50_est,
               round(vals[greatest(1,
                 CAST(ceil(0.9 * len(vals)) AS INTEGER))], 6) AS p90_est
        FROM g JOIN n ON g.window_time = n.window_time
    """
    sql["value_quantile_sketch_monthly"] = f"""
        WITH h AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS day_end,
                 {_rs_h} AS h, value
          FROM events
        ),
        r AS (
          SELECT day_end, h, value,
                 row_number() OVER (
                   PARTITION BY day_end ORDER BY h ASC, value ASC
                 ) AS rn
          FROM h
        ),
        x AS (
          SELECT CAST(date_trunc('month', day_end - INTERVAL 1 SECOND)
                   AS TIMESTAMP) AS month,
                 h, value
          FROM r WHERE rn <= 256
        ),
        r2 AS (
          SELECT month, h, value,
                 row_number() OVER (
                   PARTITION BY month ORDER BY h ASC, value ASC
                 ) AS rn
          FROM x
        ),
        g AS (
          SELECT month, list(value ORDER BY value ASC) AS vals
          FROM r2 WHERE rn <= 256 GROUP BY 1
        ),
        n AS (
          SELECT CAST(date_trunc('month',
                   time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   - INTERVAL 1 SECOND) AS TIMESTAMP) AS month,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1
        )
        SELECT g.month, n.n_events,
               CAST(len(vals) AS INTEGER) AS sketch_size,
               round(vals[greatest(1,
                 CAST(ceil(0.5 * len(vals)) AS INTEGER))], 6) AS p50_est,
               round(vals[greatest(1,
                 CAST(ceil(0.9 * len(vals)) AS INTEGER))], 6) AS p90_est
        FROM g JOIN n ON g.month = n.month
    """
    # Count-Min Sketch twins: counters and the min-over-rows estimate
    # are pure integer functions of the portable seeded hash, so the
    # heavy-hitter ESTIMATES hash-match across engines (like KMV/HLL)
    _cms_c = (
        "(('0x' || substr(md5(concat(CAST(1000 + t.r AS VARCHAR), ':', "
        "CAST(user_id AS VARCHAR))), 1, 15))::BIGINT) % 512"
    )
    sql["cms_heavy_hitters_daily"] = f"""
        WITH cells AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_time,
                 user_id, t.r, {_cms_c} AS c
          FROM events CROSS JOIN (VALUES (0), (1), (2)) AS t(r)
        ),
        counters AS (
          SELECT window_time, r, c, CAST(count(*) AS BIGINT) AS cnt
          FROM cells GROUP BY 1, 2, 3
        ),
        exact AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_time,
                 user_id, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM events GROUP BY 1, 2
        ),
        cand AS (SELECT DISTINCT window_time, user_id, r, c FROM cells),
        est AS (
          SELECT window_time, user_id, min(cnt) AS est_cnt
          FROM cand JOIN counters USING (window_time, r, c)
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT e.window_time, e.user_id, est_cnt, exact_cnt,
                 CAST(row_number() OVER (
                   PARTITION BY e.window_time
                   ORDER BY est_cnt DESC, e.user_id ASC
                 ) AS INTEGER) AS rnk
          FROM exact e JOIN est USING (window_time, user_id)
        )
        SELECT window_time, user_id, est_cnt, exact_cnt, rnk
        FROM ranked WHERE rnk <= 5
    """
    sql["cms_heavy_hitters_monthly_rollup"] = f"""
        WITH cells AS (
          SELECT CAST(date_trunc('month',
                   time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   - INTERVAL 1 SECOND) AS TIMESTAMP) AS month,
                 user_id, t.r, {_cms_c} AS c
          FROM events CROSS JOIN (VALUES (0), (1), (2)) AS t(r)
        ),
        counters AS (
          SELECT month, r, c, CAST(count(*) AS BIGINT) AS cnt
          FROM cells GROUP BY 1, 2, 3
        ),
        exact AS (
          SELECT CAST(date_trunc('month',
                   time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   - INTERVAL 1 SECOND) AS TIMESTAMP) AS month,
                 user_id, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM events GROUP BY 1, 2
        ),
        cand AS (SELECT DISTINCT month, user_id, r, c FROM cells),
        est AS (
          SELECT month, user_id, min(cnt) AS est_cnt
          FROM cand JOIN counters USING (month, r, c)
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT e.month, e.user_id, est_cnt, exact_cnt,
                 CAST(row_number() OVER (
                   PARTITION BY e.month
                   ORDER BY est_cnt DESC, e.user_id ASC
                 ) AS INTEGER) AS rnk
          FROM exact e JOIN est USING (month, user_id)
        )
        SELECT month, user_id, est_cnt, exact_cnt, rnk
        FROM ranked WHERE rnk <= 10
    """
    sql["user_activity_concentration"] = """
        WITH per_user AS (
          SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                   AS window_time,
                 user_id, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        ),
        ranked AS (
          SELECT window_time, cnt,
                 row_number() OVER (
                   PARTITION BY window_time ORDER BY cnt ASC, user_id ASC
                 ) AS i,
                 row_number() OVER (
                   PARTITION BY window_time ORDER BY cnt DESC, user_id ASC
                 ) AS top_rank
          FROM per_user
        ),
        agg AS (
          SELECT window_time,
                 CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(cnt) AS BIGINT) AS n_events,
                 CAST(sum(CASE WHEN top_rank <= 10 THEN cnt ELSE 0 END)
                      AS BIGINT) AS top10_events,
                 CAST(sum(i * cnt) AS BIGINT) AS iw
          FROM ranked GROUP BY 1
        )
        SELECT window_time, n_users, n_events,
               round(CAST(top10_events AS DOUBLE) / n_events, 6)
                 AS top10_share,
               round(2.0 * iw / (n_users * n_events)
                     - CAST(n_users + 1 AS DOUBLE) / n_users, 6) AS gini
        FROM agg
    """
    sql["winsorized_value_stats"] = """
        WITH b AS (
          SELECT event_type AS b_type,
                 round(quantile_cont(value, 0.05), 6) AS p05,
                 round(quantile_cont(value, 0.95), 6) AS p95
          FROM events GROUP BY 1
        )
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 6) AS mean_raw,
               round(CAST(sum(CAST(least(greatest(e.value, b.p05), b.p95)
                     AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
                 AS mean_winsorized,
               min(b.p05) AS p05, min(b.p95) AS p95
        FROM events e JOIN b ON e.event_type = b.b_type
        GROUP BY 1
    """
    # the Arrow-side decode is a deterministic envelope parse (first 8
    # payload bytes -> 60-bit checksum -> fake dims); DuckDB reproduces
    # it from the blob hex, so the binary plumbing is hash-checked end
    # to end (the NotImplementedError stub remains only where a real
    # image library would plug in)
    # media_meta: BUILD the same container payloads (valid PNG / JFIF /
    # GIF89a headers by doc_id % 4, mirroring attach_synth_media byte
    # for byte) and RE-PARSE them from the blob's hex — an independent
    # replay of both the builder and parse_image_dims. Byte offset k
    # (0-based) lives at hex position 2k+1 (1-based), 2 chars per byte.
    # The JPEG branch reads SOF0 at the JFIF layout's fixed offset 20
    # (SOI + 18-byte APP0); the Spark kernel walks segments generically
    # — covered by pytest, while this twin replays this dataset.
    sql["media_meta_docs"] = r"""
        WITH base AS (
          SELECT doc_id,
                 coalesce(encode(text), ''::BLOB) AS body,
                 CAST((doc_id * 7) % 1920 + 16 AS BIGINT) AS w,
                 CAST((doc_id * 13) % 1080 + 16 AS BIGINT) AS h
          FROM documents
        ),
        m AS (
          SELECT doc_id,
            CASE doc_id % 4
              WHEN 0 THEN
                '\x89PNG\x0D\x0A\x1A\x0A\x00\x00\x00\x0DIHDR'::BLOB
                || unhex(lpad(to_hex(w), 8, '0'))
                || unhex(lpad(to_hex(h), 8, '0'))
                || '\x08\x06\x00\x00\x00\x00\x00\x00\x00'::BLOB || body
              WHEN 1 THEN
                ('\xFF\xD8\xFF\xE0\x00\x10JFIF\x00\x01\x02\x00'
                 || '\x00\x48\x00\x48\x00\x00\xFF\xC0\x00\x11\x08')::BLOB
                || unhex(lpad(to_hex(h), 4, '0'))
                || unhex(lpad(to_hex(w), 4, '0'))
                || '\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01'::BLOB || body
              WHEN 2 THEN
                'GIF89a'::BLOB
                || unhex(substr(lpad(to_hex(w), 4, '0'), 3, 2)
                         || substr(lpad(to_hex(w), 4, '0'), 1, 2))
                || unhex(substr(lpad(to_hex(h), 4, '0'), 3, 2)
                         || substr(lpad(to_hex(h), 4, '0'), 1, 2))
                || '\xF7\x00\x00'::BLOB || body
              ELSE body
            END AS media
          FROM base
        ),
        hx AS (
          SELECT doc_id, octet_length(media) AS n_bytes,
                 hex(media) AS x,
                 (('0x' || rpad(substr(hex(media), 1, 16), 16, '0'))::UBIGINT
                   % 1152921504606846976)::BIGINT AS checksum
          FROM m
        ),
        typed AS (
          SELECT *,
            CASE
              WHEN n_bytes >= 24
                   AND substr(x, 1, 16) = '89504E470D0A1A0A'
                   AND substr(x, 25, 8) = '49484452'
                THEN 'image/png'
              WHEN n_bytes >= 10
                   AND substr(x, 1, 12) IN ('474946383761', '474946383961')
                THEN 'image/gif'
              WHEN n_bytes >= 29 AND substr(x, 1, 4) = 'FFD8'
                   AND substr(x, 41, 4) = 'FFC0'
                THEN 'image/jpeg'
              ELSE 'image/fake'
            END AS media_type
          FROM hx
        )
        SELECT doc_id, media_type,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(CASE media_type
                 WHEN 'image/png' THEN ('0x' || substr(x, 33, 8))::BIGINT
                 WHEN 'image/gif' THEN
                   ('0x' || substr(x, 15, 2) || substr(x, 13, 2))::BIGINT
                 WHEN 'image/jpeg' THEN ('0x' || substr(x, 55, 4))::BIGINT
                 ELSE checksum % 640 + 1 END AS INTEGER) AS width,
               CAST(CASE media_type
                 WHEN 'image/png' THEN ('0x' || substr(x, 41, 8))::BIGINT
                 WHEN 'image/gif' THEN
                   ('0x' || substr(x, 19, 2) || substr(x, 17, 2))::BIGINT
                 WHEN 'image/jpeg' THEN ('0x' || substr(x, 51, 4))::BIGINT
                 ELSE checksum % 480 + 1 END AS INTEGER) AS height,
               checksum
        FROM typed
    """
    # strided frame sampling: frame i = bytes [i*32, i*32+32) of the
    # blob, stride = ceil(n/8); checksum mirrors the media_meta rule
    sql["media_frames_docs"] = """
        WITH m AS (SELECT doc_id, encode(text) AS media FROM documents),
        meta AS (
          SELECT doc_id, media,
                 octet_length(media) // 32 AS n
          FROM m WHERE octet_length(media) >= 32
        ),
        idx AS (
          SELECT doc_id, media,
                 unnest(range(0, n, CAST(ceil(n / 8.0) AS BIGINT)))
                   AS frame_index
          FROM meta
        ),
        fr AS (
          -- DuckDB substring() has no BLOB overload: slice the hex
          -- form (2 chars per byte) instead
          SELECT doc_id, frame_index,
                 substr(hex(media),
                        CAST(frame_index * 64 + 1 AS BIGINT), 64) AS slhex
          FROM idx
        )
        SELECT doc_id,
               CAST(frame_index AS INTEGER) AS frame_index,
               CAST(frame_index * 40 AS BIGINT) AS ts_ms,
               CAST(length(slhex) // 2 AS BIGINT) AS n_frame_bytes,
               ((('0x' || rpad(substr(slhex, 1, 16), 16, '0'))::UBIGINT)
                 % 1152921504606846976)::BIGINT AS frame_checksum
        FROM fr
    """
    # audio chunking: first min(ceil(bytes/128), 6) windows of 128
    # bytes (1 byte == 1 ms), mean byte energy per window
    sql["media_waveform_docs"] = """
        WITH m AS (SELECT doc_id, encode(text) AS media FROM documents),
        meta AS (
          SELECT doc_id, media,
                 least((octet_length(media) + 127) // 128, 6) AS nch
          FROM m WHERE octet_length(media) > 0
        ),
        idx AS (
          SELECT doc_id, media,
                 unnest(range(0, nch)) AS chunk_index
          FROM meta
        ),
        ch AS (
          SELECT doc_id, chunk_index,
                 substr(hex(media),
                        CAST(chunk_index * 256 + 1 AS BIGINT), 256) AS slhex
          FROM idx
        ),
        feat AS (
          SELECT doc_id, chunk_index, length(slhex) // 2 AS n_chunk_bytes,
                 [ (('0x' || substr(slhex, (j - 1) * 2 + 1, 2))::BIGINT)
                   for j in range(1, length(slhex) // 2 + 1) ] AS bytes
          FROM ch
        )
        SELECT doc_id,
               CAST(chunk_index AS INTEGER) AS chunk_index,
               CAST(chunk_index * 128 AS BIGINT) AS start_ms,
               CAST(n_chunk_bytes AS BIGINT) AS n_chunk_bytes,
               round(CAST(list_sum(bytes) AS DOUBLE) / n_chunk_bytes, 6)
                 AS mean_energy
        FROM feat
    """
    sql["repetition_docs"] = f"""
        WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {_D_SH3} AS sh FROM t)
        SELECT doc_id,
               CAST(len(sh) AS INTEGER) AS n_shingles,
               CAST(len(list_distinct(sh)) AS INTEGER)
                 AS n_distinct_shingles,
               round((len(sh) - len(list_distinct(sh)))
                 / greatest(len(sh), 1), 6) AS repetition_ratio
        FROM s
    """
    _d_sh4 = (
        "[array_to_string(toks[i:i+3], ' ') for i in range(1, len(toks) - 2)]"
    )
    sql["contamination_docs"] = f"""
        WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct({_d_sh4})) AS shingle
               FROM t),
        h AS (SELECT doc_id, {_D_HASH.format(x="shingle")} AS h FROM sh),
        tr AS (SELECT doc_id AS train_doc_id, h FROM h
               WHERE doc_id % 50 <> 0),
        ev AS (SELECT doc_id AS eval_doc_id, h FROM h
               WHERE doc_id % 50 = 0)
        SELECT train_doc_id, eval_doc_id,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM tr JOIN ev USING (h)
        GROUP BY 1, 2 HAVING count(*) >= 1
    """
    # the executed decontamination keep: train minus the flagged ids
    sql["decontaminated_docs"] = f"""
        WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct({_d_sh4})) AS shingle
               FROM t),
        h AS (SELECT doc_id, {_D_HASH.format(x="shingle")} AS h FROM sh),
        tr AS (SELECT doc_id AS train_doc_id, h FROM h
               WHERE doc_id % 50 <> 0),
        ev AS (SELECT doc_id AS eval_doc_id, h FROM h
               WHERE doc_id % 50 = 0),
        flagged AS (
          SELECT DISTINCT train_doc_id AS doc_id
          FROM tr JOIN ev USING (h)
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE d.doc_id % 50 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
    """
    _url_frag = 'https?://[^ \t\n]+'
    sql["domain_stats_docs"] = f"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' https://' || source
                           || '.example.com/page/'
                           || CAST(doc_id AS VARCHAR)
                      ELSE text END AS text
          FROM documents
        ),
        u AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '{_url_frag}'))
                   AS url
          FROM aug
        )
        SELECT lower(regexp_extract(url, 'https?://([^/ ]+)', 1)) AS domain,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM u GROUP BY 1
    """
    # URL canonicalization + per-canonical keeper (VERDICT r11 #6):
    # the synthesis CASE and every canonicalization regex replay
    # operators/text.canonical_urls step for step (TRACKING_PARAM_RE
    # imported from the operator so the twins cannot drift)
    from tweetaggregates_spark.operators.text import TRACKING_PARAM_RE

    sql["url_canonical_docs"] = f"""
        WITH aug AS (
          SELECT doc_id, text || ' ' ||
            CASE doc_id % 6
              WHEN 0 THEN 'https://WWW.Example.COM/page/'
                          || CAST(doc_id - doc_id % 6 AS VARCHAR)
                          || '?utm_source=x&id=7'
              WHEN 1 THEN 'https://example.com:443/page/'
                          || CAST(doc_id - doc_id % 6 AS VARCHAR)
                          || '/?id=7&fbclid=abc'
              WHEN 2 THEN 'https://example.com/page/'
                          || CAST(doc_id - doc_id % 6 AS VARCHAR)
                          || '?ref=tw&id=7'
              WHEN 3 THEN 'http://blog.example.org:80/post/'
                          || CAST(doc_id AS VARCHAR) || '#frag'
              WHEN 4 THEN 'https://news.example.net/a/'
                          || CAST(doc_id AS VARCHAR) || '?b=2&a=1'
              ELSE 'https://example.com/page/'
                   || CAST(doc_id - doc_id % 6 AS VARCHAR)
            END AS text
          FROM documents
        ),
        raw AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '{_url_frag}'))
                   AS url
          FROM aug
        ),
        c0 AS (
          SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u
          FROM raw
        ),
        c1 AS (
          SELECT doc_id, url,
                 lower(regexp_extract(u, '^(https?)://', 1)) AS scheme,
                 regexp_replace(
                   lower(regexp_extract(u, '^https?://([^/?#]+)', 1)),
                   '^www\\.', '') AS host0,
                 regexp_extract(u, '^https?://[^/?#]+(.*)$', 1) AS rest
          FROM c0
        ),
        c2 AS (
          SELECT doc_id, url, scheme,
                 CASE WHEN scheme = 'http'
                      THEN regexp_replace(host0, ':80$', '')
                      ELSE regexp_replace(host0, ':443$', '') END AS host,
                 regexp_replace(
                   regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
                 regexp_extract(rest, '^[^?]*\\?(.*)$', 1) AS query
          FROM c1
        ),
        c3 AS (
          SELECT doc_id, url,
                 scheme || '://' || host || path ||
                 CASE WHEN qkept <> '' THEN '?' || qkept ELSE '' END
                   AS canonical_url
          FROM (
            SELECT *, array_to_string(list_sort(list_filter(
                     string_split(query, '&'),
                     p -> p <> '' AND NOT regexp_matches(
                       p, '{TRACKING_PARAM_RE}'))), '&') AS qkept
            FROM c2)
        ),
        keeper AS (
          SELECT canonical_url, min(doc_id) AS keeper_doc_id
          FROM c3 GROUP BY 1
        )
        SELECT c3.doc_id, c3.url, c3.canonical_url, k.keeper_doc_id,
               c3.doc_id = k.keeper_doc_id AS is_keeper
        FROM c3 JOIN keeper k USING (canonical_url)
    """
    # corpus snapshot diff (round 12): both snapshots reduce to
    # (id, content hash) and meet in one FULL OUTER join; the
    # synthesis CASE replays _docs -> v2 (remove %11, edit %7, add
    # shifted %13)
    sql["corpus_diff_docs"] = f"""
        WITH old AS (
          SELECT doc_id, {_D_HASH.format(x="text")} AS old_hash
          FROM documents
        ),
        newsnap AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' revised'
                      ELSE text END AS text
          FROM documents WHERE doc_id % 11 <> 0
          UNION ALL
          SELECT doc_id + 2000000 AS doc_id, text
          FROM documents WHERE doc_id % 13 = 0
        ),
        new AS (
          SELECT doc_id, {_D_HASH.format(x="text")} AS new_hash
          FROM newsnap
        )
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.old_hash <> n.new_hash THEN 'changed'
                    ELSE 'unchanged' END AS status,
               o.old_hash, n.new_hash
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """
    # snapshot-ingest composition (round 12): fold only the diff's
    # added+changed slice into v1's content-hash index; the
    # batching-invariant fold makes the result the one-shot
    # exact_dedup over v1 + that slice, written here as predicates —
    # hash equality proves the diff-driven selection is exact
    sql["snapshot_ingest_docs"] = f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id, text || ' revised' AS text FROM documents
          WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
          UNION ALL
          SELECT doc_id + 2000000 AS doc_id, text FROM documents
          WHERE doc_id % 13 = 0
        )
        SELECT {_D_HASH.format(x="text")} AS content_hash,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM corpus GROUP BY 1
    """
    # one-permutation minhash (round 12): ONE hash per shingle
    # scattered into h mod 16 buckets, per-bucket min, empty buckets
    # densified by circular borrow + offset — then the standard
    # banding. The pairs entry runs on the duplicated crawl; the
    # audit entry reuses the lsh_recall shape on the 20% sample.
    _oph_mins = ",\n".join(
        f"min(CASE WHEN h % 16 = {i} THEN h END) AS m{i}"
        for i in range(16)
    )
    _oph_dense = ",\n".join(
        "coalesce("
        + ", ".join(f"m{(i + j) % 16} + {j}" for j in range(16))
        + f") AS mh{i}"
        for i in range(16)
    )
    _oph_body = f"""
        hsrc AS (SELECT doc_id, {_D_HASH.format(x="shingle")} AS h
                 FROM sh),
        mins AS (SELECT doc_id, {_oph_mins} FROM hsrc GROUP BY doc_id),
        sig AS (SELECT doc_id, {_oph_dense} FROM mins),
        bands AS ({_BAND_SELECTS}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
        )
    """
    _oph_pairs_sql = (
        _D_SHINGLES.replace(
            "FROM documents",
            """FROM (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id % 5 = 0
        )""",
        )
        + ",\n"
        + _oph_body
        + "\n        SELECT doc_a, doc_b FROM cand"
    )
    sql["oph_lsh_pairs_docs"] = _oph_pairs_sql
    _oph_recall_sql = f"""
        {_D_SHINGLES},
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS n_inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        truth AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE round(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.3
        ),
        {_oph_body},
        hit AS (SELECT count(*) AS n_hit
                FROM truth JOIN cand USING (doc_a, doc_b)),
        nt AS (SELECT count(*) AS n_truth FROM truth),
        nc AS (SELECT count(*) AS n_cand FROM cand)
        SELECT CAST(n_truth AS BIGINT) AS n_truth,
               CAST(n_cand AS BIGINT) AS n_cand,
               CAST(n_hit AS BIGINT) AS n_hit,
               round(n_hit / greatest(n_truth, 1), 6) AS recall,
               round(n_hit / greatest(n_cand, 1), 6) AS precision
        FROM nt CROSS JOIN nc CROSS JOIN hit
    """
    assert _oph_recall_sql.count("FROM documents") == 1
    sql["oph_lsh_recall_docs"] = _oph_recall_sql.replace(
        "FROM documents", f"FROM documents WHERE {_LSHAUDIT_PRED}"
    )
    # full BPE trainer + tokenizer (round 12): 8 unrolled training
    # rounds — per-round pair counts over the symbolized train vocab,
    # the (count desc, a asc, b asc) argmax, and the merge applied
    # with the EXACT greedy left-to-right non-overlapping fold
    # (_apply_merge): list_reduce carries the out-list as a
    # ','-joined string (symbols are alnum, ',' is safe), merging the
    # tail when (tail, x) == (a, b) — verified value-identical to the
    # Spark fold incl. the ["aa","a"] overlap case. Apply step: vocab
    # lookup with char-count OOV fallback over the full corpus.
    _bpe_rounds = []
    for _r in range(1, 9):
        _prev = f"r{_r - 1}"
        _bpe_rounds.append(f"""
        p{_r} AS (
          SELECT u.a AS a, u.b AS b, CAST(sum(wc) AS BIGINT) AS pc
          FROM (
            SELECT wc, unnest([{{'a': syms[i], 'b': syms[i+1]}}
                               for i in range(1, len(syms))]) AS u
            FROM {_prev}
          )
          GROUP BY 1, 2
        ),
        m{_r} AS (SELECT a, b FROM p{_r}
                  ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
        r{_r} AS (
          SELECT word, wc,
                 CASE WHEN m.a IS NULL THEN syms
                      ELSE string_split(list_reduce(syms,
                        (acc, x) -> CASE
                          WHEN regexp_extract(acc, '([^,]*)$', 1) = m.a
                               AND x = m.b
                          THEN substr(acc, 1,
                                      length(acc) - length(m.a))
                               || m.a || m.b
                          ELSE acc || ',' || x END), ',')
                 END AS syms
          FROM {_prev} LEFT JOIN m{_r} m ON TRUE
        )""")
    sql["bpe_token_counts_docs"] = f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        trainwords AS (
          SELECT word, CAST(count(*) AS BIGINT) AS wc
          FROM (SELECT unnest(toks) AS word FROM toksrc
                WHERE doc_id % 2 = 0)
          GROUP BY 1
        ),
        r0 AS (
          SELECT word, wc,
                 [substr(word, i, 1)
                  for i in range(1, length(word) + 1)] AS syms
          FROM trainwords
        ),
        {",".join(_bpe_rounds)},
        words AS (SELECT doc_id, unnest(toks) AS word FROM toksrc),
        seg AS (SELECT word, len(syms) AS n_sym FROM r8)
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(coalesce(s.n_sym, length(w.word)))
                    AS BIGINT) AS n_bpe_tokens
        FROM words w LEFT JOIN seg s USING (word)
        GROUP BY 1
    """
    # one-row corpus datasheet (round 12): totals, cardinalities,
    # exact-dup rate and the DECIMAL-routed mean quality — one scan
    sql["dataset_card_docs"] = f"""
        WITH corpus AS (
          SELECT doc_id, text, source, lang FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text, source, lang
          FROM documents WHERE doc_id % 5 = 0
        ),
        t AS (
          SELECT doc_id, source, lang,
                 len({_D_TOKS}) AS nt,
                 length(text) AS nc,
                 {_D_HASH.format(x="text")} AS h,
                 round((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)) * 0.5
                   + least(len({_D_TOKS}) / 100.0, 1.0) * 0.5, 6) AS q
          FROM corpus
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS n_tokens,
               CAST(sum(nc) AS BIGINT) AS n_chars,
               round(CAST(sum(nt) AS DOUBLE) / count(*), 6)
                 AS mean_doc_tokens,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6)
                 AS dup_rate,
               round(CAST(sum(CAST(q AS DECIMAL(28,12))) AS DOUBLE)
                 / count(*), 6) AS mean_quality
        FROM t
    """
    # per-source quality calibration (round 12): the quality_docs
    # score formula + a per-source (score desc, doc_id) row_number
    # and the exact integer keep cut 5*rank <= 4*n — no float
    # threshold for the engines to disagree on
    sql["quality_calibrated_docs"] = f"""
        WITH t AS (SELECT doc_id, source, text, {_D_TOKS} AS toks
                   FROM documents),
        s AS (
          SELECT doc_id, source,
                 round((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)) * 0.5
                   + least(len(toks) / 100.0, 1.0) * 0.5, 6)
                   AS quality_score
          FROM t
        ),
        r AS (
          SELECT doc_id, source, quality_score,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY quality_score DESC, doc_id ASC)
                   AS INTEGER) AS q_rank,
                 CAST(count(*) OVER (PARTITION BY source)
                   AS BIGINT) AS n_source
          FROM s
        )
        SELECT doc_id, source, quality_score, q_rank, n_source,
               5 * q_rank <= 4 * n_source AS keep
        FROM r
    """
    # per-segment language ID + per-doc mixture profile (round 12):
    # replays the segment split, the per-segment lang_id CASE (shared
    # _LANG fragments over seg tokens), and the count/majority fold —
    # counts keyed by the SAME fixed tie order as the operator
    from tweetaggregates_spark.operators.text import SEG_SPLIT_RE

    _seg_langs = list(LANG_STOPWORDS) + ["unknown"]
    _seg_counts = ",\n".join(
        f"CAST(sum(CASE WHEN lang_pred = '{L}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{L}"
        for L in _seg_langs
    )
    _seg_ncols = ", ".join(
        f"coalesce(n_{L}, 0) AS n_{L}" for L in _seg_langs
    )
    _seg_best = "greatest(" + ", ".join(f"n_{L}" for L in _seg_langs) + ")"
    _seg_maj = "\n".join(
        f"WHEN n_{L} = g THEN '{L}'" for L in _seg_langs
    )
    sql["lang_segments_docs"] = f"""
        WITH aug AS (
          SELECT doc_id,
                 CASE doc_id % 3
                   WHEN 0 THEN text ||
                     '. el que los se del las por con una su.'
                   WHEN 1 THEN text ||
                     '. der die das und ist nicht ein eine zu den.'
                   ELSE text END AS text
          FROM documents
        ),
        segsrc AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(text, '{SEG_SPLIT_RE}'))
                   AS seg_text
          FROM aug
        ),
        toksrc AS (
          SELECT doc_id,
                 {_D_TOKS.replace("lower(text)", "lower(seg_text)")} AS toks
          FROM segsrc
        ),
        f AS (SELECT doc_id, toks FROM toksrc WHERE len(toks) >= 3),
        r AS (SELECT doc_id, {_LANG_RATIO_COLS} FROM f),
        p AS (
          SELECT doc_id,
                 CASE WHEN {_LANG_BEST} < {LANG_PRED_THRESHOLD}
                      THEN 'unknown'
                      {_LANG_PRED_WHENS}
                      END AS lang_pred
          FROM r
        ),
        per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
                 {_seg_counts}
          FROM p GROUP BY 1
        ),
        perg AS (SELECT *, {_seg_best} AS g FROM per)
        SELECT d.doc_id,
               coalesce(n_segments, 0) AS n_segments,
               {_seg_ncols},
               CASE WHEN perg.doc_id IS NULL THEN 'unknown'
                    {_seg_maj}
                    END AS majority_lang,
               coalesce(n_segments - g > 0, FALSE) AS is_mixed
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN perg USING (doc_id)
    """
    # the oracle computes daily counts straight from raw events; equality
    # with the Spark side (which re-aggregates the persisted 10-min
    # buckets) PROVES the rollup nesting property, not just the numbers
    sql["daily_rollup_counts"] = """
        SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                 AS window_time,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    """
    sql["q6_revenue_change"] = """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount
                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """
    sql["q10_returned_items"] = """
        WITH agg AS (
          SELECT c_custkey, c_name, n_name,
                 sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,6))) AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-10-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
          GROUP BY 1, 2, 3
        )
        SELECT c_custkey, c_name, n_name, CAST(rev AS DOUBLE) AS revenue
        FROM agg ORDER BY rev DESC, c_custkey ASC LIMIT 20
    """
    sql["q14_promo_revenue"] = """
        WITH j AS (
          SELECT CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,6)) AS r, p_type
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-09-01'
            AND l_shipdate < TIMESTAMP '1997-10-01'
        ),
        a AS (
          SELECT sum(CASE WHEN p_type = 'PROMO' THEN r
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS promo,
                 sum(r) AS total
          FROM j
        )
        SELECT round(100.0 * promo / total, 6) AS promo_revenue_pct,
               CAST(promo AS DOUBLE) AS promo_revenue,
               CAST(total AS DOUBLE) AS total_revenue
        FROM a
    """
    sql["q18_large_orders"] = """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_qty
          FROM lineitem GROUP BY 1
          HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   > 250
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """
    # banded SimHash must equal the all-pairs result (pigeonhole
    # recall=1). Round 4: the registered entry runs the PRODUCTION
    # shape (32-bit fingerprints, hamming <= 3, 8-bit bands); the
    # oracle recomputes the same 32-bit fingerprint and verifies with
    # all-pairs hamming — the hash-match gate therefore proves both
    # the fingerprint math and the banding's recall at once.
    sql["simhash_pairs_banded"] = f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM toksrc),
        h AS (SELECT doc_id, {_D_HASH.format(x="t")} AS h FROM tok),
        sums AS (SELECT doc_id, {_SIMHASH_SUMS32} FROM h GROUP BY doc_id),
        fp AS (SELECT doc_id, CAST({_SIMHASH_VAL32} AS BIGINT) AS simhash
               FROM sums)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                 AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """
    # the capped LSH variant equals the uncapped result on normal data
    # (no bucket exceeds the cap at sf0.01; quarantine path is pytested)
    sql["minhash_lsh_capped"] = sql["minhash_lsh_docs"]
    # k-means (k=8, 2 unrolled Lloyd iterations, lowest-id init):
    # the oracle REPLAYS every step — centroid means through
    # DECIMAL(28,12) + round(6) (identical in both engines), distances
    # as in-order folds over identical values, argmin ties broken by
    # cluster id — so the final assignment is bit-comparable.
    _KM_DIST = lambda e, c: (  # noqa: E731
        f"list_sum([ (CAST({e}[i] AS DOUBLE) - {c}[i])"
        f" * (CAST({e}[i] AS DOUBLE) - {c}[i])"
        f" for i in range(1, len({e}) + 1) ])"
    )
    # seed CTE variants: fixed k=8 (kmeans_clusters_embeddings) vs the
    # adaptive production rule k = greatest(2, ceil(n/250)) — a
    # deterministic function of the data, so the twin replays it
    # (VERDICT r4 #2; mirrors cluster.semantic_dup_pairs k=None)
    _C0_FIXED8 = """
        c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                 [CAST(x AS DOUBLE) for x in embedding] AS carr
          FROM (SELECT vec_id, embedding FROM embeddings
                ORDER BY vec_id LIMIT 8)
        )
    """
    _C0_ADAPTIVE250 = """
        kk AS (
          SELECT greatest(2, CAST(ceil(count(*) / 250.0) AS BIGINT)) AS k
          FROM embeddings
        ),
        c0 AS (
          SELECT rn - 1 AS cluster,
                 [CAST(x AS DOUBLE) for x in embedding] AS carr
          FROM (SELECT vec_id, embedding,
                       row_number() OVER (ORDER BY vec_id) AS rn
                FROM embeddings) e, kk
          WHERE e.rn <= kk.k
        )
    """
    _km_body = lambda c0: f"""
        WITH {c0},
        a1r AS (
          SELECT e.vec_id, e.embedding, c.cluster,
                 {_KM_DIST("e.embedding", "c.carr")} AS d
          FROM embeddings e CROSS JOIN c0 c
        ),
        a1 AS (
          SELECT vec_id, embedding, cluster, d FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cluster) AS rn
            FROM a1r) WHERE rn = 1
        ),
        x1 AS (
          SELECT cluster,
                 unnest(range(1, len(embedding) + 1)) AS dim,
                 unnest(embedding) AS x
          FROM a1
        ),
        u1 AS (
          SELECT cluster, dim,
                 round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12)))
                            AS DOUBLE) / count(*), 6) AS c
          FROM x1 GROUP BY 1, 2
        ),
        c1 AS (SELECT cluster, list(c ORDER BY dim) AS carr
               FROM u1 GROUP BY cluster),
        a2r AS (
          SELECT e.vec_id, e.embedding, c.cluster,
                 {_KM_DIST("e.embedding", "c.carr")} AS d
          FROM embeddings e CROSS JOIN c1 c
        ),
        a2 AS (
          SELECT vec_id, embedding, cluster, d FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cluster) AS rn
            FROM a2r) WHERE rn = 1
        ),
        x2 AS (
          SELECT cluster,
                 unnest(range(1, len(embedding) + 1)) AS dim,
                 unnest(embedding) AS x
          FROM a2
        ),
        u2 AS (
          SELECT cluster, dim,
                 round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12)))
                            AS DOUBLE) / count(*), 6) AS c
          FROM x2 GROUP BY 1, 2
        ),
        c2 AS (SELECT cluster, list(c ORDER BY dim) AS carr
               FROM u2 GROUP BY cluster),
        afr AS (
          SELECT e.vec_id, e.embedding, c.cluster,
                 {_KM_DIST("e.embedding", "c.carr")} AS d
          FROM embeddings e CROSS JOIN c2 c
        ),
        af AS (
          SELECT vec_id, embedding, cluster, d FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cluster) AS rn
            FROM afr) WHERE rn = 1
        )
    """
    sql["kmeans_clusters_embeddings"] = (
        _km_body(_C0_FIXED8)
        + """
        SELECT vec_id, cluster, round(d, 6) AS dist FROM af
    """
    )
    sql["semantic_dup_embeddings"] = (
        _km_body(_C0_ADAPTIVE250)
        + """
        , afd AS (
          SELECT vec_id, cluster,
                 [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM af
        ),
        afn AS (
          SELECT vec_id, cluster,
                 [x / sqrt(list_dot_product(v, v)) for x in v] AS nv
          FROM afd
        ),
        pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cluster,
                 round(list_dot_product(a.nv, b.nv), 6) AS cos_sim
          FROM afn a JOIN afn b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, cluster, cos_sim
        FROM pairs WHERE cos_sim >= 0.4
    """
    )
    # BPE merge candidates: adjacent char pairs over the distinct-word
    # frequency table, weighted by word count
    sql["bpe_merges_docs"] = f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        w AS (SELECT unnest(toks) AS word FROM toksrc),
        wf AS (
          SELECT word, count(*) AS wc
          FROM w WHERE length(word) >= 2 GROUP BY 1
        ),
        p AS (
          SELECT wc,
                 unnest([ substr(word, i, 1) || ' ' || substr(word, i + 1, 1)
                          for i in range(1, length(word)) ]) AS pair
          FROM wf
        ),
        c AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS pair_count
              FROM p GROUP BY 1)
        SELECT pair, pair_count,
               CAST(row_number() OVER (
                 ORDER BY pair_count DESC, pair ASC) AS INTEGER) AS rank
        FROM c ORDER BY pair_count DESC, pair ASC LIMIT 20
    """
    # unigram-LM quality scores: both engines fit the same add-1
    # smoothed model, round log p to 9 dp, and DECIMAL-sum per doc
    sql["lm_quality_docs"] = f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM toksrc),
        model AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                       count(*) AS vocab
                FROM model),
        lp AS (
          SELECT token,
                 round(ln((c + 1.0) / (n_total + 1.0 * vocab)), 9) AS lp
          FROM model CROSS JOIN tot
        ),
        perdoc AS (
          SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 round(CAST(sum(CAST(lp AS DECIMAL(28,12))) AS DOUBLE)
                       / count(*), 6) AS avg_logprob
          FROM tok t JOIN lp USING (token)
          GROUP BY 1
        )
        SELECT doc_id, n_tokens, avg_logprob,
               round(exp(-avg_logprob), 6) AS ppl
        FROM perdoc
    """
    # PQ/ADC ANN with the init-only codebook (code c = subvector of the
    # c-th lowest-id vector): encode by per-subspace argmin, query
    # distance tables, ADC = subspace-ORDERED fold of table lookups
    sql["knn_pq_embeddings"] = f"""
        WITH emb AS (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings
        ),
        init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16)
        ),
        ss AS (SELECT unnest(range(0, 4)) AS subspace),
        cb AS (
          SELECT ss.subspace, init.code,
                 v[ss.subspace * 16 + 1 : ss.subspace * 16 + 16] AS centroid
          FROM init CROSS JOIN ss
        ),
        subs AS (
          SELECT vec_id, ss.subspace,
                 v[ss.subspace * 16 + 1 : ss.subspace * 16 + 16] AS sv
          FROM emb CROSS JOIN ss
        ),
        encr AS (
          SELECT s.vec_id, s.subspace, c.code,
                 list_sum([ (s.sv[i] - c.centroid[i]) * (s.sv[i] - c.centroid[i])
                            for i in range(1, 17) ]) AS d
          FROM subs s JOIN cb c ON s.subspace = c.subspace
        ),
        enc AS (
          SELECT vec_id, subspace, code FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
            FROM encr) WHERE rn = 1
        ),
        dtable AS (
          SELECT s.vec_id AS query_id, s.subspace, c.code,
                 list_sum([ (s.sv[i] - c.centroid[i]) * (s.sv[i] - c.centroid[i])
                            for i in range(1, 17) ]) AS dp
          FROM subs s JOIN cb c ON s.subspace = c.subspace
          WHERE s.vec_id < 10
        ),
        scored AS (
          SELECT t.query_id, e.vec_id AS neighbor_id,
                 list_sum(list(t.dp ORDER BY t.subspace)) AS approx_dist
          FROM enc e JOIN dtable t
            ON e.subspace = t.subspace AND e.code = t.code
          WHERE t.query_id <> e.vec_id
          GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id,
               round(approx_dist, 6) AS approx_dist,
               CAST(rnk AS INTEGER) AS knn_rank
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_dist, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
    """
    # IVF-ADC: the knn_pq path gated by an init-only coarse quantizer —
    # cells seed from the 8 lowest-id vectors, every corpus vector joins
    # its argmin cell, each query probes its 2 nearest cells, and ADC
    # scores only candidates whose cell is probed
    sql["knn_ivf_pq_embeddings"] = f"""
        WITH emb AS (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings
        ),
        cells AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)
        ),
        cdist AS (
          SELECT e.vec_id, c.cell,
                 list_sum([ (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                            for i in range(1, len(e.v) + 1) ]) AS d
          FROM emb e CROSS JOIN cells c
        ),
        cellasg AS (
          SELECT vec_id, cell FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM cdist) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM cdist WHERE vec_id < 10) WHERE rn <= 2
        ),
        init AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16)
        ),
        ss AS (SELECT unnest(range(0, 4)) AS subspace),
        cb AS (
          SELECT ss.subspace, init.code,
                 v[ss.subspace * 16 + 1 : ss.subspace * 16 + 16] AS centroid
          FROM init CROSS JOIN ss
        ),
        subs AS (
          SELECT vec_id, ss.subspace,
                 v[ss.subspace * 16 + 1 : ss.subspace * 16 + 16] AS sv
          FROM emb CROSS JOIN ss
        ),
        encr AS (
          SELECT s.vec_id, s.subspace, c.code,
                 list_sum([ (s.sv[i] - c.centroid[i]) * (s.sv[i] - c.centroid[i])
                            for i in range(1, 17) ]) AS d
          FROM subs s JOIN cb c ON s.subspace = c.subspace
        ),
        enc AS (
          SELECT vec_id, subspace, code FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, subspace ORDER BY d, code) AS rn
            FROM encr) WHERE rn = 1
        ),
        dtable AS (
          SELECT s.vec_id AS query_id, s.subspace, c.code,
                 list_sum([ (s.sv[i] - c.centroid[i]) * (s.sv[i] - c.centroid[i])
                            for i in range(1, 17) ]) AS dp
          FROM subs s JOIN cb c ON s.subspace = c.subspace
          WHERE s.vec_id < 10
        ),
        scored AS (
          SELECT t.query_id, e.vec_id AS neighbor_id,
                 list_sum(list(t.dp ORDER BY t.subspace)) AS approx_dist
          FROM enc e
          JOIN cellasg a ON a.vec_id = e.vec_id
          JOIN probes p ON p.cell = a.cell
          JOIN dtable t
            ON t.query_id = p.query_id
           AND e.subspace = t.subspace AND e.code = t.code
          WHERE t.query_id <> e.vec_id
          GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id,
               round(approx_dist, 6) AS approx_dist,
               CAST(rnk AS INTEGER) AS knn_rank
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_dist, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
    """
    # incremental IVF-PQ lifecycle (VERDICT r11 #5): appended codes
    # are bit-identical to a from-scratch encode with the same
    # quantizers and compaction is a pure layout rewrite, so the
    # build(even)+append(odd)+compact+probe pipeline EQUALS the
    # init-only twin with its quantizer seeds drawn from the even
    # half — one WHERE on the two seed subqueries rewrites the twin
    assert (
        sql["knn_ivf_pq_embeddings"].count("FROM emb ORDER BY vec_id LIMIT")
        == 2
    )
    sql["incremental_ann_ivf_embeddings"] = sql[
        "knn_ivf_pq_embeddings"
    ].replace(
        "FROM emb ORDER BY vec_id LIMIT",
        "FROM emb WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT",
    )
    # metadata-filtered exact kNN: the knn_cosine shape with the
    # predicate restricting the CORPUS side only (pre-filter strategy)
    sql["knn_filtered_embeddings"] = f"""
        WITH e AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        s AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {_D_COS} AS cos_sim
          FROM e q JOIN e c
            ON q.vec_id < 20 AND c.label = 1 AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cos_sim,
               CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id ASC)
                 AS INTEGER) AS knn_rank
        FROM s QUALIFY knn_rank <= 5
    """
    # filtered-ANN recall audit (round 12): replay the post-filter
    # pipeline — init-only cosine coarse quantizer (8 lowest-id
    # vectors; assignment ties to the HIGHER cell id, matching
    # _nearest_cells' reverse(array_sort(struct(sim, cell)))), probe 2
    # cells, rank top k*overfetch=10 by rounded cosine PRE-filter,
    # filter label = 1, keep top 5 — then the ann_recall fold against
    # the pre-filtered exact truth (per-query denominator <= k)
    _cosql = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * "
        "sqrt(list_dot_product({b}, {b}))), {dp})"
    )
    sql["ann_filtered_recall_embeddings"] = f"""
        WITH e AS (
          SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings
        ),
        cells AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
          FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
        ),
        sim AS (
          SELECT e.vec_id, c.cell,
                 {_cosql.format(a="e.v", b="c.cv", dp=9)} AS s
          FROM e CROSS JOIN cells c
        ),
        asg AS (
          SELECT vec_id, cell FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
            FROM sim) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
            FROM sim WHERE vec_id < 20) WHERE rn <= 2
        ),
        scored AS (
          SELECT p.query_id, n.vec_id AS neighbor_id, n.label,
                 {_cosql.format(a="q.v", b="n.v", dp=6)} AS cos_sim
          FROM probes p
          JOIN asg a ON a.cell = p.cell
          JOIN e n ON n.vec_id = a.vec_id
          JOIN e q ON q.vec_id = p.query_id
          WHERE n.vec_id <> p.query_id
        ),
        pre AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS pr
            FROM scored) WHERE pr <= 10
        ),
        approx AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
              PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS kr
            FROM pre WHERE label = 1) WHERE kr <= 5
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY {_cosql.format(a="q.v", b="c.v", dp=6)} DESC,
                              c.vec_id ASC) AS kr
            FROM e q JOIN e c
              ON q.vec_id < 20 AND c.label = 1 AND q.vec_id <> c.vec_id
          ) WHERE kr <= 5
        ),
        hits AS (
          SELECT query_id, count(*) AS n_hits
          FROM exact JOIN approx USING (query_id, neighbor_id)
          GROUP BY 1
        ),
        qn AS (
          SELECT query_id, least(count(*), 5) AS n_exact
          FROM exact GROUP BY 1
        )
        SELECT q.query_id,
               CAST(coalesce(h.n_hits, 0) AS INTEGER) AS n_hits,
               round(coalesce(h.n_hits, 0) / q.n_exact, 6) AS recall
        FROM qn q LEFT JOIN hits h USING (query_id)
    """
    # TRAINED IVF-ADC (knn_ivf_pq_trained_embeddings): one Lloyd
    # iteration for the coarse quantizer and for each of the m=4
    # per-subspace PQ codebooks — 5 k-means trainings replayed in SQL.
    # _km1 emits a 1-iteration chain: seeds (k lowest ids) -> assign ->
    # DECIMAL-mean rounded update -> trained centroids {p}c1; mirrors
    # _km_body's mechanics (cluster.kmeans determinism contract).
    def _km1(p, src, vc, k):
        d = _KM_DIST(f"e.{vc}", "c.carr")
        return f"""
        {p}c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                 {vc} AS carr
          FROM (SELECT vec_id, {vc} FROM {src} ORDER BY vec_id LIMIT {k})
        ),
        {p}a1 AS (
          SELECT vec_id, {vc}, cluster FROM (
            SELECT e.vec_id, e.{vc}, c.cluster,
                   row_number() OVER (
                     PARTITION BY e.vec_id ORDER BY {d}, c.cluster) AS rn
            FROM {src} e CROSS JOIN {p}c0 c) WHERE rn = 1
        ),
        {p}u1 AS (
          SELECT cluster, dim,
                 round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12)))
                            AS DOUBLE) / count(*), 6) AS cm
          FROM (SELECT cluster,
                       unnest(range(1, len({vc}) + 1)) AS dim,
                       unnest({vc}) AS x
                FROM {p}a1)
          GROUP BY 1, 2
        ),
        {p}c1 AS (SELECT cluster, list(cm ORDER BY dim) AS carr
                  FROM {p}u1 GROUP BY cluster)"""

    _M, _SUB = 4, 16
    _sub_srcs = ",".join(
        f"""
        sub{s} AS (SELECT vec_id,
                          v[{s * _SUB + 1}:{s * _SUB + _SUB}] AS sv
                   FROM emb)"""
        for s in range(_M)
    )
    _sub_kms = ",".join(_km1(f"s{s}_", f"sub{s}", "sv", 16) for s in range(_M))
    _encs = "\n          UNION ALL\n".join(
        f"""
          SELECT vec_id, {s} AS subspace, cluster AS code FROM (
            SELECT e.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {_KM_DIST("e.sv", "c.carr")}, c.cluster) AS rn
            FROM sub{s} e CROSS JOIN s{s}_c1 c) WHERE rn = 1"""
        for s in range(_M)
    )
    _dts = "\n          UNION ALL\n".join(
        f"""
          SELECT e.vec_id AS query_id, {s} AS subspace,
                 c.cluster AS code,
                 {_KM_DIST("e.sv", "c.carr")} AS dp
          FROM sub{s} e CROSS JOIN s{s}_c1 c
          WHERE e.vec_id < 10"""
        for s in range(_M)
    )
    # shared WITH-body through the ADC `scored` CTE: the trained twin
    # ranks it directly; the REFINED twin (knn_ivf_pq_refined_
    # embeddings, VERDICT r5 #6 — the faiss IVFPQ+Refine pattern)
    # shortlists depth-20 by ADC order and re-ranks the final 5 by
    # EXACT squared L2 over the true vectors.
    _trained_with = f"""
        WITH emb AS (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings
        ),
        {_km1("g_", "emb", "v", 8)},
        gfr AS (
          SELECT e.vec_id, c.cluster,
                 {_KM_DIST("e.v", "c.carr")} AS d
          FROM emb e CROSS JOIN g_c1 c
        ),
        cellasg AS (
          SELECT vec_id, cluster AS cell FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cluster) AS rn
            FROM gfr) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, cluster AS cell FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cluster) AS rn
            FROM gfr WHERE vec_id < 10) WHERE rn <= 2
        ),
        {_sub_srcs},
        {_sub_kms},
        enc AS ({_encs}),
        dtable AS ({_dts}),
        scored AS (
          SELECT t.query_id, e.vec_id AS neighbor_id,
                 list_sum(list(t.dp ORDER BY t.subspace)) AS approx_dist
          FROM enc e
          JOIN cellasg a ON a.vec_id = e.vec_id
          JOIN probes p ON p.cell = a.cell
          JOIN dtable t
            ON t.query_id = p.query_id
           AND e.subspace = t.subspace AND e.code = t.code
          WHERE t.query_id <> e.vec_id
          GROUP BY 1, 2
        )"""
    sql["knn_ivf_pq_trained_embeddings"] = _trained_with + """
        SELECT query_id, neighbor_id,
               round(approx_dist, 6) AS approx_dist,
               CAST(rnk AS INTEGER) AS knn_rank
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY approx_dist, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
    """
    sql["knn_ivf_pq_refined_embeddings"] = _trained_with + f"""
        , short AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY approx_dist, neighbor_id
            ) AS rnk
            FROM scored)
          WHERE rnk <= 20
        ),
        ex AS (
          SELECT s.query_id, s.neighbor_id,
                 {_KM_DIST("q.v", "c.v")} AS exact_dist
          FROM short s
          JOIN emb q ON q.vec_id = s.query_id
          JOIN emb c ON c.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id,
               round(exact_dist, 6) AS exact_dist,
               CAST(rnk2 AS INTEGER) AS knn_rank
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY exact_dist, neighbor_id) AS rnk2
          FROM ex)
        WHERE rnk2 <= 5
    """
    # recall@5 of IVF-PQ+refine vs the exact L2 top-5: recompute both
    # sides (the approx side is the refined twin verbatim, as a
    # subquery) and the same |Q| x k intersection join
    sql["ann_recall_ivf_embeddings"] = f"""
        WITH approx AS ({sql["knn_ivf_pq_refined_embeddings"]}),
        e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
        exd AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round({_KM_DIST("q.v", "c.v")}, 6) AS l2_dist
          FROM e2 q JOIN e2 c
            ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY l2_dist ASC, neighbor_id ASC) AS rn
            FROM exd)
          WHERE rn <= 5
        ),
        hits AS (
          SELECT x.query_id, count(*) AS n_hits
          FROM exact x JOIN approx a
            ON x.query_id = a.query_id
           AND x.neighbor_id = a.neighbor_id
          GROUP BY x.query_id
        )
        SELECT q.query_id,
               CAST(coalesce(h.n_hits, 0) AS INTEGER) AS n_hits,
               round(coalesce(h.n_hits, 0) / q.n_exact, 6) AS recall
        FROM (SELECT query_id, least(count(*), 5) AS n_exact
              FROM exact GROUP BY query_id) q
        LEFT JOIN hits h ON q.query_id = h.query_id
    """
    # cross-document substring dedup: positional 8-token shingles,
    # hash equi-join, gaps-and-islands longest-run per (pair, diagonal)
    sql["substring_dup_docs"] = f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        t AS (SELECT doc_id, toks FROM toksrc WHERE len(toks) >= 8),
        sh0 AS (SELECT doc_id, toks,
                       unnest(range(1, len(toks) - 6)) AS pos
                FROM t),
        sh AS (SELECT doc_id, pos,
                      {_D_HASH.format(x="array_to_string(toks[pos:pos+7], ' ')")} AS h
               FROM sh0),
        m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pa, a.pos - b.pos AS diag
              FROM sh a JOIN sh b
                ON a.h = b.h AND a.doc_id < b.doc_id),
        isl AS (SELECT doc_a, doc_b, diag, pa,
                       pa - row_number() OVER (
                         PARTITION BY doc_a, doc_b, diag ORDER BY pa
                       ) AS island
                FROM m),
        runs AS (SELECT doc_a, doc_b, diag, island,
                        count(*) AS run_len
                 FROM isl GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b,
               CAST(sum(run_len) AS BIGINT) AS n_shared_shingles,
               CAST(max(run_len) + 7 AS BIGINT) AS max_span_tokens
        FROM runs GROUP BY 1, 2
    """
    # banded+verified cosine near-dups must equal the all-pairs result
    # (recall 1 in practice at these LSH parameters; see similarity.py)
    sql["cosine_near_dups_banded"] = sql["cosine_near_dups"]
    # blocked-matmul discovery + exact verify equals the all-pairs plan
    # by construction (margin overgenerates, verify is the same fold)
    sql["cosine_near_dups_blocked"] = sql["cosine_near_dups"]
    # tiled block-pair matmul (no driver collect) is the same discovery
    # + exact-verify contract: margin overgenerates, verify restores
    # bit-identity with the all-pairs plan
    sql["cosine_near_dups_tiled"] = sql["cosine_near_dups"]

    # connected components over the LSH pair graph: the oracle computes
    # the transitive closure with a recursive CTE and labels each node
    # with the min reachable id — equals hash-min label propagation at
    # fixpoint (operators/cluster.py)
    _lsh_cc_cte = f"""
            toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
            sh AS (SELECT doc_id, unnest(list_distinct({_D_SH3})) AS shingle
                   FROM toksrc),
            sig AS (SELECT doc_id, {_MINHASH_MINS} FROM sh GROUP BY doc_id),
            bands AS ({_BAND_SELECTS}),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
            ),
            edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach(u, r) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
            ),
            labels AS (SELECT u AS doc_id, min(r) AS cluster_id
                       FROM reach GROUP BY 1)
    """
    sql["dedup_clusters_docs"] = f"""
        WITH RECURSIVE {_lsh_cc_cte}
        SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN labels l USING (doc_id)
    """
    # incremental two-batch dedup is batching-invariant by construction
    # (CC under component contraction), so its oracle IS the one-shot
    # transitive closure — the hash gate proves the equivalence
    sql["incremental_dedup_docs"] = sql["dedup_clusters_docs"]
    # the O(batch) DELTA path (round 6): per-batch assignments equal
    # the one-shot closure restricted to the batch's docs
    sql["incremental_dedup_delta_docs"] = f"""
        WITH RECURSIVE {_lsh_cc_cte}
        SELECT d.doc_id,
               coalesce(l.cluster_id, d.doc_id) AS cluster,
               (coalesce(l.cluster_id, d.doc_id) <> d.doc_id)
                 AS is_duplicate
        FROM documents d LEFT JOIN labels l USING (doc_id)
        WHERE d.doc_id % 2 = 1
    """
    # incremental exact dedup: min/sum associativity makes the fold
    # batching-invariant, so its oracle IS the one-shot exact dedup
    sql["incremental_exact_dedup_docs"] = sql["exact_dedup_docs"]
    # streaming exact-dedup lifecycle: the folded persisted index is
    # batching-invariant (associative min/sum fold), so its oracle is
    # the same one-shot GROUP BY
    sql["stream_exact_dedup_docs"] = sql["exact_dedup_docs"]
    sql["canonical_docs"] = f"""
        WITH RECURSIVE {_lsh_cc_cte},
        cl AS (
          SELECT d.doc_id, d.n_chars,
                 coalesce(l.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN labels l USING (doc_id)
        ),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY cluster_id
                ORDER BY n_chars DESC, doc_id ASC) AS rn FROM cl)
        SELECT cluster_id,
               min(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
               CAST(count(*) AS BIGINT) AS n_members
        FROM r GROUP BY 1
    """

    sql["dup_cluster_size_histogram"] = f"""
        WITH RECURSIVE {_lsh_cc_cte},
        cl AS (
          SELECT coalesce(l.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN labels l USING (doc_id)
        ),
        s AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
                       AS cluster_size
              FROM cl GROUP BY 1)
        SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(count(*) * cluster_size AS BIGINT) AS n_docs
        FROM s GROUP BY 1
    """

    # deterministic hash sampling / split / shuffle / packing
    # (operators/sampling.py): pure functions of (salt, doc_id) in both
    # engines via the portable hash64
    def _dbucket(salt: str) -> str:
        key = f"concat('{salt}:', CAST(doc_id AS VARCHAR))"
        return f"({_D_HASH.format(x=key)} % 1000000)"

    sql["stratified_sample_docs"] = f"""
        SELECT doc_id, lang FROM documents
        WHERE {_dbucket("strata")} <
          CASE WHEN lang = 'en' THEN 500000
               WHEN lang = 'zh' THEN 250000
               ELSE 100000 END
    """
    sql["weighted_sample_docs"] = f"""
        WITH t AS (SELECT doc_id, text, {_D_TOKS} AS toks FROM documents),
        q AS (
          SELECT doc_id,
                 round((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)) * 0.5
                   + least(len(toks) / 100.0, 1.0) * 0.5, 6)
                   AS quality_score
          FROM t
        )
        SELECT doc_id, quality_score FROM q
        WHERE CAST({_dbucket("wsample")} AS DOUBLE)
              < quality_score * 0.8 * 1000000
    """
    sql["mixture_plan_docs"] = """
        WITH per AS (
          SELECT source,
                 CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE)
                   AS stratum_size
          FROM documents GROUP BY 1
        ),
        s AS (SELECT CAST(sum(CAST(stratum_size AS DECIMAL(18,0)))
                       AS DOUBLE) AS total_size,
                     CAST(count(*) AS BIGINT) AS n_strata
              FROM per)
        SELECT per.source, per.stratum_size,
               round(least(1.0, s.total_size * 0.5 / s.n_strata
                             / per.stratum_size), 6) AS planned_rate,
               round(round(least(1.0, s.total_size * 0.5 / s.n_strata
                                   / per.stratum_size), 6)
                     * per.stratum_size, 6) AS expected_size
        FROM per, s
    """
    sql["split_docs"] = f"""
        SELECT doc_id,
               CASE WHEN {_dbucket("split")} < 100000 THEN 'val'
                    WHEN {_dbucket("split")} < 200000 THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    """
    _shuf_h = _D_HASH.format(x="concat('shuffle:', CAST(doc_id AS VARCHAR))")
    sql["shuffle_order_docs"] = f"""
        WITH h AS (SELECT doc_id, {_shuf_h} AS h FROM documents)
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY h % 64, h, doc_id) - 1
                 AS BIGINT) AS pos
        FROM h
    """
    _pack_h = _D_HASH.format(x="concat('pack:', CAST(doc_id AS VARCHAR))")
    sql["pack_sequences_docs"] = f"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x <> '')) AS ntok,
                 {_pack_h} AS h
          FROM documents
        ),
        s AS (
          SELECT doc_id,
                 CAST(coalesce(sum(ntok) OVER (
                   ORDER BY h % 64, h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_offset
          FROM t
        )
        SELECT doc_id, start_offset,
               CAST(floor(start_offset / 2048) AS BIGINT) AS chunk_id
        FROM s
    """

    # text-index family (operators/text.py: vocab / tfidf / inverted
    # index) — shares the _D_TOKS tokenization contract
    sql["vocab_docs"] = f"""
        WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS token
                     FROM documents),
        agg AS (SELECT token, count(*) AS term_count,
                       count(DISTINCT doc_id) AS doc_count
                FROM tok GROUP BY 1),
        top AS (SELECT * FROM agg
                ORDER BY term_count DESC, token ASC LIMIT 200)
        SELECT token, term_count, doc_count,
               CAST(row_number() OVER (
                 ORDER BY term_count DESC, token ASC) AS INTEGER) AS rank
        FROM top
    """
    # ranking key is all-integer (tf DESC, doc_freq ASC, token) — the
    # rounded tfidf is a value column only, so ln() ulp noise can't
    # reorder rows
    sql["tfidf_docs"] = f"""
        WITH tok AS (SELECT doc_id, unnest({_D_TOKS}) AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM tok GROUP BY 1, 2 HAVING count(*) >= 2),
        dft AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.token, tf.tf, dft.doc_freq,
                 round(tf.tf * ln((n.n_docs + 1) / (dft.doc_freq + 1)),
                       6) AS tfidf
          FROM tf JOIN dft USING (token) CROSS JOIN n
        ),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY tf DESC, doc_freq ASC, token ASC) AS term_rank
              FROM scored)
        SELECT doc_id, token, tf, doc_freq, tfidf,
               CAST(term_rank AS INTEGER) AS term_rank
        FROM r WHERE term_rank <= 3
    """
    sql["inverted_index_docs"] = f"""
        WITH tok AS (SELECT DISTINCT doc_id, unnest({_D_TOKS}) AS token
                     FROM documents),
        counts AS (SELECT token, count(*) AS doc_freq FROM tok GROUP BY 1),
        ranked AS (SELECT token, doc_id, row_number() OVER (
                     PARTITION BY token ORDER BY doc_id) AS pos FROM tok),
        postings AS (SELECT token,
                       array_to_string(list(doc_id ORDER BY doc_id), ',')
                         AS postings
                     FROM ranked WHERE pos <= 10 GROUP BY 1)
        SELECT token, doc_freq, postings
        FROM counts JOIN postings USING (token)
        WHERE doc_freq >= 5
    """
    # exact per-dimension decimal sum, one cast to double, one IEEE
    # divide — order-free in both engines (similarity.label_centroids)
    sql["label_centroids"] = """
        WITH idx AS (SELECT label, embedding,
                            unnest(range(1, len(embedding) + 1)) AS i
                     FROM embeddings),
        ex AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim,
                      embedding[CAST(i AS INTEGER)] AS x
               FROM idx)
        SELECT label, dim,
               round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12)))
                       AS DOUBLE) / count(*), 6) AS centroid,
               count(*) AS n_vectors
        FROM ex GROUP BY 1, 2
    """

    # adapted TPC-H shapes (no commit/receipt dates or partsupp in the
    # testdata — see plans/star.py docstrings for the mapping)
    sql["q12_late_priority_counts"] = """
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN
                               ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN
                               ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY 1
    """
    sql["q4_priority_counts"] = """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate
                                           + INTERVAL 30 DAY)
        GROUP BY 1
    """
    sql["q16_supplier_counts"] = """
        WITH supply AS (
          SELECT l.l_suppkey, p.p_brand, p.p_type, p.p_size
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand <> 'Brand#45'
            AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
        ),
        agg AS (SELECT p_brand, p_type, p_size,
                       count(DISTINCT l_suppkey) AS supplier_cnt
                FROM supply GROUP BY 1, 2, 3),
        top AS (SELECT * FROM agg
                ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
                LIMIT 20)
        SELECT p_brand, p_type, p_size, supplier_cnt,
               CAST(row_number() OVER (
                 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size)
                 AS INTEGER) AS rank
        FROM top
    """
    sql["q19_disjunctive_revenue"] = """
        SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
               AND l_quantity BETWEEN 20 AND 30)
    """
    # CDC compaction: last write per key wins (unique event_id breaks
    # ts ties), version count proves the full history was seen
    sql["latest_events_snapshot"] = """
        WITH r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn,
                 count(*) OVER (
                   PARTITION BY user_id, event_type) AS n_versions
          FROM events
        )
        SELECT user_id, event_type, ts AS last_ts,
               event_id AS last_event_id, value AS last_value,
               n_versions
        FROM r WHERE rn = 1
    """
    # round-2 batch: the remaining feasible TPC-H plan shapes (see
    # plans/star.py docstrings for the no-partsupp/no-commitdate
    # adaptations)
    sql["q7_nation_volume"] = """
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
          AND ns.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND nc.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND ns.n_name <> nc.n_name
        GROUP BY 1, 2, 3
    """
    sql["q8_market_share"] = """
        WITH j AS (
          SELECT year(o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,6)) AS vol,
                 ns.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation nc ON c.c_nationkey = nc.n_nationkey
          JOIN region r ON nc.n_regionkey = r.r_regionkey
          JOIN nation ns ON s.s_nationkey = ns.n_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1999-01-01'
        )
        SELECT CAST(o_year AS BIGINT) AS o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                              THEN vol ELSE CAST(0 AS DECIMAL(18,6)) END)
                       AS DOUBLE)
                     / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
        FROM j GROUP BY 1
    """
    sql["q13_order_count_distribution"] = """
        WITH per_cust AS (
          SELECT c.c_custkey,
                 CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority = '1-URGENT'
           AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          GROUP BY 1
        )
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY 1
    """
    sql["q15_top_supplier"] = """
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,6))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY 1
        )
        SELECT r.l_suppkey AS s_suppkey, s.s_name,
               CAST(r.total_rev AS DOUBLE) AS total_revenue
        FROM rev r
        JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """
    sql["q17_small_quantity_revenue"] = """
        WITH brand_lines AS (
          SELECT l.*
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = 'Brand#1'
        ),
        per_part AS (
          SELECT l_partkey AS agg_partkey,
                 sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
                 CAST(count(*) AS BIGINT) AS n_lines
          FROM brand_lines GROUP BY 1
        )
        SELECT CAST(sum(CAST(b.l_extendedprice AS DECIMAL(18,6)))
                 AS DOUBLE) / 7.0 AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_small_lines
        FROM brand_lines b
        JOIN per_part a ON b.l_partkey = a.agg_partkey
        WHERE CAST(b.l_quantity AS DECIMAL(18,6)) * 5 * a.n_lines
              < a.sum_qty
    """
    sql["q22_idle_customers"] = """
        WITH pos AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_pos,
                 CAST(count(*) AS BIGINT) AS n_pos
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 AS totacctbal
        FROM customer c, pos
        WHERE c.c_acctbal * pos.n_pos > pos.total_pos
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY 1
    """
    sql["q2_min_cost_supplier"] = """
        WITH j AS (
          SELECT l.l_partkey, l.l_suppkey,
                 l.l_extendedprice / l.l_quantity AS unit_price
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = 'Brand#2'
        ),
        best AS (
          SELECT *, row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY unit_price ASC, l_suppkey ASC) AS rn
          FROM j
        )
        SELECT b.l_partkey AS p_partkey, b.l_suppkey AS s_suppkey,
               s.s_name, round(b.unit_price, 6) AS min_unit_price
        FROM best b JOIN supplier s ON b.l_suppkey = s.s_suppkey
        WHERE b.rn = 1
    """
    # int8 quantization family: all arithmetic is either exact integer
    # or the same IEEE op sequence ((x*127.0)/scale, floor(..+0.5)), so
    # every value hash-matches bit-for-bit
    _d_quant = """
        v AS (SELECT vec_id, label,
                     CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (SELECT vec_id, label, v,
                     greatest(list_max(list_transform(v, x -> abs(x))),
                              1e-12) AS scale
              FROM v),
        q AS (SELECT vec_id, label, v, scale,
                     list_transform(v, x -> CAST(floor(x * 127.0 / scale
                       + 0.5) AS BIGINT)) AS qvec
              FROM s)
    """
    sql["quantized_embeddings"] = f"""
        WITH {_d_quant}
        SELECT vec_id, round(scale, 6) AS scale,
               CAST(list_sum(qvec) AS BIGINT) AS q_sum,
               CAST(list_min(qvec) AS BIGINT) AS q_min,
               CAST(list_max(qvec) AS BIGINT) AS q_max
        FROM q
    """
    sql["knn_cosine_quantized"] = f"""
        WITH {_d_quant},
        qq AS (SELECT vec_id AS query_id, qvec AS q_q, v AS qv
               FROM q WHERE vec_id < 20),
        cq AS (SELECT vec_id AS neighbor_id, qvec AS c_q, v AS cv FROM q),
        cand AS (
          SELECT query_id, neighbor_id, qv, cv,
                 round(CAST(list_dot_product(q_q, c_q) AS DOUBLE)
                       / greatest(
                           sqrt(CAST(list_dot_product(q_q, q_q) AS DOUBLE))
                           * sqrt(CAST(list_dot_product(c_q, c_q)
                                  AS DOUBLE)), 1e-12), 6) AS q_cos
          FROM qq JOIN cq ON query_id <> neighbor_id
        ),
        short AS (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY q_cos DESC, neighbor_id ASC) AS crn
          FROM cand
        ),
        resc AS (
          SELECT query_id, neighbor_id, q_cos,
                 round(list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(cv, cv))), 6) AS cos_sim
          FROM short WHERE crn <= 15
        )
        SELECT query_id, neighbor_id, q_cos, cos_sim,
               CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id ASC)
                 AS INTEGER) AS knn_rank
        FROM resc QUALIFY knn_rank <= 5
    """
    sql["embedding_stats"] = """
        WITH v AS (SELECT label,
                          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        per AS (
          SELECT label, CAST(len(v) AS INTEGER) AS dim,
                 CAST(len(list_filter(v, x -> isnan(x))) AS BIGINT)
                   AS n_nan,
                 CAST(len(list_filter(v, x -> x = 0.0)) AS BIGINT)
                   AS n_zero,
                 round(sqrt(list_dot_product(v, v)), 6) AS l2
          FROM v
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
               min(dim) AS min_dim, max(dim) AS max_dim,
               CAST(sum(n_nan) AS BIGINT) AS total_nan,
               CAST(sum(n_zero) AS BIGINT) AS total_zero,
               round(CAST(sum(CAST(l2 AS DECIMAL(28,12))) AS DOUBLE)
                     / count(*), 6) AS avg_l2_norm
        FROM per GROUP BY 1
    """
    sql["chunk_docs"] = f"""
        WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        c AS (SELECT doc_id, toks,
                     1 + CAST(ceil(greatest(len(toks) - 16, 0) / 8.0)
                       AS INTEGER) AS n_chunks
              FROM t),
        e AS (SELECT doc_id, toks,
                     unnest(range(n_chunks)) AS chunk_id
              FROM c)
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(chunk_id * 8 AS INTEGER) AS tok_start,
               CAST(len(toks[(chunk_id*8+1):(chunk_id*8+16)])
                 AS INTEGER) AS n_tokens,
               array_to_string(toks[(chunk_id*8+1):(chunk_id*8+16)], ' ')
                 AS chunk_text
        FROM e
        WHERE len(toks[(chunk_id*8+1):(chunk_id*8+16)]) > 0
    """
    sql["repeated_ngrams_docs"] = f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, unnest({_D_SH4}) AS ngram FROM toksrc),
        agg AS (SELECT ngram, CAST(count(*) AS BIGINT) AS total_count,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_count
                FROM g GROUP BY 1),
        top AS (SELECT * FROM agg WHERE doc_count >= 2
                ORDER BY doc_count DESC, total_count DESC, ngram ASC
                LIMIT 20)
        SELECT ngram, total_count, doc_count,
               CAST(row_number() OVER (
                 ORDER BY doc_count DESC, total_count DESC, ngram ASC)
                 AS INTEGER) AS rank
        FROM top
    """
    # window-function family (plans/sequence.py) — ordered-sequence
    # analytics the reference's engine has no surface for
    sql["user_event_gaps"] = """
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS gap_us
          FROM events
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(gap_us) AS BIGINT) AS n_gaps,
               max(gap_us) AS max_gap_us,
               round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us), 6)
                 AS avg_gap_us
        FROM g GROUP BY 1
    """
    sql["event_type_transitions"] = """
        WITH p AS (
          SELECT lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS from_type,
                 event_type AS to_type
          FROM events
        )
        SELECT from_type, to_type,
               CAST(count(*) AS BIGINT) AS n_transitions
        FROM p WHERE from_type IS NOT NULL
        GROUP BY 1, 2
    """
    sql["value_ntile_quartiles"] = """
        WITH t AS (
          SELECT event_type, value,
                 CAST(ntile(4) OVER (
                   PARTITION BY event_type
                   ORDER BY value ASC, event_id ASC) AS INTEGER)
                   AS quartile
          FROM events
        )
        SELECT event_type, quartile, CAST(count(*) AS BIGINT) AS n,
               min(value) AS min_value, max(value) AS max_value,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_value
        FROM t GROUP BY 1, 2
    """
    sql["acctbal_rank_percentiles"] = """
        WITH r AS (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 CAST(row_number() OVER w AS INTEGER) AS rank,
                 round(percent_rank() OVER w, 6) AS pct_rank,
                 round(cume_dist() OVER w, 6) AS cume
          FROM customer
          WINDOW w AS (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey ASC)
        )
        SELECT * FROM r WHERE rank <= 3
    """
    sql["q9_profit_by_nation"] = """
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                        - p.p_retailprice * 0.1 * l.l_quantity
                        AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2
    """
    sql["q11_part_revenue_share"] = """
        WITH per_part AS (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,6))) AS part_rev
          FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT sum(part_rev) AS total_rev,
                       CAST(count(*) AS BIGINT) AS n_parts
                FROM per_part)
        SELECT p.l_partkey,
               CAST(p.part_rev AS DOUBLE) AS part_revenue
        FROM per_part p, tot
        WHERE p.part_rev * tot.n_parts * 2 > tot.total_rev * 3
    """
    sql["q20_heavy_suppliers"] = """
        WITH shipped AS (
          SELECT l.l_suppkey, l.l_quantity
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_name LIKE '%bolt%'
            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01'
        ),
        per_supp AS (
          SELECT l_suppkey,
                 sum(CAST(l_quantity AS DECIMAL(18,6))) AS supp_qty
          FROM shipped GROUP BY 1
        ),
        tot AS (SELECT sum(supp_qty) AS total_qty,
                       CAST(count(*) AS BIGINT) AS n_supp
                FROM per_supp)
        SELECT h.l_suppkey AS s_suppkey, s.s_name,
               CAST(h.supp_qty AS DOUBLE) AS shipped_qty
        FROM per_supp h
        CROSS JOIN tot
        JOIN supplier s ON h.l_suppkey = s.s_suppkey
        WHERE h.supp_qty * 2 * tot.n_supp > tot.total_qty
    """
    sql["order_latency_distribution"] = """
        WITH per_order AS (
          SELECT l.l_orderkey, o.o_orderdate,
                 max(l.l_shipdate) AS last_ship
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        )
        SELECT CAST(floor(date_diff('day', o_orderdate, last_ship)
                 / 7) AS INTEGER) AS latency_weeks,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM per_order GROUP BY 1
    """
    sql["rolling_user_value_avg"] = """
        WITH b AS (
          SELECT event_id, user_id,
                 date_diff('second', TIMESTAMP '1970-01-01', ts)
                   AS epoch_s,
                 value
          FROM events
        )
        SELECT event_id, user_id, epoch_s,
               CAST(count(*) OVER w AS BIGINT) AS n_in_window,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                       AS DOUBLE) / count(*) OVER w, 6) AS avg_value_30m
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                     RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
    """
    # PageRank: the oracle unrolls the same 10 power iterations the
    # Spark operator runs (decimal-exact per-node sums each round)
    _pr = ["""
        WITH p AS (
          SELECT lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS from_type,
                 event_type AS to_type
          FROM events
        ),
        t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
              FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
        e AS (SELECT from_type AS src, to_type AS dst,
                     CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY from_type)
                            AS DOUBLE) AS weight
              FROM t),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM e
                   UNION SELECT dst FROM e)),
        ns AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
        r0 AS (SELECT node, 1.0 / ns.n_nodes AS rank
               FROM nodes CROSS JOIN ns)"""]
    for _i in range(1, 11):
        _pr.append(f""",
        c{_i} AS (
          SELECT e.dst AS node,
                 CAST(sum(CAST(r{_i - 1}.rank * e.weight
                   AS DECIMAL(28,15))) AS DOUBLE) AS s
          FROM e JOIN r{_i - 1} ON e.src = r{_i - 1}.node GROUP BY 1
        ),
        r{_i} AS (
          SELECT nodes.node,
                 (1.0 - 0.85) / ns.n_nodes
                   + 0.85 * coalesce(c{_i}.s, 0.0) AS rank
          FROM nodes LEFT JOIN c{_i} ON nodes.node = c{_i}.node
          CROSS JOIN ns
        )""")
    _pr.append("""
        SELECT node, round(rank, 6) AS pagerank FROM r10""")
    sql["event_type_pagerank"] = "".join(_pr)
    sql["click_purchase_correlation"] = """
        WITH daily AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1
                          ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1
        ),
        mo AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM daily
        )
        SELECT n, sx, sy,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                 AS pearson_r
        FROM mo
    """
    sql["cumulative_new_users"] = """
        WITH first_seen AS (
          SELECT user_id,
                 min(CAST(date_trunc('day', ts) AS TIMESTAMP))
                   AS first_day
          FROM events GROUP BY 1
        ),
        new_per_day AS (
          SELECT first_day AS day,
                 CAST(count(*) AS BIGINT) AS n_new_users
          FROM first_seen GROUP BY 1
        )
        SELECT day, n_new_users,
               CAST(sum(n_new_users) OVER (
                 ORDER BY day ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumulative_users
        FROM new_per_day
    """
    sql["user_value_skyline"] = """
        WITH per AS (
          SELECT user_id,
                 sum(CAST(value AS DECIMAL(18,6))) AS val,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1
        )
        SELECT a.user_id, CAST(a.val AS DOUBLE) AS total_value, a.cnt
        FROM per a
        WHERE NOT EXISTS (
          SELECT 1 FROM per b
          WHERE b.val >= a.val AND b.cnt >= a.cnt
            AND (b.val > a.val OR b.cnt > a.cnt)
        )
    """
    sql["daily_growth_by_type"] = """
        WITH daily AS (
          SELECT event_type,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, cnt,
               lag(cnt) OVER w AS prev_cnt,
               round(CAST(cnt AS DOUBLE)
                     / CAST(lag(cnt) OVER w AS DOUBLE), 6)
                 AS growth_ratio
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)
    """
    sql["time_weighted_value_daily"] = """
        WITH base AS (
          SELECT user_id,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 value, ts, event_id
          FROM events
        ),
        wt AS (
          SELECT user_id, day, value,
                 date_diff('microsecond', ts,
                   coalesce(lead(ts) OVER (
                              PARTITION BY user_id, day
                              ORDER BY ts ASC, event_id ASC),
                            day + INTERVAL 1 DAY)) AS w_us
          FROM base
        )
        SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(w_us) AS BIGINT) AS total_us,
               round(CAST(sum(CAST(value * w_us AS DECIMAL(28,6)))
                       AS DOUBLE) / CAST(sum(w_us) AS DOUBLE), 6)
                 AS twa_value
        FROM wt GROUP BY 1, 2
    """
    sql["conversion_funnel"] = """
        WITH s1 AS (
          -- anonymous events form no funnel (both Spark variants
          -- filter NULL user_id up front; later joins would drop it
          -- implicitly anyway, asymmetrically)
          SELECT user_id, min(ts) AS r1 FROM events
          WHERE event_type = 'signup' AND user_id IS NOT NULL GROUP BY 1
        ),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS r2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'view' AND e.ts >= s1.r1 GROUP BY 1
        ),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS r3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'click' AND e.ts >= s2.r2 GROUP BY 1
        ),
        s4 AS (
          SELECT e.user_id, min(e.ts) AS r4
          FROM events e JOIN s3 ON e.user_id = s3.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= s3.r3 GROUP BY 1
        )
        SELECT
          (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
            AS n_users,
          (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
          (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_view,
          (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_click,
          (SELECT CAST(count(*) AS BIGINT) FROM s4) AS n_purchase
    """
    sql["retention_cohorts"] = """
        WITH active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
          FROM events
        ),
        first_seen AS (
          SELECT user_id AS u, min(day) AS cohort_day
          FROM active GROUP BY 1
        )
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, a.day) AS INTEGER)
                 AS day_offset,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        FROM active a JOIN first_seen f ON a.user_id = f.u
        GROUP BY 1, 2
    """
    sql["value_bucket_histogram"] = """
        WITH b AS (
          SELECT event_type,
                 [CAST('-infinity' AS DOUBLE),
                  round(quantile_cont(value, 0.25), 6),
                  round(quantile_cont(value, 0.5), 6),
                  round(quantile_cont(value, 0.75), 6),
                  CAST('infinity' AS DOUBLE)] AS bounds
          FROM events GROUP BY 1
        ),
        iv AS (
          SELECT event_type, CAST(i AS INTEGER) AS bucket,
                 bounds[CAST(i AS INTEGER)] AS lo,
                 bounds[CAST(i + 1 AS INTEGER)] AS hi
          FROM b CROSS JOIN (SELECT unnest(range(1, 5)) AS i)
        )
        SELECT e.event_type, iv.bucket, iv.lo, iv.hi,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_value
        FROM events e
        JOIN iv ON e.event_type = iv.event_type
               AND e.value >= iv.lo AND e.value < iv.hi
        GROUP BY 1, 2, 3, 4
    """
    sql["curation_funnel_docs"] = f"""
        WITH t AS (SELECT doc_id, text, lang, {_D_TOKS} AS toks
                   FROM documents),
        f AS (
          SELECT doc_id, lang = 'en' AS pass_lang,
                 lang = 'en' AND
                 round((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)) * 0.5
                   + least(len(toks) / 100.0, 1.0) * 0.5, 6) >= 0.5
                   AS pass_quality,
                 {_D_HASH.format(x="text")} AS text_hash
          FROM t
        )
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN pass_lang THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_lang,
               CAST(sum(CASE WHEN pass_quality THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_quality,
               CAST(count(DISTINCT CASE WHEN pass_quality
                 THEN text_hash END) AS BIGINT) AS n_unique
        FROM f
    """
    sql["returnflag_measures_unpivot"] = """
        WITH wide AS (
          SELECT l_returnflag,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_qty,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                   AS DOUBLE) AS sum_price,
                 CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_disc
          FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS total
        FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
    """
    sql["q21_last_shipper"] = """
        WITH marked AS (
          SELECT l_orderkey, l_suppkey, l_shipdate, l_linenumber,
                 count(DISTINCT l_suppkey) OVER (
                   PARTITION BY l_orderkey) AS n_supps,
                 row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_shipdate DESC, l_suppkey ASC,
                            l_linenumber ASC) AS rn
          FROM lineitem
        ),
        counts AS (
          SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
          FROM marked WHERE n_supps >= 2 AND rn = 1
          GROUP BY 1
        )
        SELECT c.l_suppkey AS s_suppkey, s.s_name, c.numwait
        FROM counts c JOIN supplier s ON c.l_suppkey = s.s_suppkey
        ORDER BY numwait DESC, s_suppkey ASC
        LIMIT 10
    """
    # -- round 7 registrations --
    # Bloom-prefiltered incremental exact dedup: the bloom is a pure
    # performance prefilter (operators/dedup.bloom_dedup_new_batch);
    # the SEMANTICS are an exact anti-join on the content hash, which
    # is what the twin states directly.
    sql["bloom_dedup_new_docs"] = f"""
        WITH hist AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        ),
        batch AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id % 4 = 0
        )
        SELECT b.doc_id, {_D_HASH.format(x="b.text")} AS content_hash
        FROM batch b
        WHERE {_D_HASH.format(x="b.text")} NOT IN (
          SELECT {_D_HASH.format(x="text")} FROM hist)
    """
    # Achlioptas sparse random projection: the sign matrix is a
    # deterministic xor-multiply mix of (1-based input dim i, output
    # dim j); sums are ordered folds (list_sum over an ordered
    # comprehension = Spark's sequential F.aggregate, the _KM_DIST
    # contract). {jm} is the precomputed (j+1)*1779033703 literal —
    # DuckDB would otherwise multiply the small int as INT32 and
    # overflow.
    _RP_SIGN = (
        "(CASE ((xor(i*2654435761, {jm}) % 1048573)"
        " * 2654435761) % 6"
        " WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END)"
    )
    def _rp_cols_n(n: int) -> str:
        return ",\n               ".join(
            f"round(sqrt(3.0/{n}) * list_sum([ v[i] *"
            f" {_RP_SIGN.format(jm=(j + 1) * 1779033703)}"
            f" for i in range(1, len(v)+1) ]), 6) AS p{j}"
            for j in range(n)
        )

    _rp_cols = _rp_cols_n(8)
    sql["random_projection_embeddings"] = f"""
        WITH ev AS (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings
        )
        SELECT vec_id,
               {_rp_cols}
        FROM ev
    """
    # Per-source quality-percentile curation: the quality_docs score
    # formula + percent_rank within source, keep the top half.
    sql["domain_quality_filter_docs"] = f"""
        WITH t AS (SELECT doc_id, source, text, {_D_TOKS} AS toks
                   FROM documents),
        q AS (
          SELECT doc_id, source,
                 round((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)) * 0.5
                   + least(len(toks) / 100.0, 1.0) * 0.5, 6) AS quality_score
          FROM t
        )
        SELECT doc_id, source, quality_score,
               round(percent_rank() OVER (
                 PARTITION BY source
                 ORDER BY quality_score DESC, doc_id ASC), 6) AS q_pct
        FROM q QUALIFY q_pct <= 0.5
    """
    # Greedy k-center coreset (k=5): the k rounds unroll verbatim —
    # seed = lowest id, then argmax of min-distance-to-chosen with
    # (mind DESC, vec_id ASC) ties, least-folded distance updates.
    _kc_stages = []
    for r in range(1, 5):
        prev = "d1" if r == 1 else f"d{r}"
        _kc_stages.append(f"""
        p{r} AS (SELECT vec_id, v, mind FROM {prev}
                 ORDER BY mind DESC, vec_id ASC LIMIT 1)""")
        if r < 4:
            _kc_stages.append(f"""
        d{r + 1} AS (
          SELECT d.vec_id, d.v,
                 least(d.mind, {_KM_DIST("d.v", "c.v")}) AS mind
          FROM {prev} d CROSS JOIN p{r} c)""")
    sql["coreset_embeddings"] = f"""
        WITH e AS (
          SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
          FROM embeddings
        ),
        c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
        d1 AS (
          SELECT e.vec_id, e.v, {_KM_DIST("e.v", "c.v")} AS mind
          FROM e CROSS JOIN c0 c
        ),{",".join(_kc_stages)}
        SELECT CAST(0 AS INTEGER) AS center_rank, vec_id,
               0.0 AS min_dist FROM c0
        UNION ALL SELECT 1, vec_id, round(mind, 6) FROM p1
        UNION ALL SELECT 2, vec_id, round(mind, 6) FROM p2
        UNION ALL SELECT 3, vec_id, round(mind, 6) FROM p3
        UNION ALL SELECT 4, vec_id, round(mind, 6) FROM p4
    """
    # batched Gonzalez == sequential greedy (the batch re-check admits
    # only candidates no outside point could beat), so the twin is the
    # same unrolled-rounds SQL
    sql["coreset_embeddings_batched"] = sql["coreset_embeddings"]
    # Temperature-weighted mixture, EXECUTED (alpha=0.5 -> sqrt, the
    # one exponent that is IEEE-correctly-rounded in both engines):
    # rate_d = min(1, budget * total * sqrt(size_d)/sum sqrt(size) /
    # size_d), then the deterministic md5-bucket keep per doc. The
    # arithmetic order mirrors sampling.mixture_temperature exactly.
    sql["temperature_sample_docs"] = f"""
        WITH per AS (
          SELECT source,
                 CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE)
                   AS stratum_size
          FROM documents GROUP BY source
        ),
        perw AS (SELECT source, stratum_size,
                        sqrt(stratum_size) AS w FROM per),
        sc AS (
          SELECT CAST(sum(CAST(stratum_size AS DECIMAL(18,0))) AS DOUBLE)
                   AS total_size,
                 CAST(sum(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS sum_w
          FROM perw
        ),
        rates AS (
          SELECT source,
                 round(least(1.0,
                   0.5 * total_size * w / sum_w / stratum_size), 6)
                   AS planned_rate
          FROM perw CROSS JOIN sc
        )
        SELECT d.doc_id, d.source, r.planned_rate
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE CAST({_dbucket("temp")} AS DOUBLE)
              < r.planned_rate * 1000000
    """
    # DSIR importance weights: replay the hashed uni+bigram features,
    # the Laplace-smoothed per-bucket log-ratios (round 9 — ln ulp
    # noise absorbed, zipf convention), the DECIMAL per-doc fold, and
    # the deterministic keep rule
    _D_BIGRAMS = "[array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))]"
    sql["dsir_weights_docs"] = f"""
        WITH toksrc AS (SELECT doc_id, lang, {_D_TOKS} AS toks
                        FROM documents),
        fb AS (
          SELECT doc_id, lang,
                 ({_D_HASH.format(x="f")}) % 1024 AS b
          FROM (SELECT doc_id, lang,
                       unnest(list_concat(toks, {_D_BIGRAMS})) AS f
                FROM toksrc)
        ),
        tc AS (SELECT b, count(*) AS c FROM fb WHERE lang = 'en'
               GROUP BY b),
        rc AS (SELECT b, count(*) AS c FROM fb GROUP BY b),
        tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM fb
                        WHERE lang = 'en') AS t_tot,
                       (SELECT CAST(count(*) AS DOUBLE) FROM fb) AS r_tot),
        ratio AS (
          SELECT rc.b,
                 round(ln((coalesce(tc.c, 0) + 1.0) / (t_tot + 1024.0))
                     - ln((rc.c + 1.0) / (r_tot + 1024.0)), 9) AS lr
          FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
        ),
        lw AS (
          SELECT fb.doc_id,
                 CAST(sum(CAST(lr AS DECIMAL(20,9))) AS DOUBLE)
                   AS log_weight
          FROM fb JOIN ratio USING (b) GROUP BY fb.doc_id
        ),
        scored AS (
          SELECT d.doc_id, d.lang,
                 round(coalesce(lw.log_weight, 0.0), 6) AS log_weight,
                 round(exp(least(coalesce(lw.log_weight, 0.0), 0.0)), 6)
                   AS keep_prob
          FROM documents d LEFT JOIN lw USING (doc_id)
        )
        SELECT doc_id, lang, log_weight, keep_prob FROM scored
        WHERE CAST({_dbucket("dsir")} AS DOUBLE) < keep_prob * 1000000
    """
    # Zipf power-law fit: ln-values rounded to 9 (ulp noise absorbed),
    # DECIMAL(38,18) sums (order-free), then the OLS in DOUBLE with
    # the exact expression order of operators/text.zipf_fit.
    sql["zipf_fit_docs"] = f"""
        WITH tok AS (
          SELECT unnest({_D_TOKS}) AS tok FROM documents
        ),
        counts AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
        ranked AS (
          SELECT round(ln(CAST(rnk AS DOUBLE)), 9) AS x,
                 round(ln(CAST(cnt AS DOUBLE)), 9) AS y
          FROM (
            SELECT cnt, row_number() OVER (
              ORDER BY cnt DESC, tok ASC) AS rnk
            FROM counts)
          WHERE rnk <= 100
        ),
        agg AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
                 CAST(sum(CAST(x*x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
          FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_terms,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                 AS zipf_slope,
               round((sy - round((n * sxy - sx * sy)
                                 / (n * sxx - sx * sx), 6) * sx) / n, 6)
                 AS zipf_intercept
        FROM agg
    """
    # The Gopher (Rae et al. 2021 A1.1) and C4 (Raffel et al. 2020
    # 2.2) named rule sets as per-doc flag tables; regexes restricted
    # to the Java/RE2 common subset.
    sql["gopher_rules_docs"] = f"""
        WITH base AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS words,
                 list_filter(regexp_split_to_array(text, '\n'),
                             x -> x <> '') AS lines,
                 {_D_TOKS} AS toks
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 len(words) AS n_words,
                 round(list_sum(list_transform(words, x -> length(x)))
                       / greatest(len(words), 1), 6) AS mean_word_len,
                 round(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                       / greatest(len(words), 1), 6) AS symbol_ratio,
                 round(len(list_filter(lines,
                         x -> regexp_matches(x, '^[-*•]')))
                       / greatest(len(lines), 1), 6) AS bullet_line_frac,
                 round(len(list_filter(lines,
                         x -> regexp_matches(x, '\\.\\.\\.$')))
                       / greatest(len(lines), 1), 6) AS ellipsis_line_frac,
                 round(len(list_filter(words,
                         x -> regexp_matches(x, '[A-Za-z]')))
                       / greatest(len(words), 1), 6) AS alpha_word_ratio,
                 CAST(len(list_intersect(list_distinct(toks),
                   ['the','be','to','of','and','that','have','with']))
                   AS INTEGER) AS stop_hits
          FROM base
        )
        SELECT *,
               (n_words >= 50 AND n_words <= 100000
                AND mean_word_len >= 3 AND mean_word_len <= 10
                AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
                AND ellipsis_line_frac <= 0.3
                AND alpha_word_ratio >= 0.8
                AND stop_hits >= 2) AS gopher_keep
        FROM m
    """
    sql["c4_filter_docs"] = f"""
        WITH base AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '\n'),
                             x -> x <> '') AS lines
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 len(lines) AS n_lines,
                 round(len(list_filter(lines,
                         x -> regexp_matches(x, '[.!?"'']$')))
                       / greatest(len(lines), 1), 6)
                   AS terminal_punct_line_frac,
                 round(len(list_filter(lines,
                         x -> len(list_filter(
                           regexp_split_to_array(x, '\\s+'),
                           w -> w <> '')) >= 3))
                       / greatest(len(lines), 1), 6)
                   AS min_words_line_frac,
                 CAST(len(regexp_extract_all(text, '[.!?]')) AS INTEGER)
                   AS n_sentences,
                 contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
                 contains(text, '{{') AS has_curly_brace
          FROM base
        )
        SELECT *,
               (n_sentences >= 3 AND NOT has_lorem_ipsum
                AND NOT has_curly_brace) AS c4_keep
        FROM m
    """
    # Random-projection ANN: sketch (the random_projection twin as a
    # CTE), squared-L2 shortlist over the 8 rounded projections
    # (explicit left-to-right sum chain = Spark's sequential fold),
    # exact cosine rescore on the survivors.
    _rp_pd = " + ".join(
        f"(q.p{j}-c.p{j})*(q.p{j}-c.p{j})" for j in range(16)
    )
    sql["knn_rp_embeddings"] = f"""
        WITH ev AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        un AS (
          SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   AS v
          FROM ev
        ),
        rp AS (
          SELECT vec_id,
               {_rp_cols_n(16)}
          FROM un
        ),
        cand AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {_rp_pd} AS rpd
          FROM rp q JOIN rp c
            ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        ),
        short AS (
          SELECT query_id, neighbor_id, rpd FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY rpd, neighbor_id) AS rn
            FROM cand) WHERE rn <= 100
        ),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        res AS (
          SELECT s.query_id, s.neighbor_id,
                 round(s.rpd, 6) AS rp_dist, {_D_COS} AS cos_sim
          FROM short s
          JOIN e q ON q.vec_id = s.query_id
          JOIN e c ON c.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, rp_dist, cos_sim,
               CAST(rnk AS INTEGER) AS knn_rank
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM res)
        WHERE rnk <= 5
    """
    sql["pca_embeddings"] = _pca_sql(dim=64, iters=30)
    # the streamed-ingest fit folds per-trigger decimal sums that merge
    # to EXACTLY the one-shot covariance aggregate (associative +
    # commutative), so its twin is the same full-fit SQL
    sql["stream_pca_embeddings"] = _pca_sql(dim=64, iters=30)
    sql["quality_classifier_docs"] = _logreg_sql(
        n_buckets=256, iters=8, lr=500.0, thr=0.5
    )
    # sampled-training production variant: gradients come only from the
    # deterministic 20% hash-sample (salt 'clf_train'), scoring covers
    # the full corpus — same predicate as operators/sampling.hash_sample
    # fixed-size bottom-k-by-hash training set: constant training cost
    # at any corpus size; the twin replays the identical deterministic
    # ORDER BY (hash, doc_id) LIMIT k selection
    sql["quality_classifier_bottomk_docs"] = _logreg_sql(
        n_buckets=256,
        iters=8,
        lr=500.0,
        thr=0.5,
        train_where=(
            "ORDER BY ("
            + _D_HASH.format(
                x="concat('clf_fix:', CAST(doc_id AS VARCHAR))"
            )
            + "), doc_id LIMIT 256"
        ),
    )
    # score-on-ingest lifecycle: scoring is a stateless projection, so
    # the streamed union equals the one-shot bottom-k-trained scorer
    sql["stream_quality_scores_docs"] = (
        "SELECT doc_id, quality_prob, clf_keep FROM ("
        + _logreg_sql(
            n_buckets=256,
            iters=8,
            lr=500.0,
            thr=0.5,
            train_where=(
                "ORDER BY ("
                + _D_HASH.format(
                    x="concat('clf_fix:', CAST(doc_id AS VARCHAR))"
                )
                + "), doc_id LIMIT 256"
            ),
        )
        + ") t"
    )
    sql["quality_classifier_sampled_docs"] = _logreg_sql(
        n_buckets=256,
        iters=8,
        lr=500.0,
        thr=0.5,
        train_where=(
            "WHERE ("
            + _D_HASH.format(
                x="concat('clf_train:', CAST(doc_id AS VARCHAR))"
            )
            + " % 1000000) < 200000"
        ),
    )

    # RefinedWeb-style corpus line dedup over the boilerplate-augmented
    # docs (plans/llm._docs_with_boilerplate replayed verbatim); the
    # Spark side counts by the 60-bit md5 line hash, the twin by the
    # line itself — identical results barring a 2^-60 collision (the
    # minhash band-key convention)
    sql["line_dedup_docs"] = """
        WITH w AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws
          FROM documents
        ),
        built AS (
          SELECT doc_id,
                 'subscribe to the ' || source || ' newsletter'
                 || chr(10)
                 || array_to_string(
                      [array_to_string(ws[(i*8+1):(i*8+8)], ' ')
                       for i in range(0,
                         CAST(ceil(len(ws)/8.0) AS INTEGER))],
                      chr(10))
                 || CASE WHEN doc_id % 4 = 0
                         THEN chr(10) ||
                              'copyright example corp all rights reserved'
                         ELSE '' END AS text
          FROM w
        ),
        l AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 unnest(range(1, len(string_split(text, chr(10))) + 1))
                   AS pos
          FROM built
        ),
        c AS (SELECT line, count(*) AS lc FROM l GROUP BY 1),
        j AS (
          SELECT l.doc_id, l.pos, l.line,
                 CASE WHEN c.lc <= 1 THEN 1 ELSE 0 END AS keep
          FROM l JOIN c ON c.line = l.line
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(keep) AS BIGINT) AS n_lines_kept,
               coalesce(string_agg(CASE WHEN keep = 1 THEN line END,
                                   chr(10) ORDER BY pos), '') AS text
        FROM j GROUP BY doc_id
    """
    # UniMax waterfilling (operators/sampling.unimax_plan): capped set
    # is the ascending-cap prefix with cap_j*(n-j+1) <= B - cum_{j-1};
    # the uncapped share theta and the epoch ratios round to 6 dp
    sql["unimax_mixture_docs"] = """
        WITH per AS (
          SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_chars
          FROM documents GROUP BY 1
        ),
        capd AS (
          SELECT lang, n_chars,
                 CAST(n_chars * 2 AS BIGINT) AS cap_chars
          FROM per
        ),
        win AS (
          SELECT *,
                 row_number() OVER (ORDER BY cap_chars, lang) AS rn,
                 coalesce(sum(cap_chars) OVER (
                   ORDER BY cap_chars, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_prev,
                 count(*) OVER () AS n,
                 1.5 * (sum(n_chars) OVER ()) AS b
          FROM capd
        ),
        flag AS (
          SELECT *,
                 (cap_chars * (n - rn + 1) <= b - cum_prev) AS capped
          FROM win
        ),
        scalar AS (
          SELECT sum(CASE WHEN capped THEN cap_chars ELSE 0 END)
                   AS capsum,
                 sum(CASE WHEN capped THEN 1 ELSE 0 END) AS m,
                 max(n) AS nn, max(b) AS bb
          FROM flag
        )
        SELECT lang, n_chars, cap_chars,
               round(CASE WHEN capped OR m = nn
                          THEN CAST(cap_chars AS DOUBLE)
                          ELSE round((bb - capsum) / (nn - m), 6)
                     END, 6) AS alloc_chars,
               round(round(CASE WHEN capped OR m = nn
                          THEN CAST(cap_chars AS DOUBLE)
                          ELSE round((bb - capsum) / (nn - m), 6)
                     END, 6) / n_chars, 6) AS epochs
        FROM flag, scalar
    """
    # the executed UniMax keep: full copies for floor(epochs), one
    # fractional epoch via the deterministic md5 bucket rule — the
    # plan subquery is the unimax_mixture_docs SQL verbatim
    sql["unimax_sample_docs"] = f"""
        WITH plan AS ({sql["unimax_mixture_docs"]}),
        j AS (
          SELECT d.doc_id, d.lang, p.epochs
          FROM documents d JOIN plan p USING (lang)
        ),
        fullcp AS (
          SELECT doc_id, lang,
                 CAST(unnest(range(1, CAST(floor(epochs) AS INTEGER) + 1))
                   AS INTEGER) AS epoch
          FROM j
        ),
        extra AS (
          SELECT doc_id, lang,
                 CAST(floor(epochs) AS INTEGER) + 1 AS epoch
          FROM j
          WHERE CAST({_dbucket("unimax")} AS DOUBLE)
                < round(epochs - floor(epochs), 6) * 1000000.0
        )
        SELECT doc_id, lang, epoch FROM fullcp
        UNION ALL
        SELECT doc_id, lang, epoch FROM extra
    """
    # the unified signal table: the four per-doc twins joined on
    # doc_id (the Spark side is one projection chain; the twin's joins
    # are over the same 1-row-per-doc outputs, so equality is exact)
    sql["quality_signals_docs"] = f"""
        WITH q AS ({sql["quality_docs"]}),
        g AS ({sql["gopher_rules_docs"]}),
        c AS ({sql["c4_filter_docs"]}),
        l AS ({sql["lang_id_docs"]})
        SELECT d.doc_id, d.lang, d.source,
               q.n_chars, q.n_tokens, q.mean_token_len, q.alpha_ratio,
               q.punct_ratio, q.quality_score,
               g.n_words, g.mean_word_len, g.symbol_ratio,
               g.bullet_line_frac, g.ellipsis_line_frac,
               g.alpha_word_ratio, g.stop_hits, g.gopher_keep,
               c.n_lines, c.terminal_punct_line_frac,
               c.min_words_line_frac, c.n_sentences, c.has_lorem_ipsum,
               c.has_curly_brace, c.c4_keep,
               l.en_stop_ratio, l.es_stop_ratio, l.fr_stop_ratio,
               l.de_stop_ratio, l.lang_pred
        FROM documents d
        JOIN q USING (doc_id) JOIN g USING (doc_id)
        JOIN c USING (doc_id) JOIN l USING (doc_id)
    """
    # winnowing (Schleimer et al. 2003): positional 4-gram hashes, the
    # rightmost-min of each 4-hash window via min over a (h, -pos)
    # struct — identical struct-ordering semantics in both engines
    _D_WINNOW_FPS = f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        sh0 AS (
          SELECT doc_id,
                 unnest([{{'pos': i - 1,
                           'g': array_to_string(toks[i:i+3], ' ')}}
                         for i in range(1, len(toks) - 2)]) AS u
          FROM toksrc
        ),
        sh AS (
          SELECT doc_id, u.pos AS pos,
                 {_D_HASH.format(x="u.g")} AS h
          FROM sh0
        ),
        picked AS (
          SELECT doc_id,
                 min({{'h': h, 'negpos': -pos}}) OVER win AS m,
                 count(*) OVER win AS n_in_win
          FROM sh
          WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
        ),
        fpsel AS (
          SELECT DISTINCT doc_id, m.h AS fp_hash,
                 -m.negpos AS fp_pos
          FROM picked WHERE n_in_win = 4
        )
    """
    sql["winnow_fingerprints_docs"] = f"""
        {_D_WINNOW_FPS}
        SELECT doc_id, fp_hash, CAST(fp_pos AS INTEGER) AS fp_pos
        FROM fpsel
    """
    # the capped variant: identical pipeline with a doc-frequency
    # guard on the fingerprints before the self-join (cap deliberately
    # strict at 2 so the drop path runs under the gate)
    sql["winnow_dup_pairs_capped"] = f"""
        {_D_WINNOW_FPS},
        fps0 AS (SELECT DISTINCT doc_id, fp_hash FROM fpsel),
        cool AS (SELECT fp_hash FROM fps0 GROUP BY 1
                 HAVING count(*) <= 2),
        fps AS (SELECT f.* FROM fps0 f JOIN cool USING (fp_hash)),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
                  FROM fps GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM fps a JOIN fps b
            ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, n_shared,
               sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
               round(n_shared / least(sa.n_fp, sb.n_fp), 6) AS overlap
        FROM shared
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE round(n_shared / least(sa.n_fp, sb.n_fp), 6) >= 0.2
    """
    sql["winnow_dup_pairs_docs"] = f"""
        {_D_WINNOW_FPS},
        fps AS (SELECT DISTINCT doc_id, fp_hash FROM fpsel),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
                  FROM fps GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM fps a JOIN fps b
            ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, n_shared,
               sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
               round(n_shared / least(sa.n_fp, sb.n_fp), 6) AS overlap
        FROM shared
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE round(n_shared / least(sa.n_fp, sb.n_fp), 6) >= 0.2
    """
    # CCNet-shape bigram LM: model on the 20% hash slice, score all
    _D_REF_PRED = (
        "(('0x' || substr(md5(concat('bigram-ref:', "
        "CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT) % 100 < 20"
    )
    sql["bigram_lm_quality_docs"] = f"""
        WITH base AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        big AS (
          SELECT doc_id,
                 unnest([array_to_string(toks[i:i+1], ' ')
                         for i in range(1, len(toks))]) AS bigram
          FROM base
        ),
        refbig AS (
          SELECT unnest([array_to_string(toks[i:i+1], ' ')
                         for i in range(1, len(toks))]) AS bigram
          FROM base WHERE {_D_REF_PRED}
        ),
        c12 AS (SELECT bigram, count(*) AS c12 FROM refbig GROUP BY 1),
        c1 AS (SELECT split_part(bigram, ' ', 1) AS ctx, count(*) AS c1
               FROM refbig GROUP BY 1),
        v AS (SELECT count(DISTINCT token) AS v FROM
                (SELECT unnest(toks) AS token FROM base
                 WHERE {_D_REF_PRED})),
        scored AS (
          SELECT big.doc_id,
                 CASE WHEN v.v > 0 THEN
                   round(ln((coalesce(c12.c12, 0) + 1.0)
                            / (coalesce(c1.c1, 0) + 1.0 * v.v)), 9)
                 END AS lp
          FROM big
          LEFT JOIN c12 USING (bigram)
          LEFT JOIN c1 ON split_part(big.bigram, ' ', 1) = c1.ctx
          CROSS JOIN v
        ),
        perdoc AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 round(CAST(sum(CAST(lp AS DECIMAL(28,12))) AS DOUBLE)
                       / count(*), 6) AS avg_logprob
          FROM scored GROUP BY 1
        )
        SELECT b.doc_id, {_D_REF_PRED} AS is_ref,
               coalesce(p.n_bigrams, 0) AS n_bigrams,
               p.avg_logprob,
               round(exp(-p.avg_logprob), 6) AS ppl
        FROM base b LEFT JOIN perdoc p USING (doc_id)
    """
    # the executed end-to-end curation pipeline: fused signal scan ->
    # calibrated rule filter -> exact dedup keep-min -> 4-gram
    # decontamination. The signal stage reuses the quality_signals twin
    # verbatim (nested WITH — same pattern that twin itself uses); text
    # is re-joined from documents for the hash/shingle stages. The
    # Spark side filters the DUPLICATED corpus; every signal in the
    # predicate is a pure function of text, so a shifted dup passes iff
    # its original does — the twin therefore filters originals and
    # re-adds the kept dups (algebraically identical, one signal pass).
    sql["curated_corpus_docs"] = f"""
        WITH sig AS ({sql["quality_signals_docs"]}),
        kept0 AS (
          SELECT s.doc_id, d.text, s.lang, s.source, s.n_tokens,
                 s.quality_score
          FROM sig s JOIN documents d USING (doc_id)
          WHERE s.n_words >= 30 AND s.alpha_word_ratio >= 0.8
            AND s.stop_hits >= 1
            AND NOT s.has_lorem_ipsum AND NOT s.has_curly_brace
            AND s.quality_score >= 0.5 AND s.lang_pred = 'en'
        ),
        kept AS (
          SELECT * FROM kept0
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text, lang, source,
                 n_tokens, quality_score
          FROM kept0 WHERE doc_id % 5 = 0
        ),
        hashed AS (
          SELECT kept.*, {_D_HASH.format(x="text")} AS content_hash
          FROM kept
        ),
        canon AS (SELECT content_hash, min(doc_id) AS doc_id
                  FROM hashed GROUP BY 1),
        dd AS (SELECT h.* FROM hashed h
               JOIN canon USING (content_hash, doc_id)),
        tr AS (SELECT doc_id, {_D_TOKS} AS toks FROM dd
               WHERE doc_id % 50 <> 0),
        trh AS (
          SELECT doc_id AS train_doc_id,
                 {_D_HASH.format(x="shingle")} AS h
          FROM (SELECT doc_id, unnest(list_distinct({_d_sh4})) AS shingle
                FROM tr)
        ),
        ev0 AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents
                WHERE doc_id % 50 = 0),
        evh AS (
          SELECT DISTINCT {_D_HASH.format(x="shingle")} AS h
          FROM (SELECT doc_id, unnest(list_distinct({_d_sh4})) AS shingle
                FROM ev0)
        ),
        flagged AS (SELECT DISTINCT train_doc_id AS doc_id
                    FROM trh JOIN evh USING (h))
        SELECT doc_id, lang, source, n_tokens, quality_score,
               content_hash
        FROM dd
        WHERE doc_id % 50 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM flagged)
    """
    # content-defined chunking: a cut falls AFTER token t when the
    # 4-gram ENDING at t hashes to 0 mod 8; chunks partition the token
    # stream; the chunk hash is hash64 of the space-joined span
    _D_CDC_SPANS = f"""
        WITH base AS (SELECT doc_id, {_D_TOKS} AS toks FROM {{src}}),
        sh0 AS (
          SELECT doc_id,
                 unnest([{{{{'pos': i - 1,
                           'b': CASE WHEN i >= 4 AND
                             ({_D_HASH.format(x="array_to_string(toks[i-3:i], ' ')")}) % 8 = 0
                             THEN 1 ELSE 0 END}}}}
                         for i in range(1, len(toks) + 1)]) AS u
          FROM base
        ),
        sh AS (SELECT doc_id, u.pos AS pos, u.b AS b FROM sh0),
        seg AS (
          SELECT doc_id, pos,
                 CAST(coalesce(sum(b) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS seg_id
          FROM sh
        ),
        spans AS (
          SELECT doc_id, seg_id, min(pos) AS start_pos,
                 max(pos) AS end_pos
          FROM seg GROUP BY 1, 2
        ),
        chunks AS (
          SELECT s.doc_id, s.seg_id, s.start_pos, s.end_pos,
                 s.end_pos - s.start_pos + 1 AS n_tokens_chunk,
                 {_D_HASH.format(x="array_to_string(b.toks[s.start_pos + 1 : s.end_pos + 1], ' ')")}
                   AS chunk_hash
          FROM spans s JOIN base b USING (doc_id)
        )
    """
    sql["cdc_chunks_docs"] = (
        _D_CDC_SPANS.format(src="documents")
        + "\n        SELECT * FROM chunks"
    )
    sql["cdc_dup_chunks_docs"] = (
        _D_CDC_SPANS.format(
            src="""(
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id % 5 = 0
        )"""
        )
        + """
        SELECT chunk_hash,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS canonical_id,
               max(n_tokens_chunk) AS n_tokens_chunk
        FROM chunks GROUP BY 1
        HAVING count(DISTINCT doc_id) > 1
    """
    )
    # the executed chunk-level trim: one occurrence per chunk hash
    # (min (doc_id, seg_id)), docs reassembled from surviving spans
    sql["cdc_trim_docs"] = (
        _D_CDC_SPANS.format(src="documents")
        + """
        , keeper AS (
          SELECT chunk_hash,
                 min({'d': doc_id, 's': seg_id}) AS m
          FROM chunks GROUP BY 1
        ),
        marked AS (
          SELECT c.doc_id, c.seg_id, c.start_pos, c.end_pos,
                 c.n_tokens_chunk,
                 (c.doc_id = k.m.d AND c.seg_id = k.m.s) AS keep
          FROM chunks c JOIN keeper k USING (chunk_hash)
        ),
        per_doc AS (
          SELECT m.doc_id,
                 CAST(count(*) AS BIGINT) AS n_chunks,
                 CAST(sum(CASE WHEN m.keep THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_chunks_kept,
                 CAST(coalesce(sum(CASE WHEN m.keep
                                        THEN m.n_tokens_chunk END), 0)
                      AS BIGINT) AS n_tokens_kept,
                 string_agg(
                   CASE WHEN m.keep THEN array_to_string(
                     b.toks[m.start_pos + 1 : m.end_pos + 1], ' ')
                   END, ' ' ORDER BY m.seg_id) AS text_deduped
          FROM marked m JOIN base b USING (doc_id)
          GROUP BY 1
        )
        SELECT b.doc_id,
               coalesce(p.n_chunks, 0) AS n_chunks,
               coalesce(p.n_chunks_kept, 0) AS n_chunks_kept,
               coalesce(p.n_tokens_kept, 0) AS n_tokens_kept,
               coalesce(p.text_deduped, '') AS text_deduped
        FROM base b LEFT JOIN per_doc p USING (doc_id)
    """
    )
    # exact-substring span trim (VERDICT r11 #3): non-keeper
    # occurrences of SHARED chunks group into maximal runs
    # (gaps-and-islands prefix sum); a run trims only when its token
    # total reaches the span threshold — short incidental overlaps
    # survive, long duplicated spans go
    sql["substring_trim_docs"] = (
        _D_CDC_SPANS.format(
            src="""(
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id % 5 = 0
        )"""
        )
        + """
        , keeper AS (
          SELECT chunk_hash,
                 min({'d': doc_id, 's': seg_id}) AS m,
                 count(*) AS n_occ
          FROM chunks GROUP BY 1
        ),
        cnd AS (
          SELECT c.doc_id, c.seg_id, c.start_pos, c.end_pos,
                 c.n_tokens_chunk,
                 (k.n_occ > 1 AND NOT
                  (c.doc_id = k.m.d AND c.seg_id = k.m.s)) AS cand
          FROM chunks c JOIN keeper k USING (chunk_hash)
        ),
        grp AS (
          SELECT *, sum(CASE WHEN cand THEN 0 ELSE 1 END) OVER (
                   PARTITION BY doc_id ORDER BY seg_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS g
          FROM cnd
        ),
        runs AS (
          SELECT *, sum(CASE WHEN cand THEN n_tokens_chunk ELSE 0 END)
                   OVER (PARTITION BY doc_id, g) AS run_tokens
          FROM grp
        ),
        marked AS (
          SELECT doc_id, seg_id, start_pos, end_pos, n_tokens_chunk,
                 (NOT cand OR run_tokens < 20) AS keep
          FROM runs
        ),
        per_doc AS (
          SELECT m.doc_id,
                 CAST(count(*) AS BIGINT) AS n_chunks,
                 CAST(sum(CASE WHEN m.keep THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_chunks_kept,
                 CAST(coalesce(sum(CASE WHEN m.keep
                                        THEN m.n_tokens_chunk END), 0)
                      AS BIGINT) AS n_tokens_kept,
                 string_agg(
                   CASE WHEN m.keep THEN array_to_string(
                     b.toks[m.start_pos + 1 : m.end_pos + 1], ' ')
                   END, ' ' ORDER BY m.seg_id) AS text_deduped
          FROM marked m JOIN base b USING (doc_id)
          GROUP BY 1
        )
        SELECT b.doc_id,
               coalesce(p.n_chunks, 0) AS n_chunks,
               coalesce(p.n_chunks_kept, 0) AS n_chunks_kept,
               coalesce(p.n_tokens_kept, 0) AS n_tokens_kept,
               coalesce(p.text_deduped, '') AS text_deduped
        FROM base b LEFT JOIN per_doc p USING (doc_id)
    """
    )
    # CCNet head/middle/tail terciles over the bigram scores: global
    # rank by (ppl, doc_id), rank-based boundaries (ULP-immune), an
    # explicit 'unscored' bucket for no-bigram docs
    sql["ppl_buckets_docs"] = f"""
        WITH scored AS ({sql["bigram_lm_quality_docs"]}),
        r AS (
          SELECT doc_id, is_ref, n_bigrams, avg_logprob, ppl,
                 CAST(row_number() OVER (ORDER BY ppl, doc_id)
                      AS INTEGER) AS ppl_rank,
                 count(*) OVER () AS n
          FROM scored WHERE ppl IS NOT NULL
        )
        SELECT doc_id, is_ref, n_bigrams, avg_logprob, ppl, ppl_rank,
               CASE WHEN ppl_rank * 3 <= n THEN 'head'
                    WHEN ppl_rank * 3 <= 2 * n THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM r
        UNION ALL
        SELECT doc_id, is_ref, n_bigrams, avg_logprob, ppl,
               CAST(NULL AS INTEGER) AS ppl_rank,
               'unscored' AS ppl_bucket
        FROM scored WHERE ppl IS NULL
    """
    # LSH candidate recall/precision vs exact 3-gram Jaccard >= 0.3 —
    # composes the two existing twins over the shared shingle CTE
    sql["lsh_recall_docs"] = f"""
        {_D_SHINGLES},
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS n_inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        truth AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE round(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.3
        ),
        sig AS (
          SELECT doc_id, {_MINHASH_MINS}
          FROM sh GROUP BY doc_id
        ),
        bands AS ({_BAND_SELECTS}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
        ),
        hit AS (SELECT count(*) AS n_hit
                FROM truth JOIN cand USING (doc_a, doc_b)),
        nt AS (SELECT count(*) AS n_truth FROM truth),
        nc AS (SELECT count(*) AS n_cand FROM cand)
        SELECT CAST(n_truth AS BIGINT) AS n_truth,
               CAST(n_cand AS BIGINT) AS n_cand,
               CAST(n_hit AS BIGINT) AS n_hit,
               round(n_hit / greatest(n_truth, 1), 6) AS recall,
               round(n_hit / greatest(n_cand, 1), 6) AS precision
        FROM nt CROSS JOIN nc CROSS JOIN hit
    """
    # sampled-truth audit (VERDICT r10 #4): the identical pipeline on
    # the deterministic 20% hash-sample of docs (salt 'lshaudit', the
    # operators/sampling.hash_sample predicate replayed) — truth AND
    # candidates restricted to sampled x sampled pairs. The shingle CTE
    # is the only place the corpus enters, so one WHERE rewrites the
    # whole audit. (Predicate defined at module level — _LSHAUDIT_PRED
    # — because the OPH audit earlier in this function reuses it.)
    assert sql["lsh_recall_docs"].count("FROM documents") == 1
    sql["lsh_recall_sampled_docs"] = sql["lsh_recall_docs"].replace(
        "FROM documents", f"FROM documents WHERE {_LSHAUDIT_PRED}"
    )
    # LSH parameter planner (VERDICT r11 #4): planned recall is the
    # MMDS s-curve 1-(1-s^r)^b averaged over the exact-Jaccard true
    # pairs (rounded 9 dp, DECIMAL-summed — order-free), measured
    # recall the fraction of true pairs the real banding surfaced;
    # both on the same 'lshaudit' 20% sample as the recall audit
    _plan_audit_sql = f"""
        {_D_SHINGLES},
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS n_inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        truth AS (
          SELECT doc_a, doc_b,
                 round(n_inter / (sa.n + sb.n - n_inter), 6) AS jaccard
          FROM inter
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE round(n_inter / (sa.n + sb.n - n_inter), 6) >= 0.3
        ),
        sig AS (
          SELECT doc_id, {_MINHASH_MINS}
          FROM sh GROUP BY doc_id
        ),
        bands AS ({_BAND_SELECTS}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
        ),
        hitj AS (
          SELECT t.jaccard,
                 CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM truth t LEFT JOIN cand c USING (doc_a, doc_b)
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_truth,
                 CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hit,
                 round(CAST(coalesce(sum(CAST(round(
                         1 - pow(1 - pow(jaccard, 4), 4), 9)
                       AS DECIMAL(28,12))), 0) AS DOUBLE)
                       / greatest(count(*), 1), 6) AS planned_recall
          FROM hitj
        )
        SELECT 4 AS n_bands, 4 AS rows_per_band,
               CAST(0.3 AS DOUBLE) AS threshold,
               n_truth, n_hit, planned_recall,
               round(n_hit / greatest(n_truth, 1), 6) AS measured_recall,
               round(round(n_hit / greatest(n_truth, 1), 6)
                     - planned_recall, 6) AS gap
        FROM agg
    """
    assert _plan_audit_sql.count("FROM documents") == 1
    sql["lsh_plan_audit"] = _plan_audit_sql.replace(
        "FROM documents", f"FROM documents WHERE {_LSHAUDIT_PRED}"
    )
    # incremental CDC trim (VERDICT r10 #5): the combined-min keeper
    # makes the odd-batch-vs-even-index trim EQUAL the one-shot trim
    # over the full corpus restricted to odd docs — so the twin is the
    # cdc_trim twin wrapped with that restriction (batching-invariance
    # is exactly what the hash gate then proves).
    sql["incremental_cdc_trim_docs"] = (
        "SELECT * FROM (\n"
        + sql["cdc_trim_docs"]
        + "\n) WHERE doc_id % 2 = 1"
    )
    # broadcast-model bigram scorer: the join STRATEGY changes, the
    # algebra does not — same twin
    sql["bigram_lm_quality_bcast_docs"] = sql["bigram_lm_quality_docs"]
    # curation pipeline composed with fuzzy dedup (VERDICT r10 #7):
    # the curated twin feeds the LSH + recursive-CTE closure (the
    # dedup_clusters machinery restricted to curated survivors — the
    # shifted dups never survive exact dedup, so text joins from the
    # original documents), keep the min-id member per cluster with its
    # size. The CC CTE macro reads `FROM documents` exactly once
    # (toksrc) — rewritten to the curated subset. Round 13: the OPH
    # switch here was tried, swept hash-green (identical candidates),
    # and REVERTED after measurement — see the
    # curated_corpus_neardup_docs docstring and SCALE.md round-13;
    # the twin stays on the 16-hash closure the Spark side uses.
    assert _lsh_cc_cte.count("FROM documents") == 1
    _cur_cc = _lsh_cc_cte.replace(
        "FROM documents",
        "FROM documents WHERE doc_id IN (SELECT doc_id FROM cur)",
    )
    # HTML main-content extraction: rebuild the same synthetic page and
    # replay the same regexes (DuckDB regexp_replace needs the 'g'
    # flag; Spark's is global by default)
    sql["html_extract_docs"] = r"""
        WITH b AS (
          SELECT doc_id, text,
            '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
            '</title><script>var trk="' || CAST(doc_id AS VARCHAR) ||
            '";</script></head><body>' ||
            '<nav><a href="/">home</a> <a href="/tags">tags</a> ' ||
            '<a href="/about">about</a> <a href="/login">login</a></nav>' ||
            '<div class="content"><p>' || coalesce(text, '') ||
            '</p></div>' ||
            CASE WHEN doc_id % 3 = 0
                 THEN '<ul><li><a href="/r1">related one</a></li>' ||
                      '<li><a href="/r2">related two</a></li></ul>'
                 ELSE '' END ||
            '<footer><a href="/terms">terms</a> (c) example</footer>' ||
            '</body></html>' AS html
          FROM documents
        ),
        fr AS (
          SELECT doc_id, text,
            regexp_split_to_array(
              regexp_replace(html,
                '<(script|style)[^>]*>[^<]*</(script|style)>', ' ', 'g'),
              '</?(p|div|nav|footer|header|title|head|body|html|ul|li|h1)[^>]*>'
            ) AS frags
          FROM b
        ),
        blocks AS (
          SELECT doc_id, text,
            list_filter(
              list_transform(frags, x -> {
                't': trim(regexp_replace(
                       regexp_replace(x, '<[^>]*>', ' ', 'g'),
                       '\s+', ' ', 'g')),
                'l': CAST((length(x) - length(replace(x, '<a ', ''))) / 3
                          AS INTEGER)
              }),
              s -> s.t <> '') AS bl
          FROM fr
        ),
        kept AS (
          SELECT doc_id, text, bl,
            list_filter(bl, s -> length(s.t) >= 20
              AND s.l * 5 <= len(string_split(s.t, ' '))) AS kp
          FROM blocks
        )
        SELECT doc_id,
               CAST(len(bl) AS INTEGER) AS n_blocks,
               CAST(len(kp) AS INTEGER) AS n_blocks_kept,
               array_to_string(list_transform(kp, s -> s.t), ' ')
                 AS extracted_text,
               (array_to_string(list_transform(kp, s -> s.t), ' ')
                = trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))
                 AS roundtrip
        FROM kept
    """
    # dimension-truncation recall audit: approx side = exact kNN over
    # the 16-component prefix; same intersection join + per-query
    # denominator as the IVF recall twin
    sql["ann_recall_truncated_embeddings"] = f"""
        WITH e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
        t2 AS (SELECT vec_id, v[1:16] AS v FROM e2),
        exd AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round({_KM_DIST("q.v", "c.v")}, 6) AS l2_dist
          FROM e2 q JOIN e2 c
            ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY l2_dist ASC, neighbor_id ASC) AS rn
            FROM exd)
          WHERE rn <= 5
        ),
        apd AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round({_KM_DIST("q.v", "c.v")}, 6) AS l2_dist
          FROM t2 q JOIN t2 c
            ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        ),
        approx AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY l2_dist ASC, neighbor_id ASC) AS rn
            FROM apd)
          WHERE rn <= 5
        ),
        hits AS (
          SELECT x.query_id, count(*) AS n_hits
          FROM exact x JOIN approx a
            ON x.query_id = a.query_id
           AND x.neighbor_id = a.neighbor_id
          GROUP BY x.query_id
        )
        SELECT q.query_id,
               CAST(coalesce(h.n_hits, 0) AS INTEGER) AS n_hits,
               round(coalesce(h.n_hits, 0) / q.n_exact, 6) AS recall
        FROM (SELECT query_id, least(count(*), 5) AS n_exact
              FROM exact GROUP BY query_id) q
        LEFT JOIN hits h ON q.query_id = h.query_id
    """
    # streaming CDC trim lifecycle: each trigger's output equals the
    # one-shot trim over everything-ingested-so-far restricted to the
    # trigger's docs, so the 2-file replay is trim(evens) UNION
    # trim(all)|odds
    assert sql["cdc_trim_docs"].count("FROM documents") == 1
    sql["stream_cdc_trim_docs"] = (
        "SELECT * FROM (\n"
        + sql["cdc_trim_docs"].replace(
            "FROM documents", "FROM documents WHERE doc_id % 2 = 0"
        )
        + "\n)\nUNION ALL\nSELECT * FROM (\n"
        + sql["cdc_trim_docs"]
        + "\n) WHERE doc_id % 2 = 1"
    )
    sql["curated_corpus_neardup_docs"] = f"""
        WITH RECURSIVE cur AS ({sql["curated_corpus_docs"]}),
        {_cur_cc},
        cl AS (
          SELECT c.*, coalesce(l.cluster_id, c.doc_id) AS cluster_id
          FROM cur c LEFT JOIN labels l USING (doc_id)
        ),
        sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
               FROM cl GROUP BY 1)
        SELECT cl.doc_id, cl.lang, cl.source, cl.n_tokens,
               cl.quality_score, cl.content_hash, sz.n_members
        FROM cl JOIN sz USING (cluster_id)
        WHERE cl.doc_id = cl.cluster_id
    """
    # ---- round 13 twins (VERDICT r12 #2/#3/#4/#5/#8) -----------------------
    # paned hopping aggregation: panes are an exact algebraic
    # decomposition of the hopping count, so the twin IS the plain
    # x(size/slide) expansion SQL — hash equality proves the pane
    # partial+rollup algebra
    sql["hopping_counts_paned"] = sql["hopping_counts"]
    # streaming near-dup lifecycle: the FOLDED persisted band index is
    # batching-invariant (CC under component contraction), so its
    # labels equal the one-shot transitive closure — over the same
    # 30% 'streamnd' hash-sample slice the replay ingests (both the
    # CTE's toksrc and the outer documents scan rewrite)
    _snd_pred = (
        "("
        + _D_HASH.format(x="concat('streamnd:', CAST(doc_id AS VARCHAR))")
        + " % 1000000) < 300000"
    )
    assert sql["dedup_clusters_docs"].count("FROM documents") == 2
    sql["stream_near_dedup_docs"] = sql["dedup_clusters_docs"].replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE {_snd_pred})",
    )
    # cluster-level split routing: the recursive-CTE closure labels
    # each doc with its near-dup cluster, then the SAME 10/10/80 hash
    # split as split_docs keyed on the CLUSTER id
    _clsplit_bucket = (
        "("
        + _D_HASH.format(
            x="concat('split:', CAST(cluster_id AS VARCHAR))"
        )
        + " % 1000000)"
    )
    sql["cluster_split_docs"] = f"""
        WITH RECURSIVE {_lsh_cc_cte},
        cl AS (
          SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN labels l USING (doc_id)
        )
        SELECT doc_id, cluster_id,
               CASE WHEN {_clsplit_bucket} < 100000 THEN 'val'
                    WHEN {_clsplit_bucket} < 200000 THEN 'test'
                    ELSE 'train' END AS split
        FROM cl
    """
    # BM25 ranked retrieval (operators/text.bm25_topk): query terms =
    # first 8 distinct tokens of the query docs in first-occurrence
    # order; per-term Okapi weights round to 9 dp (ln ulp) and sum
    # through DECIMAL(28,12); rank on the exact decimal, ties by
    # doc_id. Arithmetic association matches the Spark expression
    # term for term (IEEE mul/div are deterministic given identical
    # inputs). Parameterized over the query-side and corpus-side
    # predicates: bm25_topk_docs retrieves from the full corpus with
    # corpus-derived queries; bm25_eval_contamination_docs queries
    # the TRAIN side with the eval split (index stats over train
    # only, matching text.bm25_topk's df-derived stats).
    def _bm25_sql(query_pred: str, corpus_pred: str, k: int) -> str:
        return f"""
        WITH toksrc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        postok AS (
          SELECT doc_id, u.p AS pos, u.tok AS token
          FROM (SELECT doc_id,
                       unnest([{{'p': i, 'tok': toks[i]}}
                               for i in range(1, len(toks) + 1)]) AS u
                FROM toksrc)
        ),
        tok AS (SELECT * FROM postok WHERE {corpus_pred}),
        qt AS (SELECT doc_id AS query_id, token, min(pos) AS fp
               FROM postok WHERE {query_pred} GROUP BY 1, 2),
        qterms AS (
          SELECT query_id, token FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY fp, token) AS qr
            FROM qt) WHERE qr <= 8
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        dft AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
        stats AS (
          SELECT (SELECT count(DISTINCT doc_id) FROM documents
                  WHERE {corpus_pred}) AS n_docs,
                 (SELECT count(*) FROM tok) AS total_tokens
        ),
        scored AS (
          SELECT q.query_id, t.doc_id,
                 round(
                   ln(1 + (s.n_docs - f.doc_freq + 0.5)
                          / (f.doc_freq + 0.5))
                   * (t.tf * (1.2 + 1))
                   / (t.tf + 1.2 * (1 - 0.75 + 0.75
                        * (d.dl / (s.total_tokens / s.n_docs)))),
                   9) AS w
          FROM qterms q
          JOIN tf t USING (token)
          JOIN dl d ON t.doc_id = d.doc_id
          JOIN dft f ON t.token = f.token
          CROSS JOIN stats s
        ),
        agg AS (SELECT query_id, doc_id,
                       sum(CAST(w AS DECIMAL(28,12))) AS sd
                FROM scored GROUP BY 1, 2)
        SELECT query_id, doc_id,
               round(CAST(sd AS DOUBLE), 6) AS bm25,
               CAST(rnk AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sd DESC, doc_id) AS rnk
              FROM agg)
        WHERE rnk <= {k}
    """

    sql["bm25_topk_docs"] = _bm25_sql("doc_id % 101 = 0", "TRUE", 10)
    sql["bm25_eval_contamination_docs"] = _bm25_sql(
        "doc_id % 50 = 0", "doc_id % 50 <> 0", 5
    )
    # doc-level asymmetric containment (Broder): the Jaccard twin's
    # shingle join re-selected as DIRECTED containment rows
    sql["ngram_containment_docs"] = f"""
        {_D_SHINGLES},
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS n_inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        j AS (
          SELECT doc_a, doc_b, n_inter, sa.n AS na, sb.n AS nb
          FROM inter
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
        ),
        d AS (
          SELECT doc_a AS doc_contained, doc_b AS doc_container,
                 n_inter, round(n_inter / na, 6) AS containment
          FROM j
          UNION ALL
          SELECT doc_b, doc_a, n_inter, round(n_inter / nb, 6)
          FROM j
        )
        SELECT doc_contained, doc_container, n_inter, containment
        FROM d WHERE containment >= 0.8
    """
    # snapshot-diff -> ANN ingest: tombstone(removed+changed) +
    # append(added+changed) + compact leaves exactly encode(v2) under
    # v1's quantizers, so the twin is the init-only one-shot over the
    # POST-DIFF corpus (emb) with quantizer seeds drawn from v1
    # (emb1). Vector edit = negation (exact in IEEE both engines).
    _ivf_src = sql["knn_ivf_pq_embeddings"]
    assert _ivf_src.count("FROM embeddings\n        ),") == 1
    _snap_ann = _ivf_src.replace("WITH emb AS (", "WITH emb1 AS (", 1)
    _snap_ann = _snap_ann.replace(
        "FROM embeddings\n        ),",
        """FROM embeddings
        ),
        emb AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 7 = 0 THEN [-x for x in v]
                      ELSE v END AS v
          FROM emb1 WHERE vec_id % 11 <> 0
          UNION ALL
          SELECT vec_id + 2000000 AS vec_id, v FROM emb1
          WHERE vec_id % 13 = 0
        ),""",
        1,
    )
    assert _snap_ann.count("FROM emb ORDER BY vec_id LIMIT") == 2
    _snap_ann = _snap_ann.replace(
        "FROM emb ORDER BY vec_id LIMIT",
        "FROM emb1 ORDER BY vec_id LIMIT",
    )
    sql["snapshot_ann_ingest_embeddings"] = _snap_ann

    # ---- round 14 twins (VERDICT r13 #2-#7) --------------------------------
    # quantizer refresh: compact(retrain_corpus=v2) re-trains on the
    # survivors and re-encodes, bit-identical to an init-only build
    # over the POST-DIFF corpus — so the probe twin is the same v2
    # corpus rewrite as _snap_ann but WITHOUT the seed redirection
    # (seeds now come from the survivors, not v1); the entry wraps the
    # probe in the recall@5-vs-exact join (ann_recall_ivf_embeddings'
    # SQL shape over the v2 corpus)
    _refresh_probe = _ivf_src.replace("WITH emb AS (", "WITH emb1 AS (", 1)
    assert _refresh_probe.count("FROM embeddings\n        ),") == 1
    _refresh_probe = _refresh_probe.replace(
        "FROM embeddings\n        ),",
        """FROM embeddings
        ),
        emb AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 7 = 0 THEN [-x for x in v]
                      ELSE v END AS v
          FROM emb1 WHERE vec_id % 11 <> 0
          UNION ALL
          SELECT vec_id + 2000000 AS vec_id, v FROM emb1
          WHERE vec_id % 13 = 0
        ),""",
        1,
    )
    sql["ann_refresh_recall_embeddings"] = f"""
        WITH approx AS ({_refresh_probe}),
        e1 AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
               FROM embeddings),
        e2 AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 7 = 0 THEN [-x for x in v]
                      ELSE v END AS v
          FROM e1 WHERE vec_id % 11 <> 0
          UNION ALL
          SELECT vec_id + 2000000 AS vec_id, v FROM e1
          WHERE vec_id % 13 = 0
        ),
        exd AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round({_KM_DIST("q.v", "c.v")}, 6) AS l2_dist
          FROM e2 q JOIN e2 c
            ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY l2_dist ASC, neighbor_id ASC) AS rn
            FROM exd)
          WHERE rn <= 5
        ),
        hits AS (
          SELECT x.query_id, count(*) AS n_hits
          FROM exact x JOIN approx a
            ON x.query_id = a.query_id
           AND x.neighbor_id = a.neighbor_id
          GROUP BY x.query_id
        )
        SELECT q.query_id,
               CAST(coalesce(h.n_hits, 0) AS INTEGER) AS n_hits,
               round(coalesce(h.n_hits, 0) / q.n_exact, 6) AS recall
        FROM (SELECT query_id, least(count(*), 5) AS n_exact
              FROM exact GROUP BY query_id) q
        LEFT JOIN hits h ON q.query_id = h.query_id
    """
    # frozen cluster-split routing under incremental ingest: batch 1
    # (even docs) splits by its OWN closure's labels c1; batch 2 (odd
    # docs) routes by min(c1) over the even members of its FINAL
    # component (the smallest previously-assigned cluster id — the
    # documented tie policy), else by the component label. The even
    # closure is the _lsh_cc_cte with every CTE name suffixed and the
    # corpus scan restricted; bands are per-doc, so the restriction
    # commutes with the banding.
    import re as _re

    assert _lsh_cc_cte.count("FROM documents") == 1
    _cc_even = _re.sub(
        r"\b(toksrc|sh|sig|bands|pairs|edges|reach|labels)\b",
        r"\1_e",
        _lsh_cc_cte,
    ).replace("FROM documents", "FROM documents WHERE doc_id % 2 = 0")

    def _route_case(key: str) -> str:
        b = (
            "("
            + _D_HASH.format(x=f"concat('split:', CAST({key} AS VARCHAR))")
            + " % 1000000)"
        )
        return (
            f"CASE WHEN {b} < 100000 THEN 'val' "
            f"WHEN {b} < 200000 THEN 'test' ELSE 'train' END"
        )

    # keyed paned hopping: panes are an exact decomposition for the
    # count + exact-decimal-sum partials, so the twin IS the plain
    # keyed hopping SQL (the hopping_counts_paned precedent)
    sql["top_users_hopping_paned"] = sql["top_users_hopping"]
    # probe-routed hopping: both physical paths are result-identical
    # (each is hash-twinned against this same SQL), so the probe's
    # choice cannot change the answer — the twin is the plain SQL
    sql["hopping_counts_auto"] = sql["hopping_counts"]
    # banded containment: brute-force directed containment restricted
    # to the LSH candidate set (the lsh_verified_pairs CTE stack);
    # n_inter casts to BIGINT to match Spark's size().cast('long')
    sql["containment_verified_pairs_docs"] = f"""
        {_D_SHINGLES},
        sig AS (
          SELECT doc_id, {_MINHASH_MINS}
          FROM sh GROUP BY doc_id
        ),
        bands AS ({_BAND_SELECTS}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
        ),
        shs AS (SELECT doc_id, list_distinct({_D_SH3}) AS shingles
                FROM toksrc),
        j AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(len(list_intersect(x.shingles, y.shingles))
                      AS BIGINT) AS n_inter,
                 len(x.shingles) AS na, len(y.shingles) AS nb
          FROM cand c
          JOIN shs x ON c.doc_a = x.doc_id
          JOIN shs y ON c.doc_b = y.doc_id
        ),
        d AS (
          SELECT doc_a AS doc_contained, doc_b AS doc_container,
                 n_inter, round(n_inter / na, 6) AS containment
          FROM j
          UNION ALL
          SELECT doc_b, doc_a, n_inter, round(n_inter / nb, 6)
          FROM j
        )
        SELECT doc_contained, doc_container, n_inter, containment
        FROM d WHERE containment >= 0.8
    """
    # persisted retrieval index: additive df/N folds + union tf/dl make
    # build+append+compact+read bit-equal to the scan-per-call scorer
    # over the full corpus, so the twin IS the bm25_topk_docs SQL
    sql["bm25_topk_indexed_docs"] = sql["bm25_topk_docs"]
    sql["incremental_cluster_split_docs"] = f"""
        WITH RECURSIVE {_cc_even},
        {_lsh_cc_cte},
        c1 AS (
          SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS c1
          FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
          LEFT JOIN labels_e l USING (doc_id)
        ),
        cf AS (
          SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN labels l USING (doc_id)
        ),
        routing AS (
          SELECT cf.cluster_id, min(c1.c1) AS route_c1
          FROM cf JOIN c1 USING (doc_id) GROUP BY 1
        )
        SELECT cf.doc_id, cf.cluster_id,
               {_route_case("coalesce(c1.c1, routing.route_c1, cf.cluster_id)")} AS split
        FROM cf
        LEFT JOIN c1 USING (doc_id)
        LEFT JOIN routing USING (cluster_id)
    """
    # streaming split-routing lifecycle: file batching = the even/odd
    # batching of the incremental entry, and recorded first-seen
    # cluster ids fold through the remap log to current labels — so
    # the twin IS the incremental entry's SQL over the same 30%
    # 'streamsplit' hash sample the replay ingests (every documents
    # scan: both closures, c1 and cf)
    _ssp_pred = (
        "("
        + _D_HASH.format(
            x="concat('streamsplit:', CAST(doc_id AS VARCHAR))"
        )
        + " % 1000000) < 300000"
    )
    assert sql["incremental_cluster_split_docs"].count("FROM documents") == 4
    sql["stream_cluster_split_docs"] = sql[
        "incremental_cluster_split_docs"
    ].replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE {_ssp_pred})",
    )
    # release datasheet v2: composition of the card / cluster-split /
    # n-gram contamination / BM25-retrieval CTEs — every number equals
    # what its source gate entry reports; contamination CTEs carry a
    # _c suffix to avoid colliding with the closure's names
    sql["dataset_card_v2_docs"] = f"""
        WITH RECURSIVE {_lsh_cc_cte},
        spl AS (
          SELECT d.doc_id,
                 coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                 {_route_case("coalesce(l.cluster_id, d.doc_id)")} AS split
          FROM documents d LEFT JOIN labels l USING (doc_id)
        ),
        tcard AS (
          SELECT doc_id, source, lang,
                 len({_D_TOKS}) AS nt,
                 length(text) AS nc,
                 {_D_HASH.format(x="text")} AS h,
                 round((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)) * 0.5
                   + least(len({_D_TOKS}) / 100.0, 1.0) * 0.5, 6) AS q
          FROM documents
        ),
        card AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nt) AS BIGINT) AS n_tokens,
                 CAST(sum(nc) AS BIGINT) AS n_chars,
                 round(CAST(sum(nt) AS DOUBLE) / count(*), 6)
                   AS mean_doc_tokens,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                 round(1.0 - CAST(count(DISTINCT h) AS DOUBLE)
                   / count(*), 6) AS dup_rate,
                 round(CAST(sum(CAST(q AS DECIMAL(28,12))) AS DOUBLE)
                   / count(*), 6) AS mean_quality
          FROM tcard
        ),
        splitrow AS (
          SELECT CAST(count(*) FILTER (WHERE split = 'train') AS BIGINT)
                   AS n_train,
                 CAST(count(*) FILTER (WHERE split = 'val') AS BIGINT)
                   AS n_val,
                 CAST(count(*) FILTER (WHERE split = 'test') AS BIGINT)
                   AS n_test
          FROM spl
        ),
        szs AS (SELECT cluster_id, count(*) AS c FROM spl GROUP BY 1),
        clrow AS (
          SELECT CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT)
                   AS n_neardup_docs
          FROM szs
        ),
        tc AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
        shc AS (SELECT doc_id, unnest(list_distinct({_d_sh4})) AS shingle
                FROM tc),
        hc AS (SELECT doc_id, {_D_HASH.format(x="shingle")} AS h FROM shc),
        flagged AS (
          SELECT DISTINCT tr.doc_id
          FROM hc tr JOIN hc ev ON tr.h = ev.h
          WHERE tr.doc_id % 50 <> 0 AND ev.doc_id % 50 = 0
        ),
        controw AS (
          SELECT CAST(count(*) AS BIGINT) AS ngram_flagged_train,
                 (SELECT count(*) FROM documents WHERE doc_id % 50 <> 0)
                   AS n50
          FROM flagged
        ),
        bm25row AS (
          SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
                   AS bm25_flagged_train
          FROM ({sql["bm25_eval_contamination_docs"]})
        )
        SELECT card.*,
               splitrow.n_train, splitrow.n_val, splitrow.n_test,
               clrow.n_clusters, clrow.n_neardup_docs,
               controw.ngram_flagged_train,
               bm25row.bm25_flagged_train,
               round(clrow.n_neardup_docs / card.n_docs, 6)
                 AS neardup_rate,
               round(controw.ngram_flagged_train / controw.n50, 6)
                 AS ngram_train_rate
        FROM card, splitrow, clrow, controw, bm25row
    """
    return sql

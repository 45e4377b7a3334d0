"""Domain-operator queries completing the SURVEY §2 inventory.

Risk-score assembly (X15/X16), runtime fields (X21/X23), the multi-emit
factor normalizer (X22/UD3), gated enrichment (F8), sort/limit (K1/K6),
stats-table export (A4), the prefix-scan spam truncation (UD1/X9) with
an exact oracle, and the full spec-extraction pipeline (UD2, rows-only —
its Java-regex lookaheads are not RE2-expressible, so DuckDB can't
replay it; parity is covered by the reference-golden unit tests in
tests/test_domain_golden.py instead).

printf parity rule: ``format_string``/``printf`` only ever format
values ALREADY rounded via ``_r`` at the same precision — Java
(HALF_UP) and C (half-even) disagree only on exact half-boundaries,
which pre-rounded values cannot hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.conditions import detect_condition
from ..functions.factors import normalize_risk_factors
from ..functions.textprep import SPAM_INDICATORS, truncate_spam
from ..functions.specs import with_specs
from .queries import _r, _t, query

# ---------------------------------------------------------------------------
# X15 + X16 + F4 — additive risk score, clamp, factor-list assembly
# reference: poller/poller.py:459-482,669-705 (points table README.md:370-400)
# ---------------------------------------------------------------------------


@query(
    "x15_risk_assembly",
    oracle="""
    WITH z AS (
        SELECT event_id, user_id, event_type, value,
               round(((value - 250.0) / 100.0) + 1e-6, 2) AS z
        FROM events
    ),
    pts AS (
        SELECT event_id, z,
               (CASE WHEN z < -1.5 THEN 30 ELSE 0 END
                + CASE WHEN z < -2.5 THEN 40 ELSE 0 END
                + CASE WHEN event_type = 'error' THEN 30 ELSE 0 END
                + CASE WHEN value > 400 THEN 15 ELSE 0 END
                + CASE WHEN user_id % 10 = 0 THEN -30 ELSE 0 END) AS raw,
               CASE WHEN z < -1.5
                    THEN printf('Very Low Price vs Market (Z=%.2f)', z) END AS f1,
               CASE WHEN z < -2.5 THEN 'Extremely Low Price' END AS f2,
               CASE WHEN event_type = 'error' THEN 'External Contact' END AS f3,
               CASE WHEN value > 400 THEN 'Suspiciously High Value' END AS f4,
               CASE WHEN user_id % 10 = 0 THEN 'Trusted Seller' END AS f5
        FROM z
    )
    SELECT event_id,
           greatest(0, least(100, raw)) AS risk_score,
           coalesce(array_to_string(
               list_filter([f1, f2, f3, f4, f5], x -> x IS NOT NULL), '; '), '')
               AS risk_factors
    FROM pts
    """,
    ops=("X15", "X16", "X20", "F4", "F7"),
)
def x15_risk_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive rule points → clamp [0,100] → human-readable factor
    list (poller.py:459-482,669-705): each rule is a when/otherwise-0
    column, the factor array is the same conditions emitting formatted
    strings, compacted and joined. Pure row-local codegen — no shuffle
    at any scale."""
    events = _t(spark, sf_dir, "events")
    z = _r((F.col("value") - 250.0) / 100.0, 2)
    df = events.select("event_id", "user_id", "event_type", "value", z.alias("z"))

    rules = [
        (F.col("z") < -1.5, 30, F.format_string("Very Low Price vs Market (Z=%.2f)", F.col("z"))),
        (F.col("z") < -2.5, 40, F.lit("Extremely Low Price")),
        (F.col("event_type") == "error", 30, F.lit("External Contact")),
        (F.col("value") > 400, 15, F.lit("Suspiciously High Value")),
        (F.col("user_id") % 10 == 0, -30, F.lit("Trusted Seller")),
    ]
    raw = None
    factors = []
    for cond, pts, label in rules:
        term = F.when(cond, pts).otherwise(0)
        raw = term if raw is None else raw + term
        factors.append(F.when(cond, label))
    return df.select(
        "event_id",
        F.greatest(F.lit(0), F.least(F.lit(100), raw)).alias("risk_score"),
        F.concat_ws("; ", F.array_compact(F.array(*factors))).alias("risk_factors"),
    )


# ---------------------------------------------------------------------------
# X22 / UD3 — multi-emit factor normalization (Painless emit() ≅ explode)
# reference: kibana/dashboard_export.ndjson:1 (runtime field, ~80 lines)
# ---------------------------------------------------------------------------


@query(
    "x22_factor_normalize",
    oracle="""
    WITH emitted AS (
        SELECT unnest(
            CASE WHEN event_type IN ('click', 'view') THEN []::VARCHAR[]
                 WHEN event_type = 'error' THEN ['Error Event']
                 WHEN event_type = 'purchase' THEN
                     ['Purchase',
                      'amount:' || CAST(CAST(floor(value / 100) AS BIGINT) AS VARCHAR)]
                 ELSE ['raw:' || event_type] END) AS factor
        FROM events
    )
    SELECT factor, count(*) AS n FROM emitted GROUP BY factor
    """,
    ops=("X22", "UD3"),
)
def x22_factor_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-emit normalizer: positives are dropped (emit nothing),
    known patterns map to canonical labels, one branch emits MULTIPLE
    values per row, unknowns fall through as raw — the Painless
    runtime-field shape as explode(when-chain array)."""
    events = _t(spark, sf_dir, "events")
    arr = (
        F.when(F.col("event_type").isin("click", "view"), F.array().cast("array<string>"))
        .when(F.col("event_type") == "error", F.array(F.lit("Error Event")))
        .when(
            F.col("event_type") == "purchase",
            F.array(
                F.lit("Purchase"),
                F.concat(
                    F.lit("amount:"),
                    F.floor(F.col("value") / 100).cast("bigint").cast("string"),
                ),
            ),
        )
        .otherwise(F.array(F.concat(F.lit("raw:"), F.col("event_type"))))
    )
    return (
        events.select(F.explode(arr).alias("factor"))
        .groupBy("factor")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# X22 full fidelity — the Painless risk_factor_normalized runtime field
# reference: kibana/dashboard_export.ndjson:1 (~80-line script)
# ---------------------------------------------------------------------------


@query(
    "x22_painless_normalizer",
    oracle="""
    WITH synth AS (
        SELECT list_filter([
            CASE event_type
                 WHEN 'click' THEN 'Trusted Seller (12+ reviews)'
                 WHEN 'view' THEN 'Statistically Cheap (Z=-2.10) [USED]'
                 WHEN 'error' THEN 'External Contact'
                 WHEN 'purchase' THEN
                     concat('Suspicious keywords found: [', chr(39), 'estafa',
                            chr(39), ', ', chr(39), 'urgente', chr(39), ']')
                 ELSE 'Weird Unmapped Factor' END,
            CASE WHEN value > 400 THEN 'EXTREME Price Anomaly' END,
            CASE WHEN user_id % 11 = 0 THEN 'Dormant Account' END
        ], x -> x IS NOT NULL) AS factors
        FROM events
    ),
    per AS (
        SELECT unnest(factors) AS f FROM synth
    ),
    emitted AS (
        SELECT unnest(
            CASE
            WHEN contains(f, 'Trusted Seller') OR contains(f, 'TOP SELLER')
                 THEN []::VARCHAR[]
            WHEN contains(f, 'Price is <40%') THEN ['Critical Price Drop (<40% val.)']
            WHEN contains(f, 'Statistically Cheap') THEN ['Statistically Cheap (Z-Score)']
            WHEN contains(f, 'EXTREME Price Anomaly') THEN ['EXTREME Price Anomaly']
            WHEN contains(f, 'External Contact') THEN ['External Contact Attempt']
            WHEN contains(f, 'Very Short Description') THEN ['Low Quality Desc.']
            WHEN contains(f, 'Low Image Count') THEN ['Missing Photos (0-1)']
            WHEN contains(f, 'Aggressive Title') THEN ['Aggressive Title (CAPS)']
            WHEN contains(f, 'Risky Payment') THEN ['Risky Payment Method']
            WHEN contains(f, 'User registered') OR contains(f, 'New User')
                 THEN ['New User (<48h)']
            WHEN contains(f, 'User has Scam Reports') THEN ['User Reported as Scam']
            WHEN contains(f, 'No Reviews') OR contains(f, 'Dormant Account')
                 THEN ['No Reputation / Dormant']
            WHEN contains(f, 'Suspicious keywords') OR contains(f, 'Keyword found')
                 THEN list_transform(
                     list_filter(
                         list_transform(
                             string_split(
                                 regexp_replace(
                                     CASE WHEN regexp_matches(f, '\\[.*\\]')
                                          THEN regexp_extract(f, '\\[(.*)\\]', 1)
                                          WHEN contains(f, ':')
                                          THEN regexp_replace(f, '^[^:]*:', '')
                                          ELSE f END,
                                     concat('[', chr(39), '"', ']'), '', 'g'),
                                 ','),
                             k -> trim(k)),
                         k -> length(k) > 0),
                     k -> concat('"', k, '"'))
            ELSE [f] END) AS factor
        FROM per
    )
    SELECT factor, count(*) AS n FROM emitted GROUP BY factor
    """,
    ops=("X22", "UD3"),
)
def x22_painless_normalizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful X22: synthesize reference-format factor strings (one
    per Painless branch class, incl. the quoted-keyword-list payload),
    normalize with functions/factors.py — positives dropped, canonical
    labels, keyword multi-emit, raw fallback — explode and count."""
    events = _t(spark, sf_dir, "events")
    synth = F.array_compact(
        F.array(
            F.when(F.col("event_type") == "click", F.lit("Trusted Seller (12+ reviews)"))
            .when(F.col("event_type") == "view", F.lit("Statistically Cheap (Z=-2.10) [USED]"))
            .when(F.col("event_type") == "error", F.lit("External Contact"))
            .when(
                F.col("event_type") == "purchase",
                F.lit("Suspicious keywords found: ['estafa', 'urgente']"),
            )
            .otherwise(F.lit("Weird Unmapped Factor")),
            F.when(F.col("value") > 400, F.lit("EXTREME Price Anomaly")),
            F.when(F.col("user_id") % 11 == 0, F.lit("Dormant Account")),
        )
    )
    return (
        events.select(
            F.explode(normalize_risk_factors(synth)).alias("factor")
        )
        .groupBy("factor")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# X21 + X23 + X17 — runtime bool (day-difference) + URL templating
# reference: kibana/dashboard_export.ndjson:1 (Painless runtime fields,
# fieldFormatMap); elastalert/rules/high_risk.yaml:38-42
# ---------------------------------------------------------------------------


@query(
    "x21_runtime_fields",
    oracle="""
    SELECT coalesce(date_diff('day', o_orderdate, l_shipdate) > 1, FALSE)
               AS shipped_after_one_day,
           count(*) AS n,
           min('https://es.wallapop.com/item/'
               || lower(o_orderstatus) || '-' || CAST(o_orderkey AS VARCHAR))
               AS sample_url
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    ops=("X21", "X23", "X17"),
)
def x21_runtime_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe derived boolean (modified_after_one_day ≅ shipped >1
    day after order) plus the URL-template column — query-time computed
    columns, zero-cost until referenced (Catalyst prunes them)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    flag = F.coalesce(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 1, F.lit(False)
    )
    url = F.concat(
        F.lit("https://es.wallapop.com/item/"),
        F.lower(F.col("o_orderstatus")),
        F.lit("-"),
        F.col("o_orderkey").cast("string"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(flag.alias("shipped_after_one_day"), url.alias("url"))
        .groupBy("shipped_after_one_day")
        .agg(F.count(F.lit(1)).alias("n"), F.min("url").alias("sample_url"))
    )


# ---------------------------------------------------------------------------
# F8 — gated enrichment: enrich only suspicious rows, pass others through
# reference: poller/poller.py:653-663 (manual semi-join pushdown)
# ---------------------------------------------------------------------------


@query(
    "f08_gated_enrichment",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           (l.l_extendedprice > 90000 OR l.l_returnflag = 'R') AS gated,
           s.s_name
    FROM lineitem l
    LEFT JOIN supplier s
      ON (l.l_extendedprice > 90000 OR l.l_returnflag = 'R')
     AND l.l_suppkey = s.s_suppkey
    """,
    ops=("F8", "F3", "F9"),
)
def f08_gated_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch expensive enrichment only for rows passing the gate; cheap
    rows pass through with nulls (poller.py:653-663). Spark shape:
    filter → broadcast join → union — the gate filter shrinks the join
    input BEFORE the exchange, exactly the reference's manual semi-join
    pushdown, and Catalyst pushes the gate into the scan of the hot
    branch."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice", "l_returnflag"
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    gate = (F.col("l_extendedprice") > 90000) | (F.col("l_returnflag") == "R")

    hot = (
        li.filter(gate)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey, "left")
        .select(
            "l_orderkey", "l_linenumber", F.lit(True).alias("gated"), "s_name"
        )
    )
    cold = li.filter(~gate).select(
        "l_orderkey",
        "l_linenumber",
        F.lit(False).alias("gated"),
        F.lit(None).cast("string").alias("s_name"),
    )
    return hot.unionByName(cold)


# ---------------------------------------------------------------------------
# K1 + K6 — ordered scan with cap (order_by=newest, item limit)
# reference: poller/poller.py:533,554,59; poller/analist_poller.py:289,310
# ---------------------------------------------------------------------------


@query(
    "k01_newest_first_cap",
    oracle="""
    SELECT event_id, ts, event_type, round((value) + 1e-6, 2) AS value
    FROM events
    ORDER BY ts DESC, event_id ASC
    LIMIT 100
    """,
    ops=("K1", "K6"),
)
def k01_newest_first_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order_by=newest + item cap → TakeOrderedAndProject (no global
    sort materialization: each partition keeps its local top-100, the
    driver merges — O(n) scan, O(k) memory at any scale)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.orderBy(F.desc("ts"), F.asc("event_id"))
        .select("event_id", "ts", "event_type", _r(F.col("value"), 2).alias("value"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# A4 — stats-table serialization (market_stats.json writer)
# reference: poller/regex_analyzer.py:1018-1022
# ---------------------------------------------------------------------------


@query(
    "a04_stats_export",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           printf('{"mean":%.2f,"median":%.2f,"stdev":%.2f,"count":%d}',
                  round((avg(l_extendedprice)) + 1e-6, 2),
                  round((median(l_extendedprice)) + 1e-6, 2),
                  round((stddev_samp(l_extendedprice)) + 1e-6, 2),
                  count(*)) AS stats_json
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) >= 2
    """,
    ops=("A4", "X20"),
)
def a04_stats_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The market_stats.json serialization: one JSON stats blob per
    group (regex_analyzer.py:1018-1022). Values are pre-rounded before
    formatting so both engines print identical strings; the relational
    dim table (a01) remains the preferred consumption form."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.avg("l_extendedprice"), 2).alias("mean"),
            _r(F.median("l_extendedprice"), 2).alias("median"),
            _r(F.stddev_samp("l_extendedprice"), 2).alias("stdev"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.format_string(
                '{"mean":%.2f,"median":%.2f,"stdev":%.2f,"count":%d}',
                F.col("mean"),
                F.col("median"),
                F.col("stdev"),
                F.col("n"),
            ).alias("stats_json"),
        )
    )


# ---------------------------------------------------------------------------
# UD1 / X9 — prefix-scan spam truncation, exact oracle
# reference: poller/regex_analyzer.py:248-289
# ---------------------------------------------------------------------------


def _spam_truncate_sql() -> str:
    hits = " + ".join(
        f"CASE WHEN contains(lower(l), '{ind}') THEN 1 ELSE 0 END"
        for ind in SPAM_INDICATORS
    )
    return f"""
    WITH synth AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || chr(10) || 'rtx gtx amd intel ryzen i7'
                         || chr(10) || 'hidden tail line'
                    ELSE text END AS body
        FROM documents
    ),
    l AS (
        SELECT doc_id, body, string_split(body, chr(10)) AS lines FROM synth
    ),
    f AS (
        SELECT doc_id, body, lines,
               coalesce(list_position(
                   list_transform(lines, l -> ({hits}) > 3), TRUE), 0) AS fs
        FROM l
    )
    SELECT doc_id,
           fs > 0 AS truncated,
           length(CASE WHEN fs > 0
                       THEN array_to_string(list_slice(lines, 1, fs - 1), chr(10))
                       ELSE body END) AS kept_chars
    FROM f
    """


@query("ud1_spam_truncate", oracle=_spam_truncate_sql(), ops=("UD1", "X9"))
def ud1_spam_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-dependent prefix-scan truncation (regex_analyzer.py:248-289)
    verified end-to-end: a spam line is injected into every third doc,
    and both engines must cut at the same line. Native split/transform/
    array_position/slice — the UD1 candidate stays out of Python."""
    docs = _t(spark, sf_dir, "documents")
    body = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit("\nrtx gtx amd intel ryzen i7\nhidden tail line"),
        ),
    ).otherwise(F.col("text"))
    synth = docs.select("doc_id", body.alias("body"))
    kept = truncate_spam(F.col("body"))
    truncated = F.length("body") != F.length(kept)
    return synth.select(
        "doc_id",
        truncated.alias("truncated"),
        F.length(kept).alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# X2 (structured path) — hidden-price extraction, first-match semantics
# reference: poller/regex_analyzer.py:69-76,174-204
# ---------------------------------------------------------------------------


@query(
    "x02_hidden_price_structured",
    oracle="""
    WITH synth AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0
                    THEN 'vendo por ' || CAST(50 + doc_id % 900 AS VARCHAR)
                         || ' euros ' || text
                    WHEN doc_id % 4 = 1
                    THEN 'precio: ' || CAST(doc_id % 15 AS VARCHAR) || ' eur ' || text
                    ELSE text END AS body
        FROM documents
    ),
    ex AS (
        SELECT doc_id,
               list_filter(
                   list_transform(
                       regexp_extract_all(lower(body),
                           '(?:precio|valor|vende|vendo|pido|oferta)[:\\s]*(?:por)?\\s*(\\d{2,4})(?:[\\.,]\\d{2})?\\s*(?:€|eur|euros)',
                           1),
                       x -> CAST(x AS DOUBLE)),
                   v -> v > 20) AS vals
        FROM synth
    )
    SELECT doc_id, vals[1] AS hidden_price
    FROM ex WHERE len(vals) > 0
    """,
    ops=("X2",),
)
def x02_hidden_price_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured hidden-price pattern with FIRST-match-over-20
    semantics (regex_analyzer.py:174-204) — a deterministic price
    phrase is injected into some docs ('vendo por N euros' valid,
    'precio: N eur' below the 20 threshold for most) so both the match
    and the threshold branches execute."""
    docs = _t(spark, sf_dir, "documents")
    body = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("vendo por "),
                (50 + F.col("doc_id") % 900).cast("string"),
                F.lit(" euros "),
                F.col("text"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("precio: "),
                (F.col("doc_id") % 15).cast("string"),
                F.lit(" eur "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
    )
    pat = (
        r"(?:precio|valor|vende|vendo|pido|oferta)[:\s]*(?:por)?\s*"
        r"(\d{2,4})(?:[\.,]\d{2})?\s*(?:€|eur|euros)"
    )
    vals = F.filter(
        F.transform(
            F.regexp_extract_all(F.lower(body), F.lit(pat), 1),
            lambda x: x.cast("double"),
        ),
        lambda v: v > 20,
    )
    return (
        docs.select("doc_id", F.get(vals, 0).alias("hidden_price"))
        .filter(F.col("hidden_price").isNotNull())
    )


# ---------------------------------------------------------------------------
# F9 — nested/dynamic field projection (JSON props access, null-safe)
# reference: poller/poller.py:626-638 (.get() chains over dynamic fields)
# ---------------------------------------------------------------------------


@query(
    "f09_nested_json_projection",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           count(*) AS n,
           round((avg(CAST(json_extract_string(props, '$.k') AS INT))) + 1e-6, 2)
               AS avg_k
    FROM events
    GROUP BY 1
    """,
    ops=("F9",),
)
def f09_nested_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-field access: the reference's .get() chains over
    semi-structured docs become null-safe JSON path extraction
    (the ES dynamic-template open world). get_json_object stays
    codegen'd; for hot paths, from_json with an explicit schema
    lets Catalyst prune into the parse."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.avg("k"), 2).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# F6 — condition normalization with fallback precedence API > flag > regex
# reference: poller/poller.py:248-281,630-634; regex_analyzer.py:320-369
# ---------------------------------------------------------------------------


@query(
    "f06_condition_normalize",
    oracle="""
    WITH src AS (
        SELECT event_id,
               CASE event_type WHEN 'click' THEN 'new'
                               WHEN 'view' THEN 'as_good_as_new'
                               WHEN 'error' THEN 'has_given_it_all'
                               WHEN 'signup' THEN NULL
                               ELSE 'good' END AS api_condition,
               user_id % 7 = 0 AS is_refurbished,
               CASE WHEN value > 300 THEN 'NEW' ELSE 'USED' END AS text_condition
        FROM events
    )
    SELECT coalesce(
               CASE WHEN api_condition IS NOT NULL THEN
                   CASE lower(api_condition)
                        WHEN 'new' THEN 'NEW'
                        WHEN 'as_good_as_new' THEN 'LIKE_NEW'
                        WHEN 'has_given_it_all' THEN 'BROKEN'
                        ELSE 'USED' END END,
               CASE WHEN coalesce(is_refurbished, FALSE) THEN 'LIKE_NEW' END,
               text_condition) AS condition,
           count(*) AS n
    FROM src
    GROUP BY 1
    """,
    ops=("F6", "X3"),
)
def f06_condition_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condition normalization (API term → canonical class) under the
    fallback precedence API > refurbished-flag > regex text class
    (poller.py:248-281; regex_analyzer.py:320-369), driven by columns
    synthesized deterministically from events so every branch fires."""
    events = _t(spark, sf_dir, "events")
    api = (
        F.when(F.col("event_type") == "click", "new")
        .when(F.col("event_type") == "view", "as_good_as_new")
        .when(F.col("event_type") == "error", "has_given_it_all")
        .when(F.col("event_type") == "signup", F.lit(None).cast("string"))
        .otherwise("good")
    )
    refurb = F.col("user_id") % 7 == 0
    text_cond = F.when(F.col("value") > 300, "NEW").otherwise("USED")
    return (
        events.select(
            detect_condition(api, refurb, text_cond).alias("condition")
        )
        .groupBy("condition")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# K4 + K5 — best-candidate selection: max valid RAM / lexicographic max model
# reference: poller/regex_analyzer.py:549-563,466-470,509-513
# ---------------------------------------------------------------------------

_VALID_RAM = [4, 6, 8, 12, 16, 32, 64]


@query(
    "k45_best_component",
    oracle=f"""
    SELECT doc_id,
           list_max(list_filter(
               list_transform(regexp_extract_all(text, '(\\d{{1,3}})', 1),
                              x -> CAST(x AS INTEGER)),
               x -> x IN ({", ".join(str(v) for v in _VALID_RAM)}) AND x <= 64))
               AS best_ram,
           list_max(regexp_extract_all(lower(text), '([a-z]+[0-9]{{2,4}})', 1))
               AS best_model
    FROM documents
    """,
    ops=("K4", "K5"),
)
def k45_best_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-candidate selection over regex extraction arrays: K4 = max
    whitelisted RAM value under the category cap
    (regex_analyzer.py:549-563); K5 = lexicographic max of the deduped
    model set (sorted(models, reverse=True)[0],
    regex_analyzer.py:466-470). Pure array_max over filtered
    regexp_extract_all — no UDF, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    nums = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(r"(\d{1,3})"), 1),
        lambda x: x.cast("int"),
    )
    valid = F.array(*[F.lit(v) for v in _VALID_RAM])
    best_ram = F.array_max(
        F.filter(nums, lambda x: F.array_contains(valid, x) & (x <= 64))
    )
    models = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"([a-z]+[0-9]{2,4})"), 1)
    return docs.select(
        "doc_id",
        best_ram.alias("best_ram"),
        F.array_max(models).alias("best_model"),
    )


# ---------------------------------------------------------------------------
# X18 + X19 — badge/type scan over arrays with nulls; geo-point struct
# reference: poller/poller.py:672-673,712-714
# ---------------------------------------------------------------------------


@query(
    "x18_badge_scan",
    oracle="""
    WITH src AS (
        SELECT event_id,
               [ 'seller', event_type,
                 CASE WHEN user_id % 5 = 0 THEN 'TOP10' END ] AS badges,
               CASE WHEN user_id % 3 = 0 THEN 'pro' ELSE 'individual' END AS type
        FROM events
    )
    SELECT (len(list_filter(badges,
                b -> b IS NOT NULL AND contains(upper(b), 'TOP'))) > 0
            OR type = 'pro') AS trusted,
           count(*) AS n
    FROM src
    GROUP BY 1
    """,
    ops=("X18",),
)
def x18_badge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Badge/type trust scan ('TOP' in str(badges).upper() or type ==
    'pro', poller.py:672-673): exists() over a null-holding array +
    equality, as one codegen'd predicate."""
    events = _t(spark, sf_dir, "events")
    badges = F.array(
        F.lit("seller"),
        F.col("event_type"),
        F.when(F.col("user_id") % 5 == 0, "TOP10"),
    )
    typ = F.when(F.col("user_id") % 3 == 0, "pro").otherwise("individual")
    trusted = (
        F.exists(badges, lambda b: b.isNotNull() & F.upper(b).contains("TOP"))
        | (typ == "pro")
    )
    return events.select(trusted.alias("trusted")).groupBy("trusted").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "x19_geo_struct",
    oracle="""
    SELECT event_id,
           round((value % 90) + 1e-6, 2)                    AS lat,
           round((CAST(user_id % 360 AS DOUBLE) - 180) + 1e-6, 2) AS lon
    FROM events
    """,
    ops=("X19",),
)
def x19_geo_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-point struct construction (poller.py:712-714): build the
    nested {geo: {lat, lon}} struct, then project the fields back out
    (struct round-trip; flat scalars keep the oracle engine-neutral)."""
    events = _t(spark, sf_dir, "events")
    geo = F.struct(
        _r(F.col("value") % 90, 2).alias("lat"),
        _r((F.col("user_id") % 360).cast("double") - 180, 2).alias("lon"),
    )
    return events.select("event_id", geo.alias("geo")).select(
        "event_id", F.col("geo.lat").alias("lat"), F.col("geo.lon").alias("lon")
    )


# ---------------------------------------------------------------------------
# UD2 — full spec-extraction pipeline (rows-only: Java-regex lookaheads)
# reference: poller/regex_analyzer.py:724-786
# ---------------------------------------------------------------------------


@query("ud2_spec_extraction", oracle=None, ops=("UD2", "X3", "X4", "X5", "X6", "X7", "X8", "X11", "X12"))
def ud2_spec_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full prioritized spec pipeline (sanitize → truncate → title-
    priority merge → classify → constrain → condition) over synthetic
    listing text built from documents. No oracle: the RAM regex's
    negative lookahead isn't RE2-expressible, so DuckDB can't replay it
    — semantics are pinned by reference-golden fixtures instead
    (tests/test_domain_golden.py). Rows-only check: stable schema/count."""
    docs = _t(spark, sf_dir, "documents")
    listings = docs.select(
        "doc_id",
        F.concat(F.lit("Portatil i7 16GB RTX 3060 "), F.substring("text", 1, 80)).alias(
            "title"
        ),
        F.col("text").alias("description"),
    )
    out = with_specs(listings, title_col="title", desc_col="description")
    return out.select("doc_id", "cpu", "ram", "gpu", "category", "condition_regex")


# ---------------------------------------------------------------------------
# End-to-end: §3.2 stats build feeding the §3.1 risk engine (rows-only)
# ---------------------------------------------------------------------------


@query("rp01_end_to_end_risk", oracle=None, ops=("PIPELINE",))
def rp01_end_to_end_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full production loop in one plan: synthesize a
    listing corpus from documents, build the market-stats dims from it
    (operators/stats.py = §3.2), broadcast them back into the composed
    risk scorer with gated user enrichment (operators/risk.py = §3.1).
    Rows-only (regex extraction isn't RE2-expressible); the per-stage
    semantics are pinned by tests/test_risk_pipeline.py fixtures."""
    from ..operators.risk import score_listings
    from ..operators.stats import build_market_stats

    docs = _t(spark, sf_dir, "documents")
    variant = F.col("doc_id") % 4
    title = (
        F.when(variant == 0, "Portatil gaming i7 rtx 3060 16gb")
        .when(variant == 1, "Macbook air m2 como nuevo")
        .when(variant == 2, "Chromebook celeron barato")
        .otherwise("Portatil basico para oficina")
    )
    listings = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        title.alias("title"),
        F.col("text").alias("description"),
        ((F.col("n_chars") % 900) + 50.0).alias("price"),
        F.when(F.col("doc_id") % 5 == 0, "new").alias("api_condition"),
        (F.col("doc_id") % 7 == 0).alias("is_refurbished"),
        (F.col("doc_id") % 50).alias("user_id"),
    )
    users = (
        listings.select(F.col("user_id")).distinct()
        .select(
            "user_id",
            ((F.col("user_id") * 37) % 1000).cast("int").alias("register_days"),
            F.when(F.col("user_id") % 9 == 0, F.array(F.lit("TOP")))
            .otherwise(F.array(F.lit("seller"))).alias("badges"),
            F.when(F.col("user_id") % 3 == 0, "pro").otherwise("individual").alias("user_type"),
            F.when(F.col("user_id") % 25 == 0, 1).otherwise(0).alias("scam_reports"),
        )
    )
    reviews = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("user_id"),
        (F.col("value") % 100).alias("scoring"),
    )
    specced = with_specs(listings, title_col="title", desc_col="description").persist()
    prime, comp, _secondary = build_market_stats(specced, specs_ready=True)
    return score_listings(
        specced, prime, comp, users=users, reviews=reviews, specs_ready=True
    ).select(
        "id", "price", "category", "condition", "fallback_used",
        "composite_z", "estimated_value", "risk_score", "enriched",
        F.concat_ws("; ", "risk_factors").alias("risk_factors"),
    )

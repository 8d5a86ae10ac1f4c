"""Scalar function surface — SURVEY.md §2.8.

The AQL expression vocabulary (string ops, timestamp ops, arithmetic)
plus the vector/array and JSON/map function families the dynamic-payload
data model needs.  Everything is a built-in Catalyst expression —
whole-stage codegen'd, no Python.

Cross-dialect parity notes are inline per query (SURVEY.md §7.3.4):
DuckDB ``length()`` returns BIGINT (Spark INT → cast), DuckDB
``dayofweek`` is 0-based Sunday (use Spark ``weekday()+1`` ↔ DuckDB
``isodow``), list indexing is 1-based in DuckDB, float32 array elements
are compared after cast-to-double + round4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from events_to_db_spark.registry import query
from events_to_db_spark.session import load_table


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                  AS up_name,
           lower(p_type)                                  AS lo_type,
           CAST(length(p_name) AS BIGINT)                 AS name_len,
           substr(p_name, 1, 5)                           AS name_head,
           trim(p_name)                                   AS name_trim,
           replace(p_name, ' ', '_')                      AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 3, '0')          AS size_pad,
           concat(p_brand, ':', p_type)                   AS brand_type,
           (string_split(p_name, ' '))[1]                 AS first_tok,
           regexp_extract(p_brand, '([0-9]+)', 1)         AS brand_nr,
           (p_name LIKE '%a%')                            AS has_a
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function sweep over ``part`` (AQL string ops)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_type").alias("lo_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim("p_name").alias("name_trim"),
        F.expr("replace(p_name, ' ', '_')").alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.split("p_name", " ").getItem(0).alias("first_tok"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_nr"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)   AS y,
           CAST(month(o_orderdate) AS INTEGER)  AS m,
           count(*)                             AS n,
           CAST(max(day(o_orderdate)) AS INTEGER)      AS max_dom,
           CAST(max(isodow(o_orderdate)) AS INTEGER)   AS max_dow,
           strftime(min(date_trunc('month', o_orderdate)), '%Y-%m-%d') AS month_start,
           strftime(min(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY), '%Y-%m-%d')
                                                AS min_plus30,
           CAST(max(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)))
                AS BIGINT)                      AS max_days_since
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time-function sweep with month-bucket aggregation.
    Dialect parity: Spark ``weekday()+1`` == DuckDB ``isodow`` (ISO
    Monday=1); day arithmetic through DATE casts on both sides."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count("*").alias("n"),
            F.max(F.dayofmonth("o_orderdate")).alias("max_dom"),
            F.max(F.weekday("o_orderdate") + 1).alias("max_dow"),
            F.date_format(
                F.min(F.date_trunc("month", "o_orderdate")), "yyyy-MM-dd"
            ).alias("month_start"),
            F.date_format(
                F.min(F.date_add(F.to_date("o_orderdate"), 30)), "yyyy-MM-dd"
            ).alias("min_plus30"),
            F.max(
                F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            )
            .cast("long")
            .alias("max_days_since"),
        )
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT event_id,
           CAST(floor(value) AS BIGINT)            AS v_floor,
           CAST(ceil(value) AS BIGINT)             AS v_ceil,
           round(abs(value - 100), 4)              AS v_absdiff,
           CAST(mod(event_id, 7) AS BIGINT)        AS v_mod,
           round(pow(value, 0.5), 4)               AS v_pow,
           round(sqrt(value), 4)                   AS v_sqrt,
           round(ln(value + 1), 4)                 AS v_ln,
           round(exp(value / 500), 4)              AS v_exp,
           CAST(sign(value - 100) AS INTEGER)      AS v_sign,
           round(greatest(value, 100.0), 4)        AS v_max100,
           round(least(value, 100.0), 4)           AS v_min100
    FROM events
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function sweep over ``events.value`` (AQL arithmetic)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.floor(v).cast("long").alias("v_floor"),
        F.ceil(v).cast("long").alias("v_ceil"),
        F.round(F.abs(v - 100), 4).alias("v_absdiff"),
        (F.col("event_id") % 7).cast("long").alias("v_mod"),
        F.round(F.pow(v, 0.5), 4).alias("v_pow"),
        F.round(F.sqrt(v), 4).alias("v_sqrt"),
        F.round(F.log(v + 1), 4).alias("v_ln"),
        F.round(F.exp(v / 500), 4).alias("v_exp"),
        F.signum(v - 100).cast("int").alias("v_sign"),
        F.round(F.greatest(v, F.lit(100.0)), 4).alias("v_max100"),
        F.round(F.least(v, F.lit(100.0)), 4).alias("v_min100"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS h1,
           round(CAST(embedding[2] AS DOUBLE), 4) AS h2,
           round(CAST(embedding[3] AS DOUBLE), 4) AS h3,
           round(CAST(embedding[1] AS DOUBLE), 4)      AS e1,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS e_max,
           round(CAST(list_min(embedding) AS DOUBLE), 4) AS e_min,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sumsq,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order functions over the 64-dim embedding column
    (the vector-column surface, north-star N): size, slice, indexing,
    min/max, lambda transform/filter/aggregate.  Float32 elements are
    cast to double + round4 for cross-engine parity.  The head of the
    vector is emitted as three scalar columns (h1/h2/h3), not an ARRAY
    (driver-canonicalizer contract: scalar outputs only)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 4).alias("h1"),
        F.round(F.element_at(emb, 2).cast("double"), 4).alias("h2"),
        F.round(F.element_at(emb, 3).cast("double"), 4).alias("h3"),
        F.round(F.element_at(emb, 1).cast("double"), 4).alias("e1"),
        F.round(F.array_max(emb).cast("double"), 4).alias("e_max"),
        F.round(F.array_min(emb).cast("double"), 4).alias("e_min"),
        F.round(
            F.aggregate(
                emb,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sumsq"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
    )


@query(
    "q_fn_construct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(k := o_orderkey, p := o_totalprice).p        AS s_price,
           (CAST(o_totalprice AS DOUBLE) * 2)                       AS arr_1,
           round(list_sum([CAST(o_totalprice AS DOUBLE),
                           CAST(o_totalprice AS DOUBLE) * 2]), 4)   AS arr_sum,
           (map(['status'], [o_orderstatus])['status'])[1]          AS m_status
    FROM orders
    """,
)
def q_fn_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQL SELECT object/array construction: build a STRUCT, an ARRAY,
    and a MAP in the projection, then read components back out (the
    output is flattened because struct/map *rendering* differs across
    engines; the construction machinery is what's exercised)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
    arr = F.array(F.col("o_totalprice"), F.col("o_totalprice") * 2)
    m = F.create_map(F.lit("status"), F.col("o_orderstatus"))
    return o.select(
        "o_orderkey",
        s.getField("p").alias("s_price"),
        F.element_at(arr, 2).alias("arr_1"),
        F.round(
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("arr_sum"),
        F.element_at(m, F.lit("status")).alias("m_status"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(CAST(json_keys(props) AS VARCHAR[])), ',') AS ks,
           CAST(json_extract_string(props, '$.k') AS INTEGER)     AS k_val
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic payload as a typed MAP: parse the JSON ``props`` into
    ``map<string,int>``, list its keys (sorted — §7.5.5, joined to one
    STRING so the contract output stays scalar), and look one up.
    This is AQL's free-form-object access compiled to MapType."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("ks"),
        F.element_at(m, F.lit("k")).alias("k_val"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')      AS k_str,
           json_extract_string(props, '$.a.b')    AS missing
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path access: present path as string, nested missing path →
    NULL (AQL missing-field semantics)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.a.b").alias("missing"),
    )


@query(
    "q_fn_decimal",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS sum_price_cents,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(28,6))) * 1000000 AS BIGINT)
               AS sum_disc_micros,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_fn_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL (money-grade) aggregation: prices fixed to
    DECIMAL(18,2), the price×discount product widened to
    DECIMAL(28,6), summed with *no rounding at all* — unlike every
    float aggregate here, the answers are exact integers in scaled
    space, so the engines must agree digit-for-digit (§7.5.1 does not
    apply to decimals).  Decimal sums partial-aggregate exactly, so
    the plan is the usual two-phase HashAggregate.  The *output*
    surfaces the exact sums as scaled BIGINTs (cents / discount-micros)
    rather than raw decimals: DECIMAL output columns are a
    driver-canonicalizer divergence class (object-dtype Decimal vs
    float renderings — tests/test_contract.py forbids them), and the
    scaled-integer form is lossless for this corpus's magnitudes."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(9,4)")
    return li.groupBy("l_returnflag").agg(
        (F.sum(p) * 100).cast("bigint").alias("sum_price_cents"),
        (F.sum((p * d).cast("decimal(28,6)")) * 1000000)
        .cast("bigint")
        .alias("sum_disc_micros"),
        F.count("*").alias("n"),
    )


@query(
    "q_fn_bits",
    oracle="""
    SELECT event_type,
           CAST(sum(bit_count(CAST(user_id AS BIGINT))) AS BIGINT)
               AS total_popcount,
           CAST(max((user_id << 3) | 5) AS BIGINT) AS max_shifted,
           CAST(min(xor(user_id, event_id) & 1023) AS BIGINT) AS min_xor_low
    FROM events GROUP BY event_type
    """,
)
def q_fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bit manipulation (popcount, shifts, AND/OR/XOR masks) —
    the id-packing / flag-field arithmetic layer (feature hashing,
    bitmap membership) exercised end-to-end: popcount totals, a
    shift-or pack, and a masked XOR mix per event type.  Pure codegen
    expressions folded by one hash-aggregate."""
    ev = load_table(spark, sf_dir, "events")
    uid, eid = F.col("user_id"), F.col("event_id")
    return ev.groupBy("event_type").agg(
        F.sum(F.bit_count(uid)).alias("total_popcount"),
        F.max(F.shiftleft(uid, 3).bitwiseOR(F.lit(5))).alias("max_shifted"),
        F.min(uid.bitwiseXOR(eid).bitwiseAND(F.lit(1023))).alias(
            "min_xor_low"
        ),
    )


@query(
    "q_fn_regex",
    oracle="""
    SELECT lang,
           coalesce(nullif(regexp_extract(text, '(table|query|scan)', 1), ''),
                    '<none>') AS first_kw,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(len(regexp_extract_all(text, '\\b[aeiou][a-z]*'))) AS BIGINT)
               AS vowel_tokens,
           CAST(sum(length(text)
                    - length(regexp_replace(text, '[aeiou]', '', 'g')))
               AS BIGINT) AS vowel_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function surface: ``regexp_extract`` (first capture),
    ``regexp_extract_all`` (match count), and a count-by-deletion
    ``regexp_replace`` — all JVM-side codegen, no UDF.

    Cross-engine notes: no-match extract is '' in Spark and NULL-ish
    in DuckDB — both normalized via nullif/coalesce to '<none>'; the
    global replace needs the 'g' flag in DuckDB but is Spark's
    default.  Pure map-side expressions + one small hash aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    vowel_toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\b[aeiou][a-z]*"), 0))
    vowel_chars = F.length("text") - F.length(
        F.regexp_replace("text", "[aeiou]", "")
    )
    return (
        d.select(
            "lang",
            F.coalesce(
                F.nullif(F.regexp_extract("text", "(table|query|scan)", 1), F.lit("")),
                F.lit("<none>"),
            ).alias("first_kw"),
            vowel_toks.alias("vt"),
            vowel_chars.alias("vc"),
        )
        .groupBy("lang", "first_kw")
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.sum("vt").cast("bigint").alias("vowel_tokens"),
            F.sum("vc").cast("bigint").alias("vowel_chars"),
        )
        .orderBy("lang", "first_kw")
    )


@query(
    "q_fn_format",
    oracle="""
    SELECT p_partkey,
           printf('%s-%04d', p_brand, p_partkey) AS sku,
           lpad(p_type, 12, '.') AS padded,
           reverse(p_name) AS flipped,
           translate(p_name, 'aeiou', '#####') AS masked,
           repeat('*', CAST(p_size % 5 AS INTEGER)) AS stars
    FROM part
    ORDER BY p_partkey
    LIMIT 50
    """,
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting surface: printf-style interpolation, pad,
    reverse, translate, repeat — the report-rendering scalar family,
    all codegen'd JVM expressions.

    Parity notes: Spark ``format_string`` and DuckDB ``printf`` share
    the C format-spec dialect for %s/%0Nd; ``repeat`` needs an INT
    count in both engines (the modulo result is cast explicitly).
    """
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.format_string("%s-%04d", F.col("p_brand"), F.col("p_partkey")).alias(
                "sku"
            ),
            F.lpad("p_type", 12, ".").alias("padded"),
            F.reverse("p_name").alias("flipped"),
            F.translate("p_name", "aeiou", "#####").alias("masked"),
            F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        )
        .orderBy("p_partkey")
        .limit(50)
    )


@query(
    "q_fn_try",
    oracle="""
    SELECT event_type,
           CAST(count(CASE WHEN user_id % 3 = 0 THEN 1 END) AS BIGINT)
               AS div_nulls,
           round(sum(CASE WHEN user_id % 3 <> 0
                          THEN 100.0 / (user_id % 3) END), 4) AS div_total,
           CAST(count(TRY_CAST(event_type AS DOUBLE)) AS BIGINT)
               AS numeric_types,
           CAST(count(CASE WHEN length(props) > 12 THEN 1 END) AS BIGINT)
               AS long_props
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: ``try_divide`` (NULL on /0
    instead of an ANSI error) and ``try_cast`` (NULL on malformed
    input) — the fault-tolerant scalar family an always-on copy
    pipeline needs, since one poisoned row must not kill a batch.

    Spark evaluates try_* natively under ANSI mode; the oracle
    restates the NULL-on-error semantics with guards (DuckDB's ``/``
    raises on zero).  Counting nulls per type proves the error paths
    were actually exercised, not optimized away.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            (
                F.count("*") - F.count(F.try_divide(F.lit(100), F.col("user_id") % 3))
            )
            .cast("bigint")
            .alias("div_nulls"),
            F.round(
                F.sum(F.try_divide(F.lit(100), F.col("user_id") % 3)), 4
            ).alias("div_total"),
            F.count(F.col("event_type").try_cast("double"))
            .cast("bigint")
            .alias("numeric_types"),
            F.count(F.when(F.length("props") > 12, 1))
            .cast("bigint")
            .alias("long_props"),
        )
        .orderBy("event_type")
    )


@query(
    "q_fn_collate",
    oracle="""
    SELECT lower(p_type) AS type_ci,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT p_brand) AS BIGINT) AS brands
    FROM (SELECT CASE WHEN p_partkey % 2 = 0 THEN p_type
                      ELSE lower(p_type) END AS p_type,
                 p_brand
          FROM part)
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): mixed-case type
    labels grouped under ``UTF8_LCASE`` — equality, grouping, and
    DISTINCT all follow the collation, no manual lower() at use
    sites.

    The mixed-case input is synthesized deterministically (even keys
    keep upper, odd lower), the group key is re-lowered for output
    parity, and the oracle states the same semantics with explicit
    lower().  At scale collation-aware grouping hashes the collation
    key directly — same shuffle cost as a binary group.
    """
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("p_type"),
        "p_brand",
    )
    ci = F.collate(F.col("p_type"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("type_key"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("p_brand").cast("bigint").alias("brands"),
        )
        .select(
            F.lower(F.col("type_key").cast("string")).alias("type_ci"),
            "n",
            "brands",
        )
        .orderBy("type_ci")
    )


@query(
    "q_fn_interval",
    oracle="""
    SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS q,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN CAST(o_orderdate + INTERVAL 1 MONTH AS DATE)
                                = CAST(last_day(CAST(o_orderdate AS DATE)
                                       + INTERVAL 1 MONTH) AS DATE)
                           THEN 1 END) AS BIGINT) AS month_end_next,
           CAST(count(CASE WHEN CAST(o_orderdate AS DATE)
                                = last_day(CAST(o_orderdate AS DATE))
                           THEN 1 END) AS BIGINT) AS month_end_now
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic surface: quarter truncation,
    month addition with end-of-month clamping (`add_months`), and
    `last_day` — the clamp semantics both engines share (Jan 31 + 1
    month = Feb 28/29), pinned by counting rows that land on a month
    end before and after the shift.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias(
                "q"
            )
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count(
                F.when(
                    F.add_months(d, 1) == F.last_day(F.add_months(d, 1)), 1
                )
            )
            .cast("bigint")
            .alias("month_end_next"),
            F.count(F.when(d == F.last_day(d), 1)).cast("bigint").alias(
                "month_end_now"
            ),
        )
        .orderBy("q")
    )


@query(
    "q_page_offset",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey
    LIMIT 25 OFFSET 50
    """,
)
def q_page_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless pagination (LIMIT + OFFSET, Spark 4 `offset()`): page 3
    of the order book by exact price cents with orderkey tie-break —
    deterministic pagination needs a total order (§7.5), which the
    tie-break supplies.

    Scale note: OFFSET is inherently skip-scan (the engine still
    orders the prefix); for deep pages use keyset pagination (WHERE
    (price, key) < last-seen) — this query pins the shallow-page
    surface.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.round(F.col("o_totalprice") * 100).cast("bigint").desc(), "o_orderkey"
        )
        .offset(50)
        .limit(25)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
        )
    )


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
        SELECT event_type,
               'https://shop.example.com/' || event_type || '/item-'
                   || CAST(user_id AS VARCHAR) || '?id='
                   || CAST(event_id AS VARCHAR) || '&src=' || event_type
                   AS url
        FROM events
    ),
    parsed AS (
        SELECT event_type,
               regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
               CAST(regexp_extract(url, '[?&]id=([^&]*)', 1) AS BIGINT)
                   AS qid
        FROM u
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           min(path) AS first_path,
           CAST(min(qid) AS BIGINT) AS min_id,
           CAST(max(qid) AS BIGINT) AS max_id
    FROM parsed
    GROUP BY event_type
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: synthesize a deterministic URL per event,
    split it into host / path / query-parameter with Spark's native
    ``parse_url`` (java.net.URI-backed, codegen'd), and aggregate the
    components.  The oracle re-parses the identical URLs with plain
    regular expressions, so the differential check proves parse_url's
    component semantics (host excludes the scheme, path excludes the
    query, parameter extraction decodes by key) rather than assuming
    them.

    Columnar expression work only — the parse never leaves the JVM and
    the single aggregation is the only shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://shop.example.com/"),
        F.col("event_type"),
        F.lit("/item-"),
        F.col("user_id").cast("string"),
        F.lit("?id="),
        F.col("event_id").cast("string"),
        F.lit("&src="),
        F.col("event_type"),
    )
    parsed = ev.withColumn("url", url).select(
        "event_type",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY', 'id')").cast("bigint").alias("qid"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("host").alias("n_hosts"),
        F.min("path").alias("first_path"),
        F.min("qid").alias("min_id"),
        F.max("qid").alias("max_id"),
    )


@query(
    "q_fn_timezone",
    oracle="""
    WITH loc AS (
        SELECT event_type,
               CAST(ts AS DATE) AS utc_d,
               extract(minute FROM ts) AS utc_min,
               timezone('America/New_York', timezone('UTC', ts)) AS ny,
               timezone('Asia/Kathmandu',  timezone('UTC', ts)) AS ktm
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN CAST(ny AS DATE) < utc_d THEN 1 ELSE 0 END)
                AS BIGINT) AS ny_prev_day,
           CAST(sum(CASE WHEN CAST(ktm AS DATE) > utc_d THEN 1 ELSE 0 END)
                AS BIGINT) AS ktm_next_day,
           CAST(count(DISTINCT extract(hour FROM ktm)) AS BIGINT)
               AS ktm_hours,
           CAST(sum(CASE WHEN extract(minute FROM ktm)
                              = (utc_min + 45) % 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS ktm_m45,
           strftime(min(ny), '%Y-%m-%d %H:%M:%S') AS first_ny
    FROM loc
    GROUP BY event_type
    """,
)
def q_fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion surface: every event's UTC instant rendered
    as New York (UTC-5 in the data's January span) and Kathmandu
    (UTC+5:45 — a half-hour-family zone, so minute arithmetic is
    exercised, not just hour offsets) wall time via
    ``from_utc_timestamp``; the oracle uses DuckDB's ICU
    ``timezone(tz, TIMESTAMPTZ)`` on the same instants.  Checked
    facts: how many events fall on the *previous* civil day in NY and
    the *next* civil day in Kathmandu, that Kathmandu's +45-minute
    component shifts every event's minute field by exactly 45 (mod
    60), distinct local hours touched, and the earliest NY wall time
    rendered as a string (strings, not TIMESTAMP, in the output — the
    cross-engine compare is type-strict).  DST transitions are outside
    the data's span; tests/test_round2_ops.py covers a March 2024
    spring-forward instant against the IANA rule.

    Pure per-row expression work (ICU lookup is a codegen'd intrinsic,
    no shuffle) followed by one hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    loc = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("utc_d"),
        F.minute("ts").alias("utc_min"),
        F.from_utc_timestamp("ts", "America/New_York").alias("ny"),
        F.from_utc_timestamp("ts", "Asia/Kathmandu").alias("ktm"),
    )
    return loc.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("ny").cast("date") < F.col("utc_d")).cast("bigint")
        ).alias("ny_prev_day"),
        F.sum(
            (F.col("ktm").cast("date") > F.col("utc_d")).cast("bigint")
        ).alias("ktm_next_day"),
        F.countDistinct(F.hour("ktm")).alias("ktm_hours"),
        F.sum(
            (
                F.minute("ktm") == (F.col("utc_min") + F.lit(45)) % 60
            ).cast("bigint")
        ).alias("ktm_m45"),
        F.date_format(F.min("ny"), "yyyy-MM-dd HH:mm:ss").alias("first_ny"),
    )


@query(
    "q_fn_hash",
    oracle="""
    WITH h AS (
        SELECT event_type,
               md5(props)                       AS m,
               sha256(props)                    AS s,
               ('0x' || substr(md5(props), 1, 15))::BIGINT AS mnum
        FROM events
    )
    SELECT event_type,
           CAST(count(DISTINCT m) AS BIGINT) AS n_md5,
           CAST(count(DISTINCT s) AS BIGINT) AS n_sha,
           min(m) AS min_md5,
           min(s) AS min_sha,
           CAST(sum(mnum % 1000) AS BIGINT) AS mod_sum
    FROM h
    GROUP BY event_type
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash surface parity: md5 and sha256 digests of the
    raw ``props`` payload must be byte-identical hex across engines —
    the foundation every deterministic sampler, splitter, and
    fingerprint in this repo stands on (q_sample_hash, q_split_kfold,
    q_dedup_* all derive keys this way).  Checked as distinct-digest
    counts (collision audit: both digests must agree on cardinality),
    lexicographic minima of the hex strings, and an integer reduction
    of the first 60 md5 bits (``conv(hex,16,10)`` ↔ DuckDB
    ``('0x'||…)::BIGINT`` — the md5-to-integer bridge documented in
    SURVEY §7.5).

    Per-row digest work stays inside codegen (commons-codec intrinsics
    on the JVM side); one hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.md5("props").alias("m"),
        F.sha2("props", 256).alias("s"),
        F.conv(F.substring(F.md5("props"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("mnum"),
    )
    return h.groupBy("event_type").agg(
        F.countDistinct("m").alias("n_md5"),
        F.countDistinct("s").alias("n_sha"),
        F.min("m").alias("min_md5"),
        F.min("s").alias("min_sha"),
        F.sum(F.col("mnum") % 1000).alias("mod_sum"),
    )


@query(
    "q_fn_null",
    oracle="""
    WITH x AS (
        SELECT c_mktsegment,
               -- manufacture NULLs deterministically: every 7th key
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE c_acctbal END AS bal,
               CASE WHEN c_custkey % 11 = 0 THEN NULL
                    ELSE c_nationkey END AS nk
        FROM customer
    )
    SELECT coalesce(CAST(nk % 5 AS VARCHAR), '<none>') AS nk_mod,
           CAST(count(*) AS BIGINT)        AS n_rows,
           CAST(count(bal) AS BIGINT)      AS n_bal,
           CAST(count(*) - count(bal) AS BIGINT) AS n_null_bal,
           CAST(sum(CAST(round(coalesce(bal, 0.0) * 100) AS BIGINT))
                AS BIGINT)                 AS cents_coalesced,
           CAST(sum(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
           CAST(sum(CASE WHEN ifnull(bal, -1.0) < 0 AND bal IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ifnull_hit
    FROM x
    GROUP BY 1
    """,
)
def q_fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface: COALESCE / NULLIF / IFNULL, the
    ``count(*) − count(col)`` null-count idiom, and — the part engines
    actually disagree on in the wild — grouping BY a nullable key:
    both Spark and DuckDB place all NULL keys in ONE group (SQL
    standard "grouping treats NULLs as equal", unlike equi-join
    equality), surfaced here as an explicit ``'<none>'`` bucket.
    NULLs are manufactured deterministically (every 7th / 11th key)
    so the check is reproducible; sums go through exact coalesced
    cents.

    Pure expression work + one hash aggregate; NULL branches are
    codegen'd conditionals, no UDF.
    """
    c = load_table(spark, sf_dir, "customer")
    x = c.select(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    return x.groupBy(
        F.coalesce((F.col("nk") % 5).cast("string"), F.lit("<none>")).alias(
            "nk_mod"
        )
    ).agg(
        F.count("*").alias("n_rows"),
        F.count("bal").alias("n_bal"),
        (F.count("*") - F.count("bal")).alias("n_null_bal"),
        F.sum(
            F.round(F.coalesce(F.col("bal"), F.lit(0.0)) * 100).cast("bigint")
        ).alias("cents_coalesced"),
        F.sum(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
            .isNull()
            .cast("bigint")
        ).alias("n_building"),
        F.sum(
            (
                (F.ifnull(F.col("bal"), F.lit(-1.0)) < 0)
                & F.col("bal").isNull()
            ).cast("bigint")
        ).alias("n_ifnull_hit"),
    )


@query(
    "q_fn_round",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag, cents,
               cents // 10 AS q, cents % 10 AS r
        FROM c
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(((cents + 5) // 10) * 10) AS BIGINT)
               AS sum_half_up_cents,
           CAST(sum((q + CASE WHEN r > 5 THEN 1
                              WHEN r = 5 THEN q % 2
                              ELSE 0 END) * 10) AS BIGINT)
               AS sum_half_even_cents,
           CAST(sum(((cents + 99) // 100) * 100) AS BIGINT)
               AS sum_ceil_cents,
           CAST(sum((cents // 100) * 100) AS BIGINT) AS sum_floor_cents,
           CAST(sum(CASE WHEN r = 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_half_cases,
           CAST(sum(CASE WHEN r = 5 AND q % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mode_diff
    FROM m
    GROUP BY l_returnflag
    """,
)
def q_fn_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode surface: HALF_UP (`round`), HALF_EVEN (`bround`),
    `ceil`, `floor` over exact DECIMAL prices, aggregated back to
    integer cents per return flag — the parity trap every cross-engine
    migration hits (engines disagree on what .x5 rounds to).

    The Spark side exercises the real builtins on DECIMAL (where both
    rounding modes are exact); the oracle re-derives each mode with
    pure integer arithmetic on cents, so a builtin whose mode drifted
    from its documentation would hash-mismatch.  ``n_mode_diff``
    (= half-cases sitting on an even dime) counts exactly the rows
    where HALF_UP and HALF_EVEN disagree.  Zero floats, zero shuffles
    beyond the final 3-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    ).withColumn(
        # exact dollars at scale 2: cents / 100 in DECIMAL space
        "dec",
        F.expr("CAST(cents AS DECIMAL(18,2)) / 100"),
    )
    return c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("CAST(sum(CAST(round(dec, 1) * 100 AS BIGINT)) AS BIGINT)")
        .alias("sum_half_up_cents"),
        F.expr("CAST(sum(CAST(bround(dec, 1) * 100 AS BIGINT)) AS BIGINT)")
        .alias("sum_half_even_cents"),
        F.expr("CAST(sum(CAST(ceil(dec) AS BIGINT) * 100) AS BIGINT)")
        .alias("sum_ceil_cents"),
        F.expr("CAST(sum(CAST(floor(dec) AS BIGINT) * 100) AS BIGINT)")
        .alias("sum_floor_cents"),
        F.expr("CAST(sum(CASE WHEN cents % 10 = 5 THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_half_cases"),
        F.expr(
            "CAST(sum(CASE WHEN round(dec, 1) != bround(dec, 1)"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_mode_diff"),
    )


@query(
    "q_fn_encode",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN from_base64(to_base64(p_name::BLOB))::VARCHAR
                              = p_name THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b64_roundtrip,
           CAST(sum(len(to_base64(p_name::BLOB))) AS BIGINT) AS b64_len,
           CAST(sum(CASE WHEN to_base64(p_name::BLOB) LIKE '%='
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_padded,
           CAST(sum(len(hex(p_name::BLOB))) AS BIGINT) AS hex_len,
           CAST(sum(CASE WHEN unhex(hex(p_name::BLOB))::VARCHAR = p_name
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hex_roundtrip,
           CAST(sum(ascii(p_name)) AS BIGINT) AS ascii_sum
    FROM part
    GROUP BY p_brand
    """,
)
def q_fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-encoding scalar surface: base64 / hex encode-decode
    round-trips plus `ascii`, audited in aggregate per brand — the
    codec layer every opaque-payload (multimodal bytes, checkpoint
    blob) path relies on.  Both engines must produce the identical
    RFC 4648 base64 (padding included) and upper/lower-consistent hex
    for the hashes to match; the counts prove every row round-trips
    losslessly.  All-integer output; single hash aggregate."""
    part = load_table(spark, sf_dir, "part")
    b = part.select(
        "p_brand",
        F.col("p_name").alias("nm"),
        F.expr("base64(CAST(p_name AS BINARY))").alias("b64"),
        F.expr("hex(p_name)").alias("hx"),
    )
    return b.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.expr("CAST(unbase64(b64) AS STRING)") == F.col("nm"), 1
            ).otherwise(0)
        ).alias("n_b64_roundtrip"),
        F.sum(F.length("b64")).alias("b64_len"),
        F.sum(F.when(F.col("b64").like("%="), 1).otherwise(0)).alias(
            "n_padded"
        ),
        F.sum(F.length("hx")).alias("hex_len"),
        F.sum(
            F.when(
                F.expr("CAST(unhex(hx) AS STRING)") == F.col("nm"), 1
            ).otherwise(0)
        ).alias("n_hex_roundtrip"),
        F.sum(F.ascii("nm")).alias("ascii_sum"),
    )


@query(
    "q_fn_generator",
    oracle="""
    WITH spine AS (
        SELECT r.r_name,
               unnest(generate_series(DATE '2024-01-01', DATE '2024-12-30',
                                      INTERVAL 7 DAY)) AS wk_start
        FROM region r
    ),
    g AS (
        SELECT r_name, CAST(wk_start AS DATE) AS d,
               row_number() OVER (PARTITION BY r_name
                                  ORDER BY wk_start) - 1 AS pos
        FROM spine
    )
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_weeks,
           CAST(min(d) AS VARCHAR) AS first_wk,
           CAST(max(d) AS VARCHAR) AS last_wk,
           CAST(sum((date_diff('day', DATE '1970-01-01', d) + 4) % 7)
                AS BIGINT) AS dow_checksum,
           CAST(sum(pos * date_diff('day', DATE '1970-01-01', d))
                AS BIGINT) AS pos_checksum
    FROM g
    GROUP BY r_name
    """,
)
def q_fn_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generator surface: per dimension row, generate a weekly date
    spine for 2024 with ordinal positions (`sequence` + `posexplode` —
    the lateral table-function pattern behind gap-filling and calendar
    densification), then audit it with exact integer checksums.
    Day-of-week comes from epoch-day arithmetic ((days+4) mod 7), NOT
    the engines' dayofweek builtins, whose numbering conventions
    disagree.  DATE outputs cast to VARCHAR (canonicalizer hazard)."""
    region = load_table(spark, sf_dir, "region")
    g = region.select(
        "r_name",
        F.posexplode(
            F.expr(
                "sequence(DATE'2024-01-01', DATE'2024-12-30',"
                " interval 7 days)"
            )
        ).alias("pos", "d"),
    )
    ed = F.datediff("d", F.lit("1970-01-01").cast("date"))
    return g.groupBy("r_name").agg(
        F.count("*").alias("n_weeks"),
        F.min("d").cast("string").alias("first_wk"),
        F.max("d").cast("string").alias("last_wk"),
        F.sum((ed + 4) % 7).alias("dow_checksum"),
        F.sum(F.col("pos") * ed).alias("pos_checksum"),
    )


@query(
    "q_fn_zipwith",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                              v -> CAST(round(v::DOUBLE * 1000000)
                                        AS BIGINT)) AS a
        FROM embeddings
    ),
    z AS (
        SELECT vec_id, a, list_reverse(a) AS b FROM q
    )
    SELECT vec_id,
           CAST(list_sum(list_transform(generate_series(1, len(a)),
                                        i -> a[i] + b[i])) AS BIGINT)
               AS zip_sum,
           CAST(list_max(list_transform(generate_series(1, len(a)),
                                        i -> abs(a[i] - b[i])))
                AS BIGINT) AS max_absdiff,
           CASE WHEN len(list_filter(a, x -> x > 500000)) > 0
                THEN 1 ELSE 0 END AS any_large,
           CASE WHEN len(list_filter(a, x -> abs(x) <= 1000000))
                     = len(a)
                THEN 1 ELSE 0 END AS all_bounded
    FROM z
    """,
)
def q_fn_zipwith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary higher-order array surface: ``zip_with`` over a vector
    and its reverse (element-wise sum checksum, max |difference|) plus
    the ``exists`` / ``forall`` quantifiers — the lambda-algebra
    complement to q_fn_array's unary transform/filter/aggregate.

    Elements are 1e-6-quantized BIGINTs first, so every lambda output
    is exact; DuckDB lacks zip_with, so the oracle re-expresses the
    zip as an index-generator transform (`a[i] op b[i]`) — same
    values, different surface, which is exactly what the parity check
    is for.  Map-only, zero shuffle; all lambdas run inside codegen.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " v -> cast(round(cast(v as double) * 1000000) as bigint))"
        ).alias("a"),
    ).withColumn("b", F.reverse(F.col("a")))
    return q.select(
        "vec_id",
        F.expr(
            "aggregate(zip_with(a, b, (x, y) -> x + y),"
            " cast(0 as bigint), (acc, v) -> acc + v)"
        ).alias("zip_sum"),
        F.expr(
            "array_max(zip_with(a, b, (x, y) -> abs(x - y)))"
        ).alias("max_absdiff"),
        F.when(F.expr("exists(a, x -> x > 500000)"), 1)
        .otherwise(0)
        .alias("any_large"),
        F.when(F.expr("forall(a, x -> abs(x) <= 1000000)"), 1)
        .otherwise(0)
        .alias("all_bounded"),
    )


@query(
    "q_fn_mask",
    oracle="""
    WITH m AS (
        SELECT regexp_replace(
                   regexp_replace(
                       regexp_replace(c_name, '[A-Z]', 'X', 'g'),
                       '[a-z]', 'x', 'g'),
                   '[0-9]', 'n', 'g') AS masked
        FROM customer
    )
    SELECT masked AS mask_pattern,
           CAST(count(*) AS BIGINT) AS n
    FROM m
    GROUP BY masked
    """,
)
def q_fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking surface: Spark 4's built-in ``mask()`` redacts
    upper/lower/digit classes to X/x/n; grouping customers by their
    mask *pattern* is the governance profiling step — it reveals name
    formats (and format outliers) while provably never materializing
    a clear-text value in the output.

    DuckDB has no mask(), so the oracle reconstructs the identical
    class mapping with three anchored regexp_replace passes — a hash
    match certifies Spark's builtin against the spec, which is the
    point of the parity check.  Map-side expression + one hash agg.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(F.expr("mask(c_name)").alias("mask_pattern"))
        .groupBy("mask_pattern")
        .agg(F.count("*").alias("n"))
    )


def _luhn_terms(expr: str, intdiv: str) -> str:
    """Sum of Luhn digit terms for a 10-digit number: doubling every
    second digit from the right, folding >9 via −9.  Generated
    identically for Spark (`div`) and DuckDB (`//`)."""
    terms = []
    for k in range(10):
        d = f"(({expr}) {intdiv} {10 ** k}) % 10"
        if k % 2 == 1:
            terms.append(
                f"(CASE WHEN 2 * ({d}) > 9 THEN 2 * ({d}) - 9"
                f" ELSE 2 * ({d}) END)"
            )
        else:
            terms.append(f"({d})")
    return " + ".join(terms)


@query(
    "q_fn_luhn",
    oracle=f"""
    WITH p AS (
        SELECT 1000000000 + (user_id * 7919) % 8999999999 AS pan
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    l AS (
        SELECT pan, ({_luhn_terms('pan', '//')}) % 10 AS luhn_mod
        FROM p
    )
    SELECT CAST(luhn_mod AS BIGINT) AS luhn_mod,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN luhn_mod = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_valid
    FROM l
    GROUP BY 1
    """,
)
def q_fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation — the digit-wise mod-10 algorithm
    behind card/IMEI/member-number cleaning — run over synthetic
    10-digit account numbers derived from user ids, histogrammed by
    checksum residue (residue 0 = "valid").

    The doubling-fold is unrolled into ten pure integer digit terms,
    generated from ONE Python template for both engines (only the
    integer-division token differs), so the validation is exact and
    the oracle can't drift from the implementation.  Map-side
    expression + one 10-row aggregate — validation at scan speed, the
    way ingest-time data contracts actually run it.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.select("user_id").distinct().select(
        F.expr("1000000000 + (user_id * 7919) % 8999999999").alias("pan")
    )
    l = p.select(
        F.expr(f"({_luhn_terms('pan', 'div')}) % 10").alias("luhn_mod")
    )
    return l.groupBy(F.col("luhn_mod").cast("long").alias("luhn_mod")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("luhn_mod") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
    )


@query(
    "q_fn_snowflake",
    oracle="""
    WITH ids AS (
        SELECT (epoch_us(ts) // 1000) * 4194304
               + (user_id % 32) * 4096
               + (event_id % 4096) AS sfid,
               epoch_us(ts) // 1000 AS ms, user_id, event_id
        FROM events
    ),
    d AS (
        SELECT sfid,
               sfid >> 22 AS ms_back,
               (sfid >> 12) & 31 AS worker_back,
               sfid & 4095 AS seq_back,
               ms, user_id % 32 AS worker, event_id % 4096 AS seq
        FROM ids
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN ms_back = ms AND worker_back = worker
                         AND seq_back = seq THEN 1 ELSE 0 END) AS BIGINT)
               AS n_roundtrip_ok,
           CAST(count(DISTINCT sfid) AS BIGINT) AS n_distinct_ids,
           CAST(min(sfid) AS BIGINT) AS min_id,
           CAST(max(sfid) AS BIGINT) AS max_id,
           CAST(max(sfid) >> 22 AS BIGINT) AS max_ms
    FROM d
    """,
)
def q_fn_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-style ID algebra: 64-bit ids composed as
    (ms << 22) | (worker << 12) | seq from each event's millisecond,
    user-derived worker, and sequence — then decomposed back with
    shifts/masks and audited for lossless round trip, uniqueness, and
    k-sortability (max id's embedded timestamp) — the bit surgery
    every distributed-ID scheme (Snowflake, ULID, KSUID) depends on.

    Pure integer bit arithmetic, identical in both engines (the
    compose side uses ×4194304/×4096 so DuckDB needs no shift-left
    operator precedence care).  Map-side expressions + one scalar
    audit row.
    """
    ev = load_table(spark, sf_dir, "events")
    ids = ev.select(
        (
            F.expr("(unix_micros(ts) div 1000) * 4194304")
            + (F.col("user_id") % 32) * 4096
            + (F.col("event_id") % 4096)
        ).alias("sfid"),
        F.expr("unix_micros(ts) div 1000").alias("ms"),
        (F.col("user_id") % 32).alias("worker"),
        (F.col("event_id") % 4096).alias("seq"),
    )
    d = ids.select(
        "sfid",
        F.expr("sfid >> 22").alias("ms_back"),
        F.expr("(sfid >> 12) & 31").alias("worker_back"),
        F.expr("sfid & 4095").alias("seq_back"),
        "ms",
        "worker",
        "seq",
    )
    ok = F.when(
        (F.col("ms_back") == F.col("ms"))
        & (F.col("worker_back") == F.col("worker"))
        & (F.col("seq_back") == F.col("seq")),
        1,
    ).otherwise(0)
    return d.agg(
        F.count("*").alias("n"),
        F.sum(ok).cast("long").alias("n_roundtrip_ok"),
        F.countDistinct("sfid").cast("long").alias("n_distinct_ids"),
        F.min("sfid").cast("long").alias("min_id"),
        F.max("sfid").cast("long").alias("max_id"),
        F.expr("max(sfid) >> 22").cast("long").alias("max_ms"),
    )


@query(
    "q_fn_haversine",
    oracle="""
    WITH nloc AS (
        SELECT n_nationkey,
               CAST((('0x' || substr(md5(n_name), 1, 15))::BIGINT % 120)
                    - 60 AS DOUBLE) + 0.5 AS nlat,
               CAST((('0x' || substr(md5(n_name || '#lon'), 1, 15))::BIGINT
                     % 360) - 180 AS DOUBLE) + 0.5 AS nlon
        FROM nation
    ),
    cloc AS (
        SELECT c_custkey, c_nationkey,
               CAST((('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
                     ::BIGINT % 2000) AS DOUBLE) / 100 - 10 AS dlat,
               CAST((('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#lon'),
                                     1, 15))::BIGINT % 2000) AS DOUBLE) / 100
                   - 10 AS dlon
        FROM customer
    ),
    d AS (
        SELECT c.c_custkey, n.n_nationkey,
               2 * 6371.0 * asin(sqrt(
                   sin(radians((n.nlat + c.dlat - n.nlat) / 2))
                   * sin(radians((n.nlat + c.dlat - n.nlat) / 2))
                   + cos(radians(n.nlat)) * cos(radians(n.nlat + c.dlat))
                   * sin(radians(c.dlon / 2)) * sin(radians(c.dlon / 2))
               )) AS km
        FROM cloc c
        JOIN nloc n ON c.c_nationkey = n.n_nationkey
    )
    SELECT c_custkey, CAST(n_nationkey AS BIGINT) AS n_nationkey,
           round(km, 4) AS km
    FROM d
    ORDER BY km DESC, c_custkey
    LIMIT 10
    """,
)
def q_fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance surface: each customer gets a
    deterministic md5-synthesized offset from its nation's synthesized
    centroid, and the query returns the 10 farthest customers from
    their home centroid — the geodesic scalar stack (radians / sin /
    cos / asin / sqrt) exercised end-to-end on both engines.

    Numerics note: libm trig is within-1-ulp on both sides and every
    input double is identical (exact integer hashes scaled by exact
    powers of 2·5), so the round-4 km values agree; ordering ties are
    broken by c_custkey.  Pure per-row expressions + one broadcast
    join + TakeOrdered — nothing here shuffles more than the top-10."""
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        (
            (F.expr("cast(conv(substr(md5(cast(n_name as binary)),1,15),16,10) as bigint)") % 120 - 60).cast("double") + 0.5
        ).alias("nlat"),
        (
            (F.expr("cast(conv(substr(md5(cast(concat(n_name, '#lon') as binary)),1,15),16,10) as bigint)") % 360 - 180).cast("double") + 0.5
        ).alias("nlon"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (
            (F.expr("cast(conv(substr(md5(cast(cast(c_custkey as string) as binary)),1,15),16,10) as bigint)") % 2000).cast("double") / 100 - 10
        ).alias("dlat"),
        (
            (F.expr("cast(conv(substr(md5(cast(concat(cast(c_custkey as string), '#lon') as binary)),1,15),16,10) as bigint)") % 2000).cast("double") / 100 - 10
        ).alias("dlon"),
    )
    j = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    )
    dphi_half = F.radians((F.col("nlat") + F.col("dlat") - F.col("nlat")) / 2)
    km = (
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.sin(dphi_half) * F.sin(dphi_half)
                + F.cos(F.radians(F.col("nlat")))
                * F.cos(F.radians(F.col("nlat") + F.col("dlat")))
                * F.sin(F.radians(F.col("dlon") / 2))
                * F.sin(F.radians(F.col("dlon") / 2))
            )
        )
    )
    return (
        j.select(
            "c_custkey",
            F.col("n_nationkey").cast("long").alias("n_nationkey"),
            km.alias("km"),
        )
        .orderBy(F.col("km").desc(), "c_custkey")
        .limit(10)
        .select("c_custkey", "n_nationkey", F.round("km", 4).alias("km"))
    )

"""§2.8 Scalar function families.

One graded query per family, each exercising several built-ins
(SURVEY.md §2.8) — all JVM-side expressions inside whole-stage
codegen; no Python UDFs anywhere in this module.

Cross-engine parity notes baked into the queries:
  * dayofweek: Spark 1=Sunday..7 vs DuckDB 0=Sunday..6 → emit
    Spark's value minus 1.
  * ceil/floor: Spark returns LONG, DuckDB DOUBLE → cast in SQL.
  * transcendentals (exp/ln/sin) differ in final ulps between libm
    and the JVM → ROUND(6).
  * width_bucket is absent in DuckDB 1.0 → emulated identically on
    both sides with floor arithmetic.
  * array lambdas run on float32 input → cast elementwise to DOUBLE
    first so both engines do the same double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..io import load_table
from ..registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           CONCAT_WS('|', LOWER(c_name), UPPER(c_mktsegment))        AS tagged,
           TRIM(SUBSTRING(c_name, 9, 10))                            AS key_digits,
           LPAD(CAST(c_custkey AS VARCHAR), 12, '0')                 AS padded_key,
           SPLIT_PART(c_name, '#', 2)                                AS name_suffix,
           REGEXP_EXTRACT(c_name, '([0-9]+)$', 1)                    AS trailing_digits,
           REGEXP_REPLACE(c_name, '0+', '0', 'g')                    AS squeezed,
           LEVENSHTEIN(c_mktsegment, 'BUILDING')                     AS seg_dist,
           LENGTH(c_name)                                            AS name_len,
           STARTS_WITH(c_name, 'Customer#0000000')                   AS has_prefix,
           CONTAINS(c_mktsegment, 'MACH')                            AS is_machinery
    FROM customer WHERE c_custkey <= 200
    """,
)
def fn_string(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.concat_ws("|", F.lower("c_name"), F.upper("c_mktsegment")).alias("tagged"),
        F.trim(F.substring("c_name", 9, 10)).alias("key_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.element_at(F.split("c_name", "#"), 2).alias("name_suffix"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("trailing_digits"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_dist"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").startswith("Customer#0000000").alias("has_prefix"),
        F.col("c_mktsegment").contains("MACH").alias("is_machinery"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)  AS order_month,
           YEAR(o_orderdate)                                    AS order_year,
           MONTH(o_orderdate)                                   AS order_mon,
           DAYOFWEEK(o_orderdate)                               AS dow_sun0,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)         AS plus_3_months,
           CAST(EPOCH(o_orderdate) AS BIGINT)                   AS epoch_sec,
           CAST(o_orderdate AS DATE)                            AS order_date,
           STRFTIME(o_orderdate, '%Y-%m-%d')                    AS date_str,
           o_orderdate + INTERVAL 36 HOUR                       AS plus_36h
    FROM orders WHERE o_orderkey <= 500
    """,
)
def fn_date(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.add_months("o_orderdate", 3).alias("plus_3_months"),
        # o_orderdate is TIMESTAMP_NTZ (parquet ms, no zone); route the
        # epoch extraction through a UTC timestamp cast.
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_sec"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        (F.col("o_orderdate") + F.expr("INTERVAL 36 HOURS")).alias("plus_36h"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                            AS price_r1,
           ABS(l_discount - 0.05)                               AS disc_dev,
           CAST(CEIL(l_extendedprice)  AS BIGINT)               AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT)               AS price_floor,
           ROUND(POW(l_quantity, 2), 6)                         AS qty_sq,
           ROUND(SQRT(l_extendedprice), 6)                      AS price_sqrt,
           ROUND(EXP(l_discount), 6)                            AS disc_exp,
           ROUND(LN(l_extendedprice), 6)                        AS price_ln,
           ROUND(LOG10(l_extendedprice), 6)                     AS price_log10,
           ROUND(SIN(l_tax), 6)                                 AS tax_sin,
           GREATEST(l_discount, l_tax)                          AS max_rate,
           LEAST(l_discount, l_tax)                             AS min_rate,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7           AS key_pmod7,
           (CAST(SIGN(l_discount - 0.05) AS DOUBLE) + 0.0)      AS disc_sign,
           CAST(LEAST(GREATEST(FLOOR((l_quantity - 1) / 49.0 * 5), 0), 4) + 1 AS BIGINT)
                                                                AS qty_bucket
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def fn_math(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.pow(q, 2), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.sin("l_tax"), 6).alias("tax_sin"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_pmod7"),
        # + 0.0: Java signum(-0.0) is -0.0 while DuckDB sign() is 0 —
        # sign-of-zero guard (num.round_z rationale)
        (F.signum(F.col("l_discount") - 0.05) + F.lit(0.0)).alias("disc_sign"),
        # width_bucket(q, 1, 50, 5) emulated portably (absent in DuckDB 1.0)
        (F.least(F.greatest(F.floor((q - 1) / 49.0 * 5), F.lit(0)), F.lit(4)) + 1).alias(
            "qty_bucket"
        ),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           LEN(embedding)                                                    AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)                            AS first_dim,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding[1:8],
                 x -> CAST(x AS DOUBLE))), 6)                                AS head_sum,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)            AS sq_norm,
           ROUND(LIST_MAX(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6) AS max_dim,
           ROUND(LIST_MIN(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6) AS min_dim,
           LEN(LIST_FILTER(embedding, x -> x > 0))                           AS positive_dims,
           ROUND(LIST_SUM(LIST_TRANSFORM(
                 LIST_ZIP(embedding, LIST_REVERSE(embedding)),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6)      AS rev_dot
    FROM embeddings WHERE vec_id < 100
    """,
)
def fn_array(spark, sf_dir):
    """Array lambdas over the vector column — the similarity-search
    kernel expressed as built-ins (transform/filter/aggregate/
    zip_with), all codegen'd; no UDF."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb = F.col("embedding")
    dbl = F.transform(emb, lambda x: x.cast("double"))
    sum_d = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(dbl, 1), 6).alias("first_dim"),
        F.round(sum_d(F.slice(dbl, 1, 8)), 6).alias("head_sum"),
        F.round(sum_d(F.transform(dbl, lambda x: x * x)), 6).alias("sq_norm"),
        F.round(F.array_max(dbl), 6).alias("max_dim"),
        F.round(F.array_min(dbl), 6).alias("min_dim"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("positive_dims"),
        F.round(
            sum_d(F.zip_with(dbl, F.reverse(dbl), lambda a, b: a * b)), 6
        ).alias("rev_dot"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           ARRAY_TO_STRING(JSON_KEYS(props), ',')        AS prop_keys,
           CAST(JSON_EXTRACT(props, '$.k') AS INT)       AS k_value,
           CAST(JSON_EXTRACT(props, '$.k') AS INT) * 2   AS k_doubled,
           CAST(JSON_EXTRACT(props, '$.missing') AS INT) AS absent
    FROM events WHERE event_id < 300
    """,
)
def fn_map(spark, sf_dir):
    """Dynamic-qualifier CF access: JSON props parsed into MapType
    (the hbase-spark dynamic-column mapping), then map functions."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        (F.element_at(m, "k") * 2).alias("k_doubled"),
        F.element_at(m, "missing").alias("absent"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS INT)            AS k_path,
           JSON_EXTRACT_STRING(props, '$.k')                  AS k_str,
           TO_JSON(STRUCT_PACK(k := CAST(JSON_EXTRACT(props, '$.k') AS INT)))::VARCHAR
                                                              AS rebuilt,
           JSON_VALID(props)                                  AS is_valid
    FROM events WHERE event_id < 300
    """,
)
def fn_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.cast("int").alias("k_path"),
        k.alias("k_str"),
        F.to_json(F.struct(k.cast("int").alias("k"))).alias("rebuilt"),
        F.from_json("props", "map<string,int>").isNotNull().alias("is_valid"),
    )


@register(
    "fn_binary_hash",
    oracle="""
    SELECT doc_id,
           MD5(text)                                    AS text_md5,
           SHA256(text)                                 AS text_sha256,
           TO_BASE64(ENCODE(SUBSTRING(text, 1, 24)))    AS head_b64,
           HEX(ENCODE(SUBSTRING(text, 1, 8)))           AS head_hex,
           OCTET_LENGTH(ENCODE(text))                   AS n_bytes
    FROM documents WHERE doc_id < 200
    """,
)
def fn_binary_hash(spark, sf_dir):
    """Byte-oriented surface (HBase cells are byte[]): digests,
    base64/hex codecs, byte lengths — also the exact-dedup
    workhorse."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.base64(F.encode(F.substring("text", 1, 24), "utf-8")).alias("head_b64"),
        F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("head_hex"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


@register(
    "fn_hash_spark",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           TRUE AS xxh64_injective,
           TRUE AS murmur3_injective,
           TRUE AS crc32_injective
    FROM documents WHERE doc_id < 200
    """,
)
def fn_hash_spark(spark, sf_dir):
    """Hash kernels: portable digests (md5 / sha256 — value-checked
    against the oracle) plus the Spark-native partitioner & MinHash
    primitives (xxhash64 / murmur3 / crc32), whose raw values have no
    cross-engine twin and are graded through injectivity booleans
    instead: distinct-hash-count == distinct-input-count over the
    sample (collision-free on 200 docs for 32-bit kernels too —
    deterministic, pinned by the oracle's literal TRUE)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    natives = d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.xxhash64("text").alias("xxh"),
        F.hash("text").alias("mur"),
        F.crc32(F.encode("text", "utf-8")).alias("crc"),
        "text",
    )
    stats = natives.agg(
        F.countDistinct("text").alias("n_text"),
        F.countDistinct("xxh").alias("n_xxh"),
        F.countDistinct("mur").alias("n_mur"),
        F.countDistinct("crc").alias("n_crc"),
    )
    return natives.crossJoin(F.broadcast(stats)).select(  # bcast: scalar
        "doc_id",
        "text_md5",
        "text_sha256",
        (F.col("n_xxh") == F.col("n_text")).alias("xxh64_injective"),
        (F.col("n_mur") == F.col("n_text")).alias("murmur3_injective"),
        (F.col("n_crc") == F.col("n_text")).alias("crc32_injective"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           TO_JSON(STRUCT_PACK(status := o_orderstatus,
                               total := ROUND(o_totalprice, 2)))::VARCHAR AS order_info,
           STRUCT_PACK(status := o_orderstatus, total := o_totalprice).total AS extracted_total,
           (STRUCT_PACK(a := o_orderstatus) = STRUCT_PACK(a := 'O')) AS is_open_struct
    FROM orders WHERE o_orderkey <= 300
    """,
)
def fn_struct(spark, sf_dir):
    """Struct create/access/compare — the typed column-family record
    (a CF's fixed qualifiers as one nested column). The struct value
    itself crosses the comparison as JSON text: engines render
    nested rows differently (tuple vs map) even when equal."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    info = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("total")
    )
    info_r = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("total"),
    )
    return o.select(
        "o_orderkey",
        F.to_json(info_r).alias("order_info"),
        info.getField("total").alias("extracted_total"),
        (
            F.struct(F.col("o_orderstatus").alias("a"))
            == F.struct(F.lit("O").alias("a"))
        ).alias("is_open_struct"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT e.event_id,
           e.event_id & 255                   AS low_byte,
           e.event_id | 4096                  AS with_flag,
           xor(e.event_id, 1365)              AS toggled,
           e.event_id << 2                    AS shifted_up,
           e.event_id >> 3                    AS shifted_down,
           ~e.event_id                        AS inverted,
           bit_count(e.event_id)              AS popcount
    FROM events e WHERE e.event_id < 500
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bit manipulation — HBase rowkeys/values are raw bytes, and
    bit-packing flags into key fragments is a standard rowkey-design
    trick; also the kernel under SimHash bands."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    k = F.col("event_id")
    return ev.select(
        "event_id",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("toggled"),
        F.shiftleft(k, 2).alias("shifted_up"),
        F.shiftright(k, 3).alias("shifted_down"),
        F.bitwise_not(k).alias("inverted"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "fn_explode_pos",
    oracle="""
    SELECT e.vec_id, r.i - 1 AS pos, ROUND(CAST(e.embedding[r.i] AS DOUBLE), 6) AS component
    FROM embeddings e, range(1, 9) r(i)
    WHERE e.vec_id < 20
    """,
)
def fn_explode_pos(spark, sf_dir):
    """posexplode — vector column to (position, component) rows, the
    row-form bridge between array and relational processing."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    head = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    return e.select("vec_id", F.posexplode(head).alias("pos", "comp")).select(
        "vec_id", "pos", F.round("comp", 6).alias("component")
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                                   AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')          AS status_or_open,
           CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT NULL
                THEN 'settled' ELSE 'pending' END                AS settled_flag,
           IF(o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%',
              'urgent', 'normal')                                AS urgency
    FROM orders WHERE o_orderkey <= 400
    """,
)
def fn_conditional(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.nvl2(
            F.nullif("o_orderstatus", F.lit("O")), F.lit("settled"), F.lit("pending")
        ).alias("settled_flag"),
        F.when(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"),
            "urgent",
        )
        .otherwise("normal")
        .alias("urgency"),
    )


@register(
    "fn_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           ROUND(l_quantity, 2) AS val
    FROM lineitem WHERE l_orderkey <= 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', ROUND(l_extendedprice, 2)
    FROM lineitem WHERE l_orderkey <= 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', ROUND(l_discount, 2)
    FROM lineitem WHERE l_orderkey <= 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', ROUND(l_tax, 2)
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def fn_unpivot(spark, sf_dir):
    """Wide→long reshape (melt): the inverse of agg_pivot, turning
    measure columns into (measure, val) rows — how a metrics table
    becomes a generic (key, metric, value) cell stream for HBase-style
    storage. Spark's native `unpivot` is a zero-shuffle map-side
    expand (each input row emits |measures| rows); the filter is
    pushed to the scan before the expand, so at 100 TB the 4x row
    amplification happens after pruning, never before."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "raw_val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("raw_val", 2).alias("val"),
    )


@register(
    "fn_content_uuid",
    oracle="""
    SELECT doc_id,
           substring(md5(lower(trim(text))), 1, 8) || '-' ||
           substring(md5(lower(trim(text))), 9, 4) || '-' ||
           substring(md5(lower(trim(text))), 13, 4) || '-' ||
           substring(md5(lower(trim(text))), 17, 4) || '-' ||
           substring(md5(lower(trim(text))), 21, 12) AS content_uuid
    FROM documents WHERE doc_id < 100
    """,
)
def fn_content_uuid(spark, sf_dir):
    """Deterministic content-derived IDs (UUIDv3-style formatting of
    the normalized-text md5): the stable document identity every
    multi-stage pipeline needs — re-ingesting the same content on any
    cluster, any engine, any day mints the SAME id, so downstream
    joins, dedup ledgers, and provenance records never fork. Contrast
    F.uuid()/monotonically_increasing_id(), which differ per run and
    per partitioning. Pure map-side string math; the md5 is the same
    engine-portable primitive as hashutil.h60."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    h = F.md5(F.lower(F.trim("text")))
    return d.select(
        "doc_id",
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        ).alias("content_uuid"),
    )


@register(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang,
           CAST(length(url) AS INT) AS url_len
    FROM urls
    """,
)
def fn_url(spark, sf_dir):
    """URL function family over a synthesized-but-deterministic URL
    column (the fixtures carry no native URL; source/lang/doc_id
    compose one, so the parse targets are known exactly). Spark side
    uses the native parse_url expression (PROTOCOL/HOST/PATH and the
    per-key QUERY form); the oracle restates the same extraction as
    anchored regexes — DuckDB 1.0 has no parse_url. All JVM-side
    whole-stage codegen; the canonical use is crawl-corpus URL
    normalization feeding dedup_url-style keys at 100 TB, a pure
    map expression at scan speed."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.length("url").cast("int").alias("url_len"),
    )


@register(
    "fn_business_days",
    oracle="""
    WITH base AS (
      SELECT o.o_orderpriority,
             CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d1,
             CAST(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d2
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    bd AS (
      SELECT o_orderpriority,
             ((d2 - d1) // 7) * 5
             + CASE WHEN (d2 - d1) % 7 = 0 THEN 0
                    ELSE list_sum(list_transform(range(0, (d2 - d1) % 7),
                      t -> CASE WHEN (d1 + 4 + t) % 7 IN (0, 6)
                           THEN 0 ELSE 1 END)) END AS busdays
      FROM base
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(busdays) AS BIGINT) AS total_busdays,
           CAST(MAX(busdays) AS BIGINT) AS max_busdays,
           CAST(SUM(busdays) * 1000000 // COUNT(*) AS BIGINT)
             AS avg_busdays_micro
    FROM bd GROUP BY o_orderpriority
    """,
)
def fn_business_days(spark, sf_dir):
    """Business-day interval arithmetic — the SLA math every
    fulfilment/ops dashboard needs and no engine ships natively:
    weekdays in [order, ship) per line, computed WITHOUT any
    calendar UDF or per-day explode. The kernel is pure integer:
    epoch-day numbers (engine-portable — both engines count days
    from 1970-01-01, a Thursday, so dow = (days + 4) mod 7 with
    0 = Sunday needs no engine DOW function and no locale), full
    weeks contribute 5 each, and the <=6-day remainder is summed by
    a bounded array fold over the starting weekday. Dates are the
    only input, integers the only arithmetic — regen-proof.

    Scale shape: the orders side joins broadcast-or-shuffle on the
    key Catalyst picks (both sides pruned to two columns); the
    busday kernel is per-row JVM expression work inside whole-stage
    codegen (the sequence fold is <=7 elements, constant), then one
    map-side-combining hash agg to 5 priority rows. The micro-avg
    is an exact integer ratio."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    d1 = F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).cast("long")
    d2 = F.datediff("l_shipdate", F.lit("1970-01-01").cast("date")).cast("long")
    base = j.select("o_orderpriority", d1.alias("d1"), d2.alias("d2"))
    bd = base.select(
        "o_orderpriority",
        (
            F.expr("((d2 - d1) div 7) * 5")
            + F.expr(
                "CASE WHEN (d2 - d1) % 7 = 0 THEN 0 ELSE"
                " aggregate(sequence(0, cast((d2 - d1) % 7 AS int) - 1),"
                " 0L, (acc, t) -> acc + (CASE WHEN (d1 + 4 + t) % 7 IN (0, 6)"
                " THEN 0 ELSE 1 END)) END"
            )
        ).alias("busdays"),
    )
    return bd.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("busdays").cast("bigint").alias("total_busdays"),
        F.max("busdays").cast("bigint").alias("max_busdays"),
        F.expr("sum(busdays) * 1000000 div count(*)")
        .cast("bigint")
        .alias("avg_busdays_micro"),
    )


def _quadkey_sql(x: str, y: str, levels: int = 8) -> str:
    """Bing-tile quadkey digits from integer tile coords — portable
    SQL shared verbatim by both engines (div/% on BIGINTs only):
    digit i (MSB first) = 2*bit_i(y) + bit_i(x)."""
    parts = []
    for i in range(levels):
        p = 1 << (levels - 1 - i)
        parts.append(
            f"CAST((({y}) div {p}) % 2 * 2 + (({x}) div {p}) % 2 AS STRING)"
        )
    return "concat(" + ", ".join(parts) + ")"


@register(
    "fn_geo_quadkey",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey * 37) % 18000 AS lat_h,
             (c_custkey * 73) % 36000 AS lon_h
      FROM customer
    ),
    tiles AS (
      SELECT c_custkey, lat_h, lon_h,
             (lon_h * 256) // 36000 AS tile_x,
             (lat_h * 256) // 18000 AS tile_y
      FROM pts
    )
    SELECT c_custkey, tile_x, tile_y,
           CONCAT(
             CAST((tile_y // 128) % 2 * 2 + (tile_x // 128) % 2 AS VARCHAR),
             CAST((tile_y //  64) % 2 * 2 + (tile_x //  64) % 2 AS VARCHAR),
             CAST((tile_y //  32) % 2 * 2 + (tile_x //  32) % 2 AS VARCHAR),
             CAST((tile_y //  16) % 2 * 2 + (tile_x //  16) % 2 AS VARCHAR),
             CAST((tile_y //   8) % 2 * 2 + (tile_x //   8) % 2 AS VARCHAR),
             CAST((tile_y //   4) % 2 * 2 + (tile_x //   4) % 2 AS VARCHAR),
             CAST((tile_y //   2) % 2 * 2 + (tile_x //   2) % 2 AS VARCHAR),
             CAST((tile_y //   1) % 2 * 2 + (tile_x //   1) % 2 AS VARCHAR)
           ) AS quadkey
    FROM tiles
    """,
)
def fn_geo_quadkey(spark, sf_dir):
    """Level-8 map-tile quadkey encoding — the Bing-maps key scheme
    (public: Microsoft tile-system docs) that turns a 2-D point into
    ONE sortable string whose prefixes are coarser tiles, so a plain
    range scan answers 'everything in this tile' — the standard way
    to put geo data under a rowkey-range store like HBase (and the
    geohash idea generally). Coordinates are synthesized
    deterministically in integer hundredths of a degree, projected to
    a 256x256 equirectangular grid by integer cross-multiply, and the
    quadkey digits are pure div/mod bit interleaving — no floats, no
    trig, identical in any engine.

    Scale shape: per-row whole-stage-codegen expressions only (16
    divs + a concat), no shuffle at all — an encoder you'd inline
    into any ingest pipeline. Prefix-range queries over the result
    then partition-prune like any string rowkey."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % 18000).alias("lat_h"),
        ((F.col("c_custkey") * 73) % 36000).alias("lon_h"),
    )
    tiles = pts.select(
        "c_custkey",
        F.expr("lon_h * 256 div 36000").alias("tile_x"),
        F.expr("lat_h * 256 div 18000").alias("tile_y"),
    )
    return tiles.select(
        "c_custkey",
        "tile_x",
        "tile_y",
        F.expr(_quadkey_sql("tile_x", "tile_y")).alias("quadkey"),
    )


@register(
    "fn_inet_cidr",
    oracle="""
    WITH ips AS (
      SELECT event_id,
             (event_id * 2654435761) % 4294967296 AS ip
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           CAST(ip AS BIGINT) AS ip_u32,
           CAST((ip >> 24) & 255 AS BIGINT) AS oct1,
           CAST((ip >> 16) & 255 AS BIGINT) AS oct2,
           CAST((ip >> 8) & 255 AS BIGINT) AS oct3,
           CAST(ip & 255 AS BIGINT) AS oct4,
           CAST((ip >> 24) & 255 AS VARCHAR) || '.'
             || CAST((ip >> 16) & 255 AS VARCHAR) || '.'
             || CAST((ip >> 8) & 255 AS VARCHAR) || '.'
             || CAST(ip & 255 AS VARCHAR) AS ip_str,
           CAST(CASE WHEN ((ip >> 24) & 255) = 10 THEN 1
                     WHEN ((ip >> 24) & 255) = 172
                          AND ((ip >> 16) & 255) BETWEEN 16 AND 31 THEN 1
                     WHEN ((ip >> 24) & 255) = 192
                          AND ((ip >> 16) & 255) = 168 THEN 1
                     ELSE 0 END AS INT) AS is_private,
           CAST(ip >> 8 AS BIGINT) AS net24,
           CAST(CASE WHEN (ip >> 20) = 1365 THEN 1 ELSE 0 END AS INT)
             AS in_demo_cidr12
    FROM ips
    """,
)
def fn_inet_cidr(spark, sf_dir):
    """IPv4 / CIDR arithmetic — the inet toolbox weblog and netflow
    analytics need: octet extraction, dotted-quad rendering, RFC 1918
    private-range classification, /24 network prefix, and membership
    in an arbitrary CIDR block (here a /12, i.e. the top 12 bits
    equal the block's prefix). Addresses are synthesized from the
    event key with a Knuth multiplicative hash folded into u32 space
    so the oracle reproduces them exactly; every operation is pure
    BIGINT shift/mask arithmetic — identical integers cross-engine,
    no float anywhere. A CIDR test compiles to one shift+compare, so
    at 100 TB it is a pushable/codegen-friendly predicate rather
    than a string parse."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    ip = F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(4294967296))
    oct1 = F.shiftright(ip, 24).bitwiseAND(F.lit(255))
    oct2 = F.shiftright(ip, 16).bitwiseAND(F.lit(255))
    oct3 = F.shiftright(ip, 8).bitwiseAND(F.lit(255))
    oct4 = ip.bitwiseAND(F.lit(255))
    return ev.select(
        "event_id",
        ip.cast("bigint").alias("ip_u32"),
        oct1.cast("bigint").alias("oct1"),
        oct2.cast("bigint").alias("oct2"),
        oct3.cast("bigint").alias("oct3"),
        oct4.cast("bigint").alias("oct4"),
        F.concat_ws(
            ".",
            oct1.cast("string"),
            oct2.cast("string"),
            oct3.cast("string"),
            oct4.cast("string"),
        ).alias("ip_str"),
        F.when(oct1 == 10, 1)
        .when((oct1 == 172) & oct2.between(16, 31), 1)
        .when((oct1 == 192) & (oct2 == 168), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_private"),
        F.shiftright(ip, 8).cast("bigint").alias("net24"),
        F.when(F.shiftright(ip, 20) == 1365, 1)
        .otherwise(0)
        .cast("int")
        .alias("in_demo_cidr12"),
    )

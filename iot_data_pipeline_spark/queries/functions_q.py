"""Q32-Q33: map-typed columns (B36) and the pandas-UDF surface (B50) as
oracle-checked queries.

Q32 exercises the MAP type end to end on the Spark side (map_from_entries,
map_keys, element_at, map_values folding); the DuckDB oracle states the
same facts with conditional aggregation -- maps are engine-internal, the
*values* are the contract.

Q33 puts an Arrow-batched pandas UDF in a declared query: exact integer
token counts, so vectorized Python and SQL agree bit-for-bit. This is the
one sanctioned UDF-in-oracle pattern -- integer results only; float UDF
paths stay bench-only (summation-order drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_data_pipeline_spark.functions.udfs import token_count_arrow
from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.queries.base import valid_embeddings
from iot_data_pipeline_spark.sources.readers import read_table


@declared(
    "q32_map_funcs",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROUND(SUM(value), 2) AS sum_v
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           COUNT(*) AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN n END) AS n_clicks,
           MAX(CASE WHEN event_type = 'error' THEN n END) AS n_errors,
           CAST(SUM(n) AS BIGINT) AS n_total,
           ROUND(SUM(sum_v), 2) AS sum_values
    FROM per GROUP BY user_id ORDER BY user_id
    """,
)
def q32_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns (B36): per-user map event_type -> (count, sum),
    then map_keys/element_at/map_values folds. The map is built with
    map_from_entries over a sorted collect_list (deterministic key order);
    the fold over map_values is a higher-order aggregate. All map
    operations happen after the groupBy, on one row per user -- map
    construction never inflates the shuffle.

    NULL event_type is excluded on both sides: a map key cannot be NULL
    (Spark raises NULL_MAP_KEY by spec), so a NULL-typed event has no
    place in a per-type map (round-7 NULL fixture)."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_v")
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct("event_type", F.struct("n", "sum_v")))
            )
        ).alias("m")
    )
    values = F.map_values(F.col("m"))
    return m.select(
        "user_id",
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_types"),
        F.element_at(F.col("m"), "click")["n"].alias("n_clicks"),
        F.element_at(F.col("m"), "error")["n"].alias("n_errors"),
        F.aggregate(
            values, F.lit(0).cast("long"), lambda acc, v: acc + v["n"]
        ).alias("n_total"),
        # SQL SUM semantics for the fold: skip NULL type-sums (a type
        # whose every value is NULL), NULL only when ALL are NULL -- a
        # bare `acc + v` would poison the whole fold on one NULL
        # (round-7 NULL fixture)
        F.round(
            F.when(
                F.exists(values, lambda v: v["sum_v"].isNotNull()),
                F.aggregate(
                    values,
                    F.lit(0.0),
                    lambda acc, v: acc + F.coalesce(v["sum_v"], F.lit(0.0)),
                ),
            ),
            2,
        ).alias("sum_values"),
    ).orderBy("user_id")


@declared(
    "q35_math_funcs",
    oracle="""
    SELECT event_id,
           ROUND(value, 1) AS v_round,
           CAST(FLOOR(value) AS BIGINT) AS v_floor,
           CAST(CEIL(value) AS BIGINT) AS v_ceil,
           ROUND(ABS(value - 250.0), 2) AS v_absdev,
           ROUND(SQRT(CASE WHEN value >= 0 THEN value END), 4) AS v_sqrt,
           ROUND(LN(CASE WHEN value > -1 THEN value + 1 END), 4) AS v_ln,
           ROUND(LOG10(CASE WHEN value > -1 THEN value + 1 END), 4) AS v_log10,
           ROUND(POW(value / 100, 2), 4) AS v_pow,
           event_id % 7 AS v_pmod,
           CAST(SIGN(value - 250.0) AS DOUBLE) AS v_sign
    FROM events WHERE event_id % 25 = 0 ORDER BY event_id
    """,
)
def q35_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface (B33): round/floor/ceil/abs/sqrt/ln/log10/pow/
    pmod/sign in one codegen span. sqrt is IEEE-correctly-rounded (exact
    cross-engine); ln/log10/pow are libm-dependent in the last ulp, so
    ROUND(.., 4) per SURVEY section 2.3 rule 2 absorbs it.

    Domain guards (round-8 hot-key sweep finding): a negative value is a
    legitimate measurement, but sqrt/ln of one is a domain error where
    the engines genuinely diverge -- Spark yields NaN (sqrt) / NULL
    (log), DuckDB RAISES OutOfRange. Contract: out-of-domain input is a
    NULL measurement on BOTH sides (the finite_or_null posture), via an
    explicit CASE guard in each engine. NaN passes the guards (NaN >= 0
    is TRUE in both engines' comparison semantics) and propagates as NaN
    through sqrt/ln identically, so no special-casing is needed."""
    ev = read_table(spark, sf_dir, "events")
    v = F.col("value")
    return (
        ev.filter(F.col("event_id") % 25 == 0)
        .select(
            "event_id",
            F.round(v, 1).alias("v_round"),
            F.floor(v).alias("v_floor"),
            F.ceil(v).alias("v_ceil"),
            F.round(F.abs(v - 250.0), 2).alias("v_absdev"),
            F.round(F.sqrt(F.when(v >= 0, v)), 4).alias("v_sqrt"),
            F.round(F.log(F.when(v > -1, v + 1)), 4).alias("v_ln"),
            F.round(F.log10(F.when(v > -1, v + 1)), 4).alias("v_log10"),
            F.round(F.pow(v / 100, 2), 4).alias("v_pow"),
            F.pmod(F.col("event_id"), F.lit(7)).alias("v_pmod"),
            F.signum(v - 250.0).alias("v_sign"),
        )
        .orderBy("event_id")
    )


@declared(
    "q36_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS n_dims,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST(list_position(embedding, list_max(embedding)) AS INTEGER)
               AS argmax_pos,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
           ROUND(CAST(list_sort(embedding[1:8])[1] AS DOUBLE), 4) AS min_of_first8,
           ROUND(CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                 AS DOUBLE), 4) AS sum_all
    FROM embeddings ORDER BY vec_id
    """,
)
def q36_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface (B35): size/filter/array_position/array_max/
    sort_array/slice/element_at plus a higher-order sum fold, per row over
    ``embedding: array<float>``. Sum folds left-to-right in both engines
    (same order as DuckDB's list_sum over the cast list), so ROUND(4) is
    belt-and-braces, not a crutch."""
    emb = valid_embeddings(spark, sf_dir)
    arr = F.col("embedding")
    as_double = F.transform(arr, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(arr).alias("n_dims"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_pos"),
        F.array_position(arr, F.array_max(arr)).cast("int").alias("argmax_pos"),
        F.round(F.array_max(arr).cast("double"), 4).alias("max_val"),
        F.round(
            F.element_at(F.sort_array(F.slice(arr, 1, 8)), 1).cast("double"), 4
        ).alias("min_of_first8"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda s, x: s + x), 4
        ).alias("sum_all"),
    ).orderBy("vec_id")


@declared(
    "q33_pandas_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def q33_pandas_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF surface in the oracle gate (B50): token counting runs in
    an Arrow-batched vectorized UDF, then aggregates per lang. Integer
    domain -> no float drift; proves the Python-worker path (Arrow
    round-trip, batch iteration) preserves exactness."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select("lang", token_count_arrow("text").alias("n_tokens"))
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )


@declared(
    "q38_text_normalize",
    oracle="""
    SELECT doc_id,
           length(text) AS raw_len,
           lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm_text,
           length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS norm_len,
           regexp_replace(lower(text), '[aeiou]', '', 'g') AS devoweled
    FROM documents WHERE doc_id % 50 = 0 ORDER BY doc_id
    """,
)
def q38_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-normalization scalar surface (B31/B47): whitespace collapse,
    trim, case fold, character-class regexp_replace -- the pre-tokenization
    cleanup stage of a training-data pipeline, all JVM-side codegen (no
    UDF). Spark's regexp_replace is replace-all by default == DuckDB 'g'.
    """
    docs = read_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", " +", " ")))
    return (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(
            "doc_id",
            F.length("text").alias("raw_len"),
            norm.alias("norm_text"),
            F.length(norm).alias("norm_len"),
            F.regexp_replace(F.lower(F.col("text")), "[aeiou]", "").alias("devoweled"),
        )
        .orderBy("doc_id")
    )


#: BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct splits,
#: reduced to the RE2-safe subset both engines share: no lookahead).
BPE_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@declared(
    "q39_bpe_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS piece
      FROM documents
    )
    SELECT piece, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY piece
    ORDER BY n DESC, piece LIMIT 30
    """,
)
def q39_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counts (B47, the "token counting" op of a
    training-data pipeline): regexp_extract_all with a GPT-2-shaped pattern
    (leading-space word pieces), explode, count. Pattern stays in the RE2 /
    Java-regex common subset so Spark and DuckDB tokenize identically.

    The rows + distinct-docs aggregates are computed as a TWO-LEVEL
    aggregation -- groupBy(piece, doc_id).count() then groupBy(piece) --
    instead of count + countDistinct in one agg, which plans an Expand
    that doubles every exploded row through the shuffle (the q09 lesson;
    measured 2x here). LIMIT after sort is TakeOrderedAndProject, never a
    global materialized sort.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PATTERN), F.lit(0))).alias(
            "piece"
        ),
    )
    per_doc = tok.groupBy("piece", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_doc.groupBy("piece")
        .agg(F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n"), "piece")
        .limit(30)
    )


@declared(
    "q61_regexp_extract_all",
    oracle="""
    WITH hits AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS tok
      FROM documents
    )
    SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM hits GROUP BY tok ORDER BY n DESC, tok
    """,
)
def q61_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction (B31 completion): every 'a'-containing
    word per document via regexp_extract_all + explode -- the
    pattern-mining shape (PII scans, URL harvesting) where one row
    yields many matches. Stays a JVM-side generator expression: no UDF,
    codegen keeps the explode pipelined into the aggregation.
    """
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("text", F.lit("[a-z]+a[a-z]*"), F.lit(0))
            ).alias("tok"),
        )
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n"), "tok")
    )


@declared(
    "q62_union_by_name",
    oracle="""
    SELECT kind, nationkey, COUNT(*) AS n, ROUND(SUM(acctbal), 2) AS total_bal
    FROM (
      SELECT 'customer' AS kind, c_nationkey AS nationkey, c_acctbal AS acctbal
      FROM customer
      UNION ALL BY NAME
      SELECT s_nationkey AS nationkey, 'supplier' AS kind, NULL AS acctbal
      FROM supplier
    )
    GROUP BY kind, nationkey ORDER BY kind, nationkey
    """,
)
def q62_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligning union (B29 completion): unionByName with
    allowMissingColumns stitches heterogeneous sources into one frame,
    aligning columns by NAME (position-based union would silently pair
    kind with nationkey here) and NULL-filling the absent ones -- the
    multi-source corpus-ingest shape.
    """
    customer = read_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("kind"),
    )
    return (
        customer.unionByName(supplier, allowMissingColumns=True)
        .groupBy("kind", "nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("acctbal"), 2).alias("total_bal"),
        )
        .orderBy("kind", "nationkey")
    )


@declared(
    "q63_json_struct",
    oracle="""
    WITH p AS (
      -- json_valid guard: DuckDB json functions RAISE on malformed rows
      -- where Spark's PERMISSIVE from_json yields a NULL struct
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER)
             END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           COUNT(DISTINCT k % 10) AS n_k_mod
    FROM p
    WHERE k IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q63_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON decode (B34 completion): from_json with a declared
    schema turns the props string into a real struct column ONCE; all
    downstream references are struct field reads, not repeated string
    parses (q19's get_json_object re-parses per call site). At scale
    the single-parse shape is the difference between one and N passes
    of a JSON parser over every row.
    """
    import pyspark.sql.types as T

    ev = read_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = ev.withColumn("p", F.from_json("props", schema)).filter(
        F.col("p.k").isNotNull()
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p.k").alias("min_k"),
            F.max("p.k").alias("max_k"),
            F.countDistinct(F.col("p.k") % 10).alias("n_k_mod"),
        )
        .orderBy("event_type")
    )

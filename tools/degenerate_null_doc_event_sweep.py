"""One-shot audit: run every documents- and events-consuming query against
fixtures that extend the round-6 degenerate sets with NULLs in columns the
existing suites never null out: documents.text / lang / source / n_chars,
events.ts / user_id / event_type / props.

The divergence classes this hunts (complement of the relational NULL
sweep): NULL event-time in window/session assignment (Spark's window()
drops the row, DuckDB's time_bucket keeps a NULL group), NULL group keys
through pairing pipelines, NULL text through tokenize/shingle kernels.

Usage: python -m tools.degenerate_null_doc_event_sweep [--nan|--skew] [query ...]
(--skew replaces the tiny fixtures with volumetric hot-key ones: one
user owns 90% of 50k events in one dense multi-day session, one event
type carries 85% of rows, and the 5k-doc corpus holds a 300-copy
duplicate cluster -- the shapes that stress sessionization state, EWMA
/rolling windows over a giant partition, heavy-hitter sketches, and
the dedup band's bucket paths. Values sit on exact binary grids so
double SUMs stay order-invariant; divergences are logic, not ulp.)
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import duckdb

DOC_QUERIES = [
    "q17_string_funcs", "q17b_token_counts", "q22_exact_dedup",
    "q23_minhash_lsh", "q192_lsh_hot_bucket",
    "q24_simhash_pairs", "q25_ngram_jaccard",
    "q27_langid", "q28_quality_score", "q29_doc_fingerprint",
    "q33_pandas_token_stats", "q38_text_normalize", "q39_bpe_tokens",
    "q40_curation_pipeline", "q44_repetition_ratio",
    "q45_stopword_charset", "q48_hash_split", "q49_stratified_sample",
    "q50_vocab_coverage", "q52_dup_clusters", "q61_regexp_extract_all",
    "q67_sorted_list_agg", "q70_posexplode_outer", "q85_udtf_chunks",
    "q86_tfidf_top_terms", "q109_decontamination", "q110_length_trim",
    "q114_pii_redaction", "q115_paragraph_dedup", "q116_bm25_scoring",
    "q117_sequence_packing", "q118_winnowing_fingerprints",
    "q119_incremental_dedup", "q120_char_entropy",
    "q121_repetition_rules", "q122_mix_rebalance",
    "q123_leakage_safe_split", "q128_domain_quota",
    "q129_k_anonymity_audit", "q131_bpe_learn", "q132_ngram_perplexity",
    "q137_bpe_encode", "q139_posting_lists", "q140_pagerank",
    "q141_quality_aware_dedup", "q143_rag_retrieval",
    "q144_lsh_recall_audit", "q145_prefix_filter_join",
    "q147_curation_dashboard", "q153_bloom_incremental_dedup",
    "q154_rag_rerank", "q155_url_canonicalize", "q156_incremental_lsh",
    "q157_padding_waste", "q158_span_corruption",
    "q163_importance_resampling", "q173_exact_stratified_split",
]

EVENT_QUERIES = [
    "q01_ingest_project", "q02_threshold_filter",
    "q03_celsius_to_fahrenheit", "q04_enrichment_join", "q08_range_join",
    "q08b_asof_join", "q08c_asof_forward_tolerance", "q11c_dedup_events",
    "q16_lag_lead_running", "q16b_range_frame", "q18_hourly_counts",
    "q19_json_extract", "q20_tumbling_window", "q20b_sliding_window",
    "q21_sessionization", "q32_map_funcs", "q35_math_funcs",
    "q55_salted_agg", "q58_gap_fill", "q59_forward_fill",
    "q63_json_struct", "q64_upsert_merge", "q65_rolling_zscore",
    "q66_arg_extremes", "q68_histogram", "q75_scd2_intervals",
    "q84_variant_json", "q89_ansi_safe_arith", "q90_quality_quarantine",
    "q91_funnel_stages", "q92_cohort_retention", "q93_event_transitions",
    "q98_winsorized_values", "q99_global_running_sum",
    "q138_salted_join", "q142_ewma", "q146_cdc_apply",
    "q150_chain_components", "q152_cms_heavy_hitters",
    "q172_ohlc_resample", "q175_drift_psi", "q178_scalable_exact_median",
    "q179_table_fingerprint",
]

SIDE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "embeddings",
)


def build_fixture(
    d: str, src: str = "/root/testdata/sf0.001", with_nan: bool = False
) -> None:
    """Round-6 degenerate documents/events plus the NULL rows those
    fixtures never carried. ``with_nan`` appends events whose value is
    NaN/+Inf/-Inf -- the routine failure modes of a physical sensor
    stream (the reference's actual domain)."""
    for t in SIDE_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")

    duckdb.sql(f"""
    COPY (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
             CAST(n_chars AS BIGINT) AS n_chars
      FROM (VALUES
        (0, '', 'en', 'src0', 0),
        (1, ' ', 'en', 'src0', 1),
        (2, 'one', 'de', 'src1', 3),
        (3, 'a  b', 'de', 'src1', 4),
        (4, 'normal text with several words here', 'en', 'src2', 35),
        (5, 'zzz zzz zzz zzz', 'fr', 'src2', 15),
        (6, NULL, 'en', 'src3', NULL),
        (7, 'ok text present here', NULL, NULL, 20),
        -- Unicode rows (round 7): emoji/surrogates, CJK, accents,
        -- full-width forms, RTL -- all length/tokenize/hash paths agree
        -- cross-engine on these. Deliberately ABSENT: U+0130 'İ',
        -- word-final 'Σ', and 'ß' (whose upper() diverges) -- Java
        -- full/context case mapping vs DuckDB simple folding genuinely
        -- diverges there (pinned in
        -- tests/test_oracle_queries.py::test_case_mapping_divergence).
        (8, 'emoji 😀😀 text with 🎉 party', 'en', 'src4', 28),
        (9, '中文 文本 分析 测试 中文', 'zh', 'src4', 14),
        (10, 'strasse STRASSE gross GROSS', 'de', 'src4', 27),
        (11, 'café café café naïve naive', 'fr', 'src4', 27),
        (12, 'ＦＵＬＬＷＩＤＴＨ １２３ ｄｉｇｉｔｓ', 'ja', 'src4', 19),
        (13, 'مرحبا بالعالم نص عربي', 'ar', 'src4', 21),
        -- control characters (round 7, all cross-engine clean): NUL and
        -- bell bytes, tabs, CRLF, blank-line paragraph breaks, edge
        -- whitespace
        (14, 'para one line' || chr(10) || chr(10) || 'para two line'
             || chr(10) || chr(10) || 'para one line', 'en', 'src5', 45),
        (15, 'tab' || chr(9) || 'separated' || chr(9) || 'fields here',
         'en', 'src5', 27),
        (16, 'crlf line' || chr(13) || chr(10) || 'second line',
         'en', 'src5', 22),
        (17, 'null' || chr(0) || 'byte and bell' || chr(7) || 'char',
         'en', 'src5', 20),
        (18, 'trailing spaces   ', 'en', 'src5', 18),
        (19, '   leading spaces', 'en', 'src5', 17)
      ) t(doc_id, text, lang, source, n_chars)
    ) TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)

    nan_rows = """,
        (12, TIMESTAMP '2024-01-04 01:00:00', 6, 'click', 'nan'::DOUBLE, '{}'),
        (13, TIMESTAMP '2024-01-04 02:00:00', 6, 'view', 'inf'::DOUBLE, '{}'),
        (14, TIMESTAMP '2024-01-04 03:00:00', 6, 'click', '-inf'::DOUBLE, '{}')""" if with_nan else ""

    duckdb.sql(f"""
    COPY (
      SELECT CAST(event_id AS BIGINT) AS event_id, ts,
             CAST(user_id AS BIGINT) AS user_id,
             event_type, CAST(value AS DOUBLE) AS value, props
      FROM (VALUES
        (0, TIMESTAMP '2024-01-01 00:00:00', 1, 'click', 1.5, '{{}}'),
        (1, TIMESTAMP '2024-01-01 00:00:00', 2, 'click', 2.0, '{{"a": 1}}'),
        (2, TIMESTAMP '2024-01-01 00:30:00', 2, 'view', NULL, '{{"a": [1,2]}}'),
        (3, TIMESTAMP '2024-01-01 01:00:00', 3, 'purchase', NULL, 'not json'),
        (4, TIMESTAMP '2024-01-01 01:00:01', 3, 'purchase', NULL, ''),
        (5, TIMESTAMP '2024-01-01 01:00:02', 3, 'error', 0.0,
         '{{"nested": {{"k": "v"}}}}'),
        (6, TIMESTAMP '2024-01-02 10:00:00', 4, 'click', -3.25, '{{}}'),
        (7, TIMESTAMP '2024-01-02 10:05:00', 4, 'click', 10.0, '{{}}'),
        (8, TIMESTAMP '2024-01-02 12:00:00', 4, 'signup', 7.5, '{{}}'),
        (9, TIMESTAMP '2024-01-03 09:00:00', 4, 'view', 4.25, '{{}}'),
        (10, NULL, 5, 'click', 1.0, '{{}}'),
        (11, TIMESTAMP '2024-01-04 00:00:00', NULL, NULL, 2.0, NULL),
        -- extreme ids and timestamps (round-7 probes, all cross-engine
        -- clean): negative ids (remainder semantics), near-2^63 ids
        -- (hash/mod overflow paths), years outside the pandas
        -- datetime64[ns] range (fetch-path precision)
        (-5, TIMESTAMP '2024-01-05 00:00:00', -3, 'click', 1.0, '{{}}'),
        (9223372036854775806, TIMESTAMP '2024-01-05 01:00:00',
         9223372036854775806, 'view', 2.0, '{{}}'),
        (15, TIMESTAMP '9999-12-31 23:59:59', 7, 'click', 1.0, '{{}}'),
        (16, TIMESTAMP '1000-01-01 00:00:00', 7, 'view', 2.0, '{{}}'),
        -- pathological-but-valid JSON props (round 7, cross-engine
        -- clean): 40-deep nesting, a 20 KB payload
        (17, TIMESTAMP '2024-01-06 00:00:00', 8, 'click', 1.0,
         repeat('{{"a":', 40) || '1' || repeat('}}', 40)),
        (18, TIMESTAMP '2024-01-06 01:00:00', 8, 'view', 2.0,
         '{{"k": 5, "pad": "' || repeat('x', 20000) || '"}}'){nan_rows}
      ) t(event_id, ts, user_id, event_type, value, props)
    ) TO '{d}/events.parquet' (FORMAT PARQUET)
    """)


def build_skew_fixture(d: str, src: str = "/root/testdata/sf0.001") -> None:
    """Volumetric hot-key documents/events: the cardinality shape every
    real clickstream and crawl serves, at a size (50k events / 5k docs)
    comparable to the sf0.01 harness data.

    events: user 6 owns 90% of 50,000 rows at a fixed 30 s cadence (ONE
    dense multi-day session -- giant per-key window/session state);
    'click' carries 85% of rows (hot sketch key); values land on an
    exact 0.25 grid (order-invariant double SUMs) and include negatives;
    every 97th props is malformed JSON (the routing paths stay hot).

    documents: a 300-copy duplicate cluster + a 50-copy second cluster
    (bucket-path volume without the 4*C(m,2) exhaustive-pair blowup the
    capped q192 path guards), 4,650 distinct docs with disjoint token
    vocabularies, lang/source cycling including empty string."""
    for t in SIDE_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    duckdb.sql(f"""
    COPY (
      SELECT CAST(i AS BIGINT) AS doc_id,
             CASE
               WHEN i <= 300 THEN 'the same boilerplate page text repeated verbatim across the crawl'
               WHEN i <= 350 THEN 'cookie banner accept decline privacy policy terms'
               ELSE 'doc' || i || ' tok' || (i*7 % 9973) || ' tok' || (i*13 % 9973)
                    || ' tok' || (i*17 % 9973) || ' word' || (i % 50)
             END AS text,
             ['en','de','fr','zh',''][1 + i % 5] AS lang,
             'src' || (i % 7) AS source,
             CAST(CASE
               WHEN i <= 300 THEN 66 WHEN i <= 350 THEN 49
               ELSE 40 + length(CAST(i AS VARCHAR)) + length(CAST(i*7 % 9973 AS VARCHAR))
                    + length(CAST(i*13 % 9973 AS VARCHAR)) + length(CAST(i*17 % 9973 AS VARCHAR))
                    + length(CAST(i % 50 AS VARCHAR))
             END AS BIGINT) AS n_chars
      FROM range(1, 5001) t(i)
    ) TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    duckdb.sql(f"""
    COPY (
      SELECT CAST(i AS BIGINT) AS event_id,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i * 30) SECOND AS ts,
             CAST(CASE WHEN i % 10 < 9 THEN 6 ELSE 1 + i % 20 END
                  AS BIGINT) AS user_id,
             CASE WHEN i % 20 < 17 THEN 'click'
                  ELSE ['view','purchase','signup','error'][1 + i % 4]
             END AS event_type,
             CAST(((i % 400) - 200) * 0.25 AS DOUBLE) AS value,
             CASE WHEN i % 97 = 0 THEN 'not json'
                  ELSE '{{"k": ' || (i % 100) || '}}' END AS props
      FROM range(1, 50001) t(i)
    ) TO '{d}/events.parquet' (FORMAT PARQUET)
    """)


def main() -> int:
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    with_nan = "--nan" in argv
    with_skew = "--skew" in argv
    names = [
        a for a in argv if a not in ("--nan", "--skew")
    ] or (DOC_QUERIES + EVENT_QUERIES)
    d = tempfile.mkdtemp(prefix="degenerate_null_de_")
    if with_skew:
        build_skew_fixture(d)
    else:
        build_fixture(d, with_nan=with_nan)
    spark = build_session("degenerate-null-doc-event-sweep")
    con = duck_connection(d)
    failed = 0
    for name in names:
        try:
            problems = compare_query(spark, con, name, d)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"]
        status = "PASS" if not problems else "FAIL"
        if problems:
            failed += 1
        print(f"[{status}] {name}")
        for p in problems:
            print(f"    {p}")
    print(f"{len(names) - failed}/{len(names)} passed  (fixture: {d})")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

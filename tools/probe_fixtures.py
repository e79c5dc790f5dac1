"""Fixture builders for the three formerly probe-only invariance axes
(round-8 verdict task 6), now frozen as pytest bands in
tests/test_oracle_queries.py:

- reversed row order: every table rewritten back-to-front. Exercises
  within-partition order -- tie-breaking in windows/top-k/dedup
  representatives beyond what file splits perturb. Round-8 probe:
  205/205.
- float64-stored embeddings: ``array<double>`` where the driver writes
  ``array<float>``. Exercises kernel width assumptions in the
  similarity/ANN band. Round-8 probe: 17/17.
- all-NULL columns: every ``events.value`` and every ``documents.lang``
  NULL. Exercises the all-None pandas dtype-collapse hazard on the
  Arrow fetch path and NULL-group handling in language/quality
  aggregation. Round-8 probe: 100/100.
- reversed COLUMN order: every table's parquet footer lists columns
  back-to-front (a writer serializing fields in its own order).
  Exercises by-name vs by-position binding at every read/write
  boundary. Round-9 probe: 204/205 on first run -- q51's CSV round-trip
  wrote the staged CSV in source-footer order while the declared-schema
  CSV read binds BY POSITION, silently swapping n_nationkey and
  n_regionkey; the writer now pins the column order (CSV is a
  positional format; the writer owns the layout).

Usage: python -m tools.probe_fixtures
[--reversed|--float64|--allnull|--colorder]
[src_sf_dir] [query ...] -- runs the matching representative band (or
the given queries) against a freshly built fixture, mirroring the other
tools/*_sweep.py entry points.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from iot_data_pipeline_spark.sources.readers import TABLES


def build_reversed_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        idx = pa.array(range(len(tab) - 1, -1, -1), type=pa.int64())
        pq.write_table(tab.take(idx), f"{d}/{t}.parquet")


def build_float64_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
            continue
        tab = pq.read_table(f"{src}/{t}.parquet")
        fields, arrays = [], []
        for f, col in zip(tab.schema, tab.columns):
            if f.name == "embedding":
                newt = pa.list_(pa.float64())
                col = col.cast(newt)
                f = pa.field(f.name, newt)
            fields.append(f)
            arrays.append(col)
        pq.write_table(
            pa.table(arrays, schema=pa.schema(fields)), f"{d}/{t}.parquet"
        )


def build_allnull_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """events.value and documents.lang 100% NULL, types preserved."""
    for t in TABLES:
        if t not in ("events", "documents"):
            shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
            continue
        null_col = "value" if t == "events" else "lang"
        tab = pq.read_table(f"{src}/{t}.parquet")
        fields, arrays = [], []
        for f, col in zip(tab.schema, tab.columns):
            if f.name == null_col:
                col = pa.nulls(len(tab), type=f.type)
            fields.append(f)
            arrays.append(col)
        pq.write_table(
            pa.table(arrays, schema=pa.schema(fields)), f"{d}/{t}.parquet"
        )


def build_extracol_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Every table with one trailing unknown column ``_ingest_seq``
    (schema evolution: a writer added a field the engine contract does
    not know). Both engines see the same extra column, so explicit
    projections are invariant and ``SELECT *`` shapes stay aligned;
    what this axis guards is a boundary that would DROP or REORDER the
    unknown column on one side only. Round-9 probe: 205/205."""
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        extra = pa.array(range(len(tab)), type=pa.int64())
        pq.write_table(
            tab.append_column("_ingest_seq", extra), f"{d}/{t}.parquet"
        )


def build_upper_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Every column name UPPER-CASED (the Oracle/Snowflake-bred exporter
    that upper-cases all identifiers). Spark resolves references
    case-insensitively but preserves the stored spelling in outputs and
    pandas-UDF batch columns (case-sensitive), so this axis leaked the
    writer's spelling into results and broke Python kernels until the
    round-9 read-boundary name-case normalization (read_table lowercases
    at the scan; duck_connection aliases its views identically).
    First run: 15/40 -> after the fix 205/205."""
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(
            tab.rename_columns([c.upper() for c in tab.column_names]),
            f"{d}/{t}.parquet",
        )


def build_colorder_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """Every table with its parquet column order REVERSED (row content
    identical). Readers binding by name are invariant; anything
    positional (CSV staging, index-based tuple access) flips."""
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(
            tab.select(list(reversed(tab.column_names))),
            f"{d}/{t}.parquet",
        )


#: Hostile-unicode suffix for --unicode (round-12 axis): NFD combining
#: sequence (e + U+0301), astral emoji (UTF-16 surrogate pair in the
#: JVM), RTL mark, zero-width joiner, and a non-BMP math letter. Units
#: disagree across engines on exactly this text: Spark strings are
#: UTF-16 JVM strings, DuckDB's are UTF-8 -- length/substring/ngram
#: semantics that silently count different units surface here.
_UNI_SUFFIX = " é\U0001F600‏‍\U0001D518"


def build_unicode_fixture(d: str, src: str = "/root/testdata/sf0.01") -> None:
    """documents.text with the hostile-unicode suffix appended to every
    row (deterministic; both engines see the same bytes, so any
    divergence is a UNIT-of-text semantic difference, not data)."""
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
            continue
        tab = pq.read_table(f"{src}/{t}.parquet")
        idx = tab.schema.get_field_index("text")
        import pyarrow.compute as pc

        text = pc.binary_join_element_wise(
            pc.cast(tab.column(idx), pa.string()),
            pa.scalar(_UNI_SUFFIX, pa.string()),
            "",
        )
        pq.write_table(
            tab.set_column(idx, "text", text), f"{d}/{t}.parquet"
        )


#: representative query bands per axis (frozen twins live in
#: tests/test_oracle_queries.py; keep the lists in sync there)
REVERSED_BAND = [
    "q15_topk_per_group", "q15b_rank_ntile", "q43_percent_rank",
    "q16_lag_lead_running", "q59_forward_fill", "q66_arg_extremes",
    "q67_sorted_list_agg", "q22_exact_dedup",
    "q178_scalable_exact_median", "q11_distinct", "q08b_asof_join",
    "q21_sessionization",
]
FLOAT64_BAND = [
    "q31_ann_ivf", "q97_embedding_standardize", "q136_semdedup",
    "q141_quality_aware_dedup", "q143_rag_retrieval",
    "q148_ivf_recall_audit", "q154_rag_rerank", "q176_retrieval_ndcg",
    "q183_ivf_adaptive_probe",
]
ALLNULL_BAND = [
    "q27_langid", "q28_quality_score", "q45_stopword_charset",
    "q122_mix_rebalance", "q128_domain_quota", "q16b_range_frame",
    "q56_stats_agg", "q68_histogram", "q98_winsorized_values",
    "q20_tumbling_window",
]

COLORDER_BAND = [
    # every FILE-FORMAT round-trip boundary (where positional binding
    # can bite) plus representative multi-table by-name readers
    "q51_csv_roundtrip", "q74_orc_roundtrip", "q87_xml_roundtrip",
    "q69_partitioned_sink", "q01_ingest_project", "q05_revenue_per_nation",
    "q09_lineitem_agg", "q19_json_extract", "q31_ann_ivf",
    "q170_custom_datasource", "q179_table_fingerprint",
]

#: text-unit-sensitive band: length/token/ngram/shingle/fingerprint
#: queries over documents.text
UNICODE_BAND = [
    "q17b_token_counts", "q27_langid", "q28_quality_score",
    "q29_doc_fingerprint", "q23_minhash_lsh", "q24_simhash_pairs",
    "q25_ngram_jaccard", "q38_text_normalize", "q45_stopword_charset",
    "q86_tfidf_top_terms", "q110_length_trim", "q115_paragraph_dedup",
    "q116_bm25_scoring", "q118_winnowing_fingerprints",
    "q120_char_entropy", "q121_repetition_rules", "q131_bpe_learn",
    "q132_ngram_perplexity", "q137_bpe_encode", "q145_prefix_filter_join",
    "q155_url_canonicalize",
]

_MODES = {
    "--reversed": (build_reversed_fixture, REVERSED_BAND, "revrows_"),
    "--unicode": (build_unicode_fixture, UNICODE_BAND, "unicode_"),
    "--float64": (build_float64_fixture, FLOAT64_BAND, "f64emb_"),
    "--allnull": (build_allnull_fixture, ALLNULL_BAND, "allnull_"),
    "--colorder": (build_colorder_fixture, COLORDER_BAND, "colorder_"),
    "--extracol": (build_extracol_fixture, COLORDER_BAND, "extracol_"),
    "--upper": (build_upper_fixture, COLORDER_BAND, "upper_"),
}


def main() -> int:
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    argv = sys.argv[1:]
    mode = next((a for a in argv if a in _MODES), "--reversed")
    argv = [a for a in argv if a not in _MODES]
    build, band, prefix = _MODES[mode]
    src = argv[0] if argv and not argv[0].startswith("q") else "/root/testdata/sf0.01"
    names = [a for a in argv if a.startswith("q")] or band
    d = tempfile.mkdtemp(prefix=prefix)
    build(d, src=src)
    spark = build_session("probe-fixtures-sweep")
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

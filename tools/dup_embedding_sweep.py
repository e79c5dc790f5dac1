"""One-shot audit: run every embeddings-consuming query against a
DUPLICATE-HEAVY vector corpus and report divergences.

The degenerate-embeddings fixture (tests/test_oracle_queries.py) probes
malformed vectors; this probes the orthogonal cardinality hazard a real
embedding lake always serves: mass-duplicated vectors (the boilerplate
page embedded a million times, a default/zero-content embedding). The
divergence classes it hunts: k-means where the corpus has fewer distinct
points than centroids (empty clusters, convergence ties), IVF where one
cell swallows most of the corpus (probe-budget paths), SemDeDup cells
full of EXACT ties (prune order must be id-deterministic, not
engine-order), and near-dup pairing volume through a 400-copy cluster.

Corpus: 2,000 4-dim vectors -- 400 exact copies of one unit vector, 100
copies of a second, 1,500 distinct (deterministic grid; no randomness).
All on exact binary fractions where possible so distance ties are EXACT.

Usage: python -m tools.dup_embedding_sweep [query ...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

import duckdb

EMBEDDING_QUERIES = [
    "q12_cosine_topk", "q26_embedding_neardup", "q31_ann_ivf",
    "q36_array_funcs", "q54_lsh_buckets", "q97_embedding_standardize",
    "q100_crossmodal_neardup", "q112_kmeans_clusters", "q133_image_dedup",
    "q136_semdedup", "q141_quality_aware_dedup", "q143_rag_retrieval",
    "q148_ivf_recall_audit", "q149_ivf_multiprobe_audit", "q154_rag_rerank",
    "q176_retrieval_ndcg", "q183_ivf_adaptive_probe",
]

SIDE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "events",
)


def build_fixture(d: str, src: str = "/root/testdata/sf0.001") -> None:
    """2,000 vectors: a 400-copy duplicate cluster (unit vector), a
    100-copy second cluster (orthogonal unit vector), 1,500 distinct
    vectors on a deterministic grid. Labels cycle 0-2 so label-joined
    queries keep every branch populated."""
    for t in SIDE_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    duckdb.sql(f"""
    COPY (
      SELECT CAST(i AS BIGINT) AS vec_id,
             CAST(CASE
               WHEN i <= 400 THEN [0.6, -0.8, 0.0, 0.0]
               WHEN i <= 500 THEN [0.0, 1.0, 0.0, 0.0]
               ELSE [i * 0.0005, 1.0 - i * 0.00025,
                     0.25 + (i % 4) * 0.125, -0.25 + (i % 8) * 0.0625]
             END AS FLOAT[]) AS embedding,
             CAST(i % 3 AS INTEGER) AS label
      FROM range(1, 2001) t(i)
    ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
    """)


def main() -> int:
    from iot_data_pipeline_spark.session import build_session
    from tests.oracle_harness import compare_query, duck_connection

    names = sys.argv[1:] or EMBEDDING_QUERIES
    d = tempfile.mkdtemp(prefix="dup_embedding_")
    build_fixture(d)
    spark = build_session("dup-embedding-sweep")
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

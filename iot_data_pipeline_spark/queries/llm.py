"""LLM-data-pipeline operators as declared queries (north-star mandate):
exact/near dedup (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
text analysis (tokens, language-ID, quality, fingerprint), multimodal
metadata plumbing, and IVF-style ANN. All run on documents/embeddings.

Cross-engine determinism trick: a *portable hash*
    H(s) = int(md5(s)[:15 hex], 16) % 1_000_000_007
is computable bit-identically in Spark (conv+md5) and DuckDB ('0x' cast),
so MinHash signatures, SimHash fingerprints, and rolling-hash fingerprints
hash-match the oracle exactly -- no approximate comparison needed.

Since the driver corpus has no literal duplicates, dedup queries build a
deterministic augmented corpus (every 10th doc re-inserted, exact copy for
exact-dedup / token-truncated copy for near-dup) with identical expressions
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iot_data_pipeline_spark.functions.hashing import (
    ORACLE_HASH,
    PORTABLE_MOD as MOD,
    portable_hash,
)
from iot_data_pipeline_spark.operators.spread import spread_rows as _spread_rows
from iot_data_pipeline_spark.queries.registry import declared
from iot_data_pipeline_spark.queries.base import ORACLE_FINITE, valid_embeddings
from iot_data_pipeline_spark.sources.readers import read_table
from iot_data_pipeline_spark.transient import transient_persist

N_MINHASH = 16
N_BANDS = 4  # 4 bands x 4 rows

#: Deterministic dup-augmented corpus. Exact copies for exact-dedup.
CORPUS_EXACT_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
"""

#: Near-dup corpus: every 10th doc re-inserted with its last 3 tokens dropped.
CORPUS_NEAR_CTE = """
corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  -- docs that would truncate to NOTHING produce no twin: DuckDB's
  -- array_to_string([]) is NULL while Spark's concat_ws is '', so an
  -- empty twin diverges between engines (adversarial short-doc fixture)
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(
           (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - 3, 0)],
           ' ') AS text,
         lang
  FROM documents
  WHERE doc_id % 10 = 0 AND len(string_split(text, ' ')) > 3
)
"""

#: 3-token shingles (distinct) per corpus doc -- DuckDB side.
SHINGLES_CTE = """
shingled AS (
  SELECT doc_id, lang, unnest(
    list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
      i -> string_split(text, ' ')[i] || ' ' ||
           string_split(text, ' ')[i+1] || ' ' ||
           string_split(text, ' ')[i+2])) AS shingle
  FROM corpus
),
shingles AS (SELECT DISTINCT doc_id, lang, shingle FROM shingled)
"""


def _corpus_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(dup)


def _corpus_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = F.split("text", " ")
    trunc = F.concat_ws(
        " ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(0)))
    )
    dup = docs.filter(
        (F.col("doc_id") % 10 == 0) & (F.size(toks) > 3)
    ).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        trunc.alias("text"),
        "lang",
    )
    return docs.unionByName(dup)


def _shingle_hashes(corpus: DataFrame, distinct: bool = True) -> DataFrame:
    """(doc_id, lang, h) with h = portable hash of each 3-token shingle.

    Two deliberate plan shapes:
    - ``split(text)`` is hoisted into its own projected column before the
      shingle lambda runs. Higher-order-function lambdas are interpreted
      (not codegen'd) and do NOT share subexpressions, so an inlined split
      re-tokenizes the document once per element_at -- measured 4x slower
      at sf0.1.
    - the hash is applied *before* any shuffle so downstream joins move
      8-byte ints, never shingle text -- at 100 TB the shuffle volume
      drops ~10x versus shuffling the strings.
    - ``distinct=True`` dedups with ``array_distinct`` INSIDE the row,
      before the explode: a (doc_id, h) duplicate can only come from the
      same document, so set semantics need no shuffle at all (a global
      ``.distinct()`` here measured ~2x the whole stage cost at sf0.1).
      ``distinct=False`` callers (MinHash) skip even that: min() is
      multiset-invariant.
    """
    toked = corpus.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    # explicit >= 3 guard: Spark's sequence(1, 0) AUTO-DESCENDS to
    # [1, 0], so the greatest() clamp alone still indexed past the array
    # on 1-2 token documents (empty-doc adversarial fixture; same fix as
    # operators/dedup.shingle_hashes)
    idx = F.when(
        F.size("toks") >= 3, F.sequence(F.lit(1), F.size("toks") - 2)
    ).otherwise(F.array().cast("array<int>"))
    shingle_list = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i),
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
        ),
    )
    hash_list = F.transform(shingle_list, portable_hash)
    if distinct:
        hash_list = F.array_distinct(hash_list)
    return toked.select("doc_id", "lang", F.explode(hash_list).alias("h"))


@declared(
    "q17b_token_counts",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counted AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
    SELECT token, n FROM (
      SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rn
      FROM counted
    ) WHERE rn <= 20 ORDER BY n DESC, token
    """,
)
def q17b_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by frequency (B47): split+explode+count, the word-count
    shape -- partial aggregation keeps the shuffle tiny at any scale."""
    docs = read_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # orderBy+limit plans as TakeOrderedAndProject: each partition keeps
    # its local top-20, the driver merges -- no global window, no sort.
    return counted.select("token", "n").orderBy(F.desc("n"), "token").limit(20)


@declared(
    "q22_exact_dedup",
    oracle=f"""
    WITH {CORPUS_EXACT_CTE.strip()}
    SELECT MIN(doc_id) AS rep_doc, COUNT(*) AS n_copies
    FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
    ORDER BY rep_doc
    """,
)
def q22_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash (B44): group on sha2(text) --
    at 100 TB you group on the 32-byte digest, never the document body,
    so the shuffle carries hashes instead of text. Output is hash-free
    (representative id + group size), so Spark's sha2 and the oracle's md5
    grouping agree."""
    corpus = _corpus_exact(spark, sf_dir)
    return (
        corpus.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.min("doc_id").alias("rep_doc"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("rep_doc", "n_copies")
        .orderBy("rep_doc")
    )


def _minhash_sig_sql() -> str:
    terms = ",\n           ".join(
        f"MIN(({37 + 61 * i} * h + {91 + 17 * i}) % {MOD}) AS sig_{i}"
        for i in range(N_MINHASH)
    )
    return terms


def _minhash_band_keys_sql() -> str:
    rows = []
    per_band = N_MINHASH // N_BANDS
    for b in range(N_BANDS):
        cols = ", ".join(f"sig_{b * per_band + j}" for j in range(per_band))
        rows.append(
            f"SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS key FROM sigs"
        )
    return "\n      UNION ALL\n      ".join(rows)


@declared(
    "q23_minhash_lsh",
    oracle=f"""
    WITH {CORPUS_NEAR_CTE.strip()},
    {SHINGLES_CTE.strip()},
    hashed AS (
      SELECT doc_id, {ORACLE_HASH.format("shingle")} AS h FROM shingles
    ),
    sigs AS (
      SELECT doc_id,
           {_minhash_sig_sql()}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {_minhash_band_keys_sql()}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                             AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def q23_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates (shingle -> 16 minhashes ->
    4 bands -> bucket self-join). The portable hash makes signatures
    bit-identical to the oracle.

    Scale shape: the only shuffles are the groupBy(doc_id) for signatures
    and the band-key self-join -- both linear in corpus size; no all-pairs
    comparison ever happens (that's the point of LSH at 100 TB). Shingles
    are hashed before the first shuffle and never deduplicated: MIN over a
    multiset equals MIN over its set, so the distinct pass the oracle runs
    for clarity is pure cost here.
    """
    hashed = _shingle_hashes(_corpus_near(spark, sf_dir), distinct=False).select(
        "doc_id", "h"
    )
    per_band = N_MINHASH // N_BANDS
    sigs = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(37 + 61 * i) * F.col("h") + F.lit(91 + 17 * i)) % MOD).alias(
                f"sig_{i}"
            )
            for i in range(N_MINHASH)
        ]
    )
    # One explode, not an N_BANDS-way union: a union would replicate the
    # signature aggregation subtree per band (and again per self-join side).
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",", *[f"sig_{b * per_band + j}" for j in range(per_band)]
                ).alias("key"),
            )
            for b in range(N_BANDS)
        ]
    )
    # Materialize band keys once: both self-join sides would otherwise
    # re-run shingling + the 64-minhash aggregation.
    bands = (
        sigs.select("doc_id", F.explode(band_structs).alias("bk"))
        .select("doc_id", "bk.band", "bk.key")
        .localCheckpoint(eager=True)
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


@declared(
    "q192_lsh_hot_bucket",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      UNION ALL
      -- the duplicate cluster: one document replicated 60x under
      -- synthetic ids -- the boilerplate-page shape that puts every
      -- copy in the SAME bucket of every band
      SELECT 200000 + r.range AS doc_id, d.text
      FROM documents d, range(60) r WHERE d.doc_id = 0
    ),
    shingled AS (
      SELECT doc_id, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
          i -> string_split(text, ' ')[i] || ' ' ||
               string_split(text, ' ')[i+1] || ' ' ||
               string_split(text, ' ')[i+2])) AS shingle
      FROM corpus
    ),
    hashed AS (
      SELECT doc_id, {ORACLE_HASH.format("shingle")} AS h FROM shingled
    ),
    sigs AS (
      SELECT doc_id,
           {_minhash_sig_sql()}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {_minhash_band_keys_sql()}
    ),
    stats AS (
      SELECT band, key, COUNT(*) AS n, MIN(doc_id) AS hub
      FROM bands GROUP BY band, key
    ),
    small AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id
      JOIN stats s ON s.band = a.band AND s.key = a.key
      WHERE s.n <= 8
    ),
    star AS (
      SELECT s.hub AS doc_a, b.doc_id AS doc_b
      FROM bands b JOIN stats s ON s.band = b.band AND s.key = b.key
      WHERE s.n > 8 AND b.doc_id <> s.hub
    )
    SELECT DISTINCT doc_a, doc_b
    FROM (SELECT doc_a, doc_b FROM small
          UNION ALL
          SELECT doc_a, doc_b FROM star)
    ORDER BY doc_a, doc_b
    """,
)
def q192_lsh_hot_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-dup candidates under a duplicate-cluster hot bucket, the
    capped scale path (B45 gate; operators/dedup.lsh_candidate_pairs
    max_bucket). The corpus is documents plus one document replicated
    60x -- identical signatures, so all 61 copies land in the SAME
    bucket of every band. Uncapped pairing would emit C(61,2) = 1,830
    pairs per band from that cluster alone (and ~5e13 for the 10M-copy
    page a 100 TB lake actually serves); the cap (8) replaces each
    oversized bucket's quadratic enumeration with O(m) star pairs to
    the bucket's min id. Buckets at or under the cap keep q23's
    exhaustive pairing bit-identically -- the oracle replays BOTH
    regimes plus the boundary between them, so a cap off by one, a hub
    that isn't the min id, or a star pair leaking from a small bucket
    all fail the hash.

    Scale notes: the cap's cost is one partial-merged count+min
    aggregation per (band, key); star output is linear in cluster size;
    connected components downstream are unchanged (every member reaches
    the hub). Measured against the uncapped blowup in
    tools/skew_sweep.py / SCALE.md section 7d.
    """
    from iot_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_hashes,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
    )
    cluster = (
        docs.filter(F.col("doc_id") == 0)
        .crossJoin(spark.range(60).select(F.col("id").alias("i")))
        .select((F.lit(200000) + F.col("i")).alias("doc_id"), "text")
    )
    corpus = docs.unionByName(cluster)
    sigs = minhash_signatures(
        shingle_hashes(corpus, "text", "doc_id"), N_MINHASH
    )
    return (
        lsh_candidate_pairs(sigs, N_BANDS, max_bucket=8)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        .orderBy("doc_a", "doc_b")
    )


def _simhash_bits_sql(hcol: str) -> str:
    terms = [
        f"SUM(CASE WHEN ({hcol} >> {j}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" AS bit_{j}" for j in range(30)
    ]
    return ",\n             ".join(terms)


@declared(
    "q24_simhash_pairs",
    oracle=f"""
    WITH {CORPUS_NEAR_CTE.strip()},
    tok AS (
      SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM corpus
    ),
    hashed AS (
      SELECT doc_id, lang, {ORACLE_HASH.format("token")} AS h FROM tok
    ),
    bits AS (
      SELECT doc_id, lang,
             {_simhash_bits_sql("h")}
      FROM hashed GROUP BY doc_id, lang
    ),
    fp AS (
      SELECT doc_id, lang,
             {" + ".join(f"(CASE WHEN bit_{j} > 0 THEN 1::BIGINT ELSE 0 END << {j})" for j in range(30))}
             AS simhash
      FROM bits
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
    ORDER BY doc_a, doc_b
    """,
)
def q24_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 30-bit simhash over distinct tokens, pairs
    within the same lang block at Hamming distance <= 1.

    Candidate generation is the per-lang-block pair join. An exact
    prefix-band LSH variant (5 bands of 6 bits; pigeonhole guarantees a
    full-band match at small distances) was measured and *rejected for
    this corpus*: the synthetic docs share a 31-token vocabulary, so
    fingerprints collide heavily (a <= 4 threshold qualifies ~1.5M pairs
    at sf0.1 -- hence the tight <= 1 here) and the biased simhash bits put
    most docs in one band bucket, making banding pure overhead. At 100 TB with realistic
    (sparse) fingerprints, banding is the right shape -- it is exactly the
    q23 MinHash-LSH band join with (simhash >> 6k) & 63 as the band key.
    """
    corpus = _corpus_near(spark, sf_dir)
    tok = corpus.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    hashed = tok.select("doc_id", "lang", portable_hash(F.col("token")).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1 = 1"), 1).otherwise(-1)
        ).alias(f"bit_{j}")
        for j in range(30)
    ]
    bits = hashed.groupBy("doc_id", "lang").agg(*bit_sums)
    fp_expr = " + ".join(
        f"(CASE WHEN bit_{j} > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {j})"
        for j in range(30)
    )
    # Materialize fingerprints once: both self-join sides would otherwise
    # re-run the tokenize + 30-bit-sum pipeline.
    fp = bits.select(
        "doc_id", "lang", F.expr(fp_expr).alias("simhash")
    ).localCheckpoint(eager=True)
    a = fp.alias("a")
    b = fp.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .orderBy("doc_a", "doc_b")
    )


@declared(
    "q25_ngram_jaccard",
    oracle=f"""
    WITH {CORPUS_NEAR_CTE.strip()},
    shingled AS (
      SELECT doc_id, lang, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
          i -> string_split(text, ' ')[i] || ' ' ||
               string_split(text, ' ')[i+1] || ' ' ||
               string_split(text, ' ')[i+2])) AS shingle
      FROM corpus
    ),
    shashes AS (
      SELECT DISTINCT doc_id, lang, {ORACLE_HASH.format("shingle")} AS h
      FROM shingled
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shashes GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM shashes a JOIN shashes b
        ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def q25_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard similarity >= 0.5 within lang blocks (B45): the
    self-join runs over 60-bit shingle *hashes*, not shingle text -- same
    semantics in both engines, ~10x less shuffle volume, and the scale-
    correct design (at 100 TB the intersection join moves fixed-width ints).
    """
    # Materialize the shingle hashes once: three consumers below (both
    # self-join sides + the size agg) would otherwise re-run the whole
    # shingling pipeline each.
    shingles = _shingle_hashes(
        _corpus_near(spark, sf_dir), distinct=True
    ).localCheckpoint(eager=True)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.round(
        F.col("n_inter").cast("double")
        / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")),
        4,
    )
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


#: Session-scoped cache of the q25 near-dup pair graph: q52 (clusters) and
#: q123 (leakage-safe split) both consume it; recomputing the shingle
#: pipeline per consumer doubled their cost. Keyed by (session id, sf_dir);
#: the value is a localCheckpointed frame, so the cached plan is a scan of
#: materialized blocks, not a replay of the shingle join.
_PAIR_CACHE: dict = {}


def _ngram_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed by (applicationId, startTime): id(spark) is reused by CPython
    # after GC, so a new session could collide with a stale entry holding a
    # checkpointed frame from a stopped SparkContext.
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf_dir)
    cached = _PAIR_CACHE.get(key)
    if cached is None or cached[0]._jsc.sc().isStopped():
        _PAIR_CACHE.clear()  # stale contexts can never be read again
        _PAIR_CACHE[key] = (
            sc,
            q25_ngram_jaccard(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True),
        )
    return _PAIR_CACHE[key][1]


@declared(
    "q26_embedding_neardup",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.35
    ORDER BY vec_a, vec_b
    """,
)
def q26_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (B45/B46):
    the label is the blocking key -- one shuffle on it, then one numpy
    Gram matrix per block in ``applyInPandas`` (at 100 TB, block = LSH
    bucket or IVF cell, not a semantic label; parallelism = blocks).
    Replaced the per-pair zip_with/aggregate fold: same ROUND(4) results,
    ~10x less per-pair cost (see neardup_pairs_pandas)."""
    from iot_data_pipeline_spark.operators.similarity import neardup_pairs_pandas

    emb = valid_embeddings(spark, sf_dir)
    return neardup_pairs_pandas(
        emb, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.35
    ).orderBy("vec_a", "vec_b")


#: tiny deterministic lexicons over the corpus vocabulary -- the *plumbing*
#: of n-gram language-ID (real lexicons would be table-backed the same way).
LEXICON = [
    ("table", "en"), ("row", "en"), ("value", "en"), ("query", "en"),
    ("scan", "de"), ("fast", "de"), ("slow", "de"), ("merge", "de"),
    ("join", "fr"), ("hash", "fr"), ("part", "fr"), ("line", "fr"),
    ("window", "es"), ("batch", "es"), ("order", "es"), ("column", "es"),
]

_LEX_VALUES = ", ".join(f"('{t}', '{lg}')" for t, lg in LEXICON)


@declared(
    "q27_langid",
    oracle=f"""
    WITH lex(token, cand_lang) AS (VALUES {_LEX_VALUES}),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    votes AS (
      SELECT doc_id, cand_lang, COUNT(*) AS n_hits
      FROM tok JOIN lex USING (token)
      GROUP BY doc_id, cand_lang
    )
    SELECT doc_id, cand_lang AS pred_lang, n_hits FROM (
      SELECT doc_id, cand_lang, n_hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY n_hits DESC, cand_lang) AS rn
      FROM votes
    ) WHERE rn = 1 ORDER BY doc_id
    """,
)
def q27_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-vote language ID (text-analysis op): majority vote per doc
    with deterministic tie-break. The lexicon is compiled into a literal
    MAP expression, so the lookup is a codegen'd hash probe inside the scan
    stage -- no join, no shuffle of the corpus, no broadcast wait. (A
    table-backed lexicon would use a broadcast join; below ~1k entries the
    literal map wins and keeps the stage fully fused.)"""
    docs = read_table(spark, sf_dir, "documents")
    lex_map = F.create_map(
        *[F.lit(x) for pair in LEXICON for x in pair]
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    votes = (
        tok.select("doc_id", F.element_at(lex_map, F.col("token")).alias("cand_lang"))
        .filter(F.col("cand_lang").isNotNull())
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), "cand_lang")
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "n_hits")
        .orderBy("doc_id")
    )


@declared(
    "q28_quality_score",
    oracle="""
    WITH stats AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS ttr,
           ROUND(CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens, 4)
             AS avg_token_len,
           ROUND(0.5 * (CAST(n_distinct AS DOUBLE) / n_tokens)
                 + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100, 1.0)
                 + 0.2 * least((CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens) / 8, 1.0),
                 4) AS quality
    FROM stats ORDER BY doc_id
    """,
)
def q28_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (text-analysis op): type-token ratio,
    average token length, length saturation -- one weighted score, pure
    column arithmetic (per-row, embarrassingly parallel at any scale)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length("text")
    ttr = n_distinct.cast("double") / n_tokens
    avg_len = (n_chars - n_tokens + 1).cast("double") / n_tokens
    quality = (
        0.5 * ttr
        + 0.3 * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
        + 0.2 * F.least(avg_len / 8, F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(ttr, 4).alias("ttr"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(quality, 4).alias("quality"),
    ).orderBy("doc_id")


@declared(
    "q29_doc_fingerprint",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> {ORACLE_HASH.format("t")})) AS hs
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           list_reduce(hs, (acc, x) -> (acc * 31 + x) % 1000000007)
             AS fingerprint
    FROM hashed ORDER BY doc_id
    """,
)
def q29_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint (text-analysis op): polynomial
    rolling hash over token hashes, folded sequentially -- the same int64
    arithmetic in both engines (mod keeps every intermediate < 2^35, ANSI
    overflow-safe).

    NULL documents are excluded on both sides: a fingerprint of nothing
    is meaningless, and a NULL in the output bigint would flip the whole
    pandas-fetched column to float64 on compare (round-7 NULL fixture)."""
    docs = _spread_rows(read_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    token_hashes = F.transform(F.split("text", " "), lambda t: portable_hash(t))
    fingerprint = F.aggregate(
        token_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % MOD,
    )
    return docs.select("doc_id", fingerprint.alias("fingerprint")).orderBy("doc_id")


@declared(
    "q30_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           substr(sha256(text), 1, 16) AS digest16,
           CAST(octet_length(encode(text)) // 1024 + 1 AS BIGINT) AS n_chunks
    FROM documents ORDER BY doc_id
    """,
)
def q30_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing (B48): treat content as an opaque binary
    payload with typed metadata (byte length, digest, chunk count). The
    decode/feature-extract stage lives in operators.multimodal (stubbed --
    no codecs in this container); this query proves the binary schema,
    hashing, and chunk accounting survive Spark<->oracle round trips."""
    docs = read_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.substring(F.sha2(payload, 256), 1, 16).alias("digest16"),
        (F.floor(F.octet_length(payload) / 1024) + 1)
        .cast("long")
        .alias("n_chunks"),
    ).orderBy("doc_id")


@declared(
    "q31_ann_ivf",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
             (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS cell
      FROM embeddings
    ),
    queries AS (SELECT * FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 4) AS sim
      FROM queries q JOIN e c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    )
    SELECT query_id, vec_id, sim FROM (
      SELECT query_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= 3 ORDER BY query_id, rn
    """,
)
def q31_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (the scale path next to q12's brute force): vectors are
    assigned to one of 8 cells by sign-quantizing the first 3 components
    (a stand-in for trained centroids); each query probes only its own cell.
    The join is equi on cell -- a hash shuffle, not a cross join; recall is
    traded for a ~8x candidate reduction, the IVF contract."""
    emb = valid_embeddings(spark, sf_dir)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
    )
    cell = (
        F.when(F.element_at("embedding", 1) > 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 2) > 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 3) > 0, 1).otherwise(0)
    )
    e = emb.select(
        "vec_id",
        as_double.alias("emb"),
        F.sqrt(dot(as_double, as_double)).alias("nrm"),
        cell.alias("cell"),
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    sim = F.round(
        dot(F.col("qemb"), F.col("emb")) / (F.col("qnrm") * F.col("nrm")), 4
    )
    scored = (
        e.join(F.broadcast(q), (F.col("qcell") == F.col("cell")))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "vec_id", "sim")
        .orderBy("query_id", F.desc("sim"), "vec_id")
    )


@declared(
    "q40_curation_pipeline",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text, lang
      FROM documents WHERE doc_id % 10 = 0
    ),
    scored AS (
      SELECT doc_id, text, lang,
             0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' ')))
             + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100, 1.0)
             + 0.2 * least((CAST(length(text) - len(string_split(text, ' ')) + 1
                            AS DOUBLE) / len(string_split(text, ' '))) / 8, 1.0)
               AS quality
      FROM corpus
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.51),
    dedup AS (
      SELECT MIN(doc_id) AS rep_doc, COUNT(*) AS n_copies,
             MIN(lang) AS lang, MIN(quality) AS quality
      FROM kept GROUP BY md5(text)
    )
    SELECT lang, COUNT(*) AS n_unique_docs,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_dups_removed,
           ROUND(AVG(quality), 4) AS avg_quality
    FROM dedup GROUP BY lang ORDER BY lang
    """,
)
def q40_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE declarative plan (the
    training-data headline): score quality (q28's formula) -> threshold
    filter -> exact dedup on content hash keeping the lowest doc_id ->
    per-language yield report. Composition stays a single Catalyst plan:
    scoring is per-row codegen over the scan, the filter prunes before
    the only wide stages (dedup groupBy on the 32-byte digest, then the
    tiny per-lang rollup) -- at 100 TB the heavy shuffle moves only
    hash + lang + quality, never document text."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
        )
    )
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    avg_len = (F.length("text") - n_tokens + 1).cast("double") / n_tokens
    quality = (
        0.5 * (n_distinct.cast("double") / n_tokens)
        + 0.3 * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
        + 0.2 * F.least(avg_len / 8, F.lit(1.0))
    )
    kept = corpus.withColumn("quality", quality).filter(F.col("quality") >= 0.51)
    dedup = kept.groupBy(F.sha2(F.col("text"), 256)).agg(
        F.min("doc_id").alias("rep_doc"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("lang").alias("lang"),
        F.min("quality").alias("quality"),
    )
    return (
        dedup.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_unique_docs"),
            F.sum(F.col("n_copies") - 1).alias("n_dups_removed"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@declared(
    "q52_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {CORPUS_NEAR_CTE.strip()},
    shingled AS (
      SELECT doc_id, lang, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
          i -> string_split(text, ' ')[i] || ' ' ||
               string_split(text, ' ')[i+1] || ' ' ||
               string_split(text, ' ')[i+2])) AS shingle
      FROM corpus
    ),
    shashes AS (
      SELECT DISTINCT doc_id, lang, {ORACLE_HASH.format("shingle")} AS h
      FROM shingled
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shashes GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM shashes a JOIN shashes b
        ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4)
            >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
    SELECT component, COUNT(*) AS cluster_size,
           MAX(node) AS max_doc_id
    FROM comp GROUP BY component ORDER BY component
    """,
)
def q52_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: transitive closure of the q25 n-gram
    Jaccard matches via distributed connected components (operators/
    graph.py). The DuckDB oracle computes the same closure with WITH
    RECURSIVE -- Spark has no recursive SQL, so the engine's iterative
    min-label propagation (one shuffle per round, O(diameter) rounds) is
    checked against a genuinely different algorithm, not a mirror of
    itself.

    Scale plan: rounds operate on the (node, label) frame -- fixed-width
    ints, never document text; localCheckpoint caps lineage so round N's
    plan does not replay rounds 1..N-1. Cluster pick: keep-min-id is the
    standard canonical-representative rule for dedup.
    """
    from iot_data_pipeline_spark.operators.graph import connected_components

    pairs = _ngram_pairs_cached(spark, sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max("node").alias("max_doc_id"),
        )
        .orderBy("component")
    )


def _q54_oracle() -> str:
    """8 portable-hash-seeded hyperplanes; bit b set when the dot product
    with hyperplane b is >= 0. Weight arrays are derived from the portable
    hash (functions/hashing.py) IN SQL on both engines, so no literal
    tables need shipping."""
    h = ORACLE_HASH.format("'lsh:{b}:' || CAST(i AS VARCHAR)")
    bit = (
        "CASE WHEN list_dot_product(embedding::DOUBLE[], "
        "list_transform(range(1, 65), i -> "
        f"CAST({h} % 21 - 10 AS DOUBLE))) >= 0 "
        "THEN {p} ELSE 0 END"
    )
    bits = " + ".join(bit.format(b=b, p=1 << b) for b in range(8))
    return f"""
    WITH bucketed AS (
      -- the 8x64 hyperplane table fixes this query's dimension contract:
      -- vectors of any other length are out of scope (a shorter one
      -- would crash the numpy kernel and silently NULL-pad in SQL)
      SELECT vec_id, label, ({bits}) AS bucket FROM embeddings
      WHERE len(embedding) = 64
    )
    SELECT bucket, COUNT(*) AS n_vecs,
           COUNT(DISTINCT label) AS n_labels,
           MIN(vec_id) AS min_vec_id
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """


@declared("q54_lsh_buckets", oracle=_q54_oracle())
def q54_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (sign) LSH bucketing for cosine ANN -- the scale
    path beside q12's brute force and q31's IVF cells: at 100 TB,
    candidate generation is an equi-join on ``bucket`` (hash shuffle over
    an 8-bit key), never a cross join. Hyperplane weights are
    pseudo-random integers in [-10, 10] derived from the portable hash,
    so the DuckDB oracle reproduces every signature bit-for-bit; the
    Arrow-batched numpy kernel accumulates each dot product as a strict
    left fold, IEEE-identical to DuckDB's list_dot_product (both
    sequential -- proven by q12/q31).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # dimension contract: the hyperplane table is 8x64, so only 64-dim
    # vectors are in scope (mirrored by the oracle's len() filter)
    emb = valid_embeddings(spark, sf_dir).filter(F.size("embedding") == 64)

    # Same H(s) % 21 - 10 the oracle computes in SQL, evaluated ONCE
    # driver-side (hashlib md5 == md5() in both engines): an (8, 64)
    # integer weight matrix closed over by the UDF.
    w = np.array(
        [
            [
                float(
                    int(hashlib.md5(f"lsh:{b}:{i}".encode()).hexdigest()[:15], 16)
                    % MOD
                    % 21
                    - 10
                )
                for i in range(1, 65)
            ]
            for b in range(8)
        ]
    )

    @pandas_udf("int")
    def lsh_bucket(embs):
        # Strict LEFT-FOLD accumulation, vectorized ACROSS rows: each
        # step is acc = acc + x_i * w_i in float64, the identical
        # operation order to both the fold-based column expression this
        # replaces and DuckDB's list_dot_product -- bit-parity preserved
        # while dropping the 8x64 interpreted HOF lambda evals per row
        # (~7s -> ~0.2s at sf0.1).
        mat = np.stack(embs.to_numpy()).astype(np.float64)  # (n, 64)
        buckets = np.zeros(len(mat), dtype=np.int64)
        for b in range(8):
            acc = np.zeros(len(mat))
            for i in range(64):
                acc = acc + mat[:, i] * w[b, i]
            buckets |= (acc >= 0).astype(np.int64) << b
        return pd.Series(buckets.astype(np.int32))

    return (
        emb.select("vec_id", "label", lsh_bucket("embedding").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.countDistinct("label").alias("n_labels"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("bucket")
    )


@declared(
    "q71_fuzzy_match",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS noun
      FROM part
    )
    SELECT a.noun, a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY a.noun, name_a, name_b
    """,
)
def q71_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy string matching (entity-resolution flavor of near-
    dedup): candidate pairs come from an EQUI-join on a blocking key
    (the name's final token), and edit distance only runs inside
    blocks. That ordering -- block first, distance second -- is what
    makes fuzzy joins feasible at scale: the all-pairs levenshtein
    cross join never exists in the plan. Distinct-ing names first
    collapses the distance computation to unique value pairs.
    """
    names = (
        read_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= 4)
        .select(
            F.col("a.noun").alias("noun"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
        )
        .orderBy("noun", "name_a", "name_b")
    )


@declared(
    "q97_embedding_standardize",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             unnest(embedding) AS x,
             unnest(range(len(embedding))) AS pos
      FROM embeddings
    ),
    stats AS (
      SELECT pos, AVG(x) AS mu, STDDEV_SAMP(x) AS sd
      FROM e GROUP BY pos
    )
    SELECT e.vec_id,
           ROUND(SUM((e.x - s.mu) / s.sd), 4) AS z_sum,
           ROUND(MAX(ABS((e.x - s.mu) / s.sd)), 4) AS z_max_abs
    FROM e JOIN stats s ON e.pos = s.pos
    GROUP BY e.vec_id
    ORDER BY e.vec_id
    """,
)
def q97_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding space (the
    preprocessing step before distance-based ANN when dimensions have
    unequal scales), checked through per-vector fold statistics.

    Scale plan: posexplode to (vec, pos, x) -- 64x row fan-out of
    fixed-width values, cheaper than shuffling arrays; the 64-row stats
    table broadcasts back; both aggregations are partial-agg friendly.
    The casts to double happen before any arithmetic so both engines
    fold identical float64 values.
    """
    emb = valid_embeddings(spark, sf_dir)
    e = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).withColumnRenamed("col", "x").withColumnRenamed("pos", "pos")
    stats = e.groupBy("pos").agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd")
    )
    z = (F.col("x") - F.col("mu")) / F.col("sd")
    return (
        e.join(F.broadcast(stats), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(F.sum(z), 4).alias("z_sum"),
            F.round(F.max(F.abs(z)), 4).alias("z_max_abs"),
        )
        .orderBy("vec_id")
    )


@declared(
    "q98_winsorized_values",
    oracle=f"""
    WITH fin AS (
      SELECT * REPLACE ({ORACLE_FINITE.format('value')}
                        AS value) FROM events
    ),
    bounds AS (
      SELECT quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      FROM fin
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           ROUND(AVG(LEAST(GREATEST(e.value, b.lo), b.hi)), 2) AS avg_clipped,
           ROUND(MIN(LEAST(GREATEST(e.value, b.lo), b.hi)), 2) AS min_clipped,
           ROUND(MAX(LEAST(GREATEST(e.value, b.lo), b.hi)), 2) AS max_clipped,
           COUNT(*) FILTER (WHERE e.value < b.lo OR e.value > b.hi) AS n_clipped
    FROM fin e CROSS JOIN bounds b
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def q98_winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip to exact p05/p95): the outlier-taming curation
    step applied before training-statistics computation. Exact
    percentiles keep the oracle deterministic (SURVEY.md section 2.3
    excludes approximate aggregates); the bounds are a one-row broadcast
    so clipping is a row-local projection. Non-finite readings are
    invalid measurements -- NULL through bounds and clipping on both
    sides (base.finite_or_null; round-7 NaN fixture).
    """
    from iot_data_pipeline_spark.queries.base import finite_or_null

    ev = read_table(spark, sf_dir, "events").withColumn(
        "value", finite_or_null(F.col("value"))
    )
    bounds = ev.agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(clipped), 2).alias("avg_clipped"),
            F.round(F.min(clipped), 2).alias("min_clipped"),
            F.round(F.max(clipped), 2).alias("max_clipped"),
            F.count_if(
                (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
            ).alias("n_clipped"),
        )
        .orderBy("event_type")
    )


@declared(
    "q100_crossmodal_neardup",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.35
    ),
    shingled AS (
      SELECT doc_id, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
          i -> string_split(text, ' ')[i] || ' ' ||
               string_split(text, ' ')[i+1] || ' ' ||
               string_split(text, ' ')[i+2])) AS shingle
      FROM documents
    ),
    shashes AS (
      SELECT DISTINCT doc_id, {ORACLE_HASH.format("shingle")} AS h FROM shingled
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shashes GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM shashes a JOIN shashes b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.vec_a, c.vec_b, c.sim,
           ROUND(CAST(i.n_inter AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - i.n_inter), 4) AS jaccard,
           COALESCE(ROUND(CAST(i.n_inter AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - i.n_inter), 4) >= 0.5, FALSE)
             AS text_agrees
    FROM cand c
    LEFT JOIN inter i ON i.doc_a = c.vec_a AND i.doc_b = c.vec_b
    LEFT JOIN sizes sa ON sa.doc_id = c.vec_a
    LEFT JOIN sizes sb ON sb.doc_id = c.vec_b
    ORDER BY vec_a, vec_b
    """,
)
def q100_crossmodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal ensemble dedup: embedding-cosine candidate pairs
    (q26's blocked numpy kernel) verified against the 3-gram text Jaccard
    of the SAME pair -- documents and embeddings share the 0..N id space.
    This is the production curation ensemble: the cheap modality proposes,
    the second modality confirms, and disagreement (text_agrees = false)
    is the review queue.

    Scale plan: candidates drive the text pass. The shingle table is
    semi-joined down to candidate ids BEFORE the intersection self-join,
    so the quadratic text compare touches only proposed pairs' documents,
    never the corpus; candidate pairs and shingle hashes are materialized
    once each (multiple consumers below).
    """
    from iot_data_pipeline_spark.operators.similarity import neardup_pairs_pandas

    emb = valid_embeddings(spark, sf_dir)
    cand = neardup_pairs_pandas(
        emb, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.35
    ).localCheckpoint(eager=True)  # feeds the id semi-join AND the final join

    ids = (
        cand.select(F.explode(F.array("vec_a", "vec_b")).alias("doc_id"))
        .distinct()
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    sh = _shingle_hashes(
        docs.join(F.broadcast(ids), "doc_id", "left_semi"), distinct=True
    ).localCheckpoint(eager=True)  # both self-join sides + the size agg

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.round(
        F.col("n_inter").cast("double")
        / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")),
        4,
    )
    return (
        cand.join(
            inter,
            (F.col("doc_a") == F.col("vec_a")) & (F.col("doc_b") == F.col("vec_b")),
            "left",
        )
        .join(sa, F.col("sa.doc_id") == F.col("vec_a"), "left")
        .join(sb, F.col("sb.doc_id") == F.col("vec_b"), "left")
        .select(
            "vec_a",
            "vec_b",
            "sim",
            jac.alias("jaccard"),
            F.coalesce(jac >= 0.5, F.lit(False)).alias("text_agrees"),
        )
        .orderBy("vec_a", "vec_b")
    )


@declared(
    "q109_decontamination",
    oracle=f"""
    WITH grammed AS (
      SELECT doc_id, source, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 6, 1)),
          i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS gram
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, source, {ORACLE_HASH.format('gram')} AS gram_h FROM grammed
    ),
    eval_grams AS (
      SELECT DISTINCT gram_h FROM hashed WHERE source = 'src0'
    ),
    train_grams AS (
      SELECT DISTINCT doc_id, gram_h FROM hashed WHERE source <> 'src0'
    )
    SELECT t.doc_id, COUNT(*) AS n_hits
    FROM train_grams t
    WHERE EXISTS (SELECT 1 FROM eval_grams e WHERE e.gram_h = t.gram_h)
    GROUP BY t.doc_id
    ORDER BY n_hits DESC, t.doc_id
    LIMIT 50
    """,
)
def q109_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination scan (north-star text-analysis surface):
    flag training documents sharing any 8-token n-gram with a held-out
    eval slice (source='src0'), ranked by distinct overlapping grams --
    the standard contamination check run before LLM pretraining.

    Scale shape: both sides reduce each gram to the 8-byte portable hash
    *before* the distinct/shuffle (8 tokens of text never leave the map
    side; the tiny-vocabulary corpus would skew raw-gram keys, the hash
    spreads them); the eval slice is orders of magnitude smaller than the
    training corpus, so the semi join broadcasts it at any realistic eval
    size. The training side pays one shuffle total (the per-doc distinct);
    the final count groups an already-small hit set. Hash collisions
    (~2^30 space) are deterministic and identical in both engines."""
    # spread before the 8-gram explode (round-15): the one-task scan
    # serialized the gram build + hash on a single core -- measured
    # 2.8s -> 1.0s, results identical (same rationale as _shingle_hashes)
    docs = _spread_rows(read_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")

    def grams(df: DataFrame, keep_doc: bool) -> DataFrame:
        n = F.size(toks)
        idx = F.when(n >= 8, F.sequence(F.lit(0), n - 8)).otherwise(
            F.array().cast("array<int>")
        )
        g = df.select(
            "doc_id",
            F.explode(
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 8)))
            ).alias("gram"),
        ).select("doc_id", portable_hash(F.col("gram")).alias("gram_h"))
        cols = ["doc_id", "gram_h"] if keep_doc else ["gram_h"]
        return g.select(*cols).distinct()

    eval_g = grams(docs.filter(F.col("source") == "src0"), keep_doc=False)
    train_g = grams(docs.filter(F.col("source") != "src0"), keep_doc=True)
    return (
        train_g.join(F.broadcast(eval_g), "gram_h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.desc("n_hits"), "doc_id")
        .limit(50)
    )


@declared(
    "q110_length_trim",
    oracle="""
    WITH bounds AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents GROUP BY lang
    )
    SELECT d.lang,
           COUNT(*) AS n_kept,
           ROUND(AVG(d.n_chars), 2) AS avg_chars,
           CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(d.n_chars) AS BIGINT) AS max_chars
    FROM documents d JOIN bounds b ON b.lang = d.lang
    WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def q110_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-percentile trim (corpus curation): drop each
    language's shortest/longest 5% by exact p05/p95 of n_chars, report
    surviving count and length stats -- relative (per-group) quality
    filtering, the complement of q28's absolute scoring.

    The bounds frame is one row per language -- broadcast; the corpus is
    scanned twice (once for quantiles, once for the trim) but the first
    pass reduces map-side to one t-digest-free exact percentile per
    (partition, lang) via Spark's percentile agg, so the extra pass is
    scan-bound, not shuffle-bound. At 100 TB the bounds pass reads only
    (lang, n_chars) -- column pruning keeps it off the text bytes."""
    docs = read_table(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@declared(
    "q112_kmeans_clusters",
    oracle="""
    WITH vecs AS (
      SELECT vec_id,
             CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent0 AS (
      SELECT vec_id AS cluster, pos, x AS c FROM vecs WHERE vec_id < 4
    ),
    dist1 AS (
      SELECT v.vec_id, c.cluster,
             SUM(CAST((v.x - c.c) * (v.x - c.c) AS DECIMAL(28,12))) AS d2
      FROM vecs v JOIN cent0 c ON c.pos = v.pos
      GROUP BY v.vec_id, c.cluster
    ),
    assign1 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM dist1) t WHERE rn = 1
    ),
    cent1 AS (
      SELECT a.cluster, v.pos,
             CAST(SUM(CAST(v.x AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*) AS c
      FROM assign1 a JOIN vecs v ON v.vec_id = a.vec_id
      GROUP BY a.cluster, v.pos
    ),
    dist2 AS (
      SELECT v.vec_id, c.cluster,
             SUM(CAST((v.x - c.c) * (v.x - c.c) AS DECIMAL(28,12))) AS d2
      FROM vecs v JOIN cent1 c ON c.pos = v.pos
      GROUP BY v.vec_id, c.cluster
    ),
    assign2 AS (
      SELECT vec_id, cluster, d2 FROM (
        SELECT vec_id, cluster, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM dist2) t WHERE rn = 1
    )
    SELECT cluster, COUNT(*) AS n_members,
           ROUND(CAST(SUM(d2) AS DOUBLE), 2) AS wcss
    FROM assign2
    GROUP BY cluster
    ORDER BY cluster
    """,
)
def q112_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topical clustering of the embedding corpus: two unrolled Lloyd
    (k-means) iterations, k=4, seeded deterministically with the four
    lowest vec_ids -- the curation step that groups a corpus into topic
    buckets for mixture re-weighting (the clustering complement of q31's
    fixed IVF cells).

    Cross-engine determinism without seeds or float luck: squared
    per-dimension residuals are single IEEE ops on identical operands,
    then cast to DECIMAL before the sum -- so distances are
    order-independent and argmin (ROW_NUMBER over (d2, cluster)) is
    exact; centroid updates divide an exact DECIMAL component sum by the
    member count in one double division. Scale shape: vectors live as
    (vec_id, pos, x) rows, centroids are k x 64 rows broadcast to the
    residual join; each iteration is one shuffle (the per-vec_id
    distance aggregate) -- the classic distributed k-means layout, with
    the iteration count fixed so the plan is static. The exploded vector
    frame and the iteration-1 centroid frame are materialized
    (localCheckpoint) so iteration 2's broadcast does not re-run
    iteration 1's whole lineage -- without this the plan doubles per
    round, the classic iterative-algorithm trap."""
    emb = valid_embeddings(spark, sf_dir)
    vecs = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    ).localCheckpoint(eager=True)
    cent = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cluster"), "pos", F.col("x").alias("c")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    assign = None
    for it in range(2):
        dist = (
            vecs.join(F.broadcast(cent), "pos")
            .withColumn(
                "sq",
                ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast(
                    "decimal(28,12)"
                ),
            )
            .groupBy("vec_id", "cluster")
            .agg(F.sum("sq").alias("d2"))
        )
        assign = dist.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        if it == 0:
            cent = (
                assign.select("vec_id", "cluster")
                .join(vecs, "vec_id")
                .groupBy("cluster", "pos")
                .agg(
                    (
                        F.sum(F.col("x").cast("decimal(20,8)")).cast("double")
                        / F.count(F.lit(1))
                    ).alias("c")
                )
                .localCheckpoint(eager=True)
            )
    return (
        assign.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum("d2").cast("double"), 2).alias("wcss"),
        )
        .orderBy("cluster")
    )


@declared(
    "q113_png_decode",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             (299 * ((doc_id * 7) % 256)
              + 587 * ((doc_id * 13) % 256)
              + 114 * ((doc_id * 29) % 256)) // 1000 AS luma
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           ROUND(luma / 255.0, 4) AS mean_luma,
           CAST(4 AS INTEGER) AS n_feats
    FROM px ORDER BY doc_id
    """,
)
def q113_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode in the oracle gate (B48): per row, a solid-color
    RGB PNG is synthesized worker-side (vendored stdlib encoder,
    operators/png.py), shipped through the binary media column, and decoded
    back to pixel luma features by ``extract_features(mode='strict')`` --
    zlib inflate, scanline unfilter, Rec.601 luma, spatial grid. A
    solid-color image makes every grid cell equal its known luma, so the
    DuckDB oracle can state the expected features in closed form.

    Scale notes: both synth and decode kernels are mapInPandas over Arrow
    batches (no row-at-a-time pickling); payload bytes never leave the
    executor. This is exactly the shape a JPEG/ffmpeg kernel drops into on
    a real cluster -- only the codec call changes.
    """
    from iot_data_pipeline_spark.operators.multimodal import extract_features

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import png as _png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rgb = bytes([(i * 7) % 256, (i * 13) % 256, (i * 29) % 256])
                blobs.append(_png.encode_png(6, 5, 3, rgb * (6 * 5)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth, schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        )
    )
    feats = extract_features(media, dim=4, mode="strict")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.round(
            F.aggregate(
                F.col("features"),
                F.lit(0.0),
                lambda s, x: s + x.cast("double"),
            )
            / F.size("features"),
            4,
        ).alias("mean_luma"),
        F.size("features").alias("n_feats"),
    ).orderBy("doc_id")


@declared(
    "q123_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {CORPUS_NEAR_CTE.strip()},
    shingled AS (
      SELECT doc_id, lang, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
          i -> string_split(text, ' ')[i] || ' ' ||
               string_split(text, ' ')[i+1] || ' ' ||
               string_split(text, ' ')[i+2])) AS shingle
      FROM corpus
    ),
    shashes AS (
      SELECT DISTINCT doc_id, lang, {ORACLE_HASH.format("shingle")} AS h
      FROM shingled
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shashes GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM shashes a JOIN shashes b
        ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4)
            >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    assigned AS (
      SELECT c.doc_id,
             COALESCE(p.component, c.doc_id) AS rep
      FROM corpus c LEFT JOIN comp p ON c.doc_id = p.node
    ),
    split AS (
      SELECT doc_id, rep,
             CASE WHEN {ORACLE_HASH.format("'split:' || CAST(rep AS VARCHAR)")}
                       % 10 < 8
                  THEN 'train' ELSE 'val' END AS split
      FROM assigned
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_groups,
           CAST((SELECT COUNT(*) FROM (
              SELECT rep FROM split GROUP BY rep
              HAVING COUNT(DISTINCT split) > 1)) AS BIGINT) AS n_leaky_groups
    FROM split GROUP BY split ORDER BY split
    """,
)
def q123_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: assignment hashes the near-dup
    CLUSTER representative, not the document -- every member of a
    duplicate cluster lands in the same split, so no near-copy of a val
    document can appear in train (the contamination mode a plain q48
    per-row hash split cannot prevent). Representatives come from the
    same connected components as q52; singleton docs represent
    themselves. ``n_leaky_groups`` asserts the invariant (always 0 by
    construction -- the audit column exists so a pipeline can gate on it).

    Scale notes: adds ONE broadcast-ready (node, component) frame and a
    portable-hash decision per row on top of q52's clustering; the split
    choice is row-local, no extra shuffle beyond the component join.
    """
    from iot_data_pipeline_spark.functions.hashing import portable_hash
    from iot_data_pipeline_spark.operators.graph import connected_components

    corpus = _corpus_near(spark, sf_dir).select("doc_id")
    pairs = _ngram_pairs_cached(spark, sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    assigned = corpus.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("rep")
    )
    split = assigned.withColumn(
        "split",
        F.when(
            portable_hash(F.concat(F.lit("split:"), F.col("rep").cast("string")))
            % 10
            < 8,
            "train",
        ).otherwise("val"),
    )
    leaky = (
        split.groupBy("rep")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaky_groups"))
    )
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("rep").alias("n_groups"),
        )
        .crossJoin(F.broadcast(leaky))
        .select("split", "n_docs", "n_groups", "n_leaky_groups")
        .orderBy("split")
    )


@declared(
    "q124_wav_decode",
    oracle="""
    WITH amp AS (
      SELECT doc_id, (doc_id * 97) % 30000 + 1000 AS a
      FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           ROUND(a / 32768.0, 6) AS mean_amp,
           CAST(63 AS BIGINT) AS zero_crossings,
           CAST(8 AS INTEGER) AS n_cells
    FROM amp ORDER BY doc_id
    """,
)
def q124_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode in the oracle gate (B48's audio modality, the
    twin of q113's PNG path): per row a 64-sample 16-bit PCM WAV is
    synthesized worker-side as an alternating-sign square wave of
    amplitude A = (doc_id*97) % 30000 + 1000, shipped as a binary media
    column, and decoded back by the vendored RIFF/WAVE parser
    (operators/audio.py). A constant-|amplitude| signal makes every
    time-cell feature exactly A/32768, and 64 alternating samples cross
    zero exactly 63 times -- so the oracle states the decode result in
    closed form.

    Scale notes: synth and decode are both mapInPandas kernels over
    Arrow batches; payload bytes never leave the executor. Compressed
    audio would plug an ffmpeg kernel into the same signature.
    """
    from iot_data_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import audio as _audio

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                a = (int(doc_id) * 97) % 30000 + 1000
                samples = [a if i % 2 == 0 else -a for i in range(64)]
                blobs.append(_audio.encode_wav(samples))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = extract_audio_features(media, dim=8, mode="strict")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.round(
            F.aggregate(
                F.col("features"), F.lit(0.0), lambda s, x: s + x.cast("double")
            )
            / F.size("features"),
            6,
        ).alias("mean_amp"),
        F.col("zero_crossings"),
        F.size("features").alias("n_cells"),
    ).orderBy("doc_id")


@declared(
    "q187_flac_decode",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             (doc_id * 131) % 12000 + 600 AS a,
             (doc_id % 37) + 3 AS d
      FROM documents WHERE doc_id < 150
    ),
    sig AS (
      SELECT p.doc_id, t.i, ((t.i * p.d) % (2 * p.a)) - p.a AS s
      FROM p, range(256) t(i)
    ),
    cells AS (
      SELECT doc_id, (i // 32) AS cell,
             CAST(CAST(SUM(ABS(s)) / 32.0 / 32768.0 AS REAL) AS DOUBLE) AS f
      FROM sig GROUP BY 1, 2
    ),
    zc AS (
      SELECT doc_id, CAST(COUNT(*) FILTER (
               WHERE prev IS NOT NULL AND sgn <> prev) AS BIGINT) AS n
      FROM (
        SELECT doc_id, (s > 0) AS sgn,
               LAG(s > 0) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM sig WHERE s <> 0
      ) GROUP BY doc_id
    )
    SELECT c.doc_id,
           ROUND(MAX(CASE WHEN cell = 0 THEN f END), 6) AS c0,
           ROUND(MAX(CASE WHEN cell = 3 THEN f END), 6) AS c3,
           ROUND(MAX(CASE WHEN cell = 7 THEN f END), 6) AS c7,
           MAX(z.n) AS zero_crossings
    FROM cells c JOIN zc z ON c.doc_id = z.doc_id
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def q187_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-audio decode in the oracle gate -- the boundary
    q124 left ("compressed audio would plug an ffmpeg kernel in"),
    closed round 5 by the vendored FLAC codec (operators/flac.py, RFC
    9639: rice-coded residuals under fixed/LPC predictors, CRC-checked
    frames). Per row a 256-sample integer sawtooth (amplitude and step
    derived from doc_id) is FLAC-encoded worker-side -- the fixed
    order-2 predictor zeroes the residual everywhere except the ~2 wrap
    points per 64-sample block, so the rice stream genuinely compresses
    (~25-40% of the PCM bytes, measured) -- shipped through the binary
    column, and decoded by the same strict audio kernel as q124. The
    oracle SIMULATES the generative formula in SQL (range(256) per doc)
    and recomputes three of the eight amplitude-grid cells (through the
    kernel's exact sum/32/32768 -> float32 chain) plus the sign-change
    count -- if any rice/prediction/CRC step is wrong, the hash breaks.

    Scale notes: q124's kernel shape exactly; the decode cost is
    per-payload and embarrassingly parallel; lossy codecs (MP3/AAC)
    remain the documented ffmpeg plug-in point.
    """
    from iot_data_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import flac as _flac

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                a = (did * 131) % 12000 + 600
                d = (did % 37) + 3
                samples = [((i * d) % (2 * a)) - a for i in range(256)]
                blobs.append(_flac.encode_flac(samples, block_size=64))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = extract_audio_features(media, dim=8, mode="strict")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.round(F.col("features")[0].cast("double"), 6).alias("c0"),
        F.round(F.col("features")[3].cast("double"), 6).alias("c3"),
        F.round(F.col("features")[7].cast("double"), 6).alias("c7"),
        F.col("zero_crossings"),
    ).orderBy("doc_id")


@declared(
    "q130_jpeg_decode",
    oracle="""
    WITH seed AS (
      SELECT doc_id,
             CAST((doc_id * 11) % 256 AS DOUBLE) AS r,
             CAST((doc_id * 17) % 256 AS DOUBLE) AS g,
             CAST((doc_id * 23) % 256 AS DOUBLE) AS b
      FROM documents WHERE doc_id < 200
    ),
    ycc AS (
      SELECT doc_id,
        LEAST(255, GREATEST(0, FLOOR(0.299*r + 0.587*g + 0.114*b + 0.5))) AS y,
        LEAST(255, GREATEST(0, FLOOR(128 - 0.168735892*r - 0.331264108*g
                                     + 0.5*b + 0.5))) AS cb,
        LEAST(255, GREATEST(0, FLOOR(128 + 0.5*r - 0.418687589*g
                                     - 0.081312411*b + 0.5))) AS cr
      FROM seed
    ),
    rgb2 AS (
      SELECT doc_id,
        LEAST(255, GREATEST(0, FLOOR(y + 1.402*(cr - 128) + 0.5))) AS r2,
        LEAST(255, GREATEST(0, FLOOR(y - 0.344136*(cb - 128)
                                     - 0.714136*(cr - 128) + 0.5))) AS g2,
        LEAST(255, GREATEST(0, FLOOR(y + 1.772*(cb - 128) + 0.5))) AS b2
      FROM ycc
    )
    SELECT doc_id,
           ROUND(((299 * CAST(r2 AS BIGINT) + 587 * CAST(g2 AS BIGINT)
                   + 114 * CAST(b2 AS BIGINT)) // 1000) / 255.0, 4)
             AS mean_luma,
           CAST(4 AS INTEGER) AS n_feats
    FROM rgb2 ORDER BY doc_id
    """,
)
def q130_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode in the oracle gate (B48, the twin of
    q113's PNG path): per row a solid-color 8x8 RGB JPEG is synthesized
    worker-side (vendored T.81 codec, operators/jpeg.py, quality=100 ->
    all-ones quant tables), shipped through the binary media column, and
    decoded back by ``extract_features(mode='strict')`` -- Huffman entropy
    decode, dequant, IDCT, YCbCr->RGB, Rec.601 luma grid.

    At quality=100 a flat block is bit-exact through the DCT path, so the
    only value changes are the codec's documented floor(x+0.5) YCbCr
    double-rounding -- which the DuckDB oracle replicates in closed form
    (identical IEEE doubles on both sides: same literals, same
    left-to-right association).

    Scale notes: synth and decode are both mapInPandas kernels over Arrow
    batches; payload bytes never leave the executor; the numpy IDCT is
    batched per image, not per pixel. This is the exact shape a
    libjpeg-turbo kernel drops into on a real cluster.
    """
    from iot_data_pipeline_spark.operators.multimodal import extract_features

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import jpeg as _jpeg

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rgb = bytes([(i * 11) % 256, (i * 17) % 256, (i * 23) % 256])
                blobs.append(_jpeg.encode_jpeg(8, 8, 3, rgb * 64, quality=100))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = extract_features(media, dim=4, mode="strict")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.round(
            F.aggregate(
                F.col("features"), F.lit(0.0), lambda s, x: s + x.cast("double")
            )
            / F.size("features"),
            4,
        ).alias("mean_luma"),
        F.size("features").alias("n_feats"),
    ).orderBy("doc_id")


@declared(
    "q185_progressive_jpeg",
    oracle="""
    WITH seed AS (
      SELECT doc_id,
             CAST((doc_id * 31) % 256 AS DOUBLE) AS r,
             CAST((doc_id * 43) % 256 AS DOUBLE) AS g,
             CAST((doc_id * 59) % 256 AS DOUBLE) AS b
      FROM documents WHERE doc_id < 200
    ),
    ycc AS (
      SELECT doc_id,
        LEAST(255, GREATEST(0, FLOOR(0.299*r + 0.587*g + 0.114*b + 0.5))) AS y,
        LEAST(255, GREATEST(0, FLOOR(128 - 0.168735892*r - 0.331264108*g
                                     + 0.5*b + 0.5))) AS cb,
        LEAST(255, GREATEST(0, FLOOR(128 + 0.5*r - 0.418687589*g
                                     - 0.081312411*b + 0.5))) AS cr
      FROM seed
    ),
    rgb2 AS (
      SELECT doc_id,
        LEAST(255, GREATEST(0, FLOOR(y + 1.402*(cr - 128) + 0.5))) AS r2,
        LEAST(255, GREATEST(0, FLOOR(y - 0.344136*(cb - 128)
                                     - 0.714136*(cr - 128) + 0.5))) AS g2,
        LEAST(255, GREATEST(0, FLOOR(y + 1.772*(cb - 128) + 0.5))) AS b2
      FROM ycc
    )
    SELECT doc_id,
           ROUND(((299 * CAST(r2 AS BIGINT) + 587 * CAST(g2 AS BIGINT)
                   + 114 * CAST(b2 AS BIGINT)) // 1000) / 255.0, 4)
             AS mean_luma,
           CAST(4 AS INTEGER) AS n_feats
    FROM rgb2 ORDER BY doc_id
    """,
)
def q185_progressive_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG (SOF2) decode in the oracle gate -- closing the
    boundary q130 left: the round-4 verdict listed progressive as an
    honest refusal; round 5 vendors the full T.81 Annex G decode path
    (spectral-selection bands, successive-approximation DC/AC first +
    refinement passes, EOB-run coding), and this query proves it under
    the driver's hash gate. Per row a solid-color 8x8 RGB image is
    encoded worker-side as a MULTI-SCAN progressive JPEG (DC at Al=1,
    two AC spectral bands, AC refinement to Al=0, DC refinement), then
    decoded by ``extract_features(mode='strict')`` -- the scans must
    reassemble the exact coefficients, because at quality=100 the
    closed-form oracle reproduces the only value changes (the codec's
    documented floor(x+0.5) YCbCr double-rounding).

    The same payloads are ALSO differential-tested against baseline
    decode pixel-for-pixel in tests/test_jpeg_codec.py (progressive and
    baseline encodings carry identical quantized coefficients), so the
    gate here proves end-to-end Spark plumbing, not just codec math.

    Scale notes: identical kernel shape to q130 -- synth and decode are
    mapInPandas Arrow kernels, bytes never leave the executor, the
    scan-accumulation cost is per image and embarrassingly parallel.
    """
    from iot_data_pipeline_spark.operators.multimodal import extract_features

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import jpeg as _jpeg

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rgb = bytes([(i * 31) % 256, (i * 43) % 256, (i * 59) % 256])
                blobs.append(
                    _jpeg.encode_jpeg(
                        8, 8, 3, rgb * 64, quality=100, progressive=True
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = extract_features(media, dim=4, mode="strict")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.round(
            F.aggregate(
                F.col("features"), F.lit(0.0), lambda s, x: s + x.cast("double")
            )
            / F.size("features"),
            4,
        ).alias("mean_luma"),
        F.size("features").alias("n_feats"),
    ).orderBy("doc_id")


def _bpe_chars_sql(col: str) -> str:
    """DuckDB: word -> space-joined character representation."""
    return (
        f"array_to_string(list_transform(range(1, length({col}) + 1), "
        f"i -> {col}[i:i]), ' ')"
    )


def _bpe_round_sql(prev: str, k: int) -> str:
    """One unrolled BPE merge round as DuckDB CTE fragments."""
    return f"""
    p{k} AS (
      SELECT l[i] || ' ' || l[i + 1] AS pair, SUM(cnt) AS pair_count
      FROM (SELECT cnt, string_split(rep, ' ') AS l FROM {prev}),
           unnest(range(1, len(l))) AS u(i)
      GROUP BY 1
    ),
    t{k} AS (
      SELECT pair, pair_count FROM p{k}
      ORDER BY pair_count DESC, pair LIMIT 1
    ),
    w{k} AS (
      SELECT cnt,
             COALESCE(
               trim(replace(' ' || rep || ' ',
                            ' ' || (SELECT pair FROM t{k}) || ' ',
                            ' ' || replace((SELECT pair FROM t{k}), ' ', '')
                                || ' ')),
               rep) AS rep
      FROM {prev}
    )"""


def _bpe_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency-weighted distinct-word table -- the ONLY pass the
    BPE queries make over the corpus itself; every merge round after it
    iterates vocabulary-sized data."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bpe_rep0():
    """word -> space-joined character symbols (round-0 representation)."""
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substring(F.col("word"), i, 1),
        ),
    )


def _bpe_merge_round(cur: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE merge round over a frame carrying (..., cnt, rep).

    Returns ``(top, merged)``: the 1-row winning pair (pair, pair_count)
    and the frame with that pair merged in every row's ``rep`` -- same
    columns as ``cur``, localCheckpointed so chained rounds don't
    compound lineage. Shared by the learner (q131) and the encoder
    (q137): both must merge with the identical rule or their oracles
    diverge.
    """
    arr = F.split("rep", " ")
    pairs = (
        cur.select(
            "cnt",
            F.explode(
                F.when(
                    F.size(arr) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(arr) - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(arr, i),
                            F.element_at(arr, i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
    )
    top = pairs.orderBy(F.desc("pair_count"), "pair").limit(1)
    keep = [c for c in cur.columns if c != "rep"]
    # LEFT join against the 0-or-1-row winner: when NO pair exists at all
    # (every word already a single symbol -- fully merged vocabulary), the
    # round must be an identity pass, not annihilate the table (a
    # crossJoin against the empty winner returned 0 rows; caught by the
    # hypothesis fuzz on a 1-char vocabulary).
    merged = (
        cur.join(F.broadcast(top), F.lit(True), "left")
        .select(
            *keep,
            F.when(F.col("pair").isNull(), F.col("rep"))
            .otherwise(
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("rep"), F.lit(" ")),
                        F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                        F.concat(
                            F.lit(" "),
                            F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                            F.lit(" "),
                        ),
                    )
                )
            )
            .alias("rep"),
        )
        # each round's output feeds the next: checkpoint keeps the
        # lineage (and the 1-row broadcast) from compounding
        .localCheckpoint(eager=False)
    )
    return top, merged


@declared(
    "q131_bpe_learn",
    oracle=f"""
    WITH words AS (
      SELECT token AS word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY token
    ),
    w0 AS (SELECT cnt, {_bpe_chars_sql('word')} AS rep FROM words),
    {_bpe_round_sql('w0', 1)},
    {_bpe_round_sql('w1', 2)},
    {_bpe_round_sql('w2', 3)}
    SELECT * FROM (
      SELECT 1 AS step, (SELECT pair FROM t1) AS pair,
             (SELECT CAST(pair_count AS BIGINT) FROM t1) AS pair_count,
             (SELECT CAST(SUM(cnt * len(string_split(rep, ' '))) AS BIGINT)
              FROM w1) AS corpus_tokens
      UNION ALL
      SELECT 2, (SELECT pair FROM t2), (SELECT CAST(pair_count AS BIGINT) FROM t2),
             (SELECT CAST(SUM(cnt * len(string_split(rep, ' '))) AS BIGINT)
              FROM w2)
      UNION ALL
      SELECT 3, (SELECT pair FROM t3), (SELECT CAST(pair_count AS BIGINT) FROM t3),
             (SELECT CAST(SUM(cnt * len(string_split(rep, ' '))) AS BIGINT)
              FROM w3)
    ) WHERE pair IS NOT NULL  -- empty corpus: no pair is learnable; the
      -- engine's argmax-over-nothing emits no step rows, so the oracle's
      -- scalar subqueries (NULL on empty) must not fabricate any either
    ORDER BY step
    """,
)
def q131_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning (the tokenizer-TRAINING op a
    large-scale pipeline runs before tokenizing anything): three unrolled
    merge rounds -- weighted adjacent-pair counts over the distinct-word
    table, global argmax with a deterministic tie-break, then a
    vectorized merge of the winning pair in every word.

    Merge rule (documented precisely, identical in both engines): symbols
    are space-joined and the pair is merged by ONE literal left-to-right
    ``replace`` of ``' a b '`` -- the delimiter consumption makes chained
    repeats (``a b a b``) merge alternately, i.e. the first-occurrence-
    greedy variant of textbook BPE. Counts are integers throughout, so
    parity is exact.

    Scale notes: every round iterates over the DISTINCT-WORD table (at
    100 TB that is vocabulary-sized, ~1e7-1e8 rows, NOT corpus-sized) --
    the corpus is touched exactly once to build word counts. Pair counting
    is a map-side-combined aggregate; the winning pair is a 1-row
    broadcast; the merge is a JVM-side string replace in one codegen span.
    This is the textbook distributed-BPE layout (corpus-frequency
    weighted, fixed rounds; a production learner runs the same loop to
    30k-100k merges with the word table cached).
    """
    words = _bpe_word_counts(spark, sf_dir)
    cur = words.select("cnt", _bpe_rep0().alias("rep")).localCheckpoint(
        eager=False
    )

    step_rows = []
    for step in (1, 2, 3):
        top, merged = _bpe_merge_round(cur)
        tokens_after = merged.agg(
            F.sum(F.col("cnt") * F.size(F.split("rep", " ")))
            .cast("long")
            .alias("corpus_tokens")
        )
        step_rows.append(
            top.crossJoin(F.broadcast(tokens_after)).select(
                F.lit(step).alias("step"),
                "pair",
                "pair_count",
                "corpus_tokens",
            )
        )
        cur = merged
    out = step_rows[0]
    for extra in step_rows[1:]:
        out = out.unionAll(extra)
    return out.orderBy("step")


@declared(
    "q133_image_dedup",
    oracle="""
    -- Expected dHashes derived in closed form from the synthesized
    -- patterns: pattern k paints column x with (sx*(k+1)*16) % 256 where
    -- sx is the 16->9 nearest-resample source column
    -- (sx = min(x*16//9, 15) = 0,1,3,5,7,8,10,12,14); every row is
    -- identical, so the 8 row-bits repeat 8 times. See
    -- operators/imagehash.py for the bit rule (left < right).
    WITH expected(pattern_class, dhash) AS (
      VALUES (0, CAST(-1 AS BIGINT)),
             (1, CAST(-578721382704613385 AS BIGINT)),
             (2, CAST(-1302123111085380115 AS BIGINT)),
             (3, CAST(-3038287259199220267 AS BIGINT))
    ),
    members AS (
      SELECT doc_id % 4 AS pattern_class, COUNT(*) AS n_images
      FROM documents WHERE doc_id < 300 GROUP BY 1
    )
    SELECT e.pattern_class, e.dhash, CAST(m.n_images AS BIGINT) AS n_images
    FROM expected e JOIN members m USING (pattern_class)
    ORDER BY e.pattern_class
    """,
)
def q133_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL decoded pixels (B48 x B45): per
    row a 16x16 greyscale PNG is synthesized worker-side with one of 4
    column patterns, then hashed with dHash (decode -> luma -> 9x8
    nearest resample -> neighbor-difference bits) and grouped -- images
    with the same visual pattern land in the same dedup class, and the
    oracle pins the exact 64-bit hash of every class in closed form.

    Scale notes: the shuffle carries (8-byte hash, id), never pixels; the
    kernel is mapInPandas over Arrow batches. Near-dup at hamming
    distance d extends this by pigeonhole banding (d+1 exact-match bands
    -> equi-join), the same LSH shape as operators/dedup.py.
    """
    from iot_data_pipeline_spark.operators.imagehash import dhash_images

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import png as _png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 4
                row = bytes(((x * (k + 1) * 16) % 256) for x in range(16))
                blobs.append(_png.encode_png(16, 16, 1, row * 16))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    hashed = dhash_images(media)
    return (
        hashed.groupBy((F.col("media_id") % 4).alias("pattern_class"), "dhash")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .orderBy("pattern_class")
    )


@declared(
    "q134_image_neardup",
    oracle="""
    -- 8 closed-form dHashes: 4 base column patterns (q133) and, for every
    -- second image of each class, a variant whose top TWO source rows use
    -- the next class's pattern -- after the 16->8 nearest resample that
    -- changes only resized row 0, i.e. only the top hash byte (band 7),
    -- so base and variant always share 7 of 8 bands and the pigeonhole
    -- band join must find every base~variant pair. Hamming distances:
    -- class 0 -> 1, classes 1-3 -> 3.
    WITH members AS (
      SELECT doc_id,
             doc_id % 4 AS pattern_class,
             (doc_id // 4) % 2 AS is_variant,
             CASE doc_id % 4
               WHEN 0 THEN CASE (doc_id // 4) % 2
                 WHEN 0 THEN CAST(-1 AS BIGINT)
                 ELSE CAST(-576460752303423489 AS BIGINT) END
               WHEN 1 THEN CASE (doc_id // 4) % 2
                 WHEN 0 THEN CAST(-578721382704613385 AS BIGINT)
                 ELSE CAST(-1299297323083892745 AS BIGINT) END
               WHEN 2 THEN CASE (doc_id // 4) % 2
                 WHEN 0 THEN CAST(-1302123111085380115 AS BIGINT)
                 ELSE CAST(-3031505367995650579 AS BIGINT) END
               ELSE CASE (doc_id // 4) % 2
                 WHEN 0 THEN CAST(-3038287259199220267 AS BIGINT)
                 ELSE CAST(-11868309606246955 AS BIGINT) END
             END AS dhash
      FROM documents WHERE doc_id < 300
    )
    SELECT a.pattern_class,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM members a JOIN members b
      ON a.pattern_class = b.pattern_class AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q134_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded image NEAR-dup join over real decoded pixels (the
    scale path of q133): each 64-bit dHash splits into 8 one-byte bands;
    by pigeonhole, any pair within hamming distance 7 shares at least one
    exact band, so candidates come from a band equi-join (the same LSH
    shape as MinHash, operators/dedup.py) and only candidates pay the
    xor+popcount verify. Variants are synthesized so base~variant pairs
    differ ONLY in band 7 (top two source rows swap to the next class's
    pattern, which survives the 16->8 resample as resized row 0 alone).

    The oracle verifies the same pairs from closed-form hashes with a
    within-class quadratic join -- affordable at oracle scale, which is
    exactly why the engine side must NOT do it: the banded join is linear
    in band-bucket sizes. Distances are integers; parity is exact.

    Scale notes: candidates shuffle (8-byte hash, id) pairs; the verify
    is bit_count(xor) in the JVM; no pixel ever reaches a join. At d<=7
    with 8 bands recall is exact (pigeonhole), not probabilistic.
    """
    from iot_data_pipeline_spark.operators.imagehash import dhash_images

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import png as _png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                k = i % 4
                variant = (i // 4) % 2
                base_row = bytes(((x * (k + 1) * 16) % 256) for x in range(16))
                top_row = (
                    bytes(((x * (((k + 1) % 4) + 1) * 16) % 256) for x in range(16))
                    if variant
                    else base_row
                )
                blobs.append(
                    _png.encode_png(16, 16, 1, top_row * 2 + base_row * 14)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    hashed = dhash_images(media).select(
        F.col("media_id"), (F.col("media_id") % 4).alias("pattern_class"), "dhash"
    )
    bands = hashed.select(
        "media_id",
        "pattern_class",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright("dhash", 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("band_val"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("band"),
    ).select("media_id", "pattern_class", "dhash", "band.*")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.pattern_class").alias("pattern_class"),
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()  # a pair sharing k bands appears k times
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.filter(ham <= 7)
        .filter(F.col("pattern_class") == (F.col("id_b") % 4))  # same class only
        .groupBy("pattern_class", ham.cast("int").alias("hamming"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("pattern_class", "hamming")
    )


@declared(
    "q135_y4m_frames",
    oracle="""
    WITH base AS (
      SELECT doc_id, 4 + doc_id % 3 AS n_frames
      FROM documents WHERE doc_id < 300
    ),
    frames AS (
      SELECT doc_id, CAST(k AS BIGINT) AS frame_idx, n_frames
      FROM base, LATERAL UNNEST(range(0, n_frames, 2)) AS t(k)
    )
    SELECT doc_id, frame_idx, CAST(n_frames AS BIGINT) AS n_frames,
           ROUND(CAST((doc_id * 7 + frame_idx * 31) % 256 AS DOUBLE), 4)
             AS mean_luma
    FROM frames ORDER BY doc_id, frame_idx
    """,
)
def q135_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode in the oracle gate (B48 video tier, completing
    the PNG/WAV/JPEG set): per row a multi-frame YUV4MPEG2 clip is
    synthesized worker-side (vendored public-format codec,
    operators/y4m.py -- 16x16 C420jpeg, frame k solid luma
    (doc_id*7 + k*31) % 256), shipped through the binary media column,
    then ``sample_video_frames(every_n=2, mode='strict')`` parses the
    container, slices planes, and computes each sampled frame's mean
    luma for real. A solid plane's mean is its byte value exactly, so
    the DuckDB oracle states the closed form.

    Scale notes: synth and decode are mapInPandas kernels over Arrow
    batches; the clip->frame fan-out happens inside the kernel so the
    binary payload is never exploded JVM-side (no per-frame payload
    copies). Compressed video stays refused (NotImplementedError) --
    the documented honest boundary.
    """
    from iot_data_pipeline_spark.operators.multimodal import sample_video_frames

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import y4m as _y4m

        w = h = 16
        chroma = (w // 2) * (h // 2)
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                frames = [
                    _y4m.Y4mFrame(
                        bytes([(i * 7 + k * 31) % 256]) * (w * h),
                        b"\x80" * chroma,
                        b"\x80" * chroma,
                    )
                    for k in range(4 + i % 3)
                ]
                blobs.append(_y4m.encode_y4m(w, h, frames, "C420jpeg", (25, 1)))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    frames = sample_video_frames(media, every_n=2, mode="strict")
    return frames.select(
        F.col("media_id").alias("doc_id"),
        "frame_idx",
        "n_frames",
        F.round(F.col("mean_luma"), 4).alias("mean_luma"),
    ).orderBy("doc_id", "frame_idx")


@declared(
    "q188_mjpeg_frames",
    oracle="""
    WITH base AS (
      SELECT doc_id, 4 + doc_id % 3 AS n_frames
      FROM documents WHERE doc_id < 200
    ),
    frames AS (
      SELECT doc_id, CAST(k AS BIGINT) AS frame_idx, n_frames
      FROM base, LATERAL UNNEST(range(0, n_frames, 2)) AS t(k)
    ),
    seed AS (
      SELECT doc_id, frame_idx, n_frames,
             CAST((doc_id * 5 + frame_idx * 17) % 256 AS DOUBLE) AS r,
             CAST((doc_id * 3 + frame_idx * 29) % 256 AS DOUBLE) AS g,
             CAST((doc_id * 11 + frame_idx * 41) % 256 AS DOUBLE) AS b
      FROM frames
    ),
    ycc AS (
      SELECT doc_id, frame_idx, n_frames,
        LEAST(255, GREATEST(0, FLOOR(0.299*r + 0.587*g + 0.114*b + 0.5))) AS y,
        LEAST(255, GREATEST(0, FLOOR(128 - 0.168735892*r - 0.331264108*g
                                     + 0.5*b + 0.5))) AS cb,
        LEAST(255, GREATEST(0, FLOOR(128 + 0.5*r - 0.418687589*g
                                     - 0.081312411*b + 0.5))) AS cr
      FROM seed
    ),
    rgb2 AS (
      SELECT doc_id, frame_idx, n_frames,
        LEAST(255, GREATEST(0, FLOOR(y + 1.402*(cr - 128) + 0.5))) AS r2,
        LEAST(255, GREATEST(0, FLOOR(y - 0.344136*(cb - 128)
                                     - 0.714136*(cr - 128) + 0.5))) AS g2,
        LEAST(255, GREATEST(0, FLOOR(y + 1.772*(cb - 128) + 0.5))) AS b2
      FROM ycc
    )
    SELECT doc_id, frame_idx, CAST(n_frames AS BIGINT) AS n_frames,
           ROUND(CAST((299 * CAST(r2 AS BIGINT) + 587 * CAST(g2 AS BIGINT)
                       + 114 * CAST(b2 AS BIGINT)) // 1000 AS DOUBLE), 4)
             AS mean_luma
    FROM rgb2 ORDER BY doc_id, frame_idx
    """,
)
def q188_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-video decode in the oracle gate -- the boundary
    q135 left ("compressed video stays refused"), narrowed round 5 to
    interframe codecs only: MJPEG-in-AVI (operators/mjpeg.py) parses
    the RIFF container and JPEG-decodes every frame through the
    vendored T.81 codec. Per row a 4-6 frame solid-color MJPEG AVI is
    synthesized worker-side at quality=100 -- ODD doc_ids encode each
    frame as a PROGRESSIVE (SOF2) JPEG, even ones baseline, and the
    oracle is identical for both because the scan scripts carry the
    same coefficients -- then ``sample_video_frames(every_n=2,
    mode='strict')`` samples frames and computes each one's integer
    Rec.601 mean luma. Solid frames make that luma the q130
    double-rounding chain exactly, so the oracle states the closed
    form per (doc, frame).

    Scale notes: q135's kernel shape exactly (clip->frame fan-out
    inside the kernel, no JVM-side payload explode); interframe codecs
    (H.264/VP9/AV1 -- motion compensation needs reference-frame state)
    remain the documented ffmpeg plug-in point.
    """
    from iot_data_pipeline_spark.operators.multimodal import sample_video_frames

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import mjpeg as _mjpeg

        w = h = 8
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                frames = [
                    bytes(
                        [
                            (i * 5 + k * 17) % 256,
                            (i * 3 + k * 29) % 256,
                            (i * 11 + k * 41) % 256,
                        ]
                    )
                    * (w * h)
                    for k in range(4 + i % 3)
                ]
                blobs.append(
                    _mjpeg.encode_mjpeg_avi(
                        w, h, frames, quality=100, progressive=bool(i % 2)
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = _spread_rows(docs.select("doc_id")).mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    frames = sample_video_frames(media, every_n=2, mode="strict")
    return frames.select(
        F.col("media_id").alias("doc_id"),
        "frame_idx",
        "n_frames",
        F.round(F.col("mean_luma"), 4).alias("mean_luma"),
    ).orderBy("doc_id", "frame_idx")


@declared(
    "q136_semdedup",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm,
             (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS cell
      FROM embeddings
    ),
    removed AS (
      SELECT DISTINCT b.cell, b.vec_id
      FROM e a JOIN e b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.82
    ),
    cells AS (
      SELECT cell, COUNT(*) AS n_vectors FROM e GROUP BY cell
    )
    SELECT c.cell, c.n_vectors,
           COALESCE(r.n_removed, 0) AS n_removed,
           c.n_vectors - COALESCE(r.n_removed, 0) AS n_kept
    FROM cells c
    LEFT JOIN (SELECT cell, COUNT(*) AS n_removed FROM removed GROUP BY cell) r
      ON c.cell = r.cell
    ORDER BY c.cell
    """,
)
def q136_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023 shape): cluster
    the embedding space cheaply, then prune within each cluster any
    vector whose cosine similarity to a LOWER-ID clustermate meets the
    threshold -- keep-first semantics, deterministic, no iteration.
    Complements q26 (bucketed near-dup pairs) by producing the corpus-
    curation *decision* (kept/removed per cluster), not just the pairs.

    Clustering here is 4-bit sign quantization (16 cells) standing in
    for trained k-means centroids exactly as in q31; the pair join is
    equi on cell, so cost is sum of squared cell sizes, not N^2 -- and
    the cell count is the scaling knob (more sign bits / more centroids
    at larger N keeps cells bounded, the SemDeDup paper's own recipe).

    The threshold compares the ROUNDED cosine (4dp) so the decision
    boundary is identical across engines (SURVEY.md section 2.3 rule 1).

    Scale notes: one hash-shuffle on cell for the self-join, two hash
    aggregates after; no cross join, no driver-side work, no UDFs --
    dot products ride F.aggregate/F.zip_with codegen.
    """
    from iot_data_pipeline_spark.operators.similarity import neardup_pairs_pandas

    emb = valid_embeddings(spark, sf_dir)
    cell = (
        F.when(F.element_at("embedding", 1) > 0, 8).otherwise(0)
        + F.when(F.element_at("embedding", 2) > 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 3) > 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 4) > 0, 1).otherwise(0)
    )
    e = emb.select("vec_id", "embedding", cell.alias("cell"))
    # pair generation = one numpy Gram matrix per cell (the q26 kernel):
    # same ROUND(cos,4) >= t decision, ~10-50x the HOF-fold throughput,
    # and the shuffle is one exchange on cell either way.
    pairs = neardup_pairs_pandas(
        e, block_col="cell", threshold=0.82, keep_block=True
    )
    removed = pairs.select("cell", F.col("vec_b").alias("vec_id")).distinct()
    cells = e.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    rem = removed.groupBy("cell").agg(F.count(F.lit(1)).alias("n_removed"))
    return (
        cells.join(rem, "cell", "left")
        .select(
            "cell",
            "n_vectors",
            F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
            (F.col("n_vectors") - F.coalesce(F.col("n_removed"), F.lit(0))).alias(
                "n_kept"
            ),
        )
        .orderBy("cell")
    )


def _bpe_apply_sql(prev: str, k: int) -> str:
    """Apply the already-learned merge t{k} to an apply-chain CTE that
    carries the word (the learner chain drops it)."""
    return f"""
    a{k} AS (
      SELECT word,
             COALESCE(
               trim(replace(' ' || rep || ' ',
                            ' ' || (SELECT pair FROM t{k}) || ' ',
                            ' ' || replace((SELECT pair FROM t{k}), ' ', '')
                                || ' ')),
               rep) AS rep
      FROM {prev}
    )"""


@declared(
    "q137_bpe_encode",
    oracle=f"""
    WITH words AS (
      SELECT token AS word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY token
    ),
    w0 AS (SELECT cnt, {_bpe_chars_sql('word')} AS rep FROM words),
    {_bpe_round_sql('w0', 1)},
    {_bpe_round_sql('w1', 2)},
    {_bpe_round_sql('w2', 3)},
    a0 AS (SELECT word, {_bpe_chars_sql('word')} AS rep FROM words),
    {_bpe_apply_sql('a0', 1)},
    {_bpe_apply_sql('a1', 2)},
    {_bpe_apply_sql('a2', 3)},
    encoded AS (
      SELECT word, len(string_split(rep, ' ')) AS n_tok FROM a3
    ),
    tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    SELECT t.lang,
           CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.n_tok) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(e.n_tok) AS DOUBLE) / COUNT(*), 4)
             AS tokens_per_word
    FROM tok t JOIN encoded e ON t.word = e.word
    GROUP BY t.lang ORDER BY t.lang
    """,
)
def q137_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer APPLICATION (the encode stage that runs
    after q131's learner): the 3 learned merges are replayed over the
    DISTINCT-word table (vocabulary-sized memoization -- exactly how
    production tokenizers cache word -> token-ids), then the encoded
    lengths broadcast-join back onto the corpus token stream for per-
    language token accounting. The merge rule is byte-identical to the
    learner's (shared ``_bpe_merge_round``), so learn->apply is
    self-consistent in both engines.

    Scale notes: the corpus is scanned once (word counts) plus once for
    the final accounting join; every merge round iterates the vocabulary,
    not the corpus; the encoded table is vocabulary-bounded and
    broadcasts. This is the canonical "tokenize 100 TB" layout -- the
    per-word work is memoized, the per-token work is one hash join.
    """
    words = _bpe_word_counts(spark, sf_dir)
    cur = words.select("word", "cnt", _bpe_rep0().alias("rep")).localCheckpoint(
        eager=False
    )
    for _ in (1, 2, 3):
        _, cur = _bpe_merge_round(cur)
    encoded = cur.select("word", F.size(F.split("rep", " ")).alias("n_tok"))
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        tok.join(F.broadcast(encoded), "word")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("n_tok").cast("double") / F.count(F.lit(1)), 4
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )


@declared(
    "q141_quality_aware_dedup",
    oracle=f"""
    WITH RECURSIVE {CORPUS_NEAR_CTE.strip()},
    shingled AS (
      SELECT doc_id, lang, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
          i -> string_split(text, ' ')[i] || ' ' ||
               string_split(text, ' ')[i+1] || ' ' ||
               string_split(text, ' ')[i+2])) AS shingle
      FROM corpus
    ),
    shashes AS (
      SELECT DISTINCT doc_id, lang, {{h}} AS h
      FROM shingled
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shashes GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM shashes a JOIN shashes b
        ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4)
            >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    assigned AS (
      SELECT c.doc_id, c.text,
             COALESCE(p.component, c.doc_id) AS rep
      FROM corpus c LEFT JOIN comp p ON c.doc_id = p.node
    ),
    scored AS (
      SELECT doc_id, rep,
             ROUND(0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                          / len(string_split(text, ' ')))
                   + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100, 1.0)
                   + 0.2 * least((CAST(length(text) - len(string_split(text, ' ')) + 1
                                      AS DOUBLE)
                                  / len(string_split(text, ' '))) / 8, 1.0),
                   4) AS quality
      FROM assigned
    ),
    ranked AS (
      SELECT doc_id, rep, quality,
             ROW_NUMBER() OVER (PARTITION BY rep
                                ORDER BY quality DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY rep) AS group_n
      FROM scored
    )
    SELECT doc_id, rep, CAST(group_n AS BIGINT) AS group_n, quality
    FROM ranked WHERE rn = 1 AND group_n > 1
    ORDER BY rep
    """.format(h=ORACLE_HASH.format("shingle")),
)
def q141_quality_aware_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup dedup KEEP decision: within each near-dup
    cluster (q52's connected components over the cached q25 pair graph),
    keep the member with the HIGHEST q28 quality score (ties on the
    4dp-rounded score break by doc_id) -- the production choice, versus
    q22/q136's keep-first: when a crawl holds three mutilated copies and
    one clean one, the clean one survives.

    Output is one row per multi-member cluster: the kept doc, its
    cluster representative, cluster size, and the winning quality.

    Scale notes: reuses the session-cached pair graph (one shingle
    pipeline for q52/q100/q123/q141 together); quality is per-row column
    arithmetic computed only on cluster members' text; the argmax is one
    window over rep-partitioned rows (cluster-count sized, tiny next to
    the corpus).
    """
    from iot_data_pipeline_spark.operators.graph import connected_components

    corpus = _corpus_near(spark, sf_dir).select("doc_id", "text")
    pairs = _ngram_pairs_cached(spark, sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    assigned = corpus.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        "text",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("rep"),
    )
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length("text")
    quality = F.round(
        0.5 * (n_distinct.cast("double") / n_tokens)
        + 0.3 * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
        + 0.2
        * F.least(
            ((n_chars - n_tokens + 1).cast("double") / n_tokens) / 8, F.lit(1.0)
        ),
        4,
    )
    scored = assigned.select("doc_id", "rep", quality.alias("quality"))
    w = Window.partitionBy("rep").orderBy(F.desc("quality"), "doc_id")
    wn = Window.partitionBy("rep")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("group_n", F.count(F.lit(1)).over(wn))
        .filter((F.col("rn") == 1) & (F.col("group_n") > 1))
        .select("doc_id", "rep", F.col("group_n").cast("bigint").alias("group_n"), "quality")
        .orderBy("rep")
    )


_EMB_SQL = (
    "list_transform(range(1, 9), d -> "
    "CAST(" + ORACLE_HASH.format("'emb:' || chunk || ':' || CAST(d AS VARCHAR)")
    + " % 2001 - 1000 AS DOUBLE) / 1000.0)"
)


_Q143_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE doc_id < 200
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             array_to_string(t[CAST(i * 16 + 1 AS INT):CAST((i + 1) * 16 AS INT)], ' ')
               AS chunk
      FROM toks, LATERAL UNNEST(range(0, (len(t) + 15) // 16)) AS u(i)
    ),
    emb AS (
      SELECT doc_id, chunk_idx, {_EMB_SQL} AS e FROM chunks
    ),
    celled AS (
      SELECT doc_id, chunk_idx, e,
             sqrt(list_dot_product(e, e)) AS nrm,
             (CASE WHEN e[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN e[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN e[3] > 0 THEN 1 ELSE 0 END) AS cell
      FROM emb
    ),
    q AS (SELECT * FROM celled WHERE doc_id < 3),
    scored AS (
      SELECT q.doc_id AS q_doc, q.chunk_idx AS q_chunk,
             c.doc_id AS hit_doc, c.chunk_idx AS hit_chunk,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 4) AS sim
      FROM q JOIN celled c
        ON q.cell = c.cell AND q.doc_id <> c.doc_id
      WHERE q.nrm > 0 AND c.nrm > 0
    )
    SELECT q_doc, q_chunk, hit_doc, hit_chunk, sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_doc, q_chunk
        ORDER BY sim DESC, hit_doc, hit_chunk) AS rn
      FROM scored
    ) WHERE rn <= 3 ORDER BY q_doc, q_chunk, rn
    """


def rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, chunk_idx, chunk): 16-token windows, all
    JVM-side (sequence + slice explode -- rows multiply, text is sliced,
    never copied per token). Shared by q143 and the bench encoder twin."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    n_chunks = F.floor((F.size(toks) + 15) / 16).cast("int")
    return docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("long").alias("chunk_idx"),
                    F.concat_ws(" ", F.slice(toks, i * 16 + 1, 16)).alias(
                        "chunk"
                    ),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.chunk").alias("chunk"))


def rag_retrieve(with_emb: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, e) -> top-3 foreign neighbors per query chunk
    (docs 0-2), IVF-celled by the embedding's first three sign bits.

    This is the encoder drop-in point the q143 docstring promises: ANY
    frame carrying an 8-dim ``e`` column enters the identical
    cell-equi-join + broadcast + windowed-top-k plan -- the hash
    stand-in (q143, cross-engine oracle-able) and a model-shaped
    pandas-UDF encoder (bench b06) differ only in how ``e`` is computed.
    """
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
    )
    cell = (
        F.when(F.element_at("e", 1) > 0, 4).otherwise(0)
        + F.when(F.element_at("e", 2) > 0, 2).otherwise(0)
        + F.when(F.element_at("e", 3) > 0, 1).otherwise(0)
    )
    celled = with_emb.select(
        "doc_id",
        "chunk_idx",
        "e",
        F.sqrt(dot(F.col("e"), F.col("e"))).alias("nrm"),
        cell.alias("cell"),
    ).filter(F.col("nrm") > 0)
    q = celled.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_idx").alias("q_chunk"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    sim = F.round(dot(F.col("qe"), F.col("e")) / (F.col("qnrm") * F.col("nrm")), 4)
    scored = (
        celled.join(F.broadcast(q), F.col("qcell") == F.col("cell"))
        .filter(F.col("q_doc") != F.col("doc_id"))
        .select(
            "q_doc",
            "q_chunk",
            F.col("doc_id").alias("hit_doc"),
            F.col("chunk_idx").alias("hit_chunk"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("q_doc", "q_chunk").orderBy(
        F.desc("sim"), "hit_doc", "hit_chunk"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_doc", "q_chunk", "hit_doc", "hit_chunk", "sim")
        .orderBy("q_doc", "q_chunk", F.desc("sim"), "hit_doc", "hit_chunk")
    )


@declared("q143_rag_retrieval", oracle=_Q143_ORACLE)
def q143_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG index-and-retrieve composition: documents are
    chunked into 16-token windows JVM-side (rag_chunks), each chunk gets
    a deterministic hash-embedding (8 dims of portable_hash -- the
    cross-engine stand-in for a model encoder; the bench twin
    b06_rag_encoder drops a model-shaped pandas-UDF encoder into the
    same column), chunks are IVF-celled by sign bits, and each query
    chunk (docs 0-2) retrieves its top-3 nearest foreign chunks within
    its cell by rounded cosine (rag_retrieve).

    Scale notes: chunk fan-out is a JVM explode; the candidate join is
    equi on cell (the q31 IVF contract: no cross join); the query side
    is a filter of the same celled frame, so Catalyst broadcasts the
    small side. Top-k is a per-query-chunk window on the rounded score
    with full tie-breaks (SURVEY section 2.3 rule 1).
    """
    chunks = rag_chunks(spark, sf_dir)
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda d: (
            portable_hash(
                F.concat(
                    F.lit("emb:"), F.col("chunk"), F.lit(":"), d.cast("string")
                )
            )
            % 2001
            - 1000
        ).cast("double")
        / 1000.0,
    )
    return rag_retrieve(chunks.select("doc_id", "chunk_idx", emb.alias("e")))


@declared(
    "q144_lsh_recall_audit",
    oracle=f"""
    WITH {CORPUS_NEAR_CTE.strip()},
    {SHINGLES_CTE.strip()},
    hashed AS (
      SELECT doc_id, {ORACLE_HASH.format("shingle")} AS h FROM shingles
    ),
    sigs AS (
      SELECT doc_id,
           {_minhash_sig_sql()}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {_minhash_band_keys_sql()}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id
    ),
    shashes AS (
      SELECT DISTINCT doc_id, lang, {ORACLE_HASH.format("shingle")} AS h
      FROM shingles
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shashes GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM shashes a JOIN shashes b
        ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    exact AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4)
            >= 0.5
    ),
    hit AS (
      SELECT COUNT(*) AS n_hit FROM exact e
      WHERE EXISTS (SELECT 1 FROM cand c
                    WHERE c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(n_hit AS BIGINT) FROM hit) AS n_hit,
           ROUND(CAST((SELECT n_hit FROM hit) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM exact), 0), 4) AS recall,
           ROUND(CAST((SELECT n_hit FROM hit) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM cand), 0), 4) AS precision
    """,
)
def q144_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess: the approximate tier audited against the
    exact one. MinHash-LSH candidates (q23) are scored against the exact
    3-gram-Jaccard >= 0.5 ground truth (q25): candidate recall (what the
    banding missed) and candidate precision (how much verification work
    the bands hand downstream). The number a pipeline owner needs before
    trusting the cheap tier at 100 TB -- and the audit itself is
    distributed: two pair sets, one semi join, three scalar aggregates.

    (Precision here is CANDIDATE precision by design: q23's bands are
    lang-agnostic while the ground truth is lang-blocked, so the audit
    also surfaces cross-lang false candidates the verify step must pay
    for.)
    """
    # exact side = the session-cached q25 pair graph (same frame that
    # q52/q123/q141 consume -- one shingle pipeline for all five).
    exact = _ngram_pairs_cached(spark, sf_dir)
    cand = q23_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    n_hit = (
        exact.join(cand, ["doc_a", "doc_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    return (
        n_exact.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_exact",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_exact"), F.lit(0)),
                4,
            ).alias("recall"),
            F.round(
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                4,
            ).alias("precision"),
        )
    )


@declared(
    "q145_prefix_filter_join",
    oracle=f"""
    WITH {CORPUS_NEAR_CTE.strip()},
    {SHINGLES_CTE.strip()},
    tok AS (
      SELECT DISTINCT doc_id, lang, {ORACLE_HASH.format("shingle")} AS h
      FROM shingles
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM tok a JOIN tok b
        ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.6
    ORDER BY doc_a, doc_b
    """,
)
def q145_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SHINGLE-set similarity join via PREFIX FILTERING (the
    PPJoin/AllPairs family) -- the exact-tier alternative to q23's LSH
    over the same near-dup corpus: order every document's 3-gram shingle
    set by global rarity, explode only the first
    n - ceil(0.59*n) + 1 shingles (any pair with Jaccard >= 0.59 must
    collide inside these prefixes -- the filter has NO false negatives),
    equi-join prefixes to get candidates, then verify each candidate
    with an array-intersect over the two full token sets.

    The oracle does NOT mirror the mechanics: it computes ground truth
    directly from the all-shared-token join -- so a prefix too short to
    guarantee completeness shows up as a hash mismatch, making the
    filter's exactness claim itself the thing under test. (Filter slack:
    prefixes sized for raw Jaccard 0.59 while the emitted threshold is
    rounded >= 0.6, so round-up boundary pairs cannot escape.)

    Scale notes: prefix filtering needs the join key's frequency
    distribution to be heavy-tailed -- rare keys must be genuinely rare.
    SHINGLES give that (30k+ distinct values on this corpus); raw
    unigram tokens do not (a 31-word vocabulary makes every "rare" token
    hot: the first formulation of this query measured 43s at sf0.1 on
    tokens vs ~1s on shingles -- the same lesson a 100 TB corpus teaches
    about picking the similarity unit). The prefix explode shrinks the
    candidate stream ~40% per doc at t=0.6 and drops exactly the hot
    buckets; verification joins candidate pairs to two sorted hash
    arrays and intersects JVM-side -- per-pair cost bounded by shingle
    count, zero Python.
    """
    # Round-16 (guide sections 2.4/5): the shingle pipeline used to be
    # recomputed by EVERY consumer subtree -- the document-frequency
    # aggregate, both prefix self-join sides and both docset verify sides
    # each re-scanned and re-exploded the corpus (five scan+explode
    # subtrees, plans/r15/q145_prefix_filter_join_before.txt). A transient
    # persist of the DIGEST-level (doc_id, lang, h) frame -- 8-byte hashes
    # only, never shingle text, the same scale contract q115's plan pin
    # enforces -- lets all consumers share one cached subtree; the spread
    # parallelizes the single cache build across cores (the corpus scans
    # as one task at bench scale, spread.py rationale).
    tok = transient_persist(
        _shingle_hashes(_spread_rows(_corpus_near(spark, sf_dir)), distinct=True)
    )
    dfreq = tok.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy("df", "h")
    w_n = Window.partitionBy("doc_id")
    ranked = (
        tok.join(F.broadcast(dfreq), "h")
        .withColumn("pos", F.row_number().over(w_doc))
        .withColumn("n", F.count(F.lit(1)).over(w_n))
    )
    # integer-exact prefix length for t=0.59: n - ceil(0.59 n) + 1
    prefix_len = F.col("n") - F.floor((59 * F.col("n") + 99) / 100) + 1
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "lang", "h"
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    docsets = tok.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("h")).alias("hs"),
        F.count(F.lit(1)).alias("n"),
    )
    sa = docsets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("hs_a"),
        F.col("n").alias("n_a"),
    )
    sb = docsets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("hs_b"),
        F.col("n").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = F.round(
        n_inter.cast("double") / (F.col("n_a") + F.col("n_b") - n_inter), 4
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
        .orderBy("doc_a", "doc_b")
    )


@declared(
    "q148_ivf_recall_audit",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
             (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS cell
      FROM embeddings
    ),
    queries AS (SELECT * FROM e WHERE vec_id < 5),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(list_dot_product(q.emb, c.emb)
                                / (q.nrm * c.nrm), 4) DESC, c.vec_id) AS rn
        FROM queries q JOIN e c ON q.vec_id <> c.vec_id
      ) WHERE rn <= 3
    ),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id
      FROM queries q JOIN e c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    ),
    csz AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY query_id
    ),
    stats AS (
      SELECT ex.query_id,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(COUNT(cd.vec_id) AS BIGINT) AS n_hit
      FROM exact ex
      LEFT JOIN cand cd
        ON ex.query_id = cd.query_id AND ex.vec_id = cd.vec_id
      GROUP BY ex.query_id
    )
    SELECT s.query_id, s.n_exact,
           CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
           s.n_hit,
           ROUND(CAST(s.n_hit AS DOUBLE) / s.n_exact, 4) AS recall,
           ROUND(CAST(s.n_hit AS DOUBLE) / NULLIF(c.n_candidates, 0), 4)
             AS precision
    FROM stats s LEFT JOIN csz c ON s.query_id = c.query_id
    ORDER BY s.query_id
    """,
)
def q148_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tier audited against exact search (closing the loop q144
    opened for MinHash-LSH): for each of q31's five query vectors, the
    exact top-3 over the WHOLE corpus is the ground truth, and the
    sign-bit cell's candidate set is the approximate tier under audit.
    Per-query candidate recall (how many true top-3 neighbors the probed
    cell contains) and precision (how much of the cell is useful) --
    the measured numbers SCALE.md promises for every approximate tier.

    Scale notes: the exact side is the documented serving shape -- the
    bounded query set (5 rows) broadcasts into a nested-loop score of
    the corpus, O(|queries| * N) with no shuffle of vectors (the same
    exception as q12; whitelisted in tests/test_plan_shapes.py). The
    candidate side is the q31 cell equi-join. Both pair sets reduce to
    per-query counts before the tiny audit join; nothing quadratic in N.
    """
    emb = valid_embeddings(spark, sf_dir)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
    )
    cell = (
        F.when(F.element_at("embedding", 1) > 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 2) > 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 3) > 0, 1).otherwise(0)
    )
    e = emb.select(
        "vec_id",
        as_double.alias("emb"),
        F.sqrt(dot(as_double, as_double)).alias("nrm"),
        cell.alias("cell"),
    )
    qf = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    sim = F.round(
        dot(F.col("qemb"), F.col("emb")) / (F.col("qnrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    exact = (
        e.crossJoin(F.broadcast(qf))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "vec_id")
    )
    cand = (
        e.join(F.broadcast(qf), F.col("qcell") == F.col("cell"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    csz = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    stats = (
        exact.join(cand.withColumn("hit", F.lit(1)), ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("hit").cast("bigint").alias("n_hit"),
        )
    )
    return (
        stats.join(csz, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("bigint")
            .alias("n_candidates"),
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 4).alias(
                "recall"
            ),
            F.round(
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                4,
            ).alias("precision"),
        )
        .orderBy("query_id")
    )


@declared(
    "q149_ivf_multiprobe_audit",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
             (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS cell
      FROM embeddings
    ),
    queries AS (SELECT * FROM e WHERE vec_id < 5),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(list_dot_product(q.emb, c.emb)
                                / (q.nrm * c.nrm), 4) DESC, c.vec_id) AS rn
        FROM queries q JOIN e c ON q.vec_id <> c.vec_id
      ) WHERE rn <= 3
    ),
    probes AS (
      SELECT vec_id AS query_id, u.probe
      FROM queries,
           UNNEST([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4)]) AS u(probe)
    ),
    cand AS (
      SELECT DISTINCT p.query_id, c.vec_id
      FROM probes p JOIN e c ON p.probe = c.cell
      WHERE p.query_id <> c.vec_id
    ),
    csz AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY query_id
    ),
    stats AS (
      SELECT ex.query_id,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(COUNT(cd.vec_id) AS BIGINT) AS n_hit
      FROM exact ex
      LEFT JOIN cand cd
        ON ex.query_id = cd.query_id AND ex.vec_id = cd.vec_id
      GROUP BY ex.query_id
    )
    SELECT s.query_id, s.n_exact,
           CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
           s.n_hit,
           ROUND(CAST(s.n_hit AS DOUBLE) / s.n_exact, 4) AS recall,
           ROUND(CAST(s.n_hit AS DOUBLE) / NULLIF(c.n_candidates, 0), 4)
             AS precision
    FROM stats s LEFT JOIN csz c ON s.query_id = c.query_id
    ORDER BY s.query_id
    """,
)
def q149_ivf_multiprobe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF, audited: q148 measured single-probe sign-bit
    recall at ~27%, the classic fix is probing the neighbor cells most
    likely to hold the query's true neighbors -- here the query's own
    cell plus the three cells at sign-bit Hamming distance 1 (nprobe=4
    of 8). Same audit frame as q148 (per-query candidate recall and
    precision vs exact top-3), so the two queries read side by side as
    the recall/cost curve: 4x the probed cells buys the recall lift, at
    ~4x candidate volume.

    Scale notes: multi-probe stays an EQUI join -- the probe-cell list
    is exploded on the (tiny, broadcast) query side, never the corpus
    side, so the corpus shuffles zero extra rows and the candidate join
    key is still a single int. The exact ground-truth side is q148's
    whitelisted bounded-broadcast serving shape.
    """
    emb = valid_embeddings(spark, sf_dir)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
    )
    cell = (
        F.when(F.element_at("embedding", 1) > 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 2) > 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 3) > 0, 1).otherwise(0)
    )
    e = emb.select(
        "vec_id",
        as_double.alias("emb"),
        F.sqrt(dot(as_double, as_double)).alias("nrm"),
        cell.alias("cell"),
    )
    qf = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    sim = F.round(
        dot(F.col("qemb"), F.col("emb")) / (F.col("qnrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    exact = (
        e.crossJoin(F.broadcast(qf))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "vec_id")
    )
    probes = qf.select(
        "query_id",
        F.explode(
            F.array(
                F.col("qcell"),
                F.col("qcell").bitwiseXOR(F.lit(1)),
                F.col("qcell").bitwiseXOR(F.lit(2)),
                F.col("qcell").bitwiseXOR(F.lit(4)),
            )
        ).alias("probe"),
    )
    cand = (
        e.join(F.broadcast(probes), F.col("probe") == F.col("cell"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    csz = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    stats = (
        exact.join(cand.withColumn("hit", F.lit(1)), ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("hit").cast("bigint").alias("n_hit"),
        )
    )
    return (
        stats.join(csz, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("bigint")
            .alias("n_candidates"),
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 4).alias(
                "recall"
            ),
            F.round(
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                4,
            ).alias("precision"),
        )
        .orderBy("query_id")
    )


@declared(
    "q183_ivf_adaptive_probe",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
             (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS cell
      FROM embeddings
    ),
    cell_sizes AS (
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS cell_n FROM e GROUP BY cell
    ),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
    queries AS (SELECT * FROM e WHERE vec_id < 5),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(list_dot_product(q.emb, c.emb)
                                / (q.nrm * c.nrm), 4) DESC, c.vec_id) AS rn
        FROM queries q JOIN e c ON q.vec_id <> c.vec_id
      ) WHERE rn <= 3
    ),
    ranked AS (
      SELECT q.vec_id AS query_id,
             xor(q.cell, m.mask) AS probe,
             (CASE WHEN m.mask & 4 = 4 THEN abs(q.emb[1]) ELSE 0.0 END
              + CASE WHEN m.mask & 2 = 2 THEN abs(q.emb[2]) ELSE 0.0 END
              + CASE WHEN m.mask & 1 = 1 THEN abs(q.emb[3]) ELSE 0.0 END)
               AS cost,
             m.mask
      FROM queries q, (SELECT UNNEST(range(8)) AS mask) m
    ),
    budgeted AS (
      SELECT r.query_id, r.probe,
             COALESCE(cs.cell_n, 0) AS this_n,
             SUM(COALESCE(cs.cell_n, 0)) OVER (
               PARTITION BY r.query_id ORDER BY r.cost, r.mask
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM ranked r LEFT JOIN cell_sizes cs ON r.probe = cs.cell
    ),
    chosen AS (
      SELECT query_id, probe FROM budgeted, corpus
      WHERE cum - this_n < (7 * n + 9) // 10
    ),
    nprobes AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_probes
      FROM chosen GROUP BY query_id
    ),
    cand AS (
      SELECT DISTINCT p.query_id, c.vec_id
      FROM chosen p JOIN e c ON p.probe = c.cell
      WHERE p.query_id <> c.vec_id
    ),
    csz AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY query_id
    ),
    stats AS (
      SELECT ex.query_id,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(COUNT(cd.vec_id) AS BIGINT) AS n_hit
      FROM exact ex
      LEFT JOIN cand cd
        ON ex.query_id = cd.query_id AND ex.vec_id = cd.vec_id
      GROUP BY ex.query_id
    )
    SELECT s.query_id, p.n_probes, s.n_exact,
           CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
           s.n_hit,
           ROUND(CAST(s.n_hit AS DOUBLE) / s.n_exact, 4) AS recall,
           ROUND(CAST(s.n_hit AS DOUBLE) / NULLIF(c.n_candidates, 0), 4)
             AS precision
    FROM stats s
    LEFT JOIN csz c ON s.query_id = c.query_id
    LEFT JOIN nprobes p ON s.query_id = p.query_id
    ORDER BY s.query_id
    """,
)
def q183_ivf_adaptive_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive budget-bounded multi-probe IVF, audited (the third point
    on the q148/q149 recall/cost curve): instead of a FIXED probe count,
    each query ranks all cells by boundary distance -- the flip cost of
    a cell is the sum of |component| over the sign bits it flips (Lv et
    al.'s multi-probe LSH ordering, VLDB'07) -- and probes cells in that
    order until the cumulative candidate count reaches a budget of 70%
    of the corpus. Measured on the driver testdata this lifts candidate
    recall to 0.87-1.0 (sf0.01-0.1) from q148's 0.27 single-probe and
    q149's 0.60 fixed-nprobe, at ~6x the single-cell candidate cost --
    within the <=8x envelope. The honest caveat is IN the numbers:
    these embeddings are weakly clustered (mean pairwise cosine ~0,
    top-3 neighbor sims ~0.34), so high recall genuinely requires most
    of the corpus; the audit exists to SHOW that, not hide it.

    Scale notes: probe ranking runs entirely on the tiny broadcast query
    side (8 masks per query exploded from a sequence); cell sizes come
    from one GROUP BY over the corpus; candidate retrieval stays a
    single-int equi-join, so the corpus never shuffles more than q148's
    plan. The budget rule (cum BEFORE this cell < budget) is a window
    cumsum over 8 rows/query -- driver-state-free, unlike a collect()ed
    probe loop. Flip costs are fixed-order sums of exact doubles, so
    the probe ORDER is bit-identical across engines (the property the
    hash gate rides on).
    """
    emb = valid_embeddings(spark, sf_dir)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
    )
    cell = (
        F.when(F.element_at("embedding", 1) > 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 2) > 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 3) > 0, 1).otherwise(0)
    )
    e = emb.select(
        "vec_id",
        as_double.alias("emb"),
        F.sqrt(dot(as_double, as_double)).alias("nrm"),
        cell.alias("cell"),
    )
    cell_sizes = e.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cell_n")
    )
    n_corpus = e.count()  # one scalar; the budget literal both sides derive
    budget = (7 * n_corpus + 9) // 10
    qf = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    sim = F.round(
        dot(F.col("qemb"), F.col("emb")) / (F.col("qnrm") * F.col("nrm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    exact = (
        e.crossJoin(F.broadcast(qf))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "vec_id")
    )
    mask = F.col("mask")
    flip = lambda bit, idx: (  # noqa: E731
        F.when(
            mask.bitwiseAND(F.lit(bit)) == bit,
            F.abs(F.element_at("qemb", idx)),
        ).otherwise(F.lit(0.0))
    )
    ranked = (
        qf.select("query_id", "qemb", "qcell")
        .withColumn("mask", F.explode(F.sequence(F.lit(0), F.lit(7))))
        .select(
            "query_id",
            F.col("qcell").bitwiseXOR(mask).alias("probe"),
            (flip(4, 1) + flip(2, 2) + flip(1, 3)).alias("cost"),
            "mask",
        )
    )
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy("cost", "mask")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = (
        ranked.join(F.broadcast(cell_sizes), ranked.probe == cell_sizes.cell, "left")
        .select(
            "query_id",
            "probe",
            F.coalesce("cell_n", F.lit(0)).alias("this_n"),
            "cost",
            "mask",
        )
        .withColumn("cum", F.sum("this_n").over(w_cum))
    )
    chosen = budgeted.filter(
        F.col("cum") - F.col("this_n") < F.lit(budget)
    ).select("query_id", "probe")
    nprobes = chosen.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes")
    )
    cand = (
        e.join(F.broadcast(chosen), F.col("probe") == F.col("cell"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    csz = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    stats = (
        exact.join(cand.withColumn("hit", F.lit(1)), ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("hit").cast("bigint").alias("n_hit"),
        )
    )
    return (
        stats.join(csz, "query_id", "left")
        .join(nprobes, "query_id", "left")
        .select(
            "query_id",
            "n_probes",
            "n_exact",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("bigint")
            .alias("n_candidates"),
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 4).alias(
                "recall"
            ),
            F.round(
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                4,
            ).alias("precision"),
        )
        .orderBy("query_id")
    )


@declared(
    "q151_gif_decode",
    oracle="""
    WITH grid AS (
      SELECT d.doc_id, tx.x, ty.y,
             ((tx.x * ty.y + d.doc_id) % 4) AS ix
      FROM documents d, range(16) tx(x), range(16) ty(y)
      WHERE d.doc_id < 200
    ),
    lum AS (
      SELECT doc_id,
             (ty_cell * 2 + tx_cell) AS cell,
             (299 * ((doc_id * 13 + ix * 40) % 256)
              + 587 * ((doc_id * 7 + ix * 40) % 256)
              + 114 * ((doc_id * 29 + ix * 40) % 256)) // 1000 AS l
      FROM (SELECT doc_id, ix, (x // 8) AS tx_cell, (y // 8) AS ty_cell
            FROM grid)
    )
    SELECT doc_id,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 0 THEN l END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c00,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 1 THEN l END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c01,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 2 THEN l END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c10,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 3 THEN l END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c11
    FROM lum GROUP BY doc_id ORDER BY doc_id
    """,
)
def q151_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode in the oracle gate (B48's compressed-image modality;
    completes the vendored codec family png/jpeg/wav/y4m with a
    dictionary-compressed format): per row a 16x16 4-color paletted GIF89a
    is synthesized worker-side -- pixel index (x*y + doc_id) % 4, palette
    channel c_k = (doc_id*{13,7,29} + ix*40) % 256 -- LZW-compressed by the
    vendored encoder, shipped as a binary media column, and decoded back by
    ``extract_features(mode='strict')``: magic-sniff -> variable-width LZW
    decompress -> palette expand -> Rec.601 luma 2x2 grid.

    The multiplicative index pattern makes each grid cell's mean DIFFERENT
    (unlike an additive pattern, which is translation-invariant across
    cells), so a decode that scrambles pixel ORDER -- not just values --
    fails the oracle. Cell means are integer sums / 64 / 255.0; both
    engines quantize through float32 (Spark's array<float>, DuckDB
    CAST AS REAL) so the 6-decimal compare is exact, not tolerance-based.

    Scale notes: synth and decode are mapInPandas kernels over Arrow
    batches; payload bytes never leave the executor; LZW is per-image
    bounded work. The reference has no media path (`app/app.py:1-149`) --
    this extends SURVEY section 2.2 B48.
    """
    from iot_data_pipeline_spark.operators.multimodal import extract_features

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import gif as _gif

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                palette = [
                    (
                        (d * 13 + ix * 40) % 256,
                        (d * 7 + ix * 40) % 256,
                        (d * 29 + ix * 40) % 256,
                    )
                    for ix in range(4)
                ]
                indices = bytes(
                    (x * y + d) % 4 for y in range(16) for x in range(16)
                )
                blobs.append(_gif.encode_gif(16, 16, palette, indices))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = extract_features(media, dim=4, mode="strict")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.round(F.col("features")[0].cast("double"), 6).alias("c00"),
        F.round(F.col("features")[1].cast("double"), 6).alias("c01"),
        F.round(F.col("features")[2].cast("double"), 6).alias("c10"),
        F.round(F.col("features")[3].cast("double"), 6).alias("c11"),
    ).orderBy("doc_id")


@declared(
    "q186_adam7_palette_png",
    oracle="""
    WITH grid AS (
      SELECT d.doc_id, tx.x, ty.y,
             ((tx.x * ty.y + d.doc_id) % 4) AS ix
      FROM documents d, range(16) tx(x), range(16) ty(y)
      WHERE d.doc_id < 200
    ),
    lum AS (
      SELECT doc_id,
             ((y // 8) * 2 + (x // 8)) AS cell,
             ((doc_id * 11 + ix * 60) % 256) AS v
      FROM grid
    )
    SELECT doc_id,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 0 THEN v END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c00,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 1 THEN v END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c01,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 2 THEN v END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c10,
           ROUND(CAST(CAST(AVG(CASE WHEN cell = 3 THEN v END) / 255.0
                           AS REAL) AS DOUBLE), 6) AS c11
    FROM lum GROUP BY doc_id ORDER BY doc_id
    """,
)
def q186_adam7_palette_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adam7-INTERLACED PALETTE PNG decode in the oracle gate -- the two
    PNG features round 5 added to the vendored codec (previously
    refused), proven together under the driver's hash gate: per row a
    16x16 depth-2 indexed image (4 greyscale palette entries derived
    from doc_id) is written as an interlaced color-type-3 PNG
    worker-side, shipped through the binary media column, and decoded
    by ``extract_features(mode='strict')`` -- seven-pass de-interlace,
    sub-byte index unpacking, PLTE expansion, Rec.601 luma grid. Grey
    palette entries make luma == the palette value exactly
    ((299+587+114)v // 1000 = v), so the oracle is pure integer
    arithmetic over the generative formula; the REAL cast mirrors the
    kernel's float32 feature column (the q151 rule).

    Scale notes: q130/q151/q185's kernel shape exactly -- synth and
    decode are mapInPandas Arrow kernels, bytes never leave the
    executor, per-image cost is embarrassingly parallel.
    """
    from iot_data_pipeline_spark.operators.multimodal import extract_features

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import png as _png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pal = [((d * 11 + ix * 60) % 256,) * 3 for ix in range(4)]
                idx = bytes(
                    (x * y + d) % 4 for y in range(16) for x in range(16)
                )
                blobs.append(
                    _png.encode_png_palette(
                        16, 16, pal, idx, depth=2, interlace=True
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = extract_features(media, dim=4, mode="strict")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.round(F.col("features")[0].cast("double"), 6).alias("c00"),
        F.round(F.col("features")[1].cast("double"), 6).alias("c01"),
        F.round(F.col("features")[2].cast("double"), 6).alias("c10"),
        F.round(F.col("features")[3].cast("double"), 6).alias("c11"),
    ).orderBy("doc_id")


_Q154_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE doc_id < 200
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             array_to_string(t[CAST(i * 16 + 1 AS INT):CAST((i + 1) * 16 AS INT)], ' ')
               AS chunk
      FROM toks, LATERAL UNNEST(range(0, (len(t) + 15) // 16)) AS u(i)
    ),
    emb AS (
      SELECT doc_id, chunk_idx, chunk, {{emb_sql}} AS e FROM chunks
    ),
    celled AS (
      SELECT doc_id, chunk_idx, chunk, e,
             sqrt(list_dot_product(e, e)) AS nrm,
             (CASE WHEN e[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN e[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN e[3] > 0 THEN 1 ELSE 0 END) AS cell
      FROM emb
    ),
    q AS (SELECT * FROM celled WHERE doc_id < 3),
    scored AS (
      SELECT q.doc_id AS q_doc, q.chunk_idx AS q_chunk,
             c.doc_id AS hit_doc, c.chunk_idx AS hit_chunk,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 4) AS sim,
             q.chunk AS q_text, c.chunk AS h_text
      FROM q JOIN celled c
        ON q.cell = c.cell AND q.doc_id <> c.doc_id
      WHERE q.nrm > 0 AND c.nrm > 0
    ),
    stage1 AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY q_doc, q_chunk
          ORDER BY sim DESC, hit_doc, hit_chunk) AS rn
        FROM scored
      ) WHERE rn <= 3
    ),
    reranked AS (
      SELECT q_doc, q_chunk, hit_doc, hit_chunk, sim,
             ROUND(
               CAST(len(list_intersect(list_distinct(string_split(q_text, ' ')),
                                       list_distinct(string_split(h_text, ' '))))
                    AS DOUBLE)
               / len(list_distinct(list_concat(string_split(q_text, ' '),
                                               string_split(h_text, ' ')))),
               4) AS ce_score
      FROM stage1
    )
    SELECT q_doc, q_chunk, hit_doc, hit_chunk, sim AS bi_sim, ce_score FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_doc, q_chunk
        ORDER BY ce_score DESC, sim DESC, hit_doc, hit_chunk) AS rr
      FROM reranked
    ) WHERE rr = 1 ORDER BY q_doc, q_chunk
    """.format(emb_sql=_EMB_SQL)


@declared("q154_rag_rerank", oracle=_Q154_ORACLE)
def q154_rag_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with reranking -- the serving pattern every RAG
    stack runs: q143's cheap bi-encoder tier (hash embeddings + IVF cells)
    nominates top-3 candidates per query chunk, then an expensive
    'cross-encoder' tier re-scores each (query, candidate) PAIR and keeps
    the winner. The pair scorer here is token-set Jaccard between the two
    chunk texts (deterministic and SQL-restatable -- the cross-engine
    stand-in for a model cross-encoder, same posture as q143's hash
    embeddings; a pandas-UDF model kernel drops into the ce_score column
    exactly like b06_rag_encoder does for embeddings).

    Scale notes: the expensive tier touches ONLY stage-1 survivors (<= 3
    pairs per query chunk), which is the whole point of the architecture
    -- rerank cost is O(queries x k), not O(queries x corpus). Chunk
    texts are joined back to the candidate list by (doc_id, chunk_idx)
    with the tiny candidate side broadcast; ties broken (ce_score, sim,
    hit_doc, hit_chunk) per SURVEY section 2.3 rule 1.
    """
    chunks = rag_chunks(spark, sf_dir)
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda d: (
            portable_hash(
                F.concat(
                    F.lit("emb:"), F.col("chunk"), F.lit(":"), d.cast("string")
                )
            )
            % 2001
            - 1000
        ).cast("double")
        / 1000.0,
    )
    stage1 = rag_retrieve(chunks.select("doc_id", "chunk_idx", emb.alias("e")))
    qtext = chunks.select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_idx").alias("q_chunk"),
        F.col("chunk").alias("q_text"),
    )
    htext = chunks.select(
        F.col("doc_id").alias("hit_doc"),
        F.col("chunk_idx").alias("hit_chunk"),
        F.col("chunk").alias("h_text"),
    )
    paired = (
        F.broadcast(stage1)
        .join(qtext, ["q_doc", "q_chunk"])
        .join(htext, ["hit_doc", "hit_chunk"])
    )
    qt = F.array_distinct(F.split("q_text", " "))
    ht = F.array_distinct(F.split("h_text", " "))
    reranked = paired.withColumn(
        "ce_score",
        F.round(
            F.size(F.array_intersect(qt, ht)).cast("double")
            / F.size(F.array_union(qt, ht)),
            4,
        ),
    )
    w = Window.partitionBy("q_doc", "q_chunk").orderBy(
        F.desc("ce_score"), F.desc("sim"), "hit_doc", "hit_chunk"
    )
    return (
        reranked.withColumn("rr", F.row_number().over(w))
        .filter(F.col("rr") == 1)
        .select(
            "q_doc",
            "q_chunk",
            "hit_doc",
            "hit_chunk",
            F.col("sim").alias("bi_sim"),
            "ce_score",
        )
        .orderBy("q_doc", "q_chunk")
    )


def _band_keys_sql_for(sigs_table: str) -> str:
    rows = []
    per_band = N_MINHASH // N_BANDS
    for b in range(N_BANDS):
        cols = ", ".join(f"sig_{b * per_band + j}" for j in range(per_band))
        rows.append(
            f"SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS key "
            f"FROM {sigs_table}"
        )
    return "\n      UNION ALL\n      ".join(rows)


_Q156_ORACLE = f"""
    WITH hist AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    batch AS (
      SELECT doc_id + 100000 AS doc_id,
             array_to_string(
               (string_split(text, ' '))[1:greatest(len(string_split(text, ' ')) - 3, 0)],
               ' ') AS text
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    ),
    corpus AS (
      SELECT 'h' AS side, doc_id, text FROM hist
      UNION ALL
      SELECT 'b' AS side, doc_id, text FROM batch
    ),
    shingled AS (
      SELECT side, doc_id, unnest(
        list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
          i -> string_split(text, ' ')[i] || ' ' ||
               string_split(text, ' ')[i+1] || ' ' ||
               string_split(text, ' ')[i+2])) AS shingle
      FROM corpus
    ),
    hashed AS (
      SELECT side, doc_id, {ORACLE_HASH.format("shingle")} AS h FROM shingled
    ),
    sigs AS (
      SELECT side, doc_id,
           {_minhash_sig_sql()}
      FROM hashed GROUP BY side, doc_id
    ),
    hsigs AS (SELECT * EXCLUDE (side) FROM sigs WHERE side = 'h'),
    bsigs AS (SELECT * EXCLUDE (side) FROM sigs WHERE side = 'b'),
    hbands AS (
      {_band_keys_sql_for("hsigs")}
    ),
    bbands AS (
      {_band_keys_sql_for("bsigs")}
    ),
    cand AS (
      SELECT DISTINCT b.doc_id AS batch_doc, h.doc_id AS hist_doc
      FROM bbands b JOIN hbands h ON b.band = h.band AND b.key = h.key
    )
    SELECT bt.doc_id AS batch_doc,
           CAST(COUNT(c.hist_doc) AS BIGINT) AS n_index_hits,
           CASE WHEN COUNT(c.hist_doc) > 0 THEN 1 ELSE 0 END AS is_near_dup
    FROM batch bt LEFT JOIN cand c ON c.batch_doc = bt.doc_id
    GROUP BY bt.doc_id
    HAVING COUNT(c.hist_doc) > 0
    ORDER BY batch_doc
    """


@declared("q156_incremental_lsh", oracle=_Q156_ORACLE)
def q156_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup screening of an arriving batch against a
    persisted MinHash-LSH index -- the q119 pattern (incremental exact
    dedup via digest index) lifted to the q23 near-dup tier: the
    historical corpus's band keys ARE the index; an arriving batch is
    signed with the identical hash family and probed by band-bucket
    equi-join, so each new doc learns its near-duplicate predecessors
    without any batch-vs-history all-pairs work. The batch deliberately
    mixes truncated copies of history docs (must hit) with unseen odd-id
    docs (may hit only by LSH coincidence); emitted rows are the flagged
    docs with their index-hit counts.

    Scale story: at 100 TB the ``hbands`` frame is a *persisted* table
    (written once, partitioned by (band, key-prefix)); per-arrival cost is
    shingle+sign the BATCH only, then one equi-join against the index --
    linear in batch size, never touching history text. Signatures for
    both sides here derive in one shared pass (same-plan guarantee that
    index and probe use the identical hash family). The band join
    shuffles 8-byte ids + band keys, not text (the q23 rule).

    Reference parity: the reference re-reads everything per run
    (`app/app.py:29-43`); SURVEY section 2.2 B45 names incremental
    near-dup as the scale path.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 2 == 0).withColumn("side", F.lit("h"))
    toks = F.split("text", " ")
    trunc = F.concat_ws(
        " ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(0)))
    )
    batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), trunc.alias("text"))
        .unionByName(docs.filter(F.col("doc_id") % 2 == 1))
        .withColumn("side", F.lit("b"))
    )
    corpus = hist.unionByName(batch)
    hashed = _shingle_hashes(
        corpus.withColumnRenamed("side", "lang"), distinct=False
    ).select("doc_id", F.col("lang").alias("side"), "h")
    per_band = N_MINHASH // N_BANDS
    sigs = hashed.groupBy("side", "doc_id").agg(
        *[
            F.min((F.lit(37 + 61 * i) * F.col("h") + F.lit(91 + 17 * i)) % MOD).alias(
                f"sig_{i}"
            )
            for i in range(N_MINHASH)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",", *[f"sig_{b * per_band + j}" for j in range(per_band)]
                ).alias("key"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = (
        sigs.select("side", "doc_id", F.explode(band_structs).alias("bk"))
        .select("side", "doc_id", "bk.band", "bk.key")
        .localCheckpoint(eager=True)
    )
    hbands = bands.filter(F.col("side") == "h").select(
        F.col("doc_id").alias("hist_doc"), "band", "key"
    )
    bbands = bands.filter(F.col("side") == "b").select(
        F.col("doc_id").alias("batch_doc"), "band", "key"
    )
    cand = (
        bbands.join(hbands, ["band", "key"])
        .select("batch_doc", "hist_doc")
        .distinct()
    )
    return (
        cand.groupBy("batch_doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_index_hits"))
        .withColumn("is_near_dup", F.lit(1))
        .orderBy("batch_doc")
    )


@declared(
    "q159_audio_spectral_probe",
    oracle="""
    WITH samples AS (
      SELECT d.doc_id, tn.n,
             ((d.doc_id * 31 + tn.n * tn.n * 7) % 2001) - 1000 AS x
      FROM documents d, range(64) tn(n)
      WHERE d.doc_id < 150
    )
    SELECT doc_id,
           CAST(ABS(SUM(x)) AS BIGINT) AS dc_mag,
           CAST(ABS(SUM(CASE WHEN n % 2 = 0 THEN x ELSE -x END)) AS BIGINT)
             AS nyquist_mag,
           CAST(COUNT(*) AS BIGINT) AS n_samples
    FROM samples GROUP BY doc_id ORDER BY doc_id
    """,
)
def q159_audio_spectral_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral probe features over REAL decoded audio (extends q124's
    time-domain features with frequency-domain ones): per row a 64-sample
    PCM WAV -- x_n = ((doc_id*31 + 7n^2) % 2001) - 1000 -- is synthesized,
    RIFF-encoded, decoded back by the vendored parser, and probed at the
    two DFT bins whose twiddle factors are EXACTLY +-1: DC (bin 0, plain
    sum) and Nyquist (bin N/2, alternating sum). Those bins are integer
    arithmetic end-to-end, so the oracle states them in closed form with
    no float tolerance -- deliberately unlike interior bins, whose
    irrational twiddles would make cross-engine bit-parity depend on libm
    (documented boundary: a production FFT kernel -- numpy.fft over the
    same decoded arrays -- drops into this exact mapInPandas signature and
    is what you'd deploy; these two bins are its verifiable skeleton).

    Scale notes: synth/decode/probe all run inside one Arrow-batched
    kernel; the probe is a vectorized numpy dot with a +-1 vector per
    batch, not per sample; payloads never leave the executor.
    """
    import pyspark.sql.types as T

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from iot_data_pipeline_spark.operators import audio as _audio

        alt = np.where(np.arange(64) % 2 == 0, 1, -1).astype(np.int64)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = np.arange(64, dtype=np.int64)
                x = ((d * 31 + 7 * n * n) % 2001) - 1000
                blob = _audio.encode_wav([int(v) for v in x])
                _, _, decoded = _audio.decode_wav(blob)
                arr = np.asarray(decoded, dtype=np.int64)
                rows.append(
                    (
                        d,
                        int(abs(arr.sum())),
                        int(abs((arr * alt).sum())),
                        int(arr.size),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "dc_mag", "nyquist_mag", "n_samples"]
            )

    out = docs.select("doc_id").mapInPandas(
        kernel,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("dc_mag", T.LongType()),
                T.StructField("nyquist_mag", T.LongType()),
                T.StructField("n_samples", T.LongType()),
            ]
        ),
    )
    return out.orderBy("doc_id")


@declared(
    "q160_media_dead_letter",
    oracle="""
    WITH cls AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                             WHEN 2 THEN 'wav' ELSE 'corrupt' END AS payload_class
      FROM documents WHERE doc_id < 240
    )
    SELECT payload_class,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(CASE WHEN payload_class IN ('png', 'gif')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded,
           CAST(SUM(CASE WHEN payload_class IN ('wav', 'corrupt')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_routed,
           CASE payload_class
             WHEN 'wav' THEN 'NotImplementedError'
             WHEN 'corrupt' THEN 'PngFormatError'
           END AS error_kind,
           ROUND(AVG(CASE WHEN payload_class IN ('png', 'gif')
                          THEN ((doc_id * 19) % 256) // 1 / 255.0 END), 6)
             AS mean_luma
    FROM cls
    GROUP BY payload_class ORDER BY payload_class
    """,
)
def q160_media_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-media tolerance in the decode kernel (the media twin of the
    reference's corrupt-record dead-letter channel, `app/app.py:60-66`,
    A13): a mixed payload stream -- solid-gray PNGs, solid-gray GIFs, WAV
    payloads (wrong modality for an image kernel), and truncated PNGs --
    runs through ``extract_features(mode='tolerant')``, which yields NULL
    features plus the error CLASS NAME instead of failing the job. The
    audit aggregates per payload class: decode counts, routed counts, the
    error kind (exact string -- class names are deterministic), and the
    mean luma of successfully decoded images (gray level (doc_id*19)%256,
    so the oracle states it in closed form; grayscale makes the Rec.601
    weighting drop out: luma == gray for PNG and GIF alike).

    Scale story: one bad blob must never kill a 100 TB media scan --
    tolerance lives INSIDE the Arrow kernel (per-payload try/route, zero
    extra passes), and the error column is a plain string the downstream
    dead-letter sink filters on, exactly like the JSONL corrupt-record
    path (q13). Decode work for routed rows stops at the first header
    violation, so poison payloads are cheap, not just survivable.
    """
    from iot_data_pipeline_spark.operators.multimodal import extract_features

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)

    def synth(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import audio as _audio
        from iot_data_pipeline_spark.operators import gif as _gif
        from iot_data_pipeline_spark.operators import png as _png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = (d * 19) % 256
                if d % 4 == 0:
                    blobs.append(_png.encode_png(4, 4, 3, bytes([g] * 48)))
                elif d % 4 == 1:
                    blobs.append(
                        _gif.encode_gif(4, 4, [(g, g, g), (0, 0, 0)], bytes(16))
                    )
                elif d % 4 == 2:
                    blobs.append(_audio.encode_wav([1000] * 64))
                else:
                    blobs.append(b"\x89PNG\r\n\x1a\n" + b"garbagegarbage")
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": blobs})

    import pyspark.sql.types as T

    media = docs.select("doc_id").mapInPandas(
        synth,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    feats = extract_features(media, dim=1, mode="tolerant")
    classed = feats.select(
        F.col("media_id").alias("doc_id"),
        F.element_at("features", 1).cast("double").alias("f0"),
        "decode_error",
        F.when(F.col("media_id") % 4 == 0, "png")
        .when(F.col("media_id") % 4 == 1, "gif")
        .when(F.col("media_id") % 4 == 2, "wav")
        .otherwise("corrupt")
        .alias("payload_class"),
    )
    return (
        classed.groupBy("payload_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
            F.count("f0").cast("bigint").alias("n_decoded"),
            F.count("decode_error").cast("bigint").alias("n_routed"),
            F.min("decode_error").alias("error_kind"),
            F.round(F.avg("f0"), 6).alias("mean_luma"),
        )
        .orderBy("payload_class")
    )


@declared(
    "q161_gif_animation_sample",
    oracle="""
    WITH frames AS (
      SELECT d.doc_id, tf.f
      FROM documents d, range(6) tf(f)
      WHERE d.doc_id < 150 AND tf.f % 2 = 0
    ),
    cells AS (
      SELECT doc_id, f, tx.x, ty.y,
             ((tx.x + ty.y * 2 + doc_id + f) % 4) AS ix
      FROM frames, range(8) tx(x), range(8) ty(y)
    )
    SELECT doc_id,
           CAST(f AS BIGINT) AS frame_idx,
           ROUND(AVG(CAST(((doc_id * 13 + ix * 40) % 256) AS DOUBLE)), 4)
             AS mean_gray,
           CAST(6 AS BIGINT) AS n_frames_total
    FROM cells
    GROUP BY doc_id, f ORDER BY doc_id, frame_idx
    """,
)
def q161_gif_animation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF frame sampling (the GIF twin of q135's Y4M video
    path): per row a 6-frame 8x8 animation is synthesized -- frame f's
    pixel index is (x + 2y + doc_id + f) % 4 over a gray 4-level palette
    g(ix) = (doc_id*13 + ix*40) % 256 -- encoded with per-frame
    graphic-control extensions and a NETSCAPE loop block, decoded back by
    ``decode_gif_frames`` (every frame LZW-decompressed under the shared
    global table), and every SECOND frame is kept with its mean gray
    level. Frame selection after decode mirrors video keyframe sampling;
    the oracle states each sampled frame's mean in closed form, so a
    decoder that miscounts frames, misorders them, or bleeds dictionary
    state across frame boundaries fails the hash.

    Scale notes: one Arrow-batched kernel synthesizes, decodes, and
    samples; the frame explosion happens INSIDE the kernel (6 frames ->
    3 rows per doc emitted), so unsampled frames never reach the plan.
    """
    import pyspark.sql.types as T

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)

    def kernel(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import gif as _gif

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pal = [((d * 13 + ix * 40) % 256,) * 3 for ix in range(4)]
                frames = [
                    bytes(
                        (x + 2 * y + d + f) % 4
                        for y in range(8)
                        for x in range(8)
                    )
                    for f in range(6)
                ]
                blob = _gif.encode_gif_animation(8, 8, pal, frames)
                w, h, dpal, dframes = _gif.decode_gif_frames(blob)
                for f in range(0, len(dframes), 2):
                    grays = [dpal[ix][0] for ix in dframes[f]]
                    rows.append(
                        (d, f, round(sum(grays) / len(grays), 4), len(dframes))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "mean_gray", "n_frames_total"],
            )

    out = docs.select("doc_id").mapInPandas(
        kernel,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("frame_idx", T.LongType()),
                T.StructField("mean_gray", T.DoubleType()),
                T.StructField("n_frames_total", T.LongType()),
            ]
        ),
    )
    return out.orderBy("doc_id", "frame_idx")


@declared(
    "q176_retrieval_ndcg",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
             (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS cell
      FROM embeddings
    ),
    queries AS (SELECT * FROM e WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id, c.cell,
             q.cell AS qcell,
             ROUND(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 4) AS sim
      FROM queries q JOIN e c ON q.vec_id <> c.vec_id
    ),
    exact AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS erank
      FROM scored
    ),
    rel AS (
      SELECT query_id, vec_id,
             CASE WHEN erank <= 3 THEN 4 - erank ELSE 0 END AS rel
      FROM exact
    ),
    approx AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS arank
      FROM scored WHERE cell = qcell
    ),
    alist AS (SELECT * FROM approx WHERE arank <= 3),
    gains AS (
      SELECT a.query_id,
             SUM(r.rel / log2(a.arank + 1.0)) AS dcg,
             MAX(CASE WHEN r.rel = 3 THEN 1.0 / a.arank ELSE 0 END) AS mrr
      FROM alist a JOIN rel r
        ON a.query_id = r.query_id AND a.vec_id = r.vec_id
      GROUP BY a.query_id
    ),
    idcg AS (
      SELECT 3.0 / log2(2.0) + 2.0 / log2(3.0) + 1.0 / log2(4.0) AS v
    )
    SELECT q.vec_id AS query_id,
           ROUND(COALESCE(g.dcg, 0) / (SELECT v FROM idcg), 4) AS ndcg3,
           ROUND(COALESCE(g.mrr, 0), 4) AS mrr
    FROM queries q LEFT JOIN gains g ON g.query_id = q.vec_id
    ORDER BY query_id
    """,
)
def q176_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-retrieval quality metrics for the approximate tier --
    nDCG@3 and MRR, the numbers a retrieval stack reports, not just
    candidate recall (q148 counts hits; this scores ORDER): the exact
    whole-corpus ranking defines graded relevance (top-1 -> 3, top-2 ->
    2, top-3 -> 1, else 0), the IVF-cell tier produces its own ranked
    top-3, and each query scores DCG over the approximate list's ranks
    against the ideal DCG, plus reciprocal rank of the true best
    neighbor. Queries whose cell ranking misses everything score 0 --
    kept via left join (an audit that silently drops its failures is
    not an audit).

    Scale notes: same frame shapes as q148 (bounded query side
    broadcast; cell equi-join for the approximate tier; per-query
    reductions before the tiny metric join); log2 parity follows the
    q132/q163 libm precedent with ROUND-after-aggregate.
    """
    emb = valid_embeddings(spark, sf_dir)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
    )
    cell = (
        F.when(F.element_at("embedding", 1) > 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 2) > 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 3) > 0, 1).otherwise(0)
    )
    e = emb.select(
        "vec_id",
        as_double.alias("emb"),
        F.sqrt(dot(as_double, as_double)).alias("nrm"),
        cell.alias("cell"),
    )
    qf = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.col("cell").alias("qcell"),
    )
    sim = F.round(
        dot(F.col("qemb"), F.col("emb")) / (F.col("qnrm") * F.col("nrm")), 4
    )
    scored = (
        e.crossJoin(F.broadcast(qf))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", "cell", "qcell", sim.alias("sim"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    rel = scored.withColumn("erank", F.row_number().over(w)).select(
        "query_id",
        "vec_id",
        F.when(F.col("erank") <= 3, 4 - F.col("erank")).otherwise(0).alias("rel"),
    )
    alist = (
        scored.filter(F.col("cell") == F.col("qcell"))
        .withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= 3)
        .select("query_id", "vec_id", "arank")
    )
    gains = (
        alist.join(rel, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(
            F.sum(F.col("rel") / F.log2(F.col("arank") + 1.0)).alias("dcg"),
            F.max(
                F.when(F.col("rel") == 3, 1.0 / F.col("arank")).otherwise(0.0)
            ).alias("mrr"),
        )
    )
    import math

    idcg = 3.0 / math.log2(2.0) + 2.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    return (
        qf.select("query_id")
        .join(gains, "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 4).alias("ndcg3"),
            F.round(F.coalesce(F.col("mrr"), F.lit(0.0)), 4).alias("mrr"),
        )
        .orderBy("query_id")
    )


def _q190_oracle() -> str:
    """Oracle for q190, generated from the SAME frozen integer twiddle/tone
    tables the kernel uses (operators/audio.py) -- single source of truth,
    so the gate proves exact cross-engine integer arithmetic; the tables'
    own correctness as a DFT is pinned separately by the numpy error-bound
    test (tests/test_audio_codec.py), keeping the check non-circular."""
    from iot_data_pipeline_spark.operators import audio

    def lst(vals) -> str:
        return "[" + ", ".join(str(v) for v in vals) + "]"

    tw_rows = ",\n      ".join(
        f"({k}, {lst(audio.DFT_COS_Q15[k])}, {lst(audio.DFT_SIN_Q15[k])})"
        for k in audio.DFT_BINS
    )
    tone_rows = ",\n      ".join(
        f"({k}, {lst(audio.TONE_Q11[k])})" for k in audio.DFT_BINS
    )
    return f"""
    WITH tw(bin, cosv, sinv) AS (VALUES
      {tw_rows}
    ),
    tone(bin, tonev) AS (VALUES
      {tone_rows}
    ),
    docs AS (
      SELECT doc_id, doc_id % 5 AS cls FROM documents WHERE doc_id < 200
    ),
    x AS (
      SELECT d.doc_id,
             CASE WHEN d.cls = 4 THEN 'noise' ELSE 'tone' END AS signal_class,
             n.n,
             CASE WHEN d.cls = 4
                  THEN ((d.doc_id * 37 + 11 * n.n * n.n * n.n + 5 * n.n)
                        % 4001) - 2000
                  ELSE t.tonev[n.n + 1] + (d.doc_id % 17) - 8
             END AS xv
      FROM docs d
      JOIN range(32) n(n) ON TRUE
      LEFT JOIN tone t
        ON t.bin = CASE d.cls WHEN 0 THEN 1 WHEN 1 THEN 3
                              WHEN 2 THEN 5 WHEN 3 THEN 7 END
    ),
    resp AS (
      SELECT x.doc_id, x.signal_class, tw.bin,
             SUM(x.xv * tw.cosv[x.n + 1]) AS re,
             -SUM(x.xv * tw.sinv[x.n + 1]) AS im
      FROM x JOIN tw ON TRUE
      GROUP BY x.doc_id, x.signal_class, tw.bin
    ),
    ranked AS (
      SELECT doc_id, signal_class, bin, re, im,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY re * re + im * im DESC, bin)
               AS mag_rank
      FROM resp
    )
    SELECT doc_id, signal_class, CAST(bin AS BIGINT) AS bin,
           CAST(re AS BIGINT) AS re, CAST(im AS BIGINT) AS im,
           CAST(mag_rank AS BIGINT) AS mag_rank
    FROM ranked ORDER BY doc_id, bin
    """


@declared("q190_interior_dft_probe", oracle=_q190_oracle())
def q190_interior_dft_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point INTERIOR-bin spectral probe over real decoded audio --
    closing the boundary q159 documents (q159 gates only the two bins
    whose twiddles are exactly +-1; interior bins have irrational
    twiddles, so a float DFT's cross-engine bit-parity would hinge on
    libm). The frozen Q15 integer twiddle tables (operators/audio.py)
    make bins 1/3/5/7 of a 32-point DFT exact integer arithmetic
    end-to-end: per doc a signal is synthesized -- 4 of 5 docs a
    quantized unit tone at one probed bin (plus a per-doc DC offset),
    the 5th pseudo-random noise -- RIFF-encoded, decoded back by the
    vendored WAV parser, and probed; outputs are the raw (re, im)
    integer responses at the 2^15 scale plus each bin's magnitude rank.
    The hash match proves tone rows peak at their own bin (mag_rank=1)
    cell-for-cell against the oracle's SQL restatement of the same
    integer tables.

    Scale notes: synth/encode/decode/probe run inside one Arrow-batched
    mapInPandas kernel (constant 200-doc probe, q159's shape); the probe
    is 4 integer dot products of length 32 per payload; magnitude
    squaring uses Python ints because (2^15 amplitude x 2^15 twiddle
    x 32)^2 overflows int64 -- the same reason the oracle keeps mag_rank
    internal to HUGEINT and outputs only re/im/rank.
    """
    import pyspark.sql.types as T

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def kernel(batches):
        import pandas as pd

        from iot_data_pipeline_spark.operators import audio as _audio

        bins = _audio.DFT_BINS
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cls = d % 5
                if cls == 4:
                    x = [
                        ((d * 37 + 11 * n**3 + 5 * n) % 4001) - 2000
                        for n in range(_audio.DFT_N)
                    ]
                    signal_class = "noise"
                else:
                    tone = _audio.TONE_Q11[bins[cls]]
                    off = (d % 17) - 8
                    x = [t + off for t in tone]
                    signal_class = "tone"
                blob = _audio.encode_wav(x)
                _, _, decoded = _audio.decode_wav(blob)
                resp = _audio.fixed_point_dft_bins(decoded)
                by_mag = sorted(
                    resp, key=lambda b: (-(resp[b][0] ** 2 + resp[b][1] ** 2), b)
                )
                rank = {b: i + 1 for i, b in enumerate(by_mag)}
                for b in bins:
                    re, im = resp[b]
                    rows.append((d, signal_class, b, re, im, rank[b]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "signal_class", "bin", "re", "im", "mag_rank",
                ],
            )

    out = docs.select("doc_id").mapInPandas(
        kernel,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("signal_class", T.StringType()),
                T.StructField("bin", T.LongType()),
                T.StructField("re", T.LongType()),
                T.StructField("im", T.LongType()),
                T.StructField("mag_rank", T.LongType()),
            ]
        ),
    )
    return out.orderBy("doc_id", "bin")

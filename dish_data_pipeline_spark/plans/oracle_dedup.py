"""DuckDB oracle SQL for the fuzzy-dedup operators.

These replicate the Spark pipelines in ``ops/dedup_fuzzy.py`` /
``ops/text.py`` EXACTLY — same portable 60-bit hash
(``ops.portable``), same permutations, same band keys — so the
candidate sets match pair-for-pair, including the algorithms'
false-negative behavior. That upgrades MinHash-LSH, SimHash, n-gram
Jaccard, and winnowing from rows-only checks to full value-hash
oracle verification: two independent implementations (Spark
higher-order expressions vs DuckDB list functions) of the same
algorithm must agree bitwise.
"""

from __future__ import annotations

from dish_data_pipeline_spark.ops.portable import duck_phash, perm_coeffs, perm_expr

TOKEN_RE_SQL = "[A-Za-z0-9]+"


def minhash_banded_ctes(
    corpus_sql: str,
    prefix: str = "",
    n_hashes: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
) -> str:
    """CTE chain ending in ``{prefix}banded(doc_id, minhash, band_id,
    band_hash)`` — the twin of with_shingles → with_minhash →
    with_band_buckets. ``prefix`` lets one query band two corpora
    (incremental dedup)."""
    p = prefix
    # shingles: n-token windows; < n tokens → one joined shingle.
    # (x, i) lambda indices are 1-based; out-of-range slots yield
    # NULL, which list_distinct drops (Spark never emits them).
    parts = " || ' ' || ".join(
        f"toks[i + {j}]" for j in range(shingle_n)
    )
    shingle_expr = (
        f"CASE WHEN len(toks) < {shingle_n} THEN [array_to_string(toks, ' ')] "
        f"ELSE list_distinct(list_transform(toks, (x, i) -> "
        f"CASE WHEN i <= len(toks) - {shingle_n - 1} THEN {parts} END)) END"
    )
    sig_exprs = ", ".join(
        f"list_min(list_transform(ph, x -> {perm_expr('x', a, b)}))"
        for a, b in perm_coeffs(n_hashes, seed)
    )
    band_ids = ", ".join(str(b) for b in range(bands))
    lo = f"(band_id * {rows_per_band} + 1)"
    hi = f"(band_id * {rows_per_band} + {rows_per_band})"
    band_str = f"array_to_string(minhash[{lo}:{hi}], '-')"
    return f"""
{p}corpus AS ({corpus_sql}),
{p}tok AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks FROM {p}corpus),
{p}sh AS (
  SELECT doc_id, {shingle_expr} AS shingles FROM {p}tok),
{p}ph AS (
  SELECT doc_id, shingles, list_transform(shingles, s -> {duck_phash('s')}) AS ph
  FROM {p}sh),
{p}sig AS (
  SELECT doc_id, shingles, [{sig_exprs}] AS minhash FROM {p}ph),
{p}banded AS (
  SELECT doc_id, minhash, band_id, {duck_phash(band_str)} AS band_hash
  FROM {p}sig CROSS JOIN (SELECT unnest([{band_ids}]) AS band_id)),"""


def minhash_pipeline_ctes(
    corpus_sql: str,
    n_hashes: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
) -> str:
    """CTE chain ending in ``scored(id_a, id_b, est_jaccard,
    jaccard)`` — the twin of with_shingles → with_minhash →
    minhash_candidate_pairs → exact_jaccard_pairs."""
    head = minhash_banded_ctes(
        corpus_sql, "", n_hashes, seed, shingle_n, bands, rows_per_band
    )
    return head + f"""
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id),
scored AS (
  SELECT p.id_a, p.id_b,
         CAST(len(list_filter(range(1, {n_hashes + 1}),
               j -> sa.minhash[j] = sb.minhash[j])) AS DOUBLE)
           / CAST({n_hashes} AS DOUBLE) AS est_jaccard,
         CAST(len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x)))
              AS DOUBLE)
           / CAST(len(sa.shingles) + len(sb.shingles)
               - len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x)))
              AS DOUBLE) AS jaccard
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.id_a
  JOIN sig sb ON sb.doc_id = p.id_b)
"""


def sql_minhash_neardup(corpus_sql: str, threshold: float = 0.8) -> str:
    return (
        "WITH " + minhash_pipeline_ctes(corpus_sql)
        + f"SELECT id_a, id_b, est_jaccard, jaccard FROM scored "
        f"WHERE jaccard >= {threshold}"
    )


def sql_ngram_jaccard(corpus_sql: str) -> str:
    return (
        "WITH " + minhash_pipeline_ctes(corpus_sql)
        + "SELECT id_a, id_b, est_jaccard, jaccard FROM scored"
    )


def sql_lsh_quality(corpus_sql: str, threshold: float = 0.8) -> str:
    """Twin of ``lsh_quality_metrics``: LSH candidate precision/
    recall against exact all-pairs Jaccard truth."""
    inter = "len(list_filter(a.shingles, x -> list_contains(b.shingles, x)))"
    return (
        "WITH "
        + minhash_pipeline_ctes(corpus_sql)
        + f""",
truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST({inter} AS DOUBLE)
        / CAST(len(a.shingles) + len(b.shingles) - {inter} AS DOUBLE)
        >= {threshold}),
tp AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN truth t ON t.id_a = p.id_a AND t.id_b = p.id_b),
m AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_candidates,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true_pairs,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM tp) AS true_positives)
SELECT n_candidates, n_true_pairs, true_positives,
       CASE WHEN n_candidates = 0 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(true_positives AS DOUBLE) / n_candidates END
         AS precision,
       CASE WHEN n_true_pairs = 0 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(true_positives AS DOUBLE) / n_true_pairs END
         AS recall
FROM m
"""
    )


def sql_incremental_neardup(new_sql: str, existing_sql: str) -> str:
    """Twin of ``incremental_neardup_filter``: NEW docs surviving the
    band-bucket probe against the EXISTING corpus' signature keys."""
    return (
        "WITH "
        + minhash_banded_ctes(new_sql, "n_")
        + minhash_banded_ctes(existing_sql, "e_")
        + """
hits AS (
  SELECT DISTINCT nb.doc_id FROM n_banded nb
  JOIN (SELECT DISTINCT band_id, band_hash FROM e_banded) eb
    ON nb.band_id = eb.band_id AND nb.band_hash = eb.band_hash)
SELECT c.doc_id, c.lang FROM n_corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM hits)
"""
    )


def sql_simhash_neardup(
    corpus_sql: str,
    bits: int = 60,
    band_bits: int = 15,
    max_hamming: int = 3,
) -> str:
    """Twin of with_simhash → simhash_near_pairs (4 × 15-bit bands,
    exact hamming ≤ 3 — recall guaranteed by pigeonhole on BOTH
    sides, so the pair sets are identical)."""
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    vote = (
        "COALESCE(list_sum(list_transform(hs, x -> "
        "CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END)), 0)"
    )
    pack = " + ".join(
        f"CASE WHEN {vote.format(j=j)} >= 0 THEN CAST({2**j} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    band_ids = ", ".join(str(b) for b in range(n_bands))
    return f"""
WITH corpus AS ({corpus_sql}),
h AS (
  SELECT doc_id, list_transform(
    list_distinct(regexp_extract_all(text, '{TOKEN_RE_SQL}')),
    t -> {duck_phash('t')}) AS hs
  FROM corpus),
sim AS (SELECT doc_id, CAST({pack} AS BIGINT) AS simhash FROM h),
banded AS (
  SELECT doc_id, simhash, band_id,
         (simhash >> (band_id * {band_bits})) & {mask} AS band_val
  FROM sim CROSS JOIN (SELECT unnest([{band_ids}]) AS band_id)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
"""


_CC_TAIL = """
pairs8 AS (SELECT id_a, id_b FROM scored WHERE jaccard >= {threshold}),
sym(a, b) AS (SELECT id_a, id_b FROM pairs8
              UNION ALL SELECT id_b, id_a FROM pairs8),
walk(id, r) AS (
  SELECT doc_id, doc_id FROM {nodes}
  UNION
  SELECT w.id, s.b FROM walk w JOIN sym s ON s.a = w.r)
"""


def sql_dup_clusters(corpus_sql: str, threshold: float = 0.8) -> str:
    """Twin of ``connected_components`` over the MinHash-LSH pair
    set: DuckDB's recursive reachability computes the same unique
    fixpoint (min reachable id) the Spark label propagation
    converges to."""
    return (
        "WITH RECURSIVE "
        + minhash_pipeline_ctes(corpus_sql)
        + ","
        + _CC_TAIL.format(threshold=threshold, nodes="corpus")
        + "SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id "
        "FROM walk GROUP BY id"
    )


def sql_training_corpus(corpus_sql: str, threshold: float = 0.8) -> str:
    """Twin of the composed corpus-builder: quality gate →
    MinHash-LSH pairs among survivors → connected components →
    canonical (min-id) member per cluster."""
    return (
        f"""
WITH RECURSIVE
base AS ({corpus_sql}),
qstats AS (
  SELECT doc_id, lang, text,
         CAST(LENGTH(text) AS DOUBLE) AS n_chars,
         CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS DOUBLE)
           AS n_tokens,
         CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g'))
           AS DOUBLE) AS n_punct
  FROM base),
kq AS (
  SELECT doc_id, lang, text,
         (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 2
                AND n_chars / GREATEST(n_tokens, 1.0) <= 12 THEN 1.0 ELSE 0.5 END)
         * (CASE WHEN n_punct / GREATEST(n_chars, 1.0) <= 0.2 THEN 1.0 ELSE 0.5 END)
         AS quality
  FROM qstats),
kept AS (SELECT * FROM kq WHERE quality >= 0.75),
"""
        + minhash_pipeline_ctes("SELECT doc_id, text FROM kept").lstrip()
        + ","
        + _CC_TAIL.format(threshold=threshold, nodes="kept")
        + """
SELECT k.doc_id, k.lang, k.quality
FROM kept k JOIN (SELECT id, MIN(r) AS m FROM walk GROUP BY id) c
  ON c.id = k.doc_id
WHERE k.doc_id = c.m
"""
    )


def sql_winnow_fingerprint(k: int = 8, window: int = 4) -> str:
    """Twin of winnow_fingerprints over ``documents``: same grams,
    same window minima, digest of the sorted distinct set."""
    gram_hash = duck_phash(f"substr(text, i, {k})")
    return f"""
WITH g AS (
  SELECT doc_id, list_transform(
    range(1, GREATEST(LENGTH(text) - {k - 1}, 1) + 1),
    i -> {gram_hash}) AS grams
  FROM documents),
m AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, GREATEST(len(grams) - {window - 1}, 1) + 1),
    i -> list_min(grams[i:i + {window - 1}]))) AS fps
  FROM g)
SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fingerprints,
       md5(array_to_string(list_sort(fps), ',')) AS fp_digest
FROM m
"""


def sql_dup_ngram_coverage(corpus_sql: str, n: int = 5) -> str:
    """Twin of ``cross_doc_ngram_coverage``: same shingling, same
    portable 60-bit shingle hash, same BIGINT counts and single
    IEEE division."""
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    shingle_expr = (
        f"CASE WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')] "
        f"ELSE list_distinct(list_transform(toks, (x, i) -> "
        f"CASE WHEN i <= len(toks) - {n - 1} THEN {parts} END)) END"
    )
    return f"""
WITH corpus AS ({corpus_sql}),
tok AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks FROM corpus),
sh AS (SELECT doc_id, {shingle_expr} AS shingles FROM tok),
ds AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
hashed AS (SELECT doc_id, {duck_phash('s')} AS h FROM ds),
freq AS (SELECT h, COUNT(*) AS df FROM hashed GROUP BY h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(COUNT(CASE WHEN df >= 2 THEN 1 END) AS BIGINT) AS n_dup_ngrams,
       CAST(COUNT(CASE WHEN df >= 2 THEN 1 END) AS DOUBLE) / COUNT(*)
         AS dup_coverage
FROM hashed JOIN freq USING (h)
GROUP BY doc_id
"""


def sql_best_of_cluster(corpus_sql: str, threshold: float = 0.8) -> str:
    """Twin of quality gate → MinHash-LSH pairs → connected
    components → ``canonical_best`` (highest-quality member per
    cluster, min-id tiebreak, with the cluster size)."""
    return (
        f"""
WITH RECURSIVE
base AS ({corpus_sql}),
qstats AS (
  SELECT doc_id, lang, text,
         CAST(LENGTH(text) AS DOUBLE) AS n_chars,
         CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9]+')) AS DOUBLE)
           AS n_tokens,
         CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g'))
           AS DOUBLE) AS n_punct
  FROM base),
kq AS (
  SELECT doc_id, lang, text,
         (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 2
                AND n_chars / GREATEST(n_tokens, 1.0) <= 12 THEN 1.0 ELSE 0.5 END)
         * (CASE WHEN n_punct / GREATEST(n_chars, 1.0) <= 0.2 THEN 1.0 ELSE 0.5 END)
         AS quality
  FROM qstats),
kept AS (SELECT * FROM kq WHERE quality >= 0.75),
"""
        + minhash_pipeline_ctes("SELECT doc_id, text FROM kept").lstrip()
        + ","
        + _CC_TAIL.format(threshold=threshold, nodes="kept")
        + """,
lab AS (SELECT id, MIN(r) AS cluster_id FROM walk GROUP BY id)
SELECT doc_id, lang, quality, cluster_size FROM (
  SELECT k.doc_id, k.lang, k.quality,
         CAST(COUNT(*) OVER (PARTITION BY l.cluster_id) AS BIGINT)
           AS cluster_size,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY k.quality DESC, k.doc_id ASC) AS rn
  FROM kept k JOIN lab l ON l.id = k.doc_id) t
WHERE rn = 1
"""
    )

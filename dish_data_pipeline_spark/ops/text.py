"""Text-analysis operators over a document table
(``documents(doc_id, text, lang, source, n_chars)``).

All pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen'd, no UDFs. Language ID and quality scoring are
shared SQL expression strings so the Spark plan and the DuckDB
oracle evaluate literally the same CASE/regex logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word pieces: alphanumeric runs. Same regex dialect subset
# works in Java regex (Spark) and RE2 (DuckDB).
TOKEN_RE = "[A-Za-z0-9]+"

# Tiny per-language stopword markers for the n-gram/stopword
# language-ID heuristic. Deterministic by construction.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und"],
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "fr": ["le", "la", "les"],
    "zh": ["de", "le", "shi"],
}


def lang_score_exprs(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-hit counts (Spark Columns)."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[f"score_{lang}"] = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        ).cast("bigint")
    return out


def lang_pick_case_sql() -> str:
    """CASE chain picking argmax score with alphabetical tie-break —
    identical SQL string evaluated by Spark (via F.expr) and DuckDB."""
    langs = sorted(LANG_MARKERS)
    clauses = []
    for i, lang in enumerate(langs):
        others = [f"score_{lang} >= score_{o}" for o in langs[i + 1 :]]
        cond = " AND ".join(others) if others else "TRUE"
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " END"


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / punctuation statistics per document."""
    text = F.col(text_col)
    tokens = F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)
    return (
        df.withColumn("n_chars_calc", F.length(text).cast("bigint"))
        .withColumn("n_tokens", F.size(tokens).cast("bigint"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(tokens)).cast("bigint"))
        .withColumn(
            "n_punct",
            (
                F.length(text)
                - F.length(F.regexp_replace(text, "[^A-Za-z0-9 ]", ""))
            ).cast("bigint"),
        )
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: per-language hit counts + argmax
    pick (alphabetical tie-break)."""
    out = df
    for name, col in lang_score_exprs(text_col).items():
        out = out.withColumn(name, col)
    return out.withColumn("lang_pred", F.expr(lang_pick_case_sql()))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint (md5 of the raw text) —
    the exact-dedup key."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col)))


# BPE-ish pretokenizer: contraction pieces, space-prefixed word /
# number / punctuation runs, whitespace runs. Same subset parses in
# Java regex and RE2 (no lookahead).
BPE_RE = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+| +"


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (rolling k-gram hashes,
    window-minimum selection — the MOSS scheme): for every position,
    hash the k-char gram; keep the minimum hash of each sliding
    window of ``window`` grams; the distinct kept hashes are the
    fingerprint set.

    Pure higher-order expressions (substring + portable 60-bit hash
    over an index sequence) — no UDF; cost is O(len) per doc,
    map-side only. The hash is ``ops.portable`` so the DuckDB oracle
    computes the identical fingerprint set.
    """
    from dish_data_pipeline_spark.ops.portable import spark_phash

    text = F.col(text_col)
    grams = (
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> {spark_phash(f'substring({text_col}, i, {k})')})"
    )
    fingerprint = (
        f"array_distinct(transform("
        f"sequence(1, greatest(size(_grams) - {window - 1}, 1)), "
        f"i -> array_min(slice(_grams, i, {window}))))"
    )
    return (
        df.withColumn("_grams", F.expr(grams))
        .withColumn("fingerprints", F.expr(fingerprint))
        .drop("_grams")
        .withColumn("n_fingerprints", F.size("fingerprints"))
    )


# Cleaning patterns: Java∩RE2 subset (no lookaround) so the DuckDB
# oracle evaluates literally the same regexes.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
CTRL_RE = r"[\x00-\x1f\x7f]"


def clean_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard pre-training text normalization: flag + strip URLs
    and e-mail addresses, replace control characters with spaces,
    collapse whitespace runs, trim. Pure ``regexp_replace`` chain —
    JVM-side, order matters (URLs before whitespace collapse so the
    removal seam collapses too)."""
    text = F.col(text_col)
    cleaned = F.regexp_replace(text, CTRL_RE, " ")
    cleaned = F.regexp_replace(cleaned, URL_RE, " ")
    cleaned = F.regexp_replace(cleaned, EMAIL_RE, " ")
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return (
        df.withColumn("had_url", text.rlike(URL_RE).cast("int"))
        .withColumn("had_email", text.rlike(EMAIL_RE).cast("int"))
        .withColumn("clean_text", cleaned)
        .withColumn(
            "n_chars_removed",
            (F.length(text) - F.length(cleaned)).cast("bigint"),
        )
    )


IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}[- ]?[0-9]{3}[- ]?[0-9]{3}[- ]?[0-9]{2,4}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: replace e-mail addresses,
    IPv4 addresses, and international-format phone numbers with typed
    placeholders (``<EMAIL>``/``<IP>``/``<PHONE>``), and emit per-doc
    match counts for the redaction audit. Patterns stay in the
    Java∩RE2 regex subset so the DuckDB oracle replicates them
    literally. Order matters: e-mails first (their dotted domains
    would otherwise partially match the IP pattern) — and each count
    is taken on the text the replacement actually sees, so a match
    consumed by an earlier stage (a phone-shaped digit run inside an
    e-mail) is never counted: counts always tie out against the
    placeholders present in ``text_redacted`` — in fact they are
    COMPUTED from those placeholders: each count is the occurrence
    count of its placeholder token in the final redacted text,
    derived from the length delta of a literal (non-regex) strip.
    That keeps the regex work to the 3 unavoidable replace passes —
    the earlier per-stage ``regexp_extract_all`` counts tripled the
    regex cost (11× over baseline at sf0.1) for byte-identical
    results on any corpus that doesn't already contain the literal
    placeholder tokens. Map-side, codegen'd, 0 shuffles. NULL text
    is treated as '' (zero counts, empty redaction).

    CAVEAT (count semantics, not redaction): a document that ALREADY
    contains a literal ``<EMAIL>``/``<IP>``/``<PHONE>`` token
    over-reports that counter by the pre-existing occurrences —
    placeholders the redaction wrote and placeholders that were
    already there are indistinguishable in the final text. The
    redacted TEXT is unaffected. If exact counts matter on such
    corpora, pre-escape the literal tokens upstream (the DuckDB
    oracle mirrors this placeholder-derived counting, so the two
    engines agree either way)."""
    t0 = F.coalesce(F.col(text_col), F.lit(""))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    red = F.col("text_redacted")

    def n(token: str):
        return (
            (F.length(red) - F.length(F.replace(red, F.lit(token))))
            / F.lit(len(token))
        ).cast("bigint")

    # two projections on purpose: text_redacted lands first so the
    # 3-regex chain is computed once and the counts reference the
    # materialized column (CollapseProject keeps non-cheap exprs
    # single-use; subexpression elimination backs it up)
    return (
        df.withColumn("text_redacted", t3)
        .withColumn("n_emails", n("<EMAIL>"))
        .withColumn("n_ips", n("<IP>"))
        .withColumn("n_phones", n("<PHONE>"))
    )


def top_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition statistics per document (Rae et al.
    2021 §A1.1: a document dominated by one repeated n-gram is
    boilerplate): the most frequent word n-gram, the fraction of
    characters it covers, and the duplicate-n-gram occurrence
    fraction.

    Scale shape: explode n-grams → two-stage aggregation — a
    partial-agg'd ``(doc, gram)`` count, then a per-doc rollup whose
    top pick is ``max(struct(count, gram))`` (deterministic: highest
    count, lexicographically-largest gram on ties; identical struct
    comparison semantics in DuckDB ``max(struct_pack(...))``). Keys
    are per-document, so reducer load is bounded by document length,
    never corpus size. Documents with fewer than ``n`` tokens have no
    n-gram and are absent from the output.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    # Spark's sequence(1, 0) counts DOWN — guard short docs to an
    # explicit empty array.
    grams = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(_toks, i, {n}))) "
        "ELSE array() END"
    )
    exploded = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("_nchars"),
        toks.alias("_toks"),
    ).select(id_col, "_nchars", F.explode(grams).alias("gram"))
    counts = exploded.groupBy(id_col, "gram").agg(
        F.count("*").alias("gram_count"), F.first("_nchars").alias("_nchars")
    )
    rolled = counts.groupBy(id_col).agg(
        F.max(
            F.struct(F.col("gram_count").alias("c"), F.col("gram").alias("g"))
        ).alias("_top"),
        F.sum("gram_count").alias("n_ngrams"),
        F.count("*").alias("n_distinct_ngrams"),
        F.first("_nchars").alias("_nchars"),
    )
    return rolled.select(
        id_col,
        F.col("_top.g").alias("top_ngram"),
        F.col("_top.c").alias("top_ngram_count"),
        (
            F.col("_top.c").cast("double")
            * F.length("_top.g").cast("double")
            / F.col("_nchars").cast("double")
        ).alias("top_ngram_char_frac"),
        F.col("n_ngrams"),
        (
            F.lit(1.0)
            - F.col("n_distinct_ngrams").cast("double")
            / F.col("n_ngrams").cast("double")
        ).alias("dup_ngram_frac"),
    )


def with_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_distinct_frac: float = 0.2,
) -> DataFrame:
    """Gopher/C4-style document quality gate (Rae et al. 2021 §A1.1,
    Raffel et al. 2020 §2.2) as pure column arithmetic: token-count
    window, mean-token-length window, symbol-to-token ratio cap,
    distinct-token-fraction floor. Emits one int flag per rule plus
    the conjunction ``keep`` — callers filter or route on it.
    Map-side only (0 shuffles), whole-stage-codegen'd. NULL text is
    treated as '' (0 tokens, gated out) so legacy ``size(null) = -1``
    never reaches the stats."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)
    n_tokens = F.size(toks).cast("bigint")
    n_alnum = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", "")).cast("double")
    n_symbols = (
        F.length(text) - F.length(F.regexp_replace(text, "[^A-Za-z0-9 ]", ""))
    ).cast("double")
    denom = F.greatest(n_tokens, F.lit(1)).cast("double")
    mean_len = n_alnum / denom
    symbol_ratio = n_symbols / denom
    distinct_frac = F.size(F.array_distinct(toks)).cast("double") / denom
    ok_tokens = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    ok_mean = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    ok_symbol = symbol_ratio <= max_symbol_ratio
    ok_distinct = distinct_frac >= min_distinct_frac
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", mean_len)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("distinct_frac", distinct_frac)
        .withColumn("ok_tokens", ok_tokens.cast("int"))
        .withColumn("ok_mean_len", ok_mean.cast("int"))
        .withColumn("ok_symbol", ok_symbol.cast("int"))
        .withColumn("ok_distinct", ok_distinct.cast("int"))
        .withColumn(
            "keep", (ok_tokens & ok_mean & ok_symbol & ok_distinct).cast("int")
        )
    )


def quality_score(text_col: str = "text") -> Column:
    """Heuristic quality score in [0,1]: token-length sanity ×
    punctuation sanity. Pure arithmetic → oracle-exact."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)).cast("double")
    avg_tok = n_chars / F.greatest(n_tokens, F.lit(1.0))
    tok_sane = F.when((avg_tok >= 2) & (avg_tok <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    punct = (
        n_chars - F.length(F.regexp_replace(text, "[^A-Za-z0-9 ]", "")).cast("double")
    ) / F.greatest(n_chars, F.lit(1.0))
    punct_sane = F.when(punct <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return tok_sane * punct_sane


def char_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus character-pair frequencies — the first iteration of BPE
    tokenizer training (count adjacent symbol pairs within words,
    weighted by word occurrence; the argmax pair is the first merge).

    Words come from the lowercase ``TOKEN_RE`` tokenizer; pairs are
    2-char substrings at every offset. Pure map-side higher-order
    expressions (tokenize → explode → windowed substring → explode),
    so the only exchange is the final count groupBy with map-side
    combine — pair cardinality is bounded by the alphabet squared,
    making the aggregate essentially free at any corpus size.

    Output: (pair, n) for words of length >= 2."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))


def bigram_lm_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram language-model counts with Kneser-Ney continuation
    counts: per bigram (w1, w2) the raw count, and per w2 the number
    of DISTINCT left contexts (the continuation count KN smoothing
    needs — "how many ways does w2 complete a bigram", not "how
    often").

    Plan: tokenize once, pair each token with its successor via a
    map-side windowed zip (arrays_zip on the token array and its
    slice — no self-join, no window shuffle over the corpus), then
    one groupBy(w1, w2) count; the continuation count reaggregates
    the bigram relation (vocab²-bounded relative to the corpus) by
    w2 and joins back on w2. No broadcast HINT on the continuation
    side: it has one row per distinct w2 — the vocabulary — which a
    web-scale corpus pushes to 10⁷-10⁸ rows, beyond any sane
    broadcast threshold; left unhinted, AQE broadcasts it when it is
    actually small and falls back to a shuffled hash join when not.

    Output: (w1, w2, n, continuation_w2)."""
    toks = df.select(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0).alias("_t")
    ).filter(F.size("_t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), "
                "i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2))"
            )
        ).alias("_b")
    ).select("_b.w1", "_b.w2")
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # counts feeds both the output join and the broadcast
    # continuation branch; without the persist the tokenize + count
    # pass over the corpus executes twice (exchange reuse does not
    # fire under a broadcast subtree).
    counts = tracked_persist(
        bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    )
    cont = counts.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("continuation_w2")
    )
    return counts.join(cont, "w2").select(
        "w1", "w2", "n", "continuation_w2"
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
    batch_m: int = 1,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Train a byte-pair-encoding merge table: ``n_merges`` rounds of
    (count adjacent symbol pairs → merge the most frequent pair
    everywhere) — full tokenizer induction, extending
    :func:`char_pair_counts` (which is exactly iteration 1) to the
    merge loop of Sennrich et al. 2016.

    Algorithm (the classic word-frequency formulation): the corpus
    is read ONCE into the distinct-word relation ``(syms
    ARRAY<STRING>, n)`` — words from the lowercase ``TOKEN_RE``
    tokenizer, symbols initially characters, ``n`` the word's corpus
    frequency. Every iteration then touches only this vocab-bounded
    relation, never the corpus again:

    1. pair counts: map-side adjacent-pair explode weighted by ``n``
       + one vocab-bounded groupBy (map-side combine);
    2. argmax pair via sort + ``limit(1).collect()`` — one row of
       model state to the driver per round (the ``kmeans_centroids``
       pattern), tie-broken (count DESC, left ASC, right ASC) so
       training is deterministic;
    3. merge: a map-side ``F.aggregate`` fold rewrites each word's
       symbol array greedily left-to-right (``aaa`` + merge (a,a) →
       ``[aa, a]``), all executors, no shuffle;
    4. ``localCheckpoint`` truncates the growing lineage (iterative-
       operator discipline shared with connected components /
       k-means), keeping plan depth O(1) across rounds.

    Stops early when no pair reaches ``min_pair_count``. Returns
    ``(merges, vocab)``: the ordered merge table as ``(step, left,
    right, pair_count)`` tuples, and the final re-segmented vocab
    DataFrame ``(syms, n)``.

    ``batch_m`` > 1 is the fast path for real vocab sizes: each
    round accepts the longest PREFIX (up to ``batch_m``) of the
    count-ordered pair list whose pairs are mutually non-interacting
    — no symbol shared between any two accepted pairs, and no
    accepted pair's merged symbol appearing as a symbol of another —
    and applies them all in ONE vocab rewrite pass (a single fold
    whose per-element dispatch checks every accepted pair; for
    disjoint pairs the combined pass is provably identical to
    applying them sequentially). This cuts driver round-trips and
    vocab passes up to M× (measured ~3.1× wall at n_merges=32,
    batch_m=8, sf0.001). Exactness caveat, standard for batched BPE
    trainers: strict greedy could rank a pair CREATED by an earlier
    merge in the batch above a later batch member (a new pair's
    count is bounded by its creator's count, not by the batch
    tail's), so batched output can diverge from ``batch_m=1`` when
    merges interact that way; where they don't — the disjoint-prefix
    condition plus no-overtake — the tables are identical (property
    tests). The default ``batch_m=1`` is exact greedy, and is what
    the oracle-twinned catalog query uses.

    Scale shape: O(corpus) once, then O(n_merges/batch_m × vocab)
    passes. The vocab relation is distinct-word-bounded (≪ corpus at
    web scale), each round is one exchange over it, and the driver
    holds only the merge table — n_merges rows."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch_m < 1:
        raise ValueError(f"batch_m must be >= 1, got {batch_m}")
    vocab = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.split("w", "").alias("syms"), "n")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        want = min(batch_m, n_merges - len(merges))
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").cast("bigint").alias("c"))
        )
        best = (
            pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(want)
            .collect()
        )
        accepted: list[tuple[str, str]] = []
        touched: set[str] = set()
        for row in best:
            if int(row["c"]) < min_pair_count:
                break
            left, right = str(row["l"]), str(row["r"])
            if accepted and (
                {left, right, left + right} & touched
            ):
                break  # prefix rule: first interaction ends the batch
            accepted.append((left, right))
            touched |= {left, right, left + right}
            merges.append((len(merges) + 1, left, right, int(row["c"])))
        if not accepted:
            break
        vocab = vocab.select(
            _merge_fold_multi(F.col("syms"), accepted).alias("syms"), "n"
        ).localCheckpoint()
    return merges, vocab


def _merge_fold(arr: Column, left: str, right: str) -> Column:
    """Greedy left-to-right rewrite of one BPE merge over a symbol
    array (``aaa`` + merge (a,a) → ``[aa, a]``) as a map-side
    ``F.aggregate`` fold — shared by training (over the vocab
    relation) and segmentation (over documents)."""
    return _merge_fold_multi(arr, [(left, right)])


def _merge_fold_multi(
    arr: Column, pairs: list[tuple[str, str]]
) -> Column:
    """One greedy left-to-right pass applying EVERY pair in
    ``pairs`` (per-element dispatch over chained WHENs). For
    mutually non-interacting pairs — disjoint symbols, no merged
    symbol colliding with another pair's symbols, the ``bpe_train``
    batch-acceptance rule — a match of one pair can neither enable
    nor shadow a match of another, so this single pass equals
    applying the pairs as sequential :func:`_merge_fold` passes."""

    def step(acc: Column, s: Column) -> Column:
        out = F.concat(acc, F.array(s))
        for left, right in pairs:
            l_lit, r_lit = F.lit(left), F.lit(right)
            # F.get (not element_at(-1)): null-safe on the empty
            # accumulator even under ANSI mode.
            out = F.when(
                (F.get(acc, F.size(acc) - 1) == l_lit) & (s == r_lit),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(l_lit, r_lit)),
                ),
            ).otherwise(out)
        return out

    return F.aggregate(arr, F.array().cast("array<string>"), step)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Apply a trained BPE merge table (the inference side of
    :func:`bpe_train`): tokenize with the same lowercase ``TOKEN_RE``
    pretokenizer, split each word to characters, replay the merges
    IN TRAINING ORDER via the shared greedy fold, and flatten to the
    document's token sequence.

    Adds ``out_col`` (ARRAY<STRING>) and ``n_<out_col>`` (BIGINT).
    Entirely map-side — the merge table is embedded in the
    expression tree as literals (n_merges nested folds), so
    segmenting a 100 TB corpus is a zero-shuffle projection."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    syms = F.transform(words, lambda w: F.split(w, ""))
    for _step, left, right, _c in merges:
        syms = F.transform(syms, lambda a: _merge_fold(a, left, right))
    return df.withColumn(out_col, F.flatten(syms)).withColumn(
        f"n_{out_col}", F.size(out_col).cast("bigint")
    )


def bpe_segment_by_vocab(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary-memoized BPE segmentation — same result as
    :func:`bpe_segment`, different scale shape: the ``n_merges``
    greedy folds run once per DISTINCT word (the corpus vocabulary),
    and documents get their token sequences back through a
    word-keyed join + positional regroup.

    Why both exist: ``bpe_segment`` is a ZERO-shuffle projection
    whose compute is O(word *occurrences* × merges) — right when the
    corpus streams through once and shuffles are the scarce
    resource. This variant pays three bounded shuffles (vocab
    distinct, word join, per-doc regroup + rejoin) to cut the fold
    compute to O(*vocabulary* × merges); since natural-language
    vocabulary grows ~√corpus (Heaps' law) while occurrences grow
    linearly, this is the 100 TB default (measured: ~11.6 s → ~2.9 s
    at sf0.1 even on the synthetic 31-word vocab). The vocab
    relation is unhinted — AQE broadcasts it when small, falls back
    to a shuffled join at web-scale vocabularies.

    Token order is preserved via ``posexplode`` + sort-by-position
    regroup; wordless documents come back with an empty array.
    Output schema identical to :func:`bpe_segment`."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    exploded = df.select(id_col, F.posexplode(words).alias("_pos", "_w"))
    expr: Column = F.split("w", "")
    for _step, left, right, _c in merges:
        expr = _merge_fold(expr, left, right)
    vocab = (
        exploded.select(F.col("_w").alias("w"))
        .distinct()
        .select("w", expr.alias("_toks"))
    )
    per_doc = (
        exploded.join(vocab, exploded["_w"] == vocab["w"])
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_toks"))),
                    lambda s: s["_toks"],
                )
            ).alias(out_col)
        )
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.array().cast("array<string>")),
        )
        .withColumn(f"n_{out_col}", F.size(out_col).cast("bigint"))
    )


#: Quantization denominator for tie-free probability accumulation in
#: :func:`doc_lm_scores` (floor has no rounding ties; each p is in
#: [0,1] so doc sums stay far below BIGINT range at any doc length).
LM_SCORE_SCALE = 1_000_000_000


def doc_lm_scores(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document fluency score from the corpus's own bigram LM:
    the mean MLE conditional probability p(w2|w1) = n(w1,w2)/n(w1)
    over the document's bigrams — the cheap LM-quality gate (a
    perplexity proxy without logarithms: libm ``ln`` is not
    correctly-rounded, so a log-based score could not be
    cross-engine hash-exact; the probability mean can).

    Determinism contract: each p is ONE IEEE division of two exact
    BIGINTs (identical both engines); per-doc accumulation uses the
    floor-quantization device (``floor(p·SCALE)`` summed exact, one
    final division chain) — tie-free, order-independent.

    Scale shape: doc bigrams are a map-side windowed transform (no
    self-join); the count relations aggregate with map-side combine
    (vocab²- and vocab-bounded); the probability join hashes on the
    bigram key — the build side is UNIQUE per key, so natural-language
    hot keys ("of the") skew only the probe side, which AQE's skew
    split handles without correctness hazards; the context-count join
    piggybacks on the w1 hash; the final doc collapse is one more
    exchange of per-doc partials. Only docs with >= 2 tokens appear.

    Output: (doc_col, n_bigrams BIGINT, lm_score DOUBLE)."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    toks = df.select(
        F.col(doc_col),
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0).alias(
            "_t"
        ),
    ).filter(F.size("_t") >= 2)
    bigrams = toks.select(
        F.col(doc_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), "
                "i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2))"
            )
        ).alias("_b"),
    ).select(doc_col, "_b.w1", "_b.w2")
    # The doc-bigram relation feeds the count aggregates AND the
    # probability join probe; persisting keeps the tokenize+explode
    # corpus pass to one execution.
    bigrams = tracked_persist(bigrams)
    counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n12")
    )
    ctx = counts.groupBy("w1").agg(F.sum("n12").cast("bigint").alias("n1"))
    p = F.col("n12").cast("double") / F.col("n1").cast("double")
    scale = F.lit(float(LM_SCORE_SCALE))
    scored = (
        bigrams.join(counts, ["w1", "w2"])
        .join(ctx, "w1")
        .select(F.col(doc_col), F.floor(p * scale).alias("_pq"))
    )
    n = F.count(F.lit(1)).cast("bigint")
    return scored.groupBy(doc_col).agg(
        n.alias("n_bigrams"),
        (F.sum("_pq").cast("double") / scale / n.cast("double")).alias("lm_score"),
    )


#: Quantization denominator for the hashed linear classifier margin
#: (integer weights summed as exact BIGINTs; one IEEE division at
#: the end — the doc_lm_scores discipline).
CLASSIFIER_SCALE = 1_000_000


def hashed_linear_score(
    df: DataFrame,
    weights: list[int],
    bias: int = 0,
    doc_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Hashed bag-of-words linear classifier inference — the
    fastText-style quality-gate shape (CCNet / LLaMA-pipeline
    practice: a small supervised model scores each document and a
    threshold keeps the "high-quality" tail). This is the INFERENCE
    plumbing with a frozen weight table; a trained model drops its
    quantized weights in unchanged.

    ``weights`` is the hashed feature table: token t contributes
    ``weights[phash(t) % len(weights)]`` (integer, units of
    1/CLASSIFIER_SCALE — quantize real model weights by
    ``round(w*SCALE)``). The margin is ``bias + mean(contribution
    per token)``; sigmoid is monotone, so thresholding the margin
    IS thresholding the probability (no exp in the plan, keeping the
    arithmetic integer-exact and cross-engine deterministic).

    Plan shape: tokenize → per-token weight lookup via an
    ``element_at`` on the literal weight array → ``F.aggregate``
    BIGINT fold — a pure map-side projection, ZERO shuffles at any
    corpus size, with the portable 60-bit hash so the DuckDB twin
    replays the bucket assignment bit-identically. Output:
    (doc_col, n_tokens BIGINT, margin_q BIGINT, score DOUBLE,
    keep BOOLEAN).
    """
    if not weights:
        raise ValueError("weights must be non-empty")

    nb = len(weights)
    warr = F.array(*[F.lit(int(w)).cast("bigint") for w in weights])
    # ops.portable's 60-bit hash as Column ops (the SQL-string
    # spelling can't reference a higher-order-function lambda var)
    phash = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast(
        "bigint"
    )
    tokens = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
    )
    contribs = F.transform(
        tokens,
        lambda t: F.element_at(warr, (phash(t) % nb + 1).cast("int")),
    )
    raw = F.aggregate(
        contribs,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + w,
    )
    n = F.size(tokens).cast("bigint")
    score = F.when(
        n > 0,
        (F.lit(int(bias)).cast("bigint") + (raw / n)).cast("double")
        / F.lit(float(CLASSIFIER_SCALE)),
    )
    return df.select(
        F.col(doc_col),
        n.alias("n_tokens"),
        (F.lit(int(bias)).cast("bigint") * n + raw).alias("margin_q"),
        score.alias("score"),
        F.coalesce(score > F.lit(threshold), F.lit(False)).alias("keep"),
    )

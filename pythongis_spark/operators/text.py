"""Text-analysis operators for training-data pipelines over the
``documents`` table: language-ID, quality scoring, token counting,
document fingerprinting.

Beyond the reference's scope (it has no text ops) — these are the
training-data-pipeline operators the engine needs at 100 TB. Everything
that can stay JVM-side does (regexp_count / split / xxhash64 in
whole-stage codegen); only the winnowing fingerprint uses a pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword profiles for the n-gram/stopword language
# heuristic (deterministic, dependency-free)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "pour", "une"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "por", "con", "una"],
}


def _word_hits(text: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID: count profile-word hits per language
    (JVM regexp), pick argmax; ties and zero-hit rows → 'und'."""
    hit_cols = [
        _word_hits(F.col(text_col), words).alias(f"_h_{lang}")
        for lang, words in LANG_PROFILES.items()
    ]
    tmp = df.select("*", *hit_cols)
    best = None
    best_n = None
    for lang in LANG_PROFILES:
        n = F.col(f"_h_{lang}")
        if best is None:
            best, best_n = F.lit(lang), n
        else:
            cond = n > best_n
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_n = F.when(cond, n).otherwise(best_n)
    out_df = tmp.withColumn(out, F.when(best_n > 0, best).otherwise(F.lit("und")))
    return out_df.drop(*[f"_h_{lang}" for lang in LANG_PROFILES])


def token_count_exprs(text: Column) -> dict[str, Column]:
    """Whitespace tokens + a BPE-ish sub-word estimate (word chunks of ≤4
    chars + punctuation marks), all in codegen."""
    trimmed = F.trim(text)
    ws = F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    # BPE-ish: every run of ≤4 word chars is one token; digits and
    # punctuation tokenize separately (a crude GPT-style regex)
    bpe = F.regexp_count(text, F.lit(r"[A-Za-z]{1,4}|[0-9]{1,3}|[^\sA-Za-z0-9]"))
    return {"n_tokens_ws": ws.cast("long"), "n_tokens_bpe": bpe.cast("long")}


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    exprs = token_count_exprs(F.col(text_col))
    for name, e in exprs.items():
        df = df.withColumn(name, e)
    return df


def quality_exprs(text: Column) -> dict[str, Column]:
    """Quality features: length, punctuation/digit/space ratios, stopword
    ratio, mean word length — the usual pre-training quality filters."""
    n = F.length(text).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double")
    digits = F.regexp_count(text, F.lit(r"[0-9]")).cast("double")
    spaces = F.regexp_count(text, F.lit(r"\s")).cast("double")
    stop = _word_hits(text, LANG_PROFILES["en"]).cast("double")
    words = F.when(F.length(F.trim(text)) == 0, 0).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    ).cast("double")
    safe_w = F.greatest(words, F.lit(1.0))
    return {
        "n_chars_q": n.cast("long"),
        "punct_ratio": punct / safe_n,
        "digit_ratio": digits / safe_n,
        "space_ratio": spaces / safe_n,
        "stopword_ratio": stop / safe_w,
        "mean_word_len": (n - spaces) / safe_w,
    }


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    for name, e in quality_exprs(F.col(text_col)).items():
        df = df.withColumn(name, e)
    return df


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Single scalar quality score in [0, 1]: penalize extreme ratios,
    reward stopword presence and sane word lengths (deterministic
    hand-tuned blend; JVM-side)."""
    q = quality_exprs(F.col(text_col))
    score = (
        F.lit(1.0)
        - F.least(F.lit(1.0), q["punct_ratio"] * 2)
        * F.lit(0.25)
        - F.least(F.lit(1.0), q["digit_ratio"] * 4) * F.lit(0.25)
    ) * (
        F.lit(0.5)
        + F.least(F.lit(0.5), q["stopword_ratio"])
    )
    return df.withColumn(out, F.greatest(F.lit(0.0), F.least(F.lit(1.0), score)))


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """64-bit document fingerprint: xxhash64 of the normalized text
    (lowercase, alnum+space only, squeezed) — exact-dup detection key,
    fully JVM-side."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
        r"\s+",
        " ",
    )
    return df.withColumn(out, F.xxhash64(F.trim(norm)))


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 5, window: int = 4, out: str = "fps"
) -> DataFrame:
    """Winnowing fingerprint set (Schleimer et al. 2003): rolling hash of
    k-grams, per-window minimum → array of selected hashes. Near-dup /
    containment detection key set; numpy-vectorized pandas UDF."""

    @F.pandas_udf("array<long>")
    def winnow(texts: pd.Series) -> pd.Series:
        out_rows = []
        B, M = np.uint64(1000003), np.uint64((1 << 61) - 1)
        for t in texts.to_numpy(object):
            if t is None:
                out_rows.append(None)
                continue
            s = "".join(ch for ch in t.lower() if ch.isalnum() or ch == " ")
            data = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
            n = len(data)
            if n < k:
                out_rows.append([])
                continue
            # polynomial rolling hash of all k-grams, vectorized
            h = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):
                h = (h * B + data[j : n - k + 1 + j].astype(np.uint64)) & M
            if len(h) <= window:
                sel = {int(h.min())}
            else:
                win = np.lib.stride_tricks.sliding_window_view(h, window)
                sel = set(win.min(axis=1).astype(np.int64).tolist())
            out_rows.append(sorted(int(v) for v in sel))
        return pd.Series(out_rows, index=texts.index)

    return df.withColumn(out, winnow(F.col(text_col)))


# ---------------------------------------------------------------------------
# corpus boilerplate scoring + PII redaction


def boilerplate_counts(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 3,
    out_total: str = "n_grams",
    out_hot: str = "n_hot",
) -> DataFrame:
    """Per-document boilerplate signal: of the document's DISTINCT word
    ``n``-grams, how many occur in at least ``min_docs`` distinct
    documents corpus-wide. High ``n_hot``/``n_grams`` marks templated
    pages (navigation chrome, legal footers) — a standard quality-filter
    input (C4 uses the same corpus-frequency idea at line granularity;
    public methodology).

    Scale shape: the inverted index carries only (gram, doc) DISTINCT
    pairs — one shuffle keyed on the gram for the document-frequency
    count, one keyed on the doc id to fold counts back. Same two-shuffle
    inverted-index shape as ``dedup.ngram_jaccard_pairs``; the gram key
    can be ``xxhash64``-narrowed at corpus scale, kept as the string
    here so the DuckDB oracle replays it exactly.
    """
    from pythongis_spark.operators.dedup import word_ngrams

    grams = (
        df.select(F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_g"))
        .distinct()
    )
    dfreq = grams.groupBy("_g").agg(F.count("*").alias("_df"))
    per_doc = (
        grams.join(dfreq, "_g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias(out_total),
            F.sum((F.col("_df") >= min_docs).cast("long")).alias(out_hot),
        )
    )
    return df.join(per_doc, id_col, "left").fillna({out_total: 0, out_hot: 0})


# Deliberately conservative, RE2-compatible patterns (no backtracking,
# no lookaround) so Spark's Java regex and the DuckDB oracle's RE2
# agree character-for-character. Order matters: SSN before phone (both
# are dash-digit shapes), IP last (dots).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    token: str = "<PII>",
    count_prefix: str = "n_pii_",
) -> DataFrame:
    """Redact emails / SSNs / phone numbers / IPv4 addresses with
    ``token`` and count each category — the standard scrub pass before
    a corpus ships. Pure Catalyst (``regexp_count`` + chained
    ``regexp_replace`` in whole-stage codegen): the scan is the cost at
    any corpus size, there is no shuffle and no Python.

    Counts are taken on the ORIGINAL text (before any replacement), so
    category counts are order-independent; replacement applies the
    patterns in ``PII_PATTERNS`` order (SSN before phone — both
    dash-digit shapes — and IPv4 last).
    """
    out = out or text_col
    col = F.col(text_col)
    res = df
    for name, pat in PII_PATTERNS:
        res = res.withColumn(count_prefix + name, F.regexp_count(col, F.lit(pat)))
    red = col
    for _, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return res.withColumn(out, red)


def repetition_signals(
    df: DataFrame, text_col: str = "text", prefix: str = "rep_"
) -> DataFrame:
    """Within-document repetition counters — the Gopher/MassiveText
    quality-filter family (Rae et al. 2021 §A1.1, public): repeated
    tokens and repeated n-grams mark low-quality generated/templated
    text. Emits integer counts (callers derive fractions) so the values
    are exact at any scale and bit-reproducible in the SQL oracle:

    - ``rep_n_tokens`` / ``rep_n_distinct``: token total vs distinct;
    - ``rep_top_token``: occurrences of the most frequent token;
    - ``rep_n_2grams`` / ``rep_dup_2grams``: 2-gram total vs
      occurrences of 2-grams that appear more than once in the doc.

    Pure Catalyst via higher-order array functions (transform/filter/
    array_distinct over the token array) — per-row cost is
    O(distinct × n) on documents, no shuffle, no Python; the whole
    thing is a projection over the scan.
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")), " "
    )
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def counts(arr):
        # per-distinct-element occurrence counts within arr
        return F.transform(
            F.array_distinct(arr),
            lambda v: F.size(F.filter(arr, lambda x: x == v)),
        )

    return (
        df.withColumn("_t", toks)
        .withColumn("_g", grams)
        .withColumn(prefix + "n_tokens", F.size("_t"))
        .withColumn(prefix + "n_distinct", F.size(F.array_distinct("_t")))
        .withColumn(
            prefix + "top_token",
            F.coalesce(F.array_max(counts(F.col("_t"))), F.lit(0)),
        )
        .withColumn(prefix + "n_2grams", F.size("_g"))
        .withColumn(
            prefix + "dup_2grams",
            F.coalesce(
                F.aggregate(
                    counts(F.col("_g")),
                    F.lit(0),
                    lambda acc, c: acc + F.when(c > 1, c).otherwise(F.lit(0)),
                ),
                F.lit(0),
            ),
        )
        .drop("_t", "_g")
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stop_words: int = 2,
    prefix: str = "r_",
) -> DataFrame:
    """Gopher/MassiveText document-quality rule filter (Rae et al. 2021
    §A1.1, public): per-rule boolean flags plus ``keep`` = AND of all —
    the standard pre-training corpus gate, composed from the same token
    array the repetition signals use.

    Every rule compares INTEGER counts via cross-multiplication
    (``5 * dup_2grams <= n_2grams`` instead of ``dup/n <= 0.2``), so
    the flags are exact at any scale and bit-reproducible in the SQL
    oracle — no float-ratio boundary cases. Pure Catalyst projection
    over the scan: no shuffle, no Python.

    Rules (flag TRUE = passes):
    - ``r_nwords``:   min_words ≤ word count ≤ max_words;
    - ``r_mwl``:      mean word length in [min,max] chars (integer
                      bound: min·n ≤ Σ len(word) ≤ max·n);
    - ``r_alpha``:    ≥80% of words contain an alphabetic character;
    - ``r_stop``:     ≥``min_stop_words`` distinct Gopher stop words present;
    - ``r_symbol``:   hash/ellipsis-to-word ratio ≤ 0.1;
    - ``r_rep2``:     duplicate-2-gram occurrences ≤ 20% of 2-grams;
    - ``r_toptok``:   most frequent token ≤ 20% of tokens.
    """
    text = F.col(text_col)
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")), " "
    )
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def counts(arr):
        return F.transform(
            F.array_distinct(arr),
            lambda v: F.size(F.filter(arr, lambda x: x == v)),
        )

    out = (
        df.withColumn("_t", toks)
        .withColumn("_g", grams)
        .withColumn("_nw", F.size("_t"))
        .withColumn(
            "_wchars",
            F.aggregate(F.col("_t"), F.lit(0), lambda a, x: a + F.length(x)),
        )
        .withColumn(
            "_nalpha",
            F.size(F.filter(F.col("_t"), lambda x: x.rlike("[a-z]"))),
        )
        .withColumn(
            "_nstop",
            F.size(
                F.filter(
                    F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
                    lambda w: F.array_contains(F.col("_t"), w),
                )
            ),
        )
        .withColumn("_nsym", F.regexp_count(text, F.lit(r"#|\.\.\.")))
        .withColumn("_top", F.coalesce(F.array_max(counts(F.col("_t"))), F.lit(0)))
        .withColumn("_n2", F.size("_g"))
        .withColumn(
            "_dup2",
            F.coalesce(
                F.aggregate(
                    counts(F.col("_g")),
                    F.lit(0),
                    lambda acc, c: acc + F.when(c > 1, c).otherwise(F.lit(0)),
                ),
                F.lit(0),
            ),
        )
    )
    rules = {
        prefix + "nwords": (F.col("_nw") >= min_words)
        & (F.col("_nw") <= max_words),
        prefix + "mwl": (F.col("_wchars") >= min_mean_word_len * F.col("_nw"))
        & (F.col("_wchars") <= max_mean_word_len * F.col("_nw")),
        prefix + "alpha": F.col("_nalpha") * 5 >= F.col("_nw") * 4,
        prefix + "stop": F.col("_nstop") >= min_stop_words,
        prefix + "symbol": F.col("_nsym") * 10 <= F.col("_nw"),
        prefix + "rep2": F.col("_dup2") * 5 <= F.col("_n2"),
        prefix + "toptok": F.col("_top") * 5 <= F.col("_nw"),
    }
    keep = F.lit(True)
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
        keep = keep & F.col(name)
    return out.withColumn("keep", keep).drop(
        "_t", "_g", "_nw", "_wchars", "_nalpha", "_nstop", "_nsym",
        "_top", "_n2", "_dup2",
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
    out: str = "text_clean",
    prefix: str = "c4_",
) -> DataFrame:
    """C4-style page/line cleaning (Raffel et al. 2020 §2.2, public
    methodology) as a pure-Catalyst projection — no shuffle, no Python.

    Line level (applied to ``\\n``-split lines, surviving lines
    re-joined into ``out``):

    - keep only lines whose right-trimmed text ends in a terminal
      punctuation mark (``.`` ``!`` ``?`` ``"``);
    - keep only lines with ≥ ``min_line_words`` whitespace words;
    - drop lines containing the word ``javascript`` (case-insensitive).

    Page level (integer/boolean flags; ``keep`` = AND):

    - ``c4_has_brace``: ``{`` anywhere on the page (code marker);
    - ``c4_has_lorem``: ``lorem ipsum`` anywhere (case-insensitive);
    - ``c4_n_lines`` / ``c4_n_kept``: line counts before/after;
    - ``c4_n_sentences``: terminal-punctuation count in the cleaned
      text (the §2.2 "at least 3 sentences" proxy);
    - ``keep``: no brace, no lorem, ``c4_n_sentences ≥ min_sentences``.

    The §2.2 bad-word list and the three-sentence-span dedup are
    covered elsewhere in this engine (callers compose ``redact_pii`` /
    a block-list filter and :func:`~pythongis_spark.operators.dedup.
    exact_substring_signals`).
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    pred = (
        lambda x: x.rlike('[.!?"]\\s*$')
        & (F.size(F.split(F.trim(x), "\\s+")) >= min_line_words)
        & (F.trim(x) != "")
        & ~F.lower(x).contains("javascript")
    )
    kept = F.filter(lines, pred)
    cleaned = F.array_join(kept, "\n")
    n_sent = F.regexp_count(cleaned, F.lit("[.!?]"))
    return (
        df.withColumn(out, cleaned)
        .withColumn(prefix + "n_lines", F.size(lines).cast("int"))
        .withColumn(prefix + "n_kept", F.size(kept).cast("int"))
        .withColumn(prefix + "has_brace", text.contains("{"))
        .withColumn(prefix + "has_lorem", F.lower(text).contains("lorem ipsum"))
        .withColumn(prefix + "n_sentences", n_sent.cast("int"))
        .withColumn(
            "keep",
            ~text.contains("{")
            & ~F.lower(text).contains("lorem ipsum")
            & (n_sent >= min_sentences),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style LM-fit quality filter (Wenzek et al. 2020, public
# methodology: score documents by fit against a reference-corpus LM and
# filter/bucket on the score; KenLM replaced by a distributed bigram
# table — no external LM library in this image)


def bigram_lm_counts(
    ref: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Word-bigram counts of a reference corpus — the 'train' pass of
    the LM-fit filter. One hash groupBy (map-side partial agg);
    ``min_count`` prunes the long tail so the table broadcasts."""
    from pythongis_spark.operators.dedup import word_ngrams

    return (
        ref.select(F.explode(word_ngrams(F.col(text_col), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def lm_fit(
    df: DataFrame,
    counts: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: float = 1.0,
    broadcast_counts: bool = True,
) -> DataFrame:
    """Per-document fit against a reference bigram table: integer
    backbone — ``n_bigrams`` (positions), ``n_hits`` (positions whose
    bigram is in the table), ``hit_cnt_sum`` (sum of table counts over
    hits) — plus ``lm_nll``, the add-``k``-smoothed mean negative log2
    probability (the CCNet perplexity analog; lower = better fit).

    The integer columns are order-independent and SQL-replayable (the
    oracle gate proves them); the float ``lm_nll`` is a deterministic
    per-row transform of them plus two corpus scalars.

    Scale shape: doc bigrams explode to (id, gram) only, the counts
    table joins broadcast (min_count-pruned reference LMs are small;
    pass ``broadcast_counts=False`` for a shuffle join on the gram),
    and the per-doc aggregate is one partial+final hash agg. Documents
    with fewer than two words keep n_bigrams = 0 and NULL lm_nll."""
    from pythongis_spark.operators.dedup import word_ngrams

    c = counts.select("gram", "cnt")
    if broadcast_counts:
        c = F.broadcast(c)
    # corpus scalars as a broadcast single row (no driver round trip)
    tot = F.broadcast(
        counts.agg(
            F.sum("cnt").cast("double").alias("_tot"),
            F.count("*").cast("double").alias("_v"),
        )
    )
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("gram")
    )
    per_doc = (
        grams.join(c, "gram", "left")
        .crossJoin(tot)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count("cnt").alias("n_hits"),
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("hit_cnt_sum"),
            F.avg(
                -F.log2(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(k))
                    / (F.col("_tot") + F.lit(k) * F.col("_v"))
                )
            ).alias("lm_nll"),
        )
    )
    out = df.join(per_doc, id_col, "left")
    return (
        out.withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .withColumn("hit_cnt_sum", F.coalesce("hit_cnt_sum", F.lit(0)))
    )

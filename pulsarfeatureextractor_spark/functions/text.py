"""Text-analysis functions for training-data curation, over the
documents table.  All JVM built-ins unless noted; SQL-expressible
variants are kept deliberately portable so the DuckDB differential
oracle can reproduce them exactly.

- quality metrics : token count, char stats, mean word length,
  type-token ratio (all arithmetic over split()).
- language ID     : stopword-hit heuristic over a tiny built-in
  lexicon per language (deterministic; corpus langs: en es de fr zh).
- fingerprinting  : rolling polynomial hash of the token stream
  (Karp-Rabin), JVM fold via F.aggregate — content-defined document
  fingerprint for shift-stable dedup.
- token counting  : whitespace tokens + a BPE-ish subword estimate
  (regex word-piece segmentation count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal stopword lexicons (public common words); enough for a
# deterministic heuristic over the synthetic corpus
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}


def words_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def clean_words_col(text_col: str = "text") -> Column:
    """The engine-wide pinned tokenization: NULL text == '', split on
    single spaces, empty tokens dropped.  One canonical home for the
    expression the round-5 review found re-stated per module (lm /
    dsir / spans / bpe / nb / unigram all pin the same convention);
    new code should use this, existing modules keep their verbatim
    copies because their differential oracles mirror them verbatim."""
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != F.lit(""),
    )


def with_quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Arithmetic quality features (portable to ANSI SQL):

    n_tokens, n_chars_text, mean_word_len, distinct_tokens,
    type_token_ratio.  mean_word_len assumes single-space separation:
    (len(text) - (n_tokens-1)) / n_tokens.
    """
    w = words_col(text_col)
    n_tokens = F.size(w)
    n_chars = F.length(F.col(text_col))
    return (
        df.withColumn("n_tokens", n_tokens.cast("int"))
        .withColumn("n_chars_text", n_chars.cast("int"))
        .withColumn(
            "mean_word_len",
            ((n_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens.cast("double")),
        )
        .withColumn("distinct_tokens", F.size(F.array_distinct(w)).cast("int"))
        .withColumn(
            "type_token_ratio",
            F.size(F.array_distinct(w)).cast("double") / n_tokens.cast("double"),
        )
    )


def with_langid(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: predicted lang = argmax over languages
    of (#tokens in that language's stopword list); deterministic
    tie-break by language code order.  'und' when no list hits."""
    w = words_col(text_col)
    scores = []
    for lang in sorted(STOPWORDS):
        lex = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        hits = F.size(F.filter(w, lambda t: F.array_contains(lex, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max over struct(hits, lang): max hits, then max lang —
    # flip: order langs desc so ties pick the FIRST alphabetically
    best = F.array_max(
        F.array(*[
            F.struct(
                s["hits"].alias("hits"),
                (F.lit(0) - i).alias("tiebreak"),
                s["lang"].alias("lang"),
            )
            for i, s in enumerate(scores)
        ])
    )
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


#: CJK Unified Ideographs block — the script-ratio feature for the
#: learned language-ID stage (fastText-style models consume character
#: n-gram/script features; this is the scan-side analogue).
_CJK_RE = "[^\\u4e00-\\u9fff]"


def langid_features(df: DataFrame, text_col: str = "text") -> "tuple[DataFrame, list[str]]":
    """Scan-side feature assembly for the learned language-ID
    classifier (functions/inference.classify_with_model): per language
    the stopword-hit count ``lh_<lang>`` (exact integer, same counting
    as the with_langid heuristic) plus ``cjk_chars`` (CJK-block char
    count — a script-ratio signal the stopword lists cannot carry).
    All pure JVM expressions — fuses into the scan, no shuffle, and the
    integer features make the downstream linear fixture exactly
    SQL-oracle-able.  Returns (df + feature columns, feature names in
    classifier order).  NULL text coalesces to '' (0-valued features,
    so the classifier abstains rather than seeing NaN)."""
    w = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    out = df
    names = []
    for lang in sorted(STOPWORDS):
        lex = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        out = out.withColumn(
            f"lh_{lang}",
            F.size(F.filter(w, lambda t: F.array_contains(lex, t))).cast(
                "double"
            ),
        )
        names.append(f"lh_{lang}")
    out = out.withColumn(
        "cjk_chars",
        F.length(
            F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), _CJK_RE, "")
        ).cast("double"),
    )
    names.append("cjk_chars")
    return out, names


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Karp-Rabin rolling polynomial fingerprint of the token stream:
    fp = fold(tokens, 0, (acc, t) -> (acc * 1000003 + h40(t)) mod 2^40)
    where h40 = xxhash64 folded to 40 bits.  The modulus keeps every
    intermediate < 2^60 so the fold is exact under ANSI arithmetic
    (no wraparound/overflow) — a deterministic whole-document content
    fingerprint (JVM fold, no shuffle)."""
    mod = F.lit(1 << 40).cast("long")
    w = words_col(text_col)
    fp = F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(1000003).cast("long") + F.pmod(F.xxhash64(t), mod), mod
        ),
    )
    return df.withColumn(out_col, fp)


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword count estimate:
    subwords = number of matches of a word-piece regex (runs of
    letters up to length 4, digits, or single punctuation).  The regex
    count is computed JVM-side via regexp_count (Spark 4)."""
    w = words_col(text_col)
    return (
        df.withColumn("ws_tokens", F.size(w).cast("int"))
        .withColumn(
            "subword_tokens",
            F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]")).cast("int"),
        )
    )


def with_repetition_metrics(
    df: DataFrame, text_col: str = "text", max_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, recast
    as count mass): for each n in 1..max_n, the fraction of the
    document's word n-grams taken by its single most frequent n-gram
    (`rep_n` columns, rounded to 6 decimals).  High rep_2/rep_3 flags
    boilerplate and degenerate loops.

    One scan: the n-gram arrays for every n are built and tagged
    JVM-side, concatenated, and exploded ONCE; then one shuffle on
    (doc, n, gram) and one hash aggregate per (doc, n).  At 100 TB
    the (doc, n, gram) key is unique-ish per doc so the aggregate is
    map-side-combinable and skew-free (keys never cross documents)."""
    from pulsarfeatureextractor_spark.operators.dedup import shingles

    def _tag(n: int):
        # closure factory: a `lambda g, n=n:` would be seen by PySpark's
        # arity sniffing as the 2-arg (element, index) form
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(
        *[
            F.transform(shingles(text_col, n), _tag(n))
            for n in range(1, max_n + 1)
        ]
    )
    exploded = df.select(id_col, F.explode(tagged).alias("t")).select(
        id_col, F.col("t.n").alias("n"), F.col("t.gram").alias("gram")
    )
    per_gram = exploded.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_n = per_gram.groupBy(id_col, "n").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("rep")
    )
    wide = per_n.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("rep"))).alias(f"rep_{n}")
            for n in range(1, max_n + 1)
        ]
    )
    return df.join(wide, id_col, "left")


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking for embedding/training prep: one output
    row per chunk of ``chunk_tokens`` whitespace tokens, consecutive
    chunks overlapping by ``overlap``.

    n_chunks = 1 if L <= chunk_tokens else ceil((L-chunk)/stride)+1 —
    the last chunk is the clamped tail, so every token appears in at
    least one chunk.  All JVM (split + sequence + slice + explode):
    chunking fuses into the scan stage, no shuffle, no Python."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    w = words_col(text_col)
    n_chunks = F.greatest(
        (F.ceil((F.size(w) - F.lit(chunk_tokens)) / F.lit(stride)) + 1).cast("int"),
        F.lit(1),
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(w, i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.size(F.slice(w, i * stride + 1, chunk_tokens)).alias("chunk_len"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.chunk_len").alias("chunk_len"),
        )
    )


# simple public-pattern PII classes; both regexes are valid in Java
# regex (Spark) and RE2 (DuckDB) with identical semantics
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: "dict[str, str] | None" = None,
    token: str = "<PII>",
) -> DataFrame:
    """Redact PII-shaped substrings (emails, IPv4 by default) and count
    hits per class.  Pure JVM regexp_replace/regexp_count — fuses into
    the scan; patterns are engine-portable (Java regex ∩ RE2)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    red = F.col(text_col)
    out = df
    for name, pat in sorted(pats.items()):
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("int")
        )
        red = F.regexp_replace(red, pat, token)
    return out.withColumn(out_col, red)


def blocklist_filter(
    df: DataFrame,
    words: "list[str]",
    text_col: str = "text",
    max_distinct_hits: int = 0,
) -> DataFrame:
    """C4-style bad-word / blocklist gate (Raffel et al. 2020 §2.2
    drop any page containing a word from a blocklist; generalized to
    a tolerance): per document, count the blocklisted words present
    and keep iff at most ``max_distinct_hits`` DISTINCT blocklist
    words appear.

    Output = input columns + ``n_blocked_distinct`` (distinct
    blocklist words present), ``n_blocked_tokens`` (total blocked
    occurrences), ``blocklist_keep``.

    Pinned semantics (mirrored by the DuckDB oracle): tokens are the
    non-empty whitespace splits, matching is EXACT string equality
    (case-sensitive — callers lower() both sides for the usual C4
    behavior); distinct-hit counting dedups the document's tokens
    first (array_intersect/list_intersect on both engines).

    Plan shape / 100 TB posture: the blocklist is a LITERAL array in
    the plan (C4's list is ~400 entries — expression-sized, cheaper
    than a broadcast join), so the whole gate is scan-fused: zero
    shuffles, zero Python, fully pushable below any downstream join.
    """
    blk = F.array(*[F.lit(w) for w in sorted(set(words))])
    ws = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != F.lit(""),
    )
    n_distinct = F.size(F.array_intersect(F.array_distinct(ws), blk))
    n_tokens = F.size(F.filter(ws, lambda w: F.array_contains(blk, w)))
    return df.select(
        "*",
        n_distinct.cast("int").alias("n_blocked_distinct"),
        n_tokens.cast("int").alias("n_blocked_tokens"),
        (n_distinct <= F.lit(int(max_distinct_hits))).alias(
            "blocklist_keep"
        ),
    )


def boilerplate_tokens(
    df: DataFrame,
    text_col: str = "text",
    ratio: "tuple[int, int]" = (1, 2),
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate vocabulary: tokens whose document
    frequency satisfies ``dfc * den >= n_docs * num`` (ratio =
    (num, den), exact integer arithmetic so any engine reproduces the
    cut bit-for-bit — no float threshold) and ``dfc >= min_docs``.

    Returns (token, dfc).  Plan shape / 100 TB posture: one shuffle on
    token over the DISTINCT per-doc token set (array_distinct happens
    scan-side, so the exchange carries distinct (doc, token) pairs,
    not raw occurrences); n_docs is a 1-row broadcast cross-join,
    never a driver collect (same shape as tfidf.py).
    """
    num, den = ratio
    if num <= 0 or den <= 0:
        raise ValueError("ratio parts must be positive integers")
    toks = df.select(
        F.explode(
            F.array_distinct(
                F.filter(words_col(text_col), lambda w: w != F.lit(""))
            )
        ).alias("token")
    )
    dfc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    n = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        dfc.join(F.broadcast(n))
        .where(
            (F.col("dfc") * F.lit(int(den)) >= F.col("__n_docs") * F.lit(int(num)))
            & (F.col("dfc") >= F.lit(int(min_docs)))
        )
        .select("token", "dfc")
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    ratio: "tuple[int, int]" = (1, 2),
    min_docs: int = 2,
    out_col: str = "clean_text",
    kept_out: str = "n_kept",
    max_frequent: int = 10_000,
) -> DataFrame:
    """C4-style corpus boilerplate removal: drop every token that
    appears in at least ``ratio`` of all documents, preserving the
    order and multiplicity of the surviving tokens.

    Output = input columns + ``out_col`` (cleaned text, "" when every
    token was boilerplate) + ``kept_out`` (surviving token count).

    Plan shape / 100 TB posture: the boilerplate vocabulary is
    BOUNDED BY CONSTRUCTION — sum(dfc) <= n_docs * max distinct
    tokens per doc, so |{t : dfc >= (num/den) * n_docs}| <=
    max_distinct_per_doc * den / num (stopword-scale for any sane
    ratio; ~2k for 1k-distinct-token docs at 50%).  It is therefore
    collected driver-side (metadata-sized, same tier as the IVF
    centroid sample in operators/similarity.py) and inlined into a
    scan-fused higher-order filter — the removal itself costs ZERO
    shuffles and never explodes the corpus; only the vocabulary agg
    (one distinct-pair exchange) touches the cluster.  ``max_frequent``
    guards the bound: a pathological ratio that yields a larger set
    raises instead of silently building a huge In() expression.
    """
    freq = boilerplate_tokens(df, text_col, ratio, min_docs)
    rows = freq.select("token").limit(max_frequent + 1).collect()
    if len(rows) > max_frequent:
        raise ValueError(
            f"boilerplate set exceeds max_frequent={max_frequent}; "
            "raise the threshold ratio or max_frequent"
        )
    tokens = sorted(r["token"] for r in rows)
    # NULL text must behave as '' (0 tokens kept, clean_text '') — the
    # DuckDB differential oracle coalesces, so the engine must too
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != F.lit(""),
    )
    if tokens:
        clean = F.filter(words, lambda w: ~w.isin(*tokens))
    else:
        clean = words
    return df.select(
        "*",
        F.array_join(clean, " ").alias(out_col),
        F.size(clean).alias(kept_out),
    )


# Gopher quality rules (Rae et al. 2021, appendix A1.1 "MassiveWeb
# filtering") — the published rule set, word-level subset (the
# line-based rules need newline-structured text): word count within
# [min_words, max_words], mean word length within [3, 10], ≥ 80 % of
# words contain an alphabetic character, symbol-to-word ratio ('#'
# and '...') ≤ 0.1, and ≥ 2 DISTINCT words from the paper's stopword
# list.  Every rule is a scan-fused JVM expression (counts are exact
# integers; each ratio is one final division) so the whole filter is
# free at 100 TB — no shuffle, no UDF — and the DuckDB oracle
# reproduces it with the same arithmetic.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 2,
    keep_out: str = "gopher_keep",
) -> DataFrame:
    """Input columns + per-rule metrics + ``keep_out`` (True iff every
    rule passes).  Ratios round to 6 decimals; empty/NULL text fails
    the word-count rule (n_words 0) and reports NULL ratios."""
    ws = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != F.lit(""),
    )
    n = F.size(ws)
    sum_len = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_len = F.when(n > 0, F.round(sum_len.cast("double") / n, 6))
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.when(n > 0, F.round(n_alpha.cast("double") / n, 6))
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_symbols = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
        + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ).cast("int")
    symbol_ratio = F.when(n > 0, F.round(n_symbols.cast("double") / n, 6))
    stop_hits = F.size(
        F.array_intersect(
            ws, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    keep = (
        n.between(min_words, max_words)
        & mean_len.between(min_mean_word_len, max_mean_word_len)
        & (alpha_frac >= F.lit(min_alpha_frac))
        & (symbol_ratio <= F.lit(max_symbol_ratio))
        & (stop_hits >= F.lit(min_stop_hits))
    )
    return df.select(
        "*",
        n.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len_g"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.cast("int").alias("stop_hits"),
        F.coalesce(keep, F.lit(False)).alias(keep_out),
    )

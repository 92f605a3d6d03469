"""Text analysis for corpus curation: language ID, quality scoring,
token counting, document fingerprinting.

Everything here is pure Column expressions (regexp/array lambdas) so
the operators run inside WholeStageCodegen at full scan speed, and so
each one has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word-ish tokens: letter runs, digit runs, or single non-space symbols
# (the "BPE-ish" regex — splits punctuation off words the way byte-pair
# pretokenizers do)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "por", "con"],
}


def ws_tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count_ws(col) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def token_count_bpe(col) -> Column:
    """BPE-ish token count via the pretokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def quality_features(col) -> dict[str, Column]:
    """Raw quality signals (each SQL-expressible)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = ws_tokens(col)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    stop_arr = F.array(*[F.lit(s) for s in LANG_PROFILES["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens  # ≈ chars per token
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / F.greatest(n_chars, F.lit(1)),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "digit_ratio": n_digit / F.greatest(n_chars, F.lit(1)),
        "stopword_hits": n_stop,
        "mean_token_len": mean_tok_len,
    }


def quality_score(col) -> Column:
    """Composite [0,1] quality score — a Gopher/C4-style heuristic:
    rewards alphabetic text of sane length with some stopwords,
    penalizes digit/punct-heavy or degenerate docs. Deterministic,
    documented formula (weights are part of the contract)."""
    f = quality_features(col)
    len_ok = F.when((f["n_tokens"] >= 5) & (f["n_tokens"] <= 100000), 1.0).otherwise(0.0)
    tok_ok = F.when((f["mean_token_len"] >= 2) & (f["mean_token_len"] <= 12), 1.0).otherwise(0.0)
    stop_ok = F.when(f["stopword_hits"] >= 2, 1.0).otherwise(0.0)
    score = (
        0.3 * len_ok
        + 0.2 * tok_ok
        + 0.2 * stop_ok
        + 0.2 * f["alpha_ratio"]
        + 0.1 * (1.0 - F.least(f["digit_ratio"] * 4, F.lit(1.0)))
    )
    return F.round(score, 4)


def langid(col) -> Column:
    """Stopword-profile language ID: count distinct profile hits per
    language over the doc's token set; argmax wins, ties broken by
    profile order; no hits → 'und'. A pure array-intersection
    heuristic — no model, fully SQL-expressible."""
    toks = F.array_distinct(ws_tokens(col))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }
    langs = list(LANG_PROFILES)
    expr = F.lit("und")
    # first profile (in declaration order) with the max hit count ≥ 1
    for lang in reversed(langs):
        cond = hits[lang] >= 1
        for other in langs:
            if other != lang:
                cond = cond & (hits[lang] >= hits[other]) if langs.index(other) > langs.index(lang) \
                    else cond & (hits[lang] > hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (a set-semantics content signature robust to
    shuffling/duplication — the rolling-hash analogue for bag-of-words
    identity)."""
    c = F.concat_ws(" ", F.array_sort(F.array_distinct(ws_tokens(col))))
    return F.md5(c)


def repetition_ratio(col, k: int = 3) -> Column:
    """Fraction of REPEATED word k-shingles in the doc:
    (total - distinct) / total, 0 = no repetition. High values flag
    boilerplate, scraped nav bars, and looped generations — the
    Gopher-style repetition filter family. Pure Column exprs (counts
    shingles WITH repeats, unlike dedup.shingles which de-dups)."""
    toks = ws_tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    total = F.size(sh)
    return F.round((total - F.size(F.array_distinct(sh)))
                   / F.greatest(total, F.lit(1)), 4)


# PII redaction patterns — deliberately restricted to syntax valid in
# BOTH Java regex (Spark) and RE2 (DuckDB): no lookaround, no
# backrefs. Order matters: emails first (contain dots/digits), then
# IPs, then the greedy phone heuristic (earlier replacements leave no
# digits behind, so later patterns cannot re-match inside them).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
]


def redact_pii(col) -> Column:
    """Replace email / IPv4 / phone-shaped spans with typed
    placeholder tokens — the standard pre-training scrub pass. One
    chained regexp_replace per pattern, JVM codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(col) -> dict[str, Column]:
    """Per-kind PII match counts (for audit/metrics alongside the
    redaction). Each kind is counted on the text with the EARLIER
    patterns already redacted — mirroring the redact_pii chain — so a
    span is attributed to exactly one kind (an IPv4 would otherwise
    also count as a phone-shaped digit run)."""
    c = F.col(col) if isinstance(col, str) else col
    out = {}
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        c = F.regexp_replace(c, pat, repl)
    return out


# URL regex restricted to the Java∩RE2 subset (no lookaround); the
# capture group 1 is the host.
URL_RE = r"https?://([A-Za-z0-9.-]+)(/[^\s]*)?"


def extract_domains(col) -> Column:
    """Distinct lowercased hosts of every http(s) URL in the doc —
    array<string>, JVM-side (regexp_extract_all on group 1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(c, F.lit(URL_RE), 1), lambda d: F.lower(d)
        )
    )


def flag_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style domain filter: flag docs containing a URL whose host
    is on a blocklist (one `domain` column). The blocklist is config-
    sized → BROADCAST left-semi join on the exploded domains; the
    corpus side never shuffles. Returns (id_col, blocked boolean)."""
    doms = df.select(F.col(id_col), F.explode(extract_domains(text_col)).alias("domain"))
    hits = (
        doms.join(F.broadcast(blocklist.select("domain").distinct()), "domain", "left_semi")
        .select(id_col).distinct()
        .withColumn("blocked", F.lit(True))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(id_col, F.coalesce(F.col("blocked"), F.lit(False)).alias("blocked"))
    )


def with_textstats(df: DataFrame, text_col: str = "text") -> DataFrame:
    feats = quality_features(text_col)
    return df.select(
        "*",
        feats["n_tokens"].alias("n_tokens_ws"),
        token_count_bpe(text_col).alias("n_tokens_bpe"),
        F.round(feats["alpha_ratio"], 4).alias("alpha_ratio"),
        F.round(feats["punct_ratio"], 4).alias("punct_ratio"),
        quality_score(text_col).alias("quality"),
        langid(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def corpus_vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-level vocabulary: (token, count, doc_freq) over
    lowercased whitespace tokens — the tokenizer-training /
    stopword-mining primitive. ONE shuffle on the token (map-side
    partial aggregation moves per-partition distinct tokens, not
    positions; doc_freq via count(distinct id) rides the same
    grouping). min_count prunes the hapax tail BEFORE anything
    downstream joins against the vocabulary."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.countDistinct(id_col).alias("doc_freq"),
        )
        .filter(F.col("count") >= min_count)
    )


def doc_tfidf_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document, ranked by tf/df with
    tf-idf (ln) reported alongside: (doc_id, token, tf, doc_freq,
    score, tfidf, rank).

    RANKING is on score = tf / doc_freq (double): IEEE division is
    correctly rounded in every engine, so the ranking key — and
    therefore the selected top-k SET — is a deterministic function of
    the integer (tf, doc_freq) pair, unlike ln-based scores whose last
    ulp may differ between libm implementations and flip a k-boundary
    tie. Ties break on token ASC (row_number, fully deterministic).
    The familiar tfidf = tf * ln(N/df) value rides along rounded to 4
    decimals for reporting.

    Scale shape: explode → (doc, token) tf agg → token-keyed doc_freq
    agg → token join back → per-doc window. Three shuffles plus the
    per-doc top-k window; every stage is keyed, no global sort, and
    the window input is (doc, distinct-token) pairs, not positions.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.countDistinct(id_col).alias("_n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf").cast("double") / F.col("doc_freq"))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("_n_docs") / F.col("doc_freq")), 4),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "doc_freq", "score", "tfidf", "rank")
    )

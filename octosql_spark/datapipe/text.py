"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting. Everything is a Catalyst
expression (regex/split/aggregate) — these run at scan speed on a
100 TB corpus; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish pre-tokenization regex (GPT-2 style classes, simplified to
# what Java regex supports): word pieces, numbers, punctuation runs.
_BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+"

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "para"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "von", "zu"],
}


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token counting: ``whitespace`` (split) or ``bpe`` (regex
    pre-tokenizer pieces — a deterministic proxy for BPE vocab size)."""
    if mode == "whitespace":
        return F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
                .otherwise(F.size(F.split(F.trim(text), r"\s+"))).cast("long")
    if mode == "bpe":
        return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH), F.lit(0))) \
                .cast("long")
    raise ValueError(mode)


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals (length, word stats, punctuation /
    digit / stopword ratios) + a composite [0,1] score. The usual
    pre-filter columns for corpus curation."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_chars = F.length(t).cast("long")
    n_words = token_count(t)
    mean_word_len = F.when(n_words > 0,
                           (n_chars - n_words + 1) / n_words).otherwise(0.0)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    stop = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, F.lower(w))))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(0.0)
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), 0.4).otherwise(0.0)
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), 0.2).otherwise(0.0)
        + F.when(punct_ratio < 0.2, 0.2).otherwise(0.0)
        + F.when(digit_ratio < 0.3, 0.2).otherwise(0.0)
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"), n_words.alias("q_words"),
        mean_word_len.alias("q_mean_word_len"),
        punct_ratio.alias("q_punct_ratio"), digit_ratio.alias("q_digit_ratio"),
        stop_ratio.alias("q_stop_ratio"), score.alias("q_score"))


def language_id(text: Column) -> Column:
    """Stopword-vote language ID over {en,fr,es,de} (+ 'und' when no
    vote). A deterministic n-gram-free heuristic: per language, count
    hits of its top stopwords; argmax wins. CJK shortcut: any Han
    codepoint → 'zh'."""
    words = F.transform(F.split(F.trim(text), r"\s+"), F.lower)

    def _hits(stops: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in stops])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    scores = [F.struct(_hits(stops).alias("hits"), F.lit(lang).alias("lang"))
              for lang, stops in _STOPWORDS.items()]
    best = F.array_max(F.array(*scores))
    han = text.rlike(r"[一-鿿]")
    return (F.when(han, F.lit("zh"))
            .when(best.getField("hits") > 0, best.getField("lang"))
            .otherwise(F.lit("und")))


# PII/markup scrubbing patterns — applied in order (URLs first so an
# address inside a URL is not half-redacted). Patterns stay inside the
# RE2 ∩ Java-regex subset: no backreferences or lookaround.
_REDACT_PATTERNS = [
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Training-data scrubbing: replace emails / URLs / IPv4s /
    phone-number-ish digit runs with typed placeholders. A chain of
    ``regexp_replace`` expressions — scan-speed, no Python in the row
    path; at 100 TB this fuses into the same whole-stage-codegen pass
    as the scan."""
    out = text
    for kind, pat, repl in _REDACT_PATTERNS:
        if kinds is None or kind in kinds:
            out = F.regexp_replace(out, pat, repl)
    return out


def url_domain(url: Column, strip_www: bool = True) -> Column:
    """Registrable-host extraction for URL-keyed dedup and domain
    caps (the ``cap_per_key`` key a web-crawl pipeline actually
    wants): lowercased host, port and userinfo stripped, one leading
    ``www.`` label removed. NULL for strings with no ``scheme://``.
    Pure regexp — whole-stage codegen at scan speed, and every
    pattern stays in the Java/RE2 COMMON subset so a DuckDB oracle
    replays it byte-for-byte."""
    host = F.lower(F.regexp_extract(
        url, r"^\s*[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#\s]+)",
        1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def url_normalize(url: Column) -> Column:
    """Canonical URL form for exact URL-level dedup: scheme and host
    lowercased, userinfo and fragment stripped, the scheme's default
    port removed (http:80 / https:443), empty path → ``/``. Query
    strings are KEPT (they select content); anything without a
    ``scheme://`` prefix returns NULL rather than guess. Same
    engine-portable regexp-only contract as ``url_domain``."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(
        rest, r"^(?:[^/@?#]*@)?([^/?#\s]*)", 1))
    hostport = F.when(scheme == "http",
                      F.regexp_replace(hostport, r":80$", "")) \
        .when(scheme == "https",
              F.regexp_replace(hostport, r":443$", "")) \
        .otherwise(hostport)
    pq = F.regexp_replace(
        F.regexp_replace(rest, r"^(?:[^/@?#]*@)?[^/?#\s]*", ""),
        r"(?s)#.*$", "")
    pq = F.when(pq == "", F.lit("/")).otherwise(pq)
    return F.when(scheme == "", F.lit(None).cast("string")) \
        .otherwise(F.concat(scheme, F.lit("://"), hostport, pq))


def html_extract_text(html: Column) -> Column:
    """Boilerplate strip for web-crawl ingest — the step BEFORE every
    text operator in this module when the corpus arrives as HTML:
    drop ``<script>``/``<style>`` elements and comments, strip the
    remaining tags, decode the six common entities, squash
    whitespace. A chain of regexp/replace expressions (no Python, no
    parser library): deterministic, scan-speed, and exactly
    replayable by a DuckDB oracle. It is deliberately a TEXT
    extractor, not an HTML parser — malformed markup degrades to
    extra stripped tokens, never an error."""
    t = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def tf_idf_top_terms(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF:
    ``tf(term, doc) * ln(N / df(term))``, score rounded to 6 decimals
    (cross-engine float comparability), ties broken by term.

    Scale shape: tokenize+explode is narrow; the (doc, term) count and
    the (term) document-frequency are both map-side-combined
    aggregations; N is one scalar broadcast back; top-k per doc is a
    bounded window. No driver materialization.
    """
    toks = (df.select(id_col,
                      F.explode(F.split(F.lower(F.col(text_col)),
                                        r"[^a-z]+")).alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("dfreq"))  # tf rows are distinct (doc, term)
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n))
              .withColumn("score",
                          F.round(F.col("tf")
                                  * F.log(F.col("n_docs")
                                          / F.col("dfreq")), 6)))
    from pyspark.sql.window import Window
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("score").desc(), F.col("term")))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(id_col, "term", "score"))


def unigram_logprob(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the classic cheap perplexity proxy for quality
    filtering (gibberish and boilerplate score low; typical prose
    scores near the corpus mode). Returns (id, n_tokens,
    avg_logprob rounded to 6 — the mean is order-dependent).

    Scale shape: two map-side-combined aggregations (token counts =
    the vocab, then the per-doc mean), one scalar total broadcast
    back, and one tokens↔vocab equi-join. The vocab is Zipf-small
    relative to the corpus (~10M rows at 100 TB) so AQE broadcasts it
    when it fits and shuffle-joins otherwise; nothing touches the
    driver.
    """
    toks = (df.select(id_col,
                      F.explode(F.split(F.lower(F.col(text_col)),
                                        r"[^a-z]+")).alias("term"))
            .filter(F.col("term") != ""))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    return (toks.join(vocab, "term")
            .crossJoin(F.broadcast(total))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 6)
                 .alias("avg_logprob")))


def bigram_logprob(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: float = 0.5) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    add-k-smoothed bigram LM — one step up from ``unigram_logprob``
    toward a KenLM-style perplexity filter: word-salad documents whose
    unigrams are common but whose *transitions* are improbable score
    low. ``logP(cur|prev) = ln((c(prev,cur)+k) / (c(prev)+k·V))`` with
    V = distinct successor vocabulary. Returns (id, n_bigrams,
    avg_logprob rounded to 6); documents with < 2 tokens are dropped
    (no bigrams to score).

    Scale shape: like the unigram LM plus one more Zipf-small count
    table — bigram counts and context counts are two map-side-combined
    aggregations, V is a 1-row broadcast, and scoring is a
    tokens↔counts equi-join that AQE broadcasts when the vocab fits.
    Nothing touches the driver.
    """
    words = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                     lambda w: w != "")
    base = (df.select(id_col, words.alias("_ws"))
            .filter(F.size("_ws") >= 2))
    pairs = F.arrays_zip(
        F.slice("_ws", 1, F.size("_ws") - 1).alias("prev"),
        F.slice("_ws", 2, F.size("_ws") - 1).alias("cur"))
    bg = (base.select(id_col, F.explode(pairs).alias("_b"))
          .select(id_col, F.col("_b.prev").alias("prev"),
                  F.col("_b.cur").alias("cur")))
    bc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bcnt"))
    cc = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("ccnt"))
    v = bg.agg(F.count_distinct("cur").alias("vsize"))
    return (bg.join(bc, ["prev", "cur"]).join(cc, ["prev"])
            .crossJoin(F.broadcast(v))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 F.round(F.avg(F.log(
                     (F.col("bcnt") + F.lit(k))
                     / (F.col("ccnt") + F.lit(k) * F.col("vsize")))), 6)
                 .alias("avg_logprob")))


def perplexity_buckets(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_buckets: int = 3,
                       labels: tuple = ("head", "middle", "tail")
                       ) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting high quality monolingual datasets from web crawl
    data"): score each document with the corpus's own unigram-LM
    perplexity and split the corpus into equal-population quality
    buckets — CCNet's head/middle/tail thirds, the standard
    quality-stratification step before mixture sampling. Returns
    (id, n_tokens, perplexity, bucket, quality) with bucket 1 =
    lowest perplexity (head).

    The bucket boundary is an exact equal-population split
    (distribution terciles, like CCNet's percentile cuts), computed
    with the distributed NTILE decomposition — NOT a single-partition
    window sort. The ORDER key is the rounded mean log-prob (not
    exp(−x)): monotonic-equivalent, and it avoids making the bucket
    assignment depend on cross-engine libm exp behavior.

    Scale shape: unigram_logprob's two map-side aggregations + vocab
    join, then global_ntile's one range shuffle + broadcast offsets.
    Nothing touches the driver.
    """
    from octosql_spark.operators.order_limit import global_ntile
    scored = unigram_logprob(df, id_col, text_col)
    # head = LOWEST perplexity = HIGHEST avg log-prob
    tiled = global_ntile(
        scored, n_buckets,
        [F.col("avg_logprob").desc(), F.col(id_col).asc()],
        out_col="bucket")
    quality = F.when(F.lit(n_buckets != len(labels)),
                     F.concat(F.lit("q"), F.col("bucket").cast("string")))
    for i, lab in enumerate(labels):
        quality = quality.when(F.col("bucket") == i + 1, F.lit(lab))
    return tiled.select(
        id_col, "n_tokens",
        F.round(F.exp(-F.col("avg_logprob")), 6).alias("perplexity"),
        F.col("bucket").cast("long").alias("bucket"),
        quality.alias("quality"))


def fingerprint(text: Column, mode: str = "md5") -> Column:
    """Document fingerprint over whitespace-normalized, lowercased
    text. ``md5`` = content hash; ``rolling`` = min of rolling window
    hashes (winnowing-style, robust to small edits)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    if mode == "md5":
        return F.md5(norm)
    if mode == "rolling":
        words = F.split(norm, " ")
        k = F.greatest(F.size(words) - F.lit(3), F.lit(1))
        idx = F.sequence(F.lit(1), k)
        return F.array_min(F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, 4)))))
    raise ValueError(mode)


def _let(val: Column, body) -> Column:
    """let-binding for Catalyst expressions: evaluate ``val`` ONCE and
    bind it as a HOF lambda variable for ``body``. Repeated *static*
    references to an expression re-evaluate it per reference (and
    CollapseProject re-inlines withColumn aliases), which turns
    nested array pipelines quadratic — e.g. ``element_at(<transform
    over n words>, i)`` inside an n-window scan re-hashes the whole
    document per window. Lambda variables are bound values, so every
    reference inside ``body`` is O(1). (Measured on winnowing at
    sf0.1: 6.97 s → 0.83 s for the identical selection.)"""
    return F.element_at(F.transform(F.array(val), body), 1)


def _winnow_auto_impl() -> str:
    """``auto`` dispatch for winnowing: arrow whenever numpy/pandas
    import (jvm otherwise). The r8 dispatch probed mean document
    length (crossover 512 words) because the arrow path then looped
    per DOCUMENT in Python, so its fixed cost only amortized on long
    docs; the r9 cross-document vectorization (one flat min-scan +
    lexsort per Arrow batch) beats the interpreted per-window HOF
    plan at every measured shape — 500×54-word docs (0.5 vs 0.9 s),
    50k×54 (1.45 vs 5.2 s), 2k×3k (0.86 vs 11.4 s) — so the probe
    and its crossover are gone."""
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        return "arrow"
    except Exception:  # pragma: no cover — both ship with pyspark
        return "jvm"


def winnowing_fingerprints(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 4,
                           w: int = 4,
                           hash_mode: str = "xxhash64",
                           impl: str = "auto") -> DataFrame:
    """Winnowing fingerprint SET per document (Schleimer, Wilkerson &
    Aiken, SIGMOD'03 — the MOSS algorithm): hash every k-gram, slide
    a window of ``w`` consecutive hashes, and keep each window's
    minimum (rightmost minimum on ties, per the paper §2.2). The
    selected set is a deterministic ~2/(w+1) sample of the k-grams
    with the paper's guarantee: any shared run of ≥ w+k−1 tokens
    between two documents yields at least one SHARED fingerprint —
    the basis of robust partial-overlap detection.

    Returns one row per distinct (id, fingerprint, pos) where pos is
    the 1-based token position of the selected k-gram.

    Scale shape: entirely WITHIN-ROW Catalyst HOFs (split → hash
    array → per-window argmin via ``aggregate``) — zero shuffles,
    pipelined with the scan; the fingerprint table is what you join
    or group downstream, each row an 8-byte hash + position.

    ``hash_mode``: ``xxhash64`` (default — words are hashed ONCE and
    each gram hash combines k word hashes, no per-gram string
    building) or ``md5p`` (first 60 bits of md5 over the gram TEXT as
    a BIGINT — both engines compute it identically, so the gate
    entry's SELECTED positions and hash values are fully
    value-oracled in DuckDB, not just invariants).

    Every array is ``_let``-bound: the word-hash array, the gram-hash
    array and each w-slice window evaluate once — the naive nesting
    re-evaluates the whole upstream array per element and goes
    quadratic in document length (8.4× slower at sf0.1).

    ``impl``: ``auto`` (default — arrow whenever numpy/pandas are
    importable; see ``_winnow_auto_impl`` for why the r8 mean-length
    probe is gone), ``jvm`` (pure Catalyst, zero Python; keeps the
    operator entirely in the plan for contexts where Python workers
    are barred) or ``arrow`` — gram hashing stays JVM-side (so the
    fingerprint VALUES are bit-identical to ``jvm``) and only the
    per-window min-scan runs as ONE vectorized numpy pass per Arrow
    batch: every document's gram hashes concatenate into a flat
    array, w-1 ``np.minimum`` shifts + a rightmost-tie overwrite
    scan compute all window minima at once, windows straddling a
    document boundary are masked out, and a lexsort dedupes the
    (doc, fingerprint, pos) triples — no per-document Python loop
    (r9; the loop made 500k short docs cost 7 s at the 10x replica).
    """
    if impl == "auto":
        impl = _winnow_auto_impl()
    if impl not in ("jvm", "arrow"):
        raise ValueError(impl)
    # single-row-group inputs otherwise serialize the whole gram-hash
    # + window-min map on one core (no-op when the layout splits)
    from .dedup import spread_scan
    df = spread_scan(df)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    if hash_mode == "xxhash64":
        def grams_of(ws: Column) -> Column:
            # guard: < k words → no full gram (element_at past the
            # end would throw under ANSI mode); such docs produce
            # < w hashes and are dropped by the size(hs) filter anyway
            return _let(
                F.transform(ws, lambda x: F.xxhash64(x)),
                lambda arr: F.when(F.size(arr) >= k, F.transform(
                    F.sequence(F.lit(1), F.size(arr) - F.lit(k - 1)),
                    lambda i: F.xxhash64(*[F.element_at(arr, i + off)
                                           for off in range(k)])))
                .otherwise(F.array().cast("array<bigint>")))
    elif hash_mode == "md5p":
        def grams_of(ws: Column) -> Column:
            # same sub-k guard as xxhash64: a doc with < k words has
            # NO full k-gram in either mode (the old greatest(...,1)
            # emitted one partial gram here, so the two hash modes
            # disagreed on sub-k docs whenever w=1 — advisor-found r7)
            return F.when(F.size(ws) >= k, F.transform(
                F.sequence(F.lit(1), F.size(ws) - F.lit(k - 1)),
                lambda i: F.conv(
                    F.substring(F.md5(F.concat_ws(
                        " ", F.slice(ws, i, k))), 1, 15),
                    16, 10).cast("long"))) \
                .otherwise(F.array().cast("array<bigint>"))
    else:
        raise ValueError(hash_mode)
    # rightmost minimum per w-window (paper §2.2 tie rule): min +
    # LAST index attaining it, via native array fns on the bound
    # window slice (reverse + array_position finds the rightmost)
    if impl == "arrow":
        import numpy as np
        import pandas as pd

        hdf = df.select(id_col,
                        _let(words, lambda ws: grams_of(ws)).alias("_h"))
        id_field = hdf.schema[id_col]
        # empty-batch id dtype follows the SOURCE id type (a string
        # doc id with a hard-coded int64 series failed Arrow
        # conversion on partitions with no qualifying docs —
        # advisor-found r7)
        _id_dtype = {"bigint": "int64", "int": "int32",
                     "smallint": "int16", "tinyint": "int8",
                     "double": "float64", "float": "float32",
                     "boolean": "bool"}.get(
            id_field.dataType.simpleString(), "object")

        def _empty_frame():
            return pd.DataFrame({
                id_col: pd.Series([], dtype=_id_dtype),
                "fingerprint": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int32")})

        def sel_batches(batches):
            # Vectorized ACROSS documents (r9; the per-document numpy
            # loop was the largest sf1 line at 7.0 s): concatenate
            # every doc's gram hashes into ONE flat array, run the
            # w-shift min + rightmost-tie overwrite once over it, and
            # mask out the windows that straddle a document boundary
            # (a start g in doc j is valid iff g - seg_start(j) ≤
            # len(j) - w). One np.unique sort replaces D per-doc ones.
            for pdf in batches:
                col = pdf["_h"]
                ndocs = len(col)
                if ndocs == 0:
                    yield _empty_frame()
                    continue
                arrs = [np.asarray(x, dtype=np.int64)
                        if x is not None else np.empty(0, np.int64)
                        for x in col]
                lens = np.fromiter((a.shape[0] for a in arrs),
                                   dtype=np.int64, count=ndocs)
                kept = np.nonzero(lens >= w)[0]
                if kept.size == 0:
                    yield _empty_frame()
                    continue
                hs = np.concatenate([arrs[i] for i in kept])
                klens = lens[kept]
                n = hs.shape[0]
                nw = n - w + 1
                m = hs[0:nw].copy()
                for off in range(1, w):
                    np.minimum(m, hs[off:nw + off], out=m)
                # rightmost tie: ascending overwrite keeps the
                # LARGEST matching offset (paper §2.2 rule)
                p = np.zeros(nw, dtype=np.int64)
                for off in range(w):
                    np.copyto(p, off, where=hs[off:nw + off] == m)
                seg_start = np.concatenate(
                    ([0], np.cumsum(klens)[:-1]))
                didx = np.repeat(np.arange(kept.size), klens)[:nw]
                g = np.arange(nw, dtype=np.int64)
                local = g - seg_start[didx]
                valid = local <= klens[didx] - w
                dv = didx[valid]
                mv = m[valid]
                pv = local[valid] + 1 + p[valid]
                # distinct (doc, fingerprint, pos) triples: lexsort +
                # consecutive-diff mask (np.unique(axis=0)'s
                # void-view row sort measured ~2× slower end-to-end
                # on the long-doc corpus)
                order = np.lexsort((pv, mv, dv))
                dv, mv, pv = dv[order], mv[order], pv[order]
                first = np.empty(dv.shape[0], dtype=bool)
                first[0] = True
                np.not_equal(dv[1:], dv[:-1], out=first[1:])
                first[1:] |= (mv[1:] != mv[:-1]) | (pv[1:] != pv[:-1])
                ids_np = pdf[id_col].to_numpy()
                yield pd.DataFrame({
                    id_col: ids_np[kept[dv[first]]],
                    "fingerprint": mv[first],
                    "pos": pv[first].astype("int32")})

        from pyspark.sql.types import IntegerType, LongType, StructType
        out_schema = StructType([id_field]) \
            .add("fingerprint", LongType()).add("pos", IntegerType())
        return hdf.mapInPandas(sel_batches, out_schema)
    sel = _let(words, lambda ws: _let(
        grams_of(ws),
        lambda hs: F.when(F.size(hs) >= w, F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(hs) - F.lit(w - 1)),
                lambda j: _let(F.slice(hs, j, w), lambda win: F.struct(
                    F.array_min(win).alias("h"),
                    # reverse(win)[r] = hs[j + w - r], so the FIRST
                    # match in the reversed window is the RIGHTMOST
                    # minimum at global position j + w - r
                    (j + F.lit(w)
                     - F.array_position(F.reverse(win),
                                        F.array_min(win)))
                    .cast("int").alias("p"))))))
        .otherwise(F.array().cast("array<struct<h:bigint,p:int>>"))))
    # (id, fingerprint, pos) is unique per row (array_distinct runs
    # WITHIN the row) — zero shuffles in this operator
    return (df.select(id_col, F.explode(sel).alias("_s"))
            .select(id_col,
                    F.col("_s.h").alias("fingerprint"),
                    F.col("_s.p").alias("pos")))


def winnowing_overlap_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 4,
                            w: int = 4, min_shared: int = 2,
                            hash_mode: str = "xxhash64",
                            impl: str = "auto") -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints
    (id_a, id_b, shared) — MOSS-style overlap detection: by the
    winnowing guarantee, any common run of ≥ w+k−1 tokens is caught,
    while the index holds only the ~2/(w+1) fingerprint sample
    instead of every k-gram.

    Scale shape: one map-side-combined groupBy on fingerprint value
    (the inverted index), pair fan-out bounded per posting list by
    the winnowing density, then a count aggregate keyed by the id
    pair. The id pair table is skinny (two ids + a count); no text
    travels past the fingerprint stage.
    """
    fps = winnowing_fingerprints(df, id_col, text_col, k, w,
                                 hash_mode, impl)
    dd = fps.select(id_col, "fingerprint").dropDuplicates()
    a = dd.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = dd.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (a.join(b, "fingerprint")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(True)).alias("shared"))
            .filter(F.col("shared") >= min_shared))


def cap_per_key(df: DataFrame, key_col: str = "source",
                n: int = 100, id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-key quota: keep at most ``n`` rows per key,
    chosen by multiplicative-hash order of the id (reproducible
    across runs/engines — NOT first-n-in-partition-order, which is
    nondeterministic under shuffles). The web-curation "domain cap":
    no single domain/source may dominate the corpus.

    Scale shape: one hash-partition shuffle on the key + a
    per-partition window row_number — no global sort; skewed keys are
    exactly the rows the cap discards, so the post-filter frame is
    balanced by construction.
    """
    from pyspark.sql.window import Window
    rank_key = ((F.col(id_col).cast("bigint") * F.lit(2654435761))
                % F.lit(4294967296))
    w_k = Window.partitionBy(key_col).orderBy(rank_key.asc(),
                                              F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w_k))
            .filter(F.col("_rn") <= n).drop("_rn"))


def _lower_words(text: Column) -> Column:
    """Lowercased alphabetic word array (the tokenizer shared by the
    TF-IDF / unigram-LM / BM25 / classifier ops)."""
    return F.filter(F.split(F.lower(text), r"[^a-z]+"),
                    lambda w: w != F.lit(""))


def bm25_scores(df: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 relevance of every document against a fixed bag of query
    terms — the ranking function behind keyword retrieval (quality
    mining, eval-set retrieval baselines, hard-negative mining).
    Returns (id, dl, bm25 rounded to 6) for documents matching at
    least one term.

    ``bm25 = Σ_t ln(1 + (N - df_t + .5)/(df_t + .5))
             * tf_t (k1+1) / (tf_t + k1 (1 - b + b·dl/avgdl))``

    Scale shape: per-document term frequencies are within-row array
    expressions (no tokenize-explode shuffle — the query bag is tiny
    and fixed, so tf is ``size(filter(words, = term))`` per term);
    corpus stats (N, Σdl, per-term document frequencies) are ONE
    map-side-combined aggregation to a single row broadcast back.
    One scan, one scalar broadcast, zero corpus shuffles.
    """
    words = _lower_words(F.col(text_col))

    def _eq(term: str):
        # NB: a `lambda w, t=t` default-arg closure would make PySpark
        # see a 2-parameter lambda and pass (element, index) instead
        return lambda w: w == F.lit(term)

    # persisted: the stats aggregation AND the scoring pass both
    # consume the slim (id, dl, tf_*) table — without it the corpus
    # text is re-read and re-tokenized twice. A handful of longs per
    # row, so the cache is ~1% of the text it replaces.
    d = df.select(
        F.col(id_col), F.size(words).cast("long").alias("dl"),
        *[F.size(F.filter(words, _eq(t))).cast("long").alias(f"tf_{i}")
          for i, t in enumerate(query_terms)]).persist()
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(query_terms))])
    j = d.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        dfq = F.col(f"df_{i}").cast("double")
        idf = F.log(1.0 + (F.col("n_docs") - dfq + 0.5) / (dfq + 0.5))
        part = idf * tf * (k1 + 1.0) \
            / (tf + k1 * ((1.0 - b) + b * F.col("dl") / avgdl))
        score = part if score is None else score + part
    any_tf = None
    for i in range(len(query_terms)):
        c = F.col(f"tf_{i}") > 0
        any_tf = c if any_tf is None else (any_tf | c)
    return (j.filter(any_tf)
            .select(id_col, "dl", F.round(score, 6).alias("bm25")))


# Mersenne-31 LCG pieces shared with curate.mixture_sample: all
# intermediate products stay < 2^62, so ANY engine reproduces the
# hash exactly in plain BIGINT arithmetic.
_HP = 2147483647       # 2^31 - 1
_HA = 1103515245
_HALF = (_HP - 1) // 2
_KNUTH32 = 2654435761  # floor(2^32/phi)
_M32 = 4294967296


def _word_bucket(w: Column, n_buckets: int) -> Column:
    """Deterministic word → feature-bucket hash, exact in BIGINT and
    reproducible cross-engine: position-weighted character sum pushed
    through the Mersenne-31 LCG (shared by hashed_linear_score and
    dsir_importance; the DuckDB oracles replicate it verbatim)."""
    chars = F.split(w, "")
    h = F.aggregate(
        F.transform(chars, lambda c, i:
                    F.ascii(c) * (((i + 1) * F.lit(_KNUTH32)) % _M32)),
        F.lit(0).cast("long"), lambda a, x: a + x)
    return F.pmod(F.pmod(h, F.lit(_HP)) * F.lit(_HA), F.lit(_HP)) \
        % n_buckets


def hashed_linear_score(df: DataFrame, n_buckets: int = 1024,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """fastText-style hashed linear classifier score: hash each word
    into ``n_buckets`` feature buckets, look up a per-bucket weight,
    average over the document, squash with a sigmoid — the serving
    shape of the linear quality classifiers used to filter pretraining
    corpora (here with a deterministic pseudo-weight table so any
    engine reproduces the score bit-for-bit; production would
    broadcast-join learned weights keyed by bucket, same plan).

    Word hash: position-weighted character sum (ascii(c_i)·(i·K mod
    2^32), exact in BIGINT) pushed through the Mersenne-31 LCG;
    weights are integer-centered so the per-doc sum is EXACT integer
    arithmetic — the only float ops are one division and the sigmoid,
    making the result engine-independent without rounding tricks.

    Scale shape: everything is within-row array algebra — a map-only
    scan with zero shuffles at any corpus size.

    Returns (id, n_words, quality_logit, quality_prob rounded to 6)
    for documents with at least one word.
    """
    words = _lower_words(F.col(text_col))

    def bucket(w: Column) -> Column:
        return _word_bucket(w, n_buckets)

    def weight_int(bkt: Column) -> Column:
        return F.pmod((bkt + 1) * F.lit(_HA), F.lit(_HP)) - F.lit(_HALF)

    wsum = F.aggregate(F.transform(words, lambda w: weight_int(bucket(w))),
                       F.lit(0).cast("long"), lambda a, x: a + x)
    n = F.size(words)
    logit = wsum.cast("double") / n / float(_HALF)
    prob = 1.0 / (1.0 + F.exp(-logit))
    return (df.select(F.col(id_col), n.cast("long").alias("n_words"),
                      F.round(logit, 6).alias("quality_logit"),
                      F.round(prob, 6).alias("quality_prob"))
            .filter(F.col("n_words") > 0))


def char_entropy(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-document character entropy  H = -Σ (c/n)·ln(c/n)  over the
    raw character distribution — the classic cheap gibberish /
    compression-junk signal (random bytes score high, repeated
    boilerplate scores low). Returns (id, n_chars, char_entropy
    rounded to 6) for non-empty documents.

    Engine-exact determinism: the fold walks the SORTED character
    array, so per-character terms are added in ascending-char order —
    the same order an oracle gets from an ORDER BY inside its list
    aggregation — making the double sum bit-identical, not just
    close. Zero shuffles: entropy is a property of one row.
    """
    chars = F.array_sort(F.split(F.col(text_col), ""))
    n = F.length(F.col(text_col))
    zero = F.lit(0).cast("long")

    def step(acc, ch):
        same = F.coalesce(acc["prev"] == ch, F.lit(False))
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        flush = (~same) & (acc["run"] > 0)
        term = -(acc["run"] / n) * F.log(acc["run"] / n)
        return F.struct(
            ch.alias("prev"), run.alias("run"),
            (acc["h"] + F.when(flush, term).otherwise(F.lit(0.0)))
            .alias("h"))

    def finish(acc):
        term = -(acc["run"] / n) * F.log(acc["run"] / n)
        return acc["h"] + F.when(acc["run"] > 0, term).otherwise(F.lit(0.0))

    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    zero.alias("run"), F.lit(0.0).alias("h"))
    h = F.aggregate(chars, init, step, finish)
    return (df.filter(n > 0)
            .select(F.col(id_col), n.cast("long").alias("n_chars"),
                    F.round(h, 6).alias("char_entropy")))


def dsir_importance(docs: DataFrame, target: DataFrame,
                    n_buckets: int = 1024, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how much more likely its tokens are under a TARGET
    distribution (e.g. curated wiki/books) than under the raw corpus
    itself —  avg_b [ log p_target(b) - log p_raw(b) ]  over hashed
    unigram feature buckets with Laplace smoothing. High scores =
    target-like documents; resampling proportional to the weight is
    the paper's selection rule (``dsir_select`` below).

    Returns (id, n_words, log_ratio) with log_ratio the
    length-normalized log importance weight, rounded to 6 (a mean of
    floats is order-dependent in any distributed engine).

    Scale shape: the two bucket LMs are map-side-combined aggregations
    that collapse to ``n_buckets`` rows each (fixed, tiny); scoring is
    one corpus scan joining tokens to the broadcast bucket table and
    one per-doc mean. No driver materialization, nothing quadratic —
    exactly the paper's hashed-n-gram recipe, which exists so that
    100 TB corpora can be scored with a constant-size model.
    """
    def toks(df: DataFrame) -> DataFrame:
        return (df.select(F.col(id_col).alias("_id"),
                          F.explode(F.split(F.lower(F.col(text_col)),
                                            r"[^a-z]+")).alias("_w"))
                .filter(F.col("_w") != "")
                .select("_id", _word_bucket(F.col("_w"), n_buckets)
                        .alias("_b")))

    raw_t = toks(docs)
    raw_lm = raw_t.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    tgt_lm = (toks(target).groupBy("_b")
              .agg(F.count(F.lit(1)).alias("_ct")))
    # n_buckets rows: totals via an unpartitioned window are a single
    # task over a fixed-size table, not a data-dependent stage
    from pyspark.sql.window import Window
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    lm = (raw_lm.join(tgt_lm, "_b", "left")
          .withColumn("_ct", F.coalesce("_ct", F.lit(0)))
          .withColumn("_tr", F.sum("_cr").over(w))
          .withColumn("_tt", F.sum("_ct").over(w))
          .withColumn(
              "_lr",
              F.log((F.col("_ct") + 1) / (F.col("_tt") + F.lit(n_buckets)))
              - F.log((F.col("_cr") + 1)
                      / (F.col("_tr") + F.lit(n_buckets))))
          .select("_b", "_lr"))
    return (raw_t.join(F.broadcast(lm), "_b")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.round(F.avg("_lr"), 6).alias("log_ratio"))
            .select(F.col("_id").alias(id_col), "n_words", "log_ratio"))


def dsir_select(docs: DataFrame, target: DataFrame, frac: float = 0.25,
                temperature: float = 1.0, n_buckets: int = 1024,
                id_col: str = "doc_id", text_col: str = "text",
                seed: int = 42,
                threshold_method: str = "approx") -> DataFrame:
    """DSIR selection: keep ~``frac`` of the corpus, sampled
    proportionally to exp(log_ratio / temperature) — the paper's
    importance resampling, made deterministic with the Gumbel-top-k
    trick: key = log w / T + Gumbel(doc-hash uniform), take the top
    fraction by key. Reproducible across runs/engines (the Gumbel
    noise derives from md5(id), not an RNG); one corpus scan + the
    dsir_importance plan + one top-fraction threshold computed from a
    percentile over the (id, key) table.

    ``threshold_method``: "approx" (default — percentile_approx, the
    mergeable-sketch scale path) or "exact" (type-7 percentile,
    bit-reproducible in any engine — what the oracle gate uses)."""
    scored = dsir_importance(docs, target, n_buckets, id_col, text_col)
    u = (F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                           F.lit(f"#{seed}"))), 1, 8),
                16, 10).cast("long") + 1) / F.lit(4294967297.0)
    key = (F.col("log_ratio") / temperature
           - F.log(-F.log(u))).alias("_gumbel_key")
    keyed = scored.select(id_col, "n_words", "log_ratio", key)
    pfun = ("percentile" if threshold_method == "exact"
            else "percentile_approx")
    extra = "" if threshold_method == "exact" else ", 10000"
    thresh = keyed.agg(
        F.expr(f"{pfun}(_gumbel_key, {1.0 - frac}{extra})")
    ).first()[0]
    return (keyed.filter(F.col("_gumbel_key") >= F.lit(thresh))
            .select(id_col, "n_words", "log_ratio"))


def vocab_oov_rate(docs: DataFrame, vocab_size: int = 100,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` word vocabulary — the tokenizer-coverage
    diagnostic run before vocab induction (how much of the corpus
    does a frequency-cutoff vocab explain?). Returns (id, n_tokens,
    oov_rate).

    Scale shape: one token-count aggregation (map-side combined), a
    top-k on the (small) distinct-word table, then a broadcast
    LEFT-ANTI join of the token stream against the vocab and a
    per-doc aggregation — two corpus-keyed shuffles, no driver-side
    vocab materialization. Ties at the frequency cutoff break by
    word, so the vocab is deterministic in any engine."""
    toks = (docs
            .filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col),
                    F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                      r"\s+")).alias("_w")))
    vocab = (toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
             .orderBy(F.col("_c").desc(), "_w").limit(vocab_size)
             .select("_w"))
    per_doc = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    oov = (toks.join(F.broadcast(vocab), "_w", "left_anti")
           .groupBy(id_col).agg(F.count(F.lit(1)).alias("_oov")))
    return (per_doc.join(oov, id_col, "left")
            .select(id_col, "n_tokens",
                    F.round(F.coalesce(F.col("_oov"), F.lit(0))
                            / F.col("n_tokens"), 6).alias("oov_rate")))


def heavy_hitters(df: DataFrame, item_col: str,
                  min_frac: float = 0.001,
                  count_col: str = "n") -> DataFrame:
    """EXACT frequent-item mining with BOUNDED state — the 100 TB
    alternative to ``GROUP BY item`` over a vocabulary that doesn't
    fit anywhere: find every item whose frequency exceeds
    ``min_frac`` of all rows, with exact counts.

    Two passes (the classical 2-pass exact heavy hitters):

    1. Per-partition Misra-Gries summaries with ``c = ceil(1/
       min_frac)`` counters, built batch-vectorized inside
       ``mapInPandas`` (value_counts per Arrow batch, then the
       mergeable-summaries cap: subtract the (c+1)-th largest count,
       drop non-positives — Agarwal/Cormode et al., "Mergeable
       Summaries", PODS'12 §3: error stays ≤ n_p/(c+1) under
       arbitrary merges). Any item with global frequency >
       n·min_frac must exceed its local bound in at least one
       partition (pigeonhole over Σ n_p/(c+1) = n/(c+1) < n·min_frac)
       — so the candidate union is a SUPERSET of the true answer.
    2. Exact recount of candidates only: broadcast the candidate set,
       LEFT SEMI join, one map-side-combined count, filter by the
       exact threshold. False candidates die here, so the output is
       exactly ``{item: count(item) > n·min_frac}``.

    The per-partition summaries are merged DISTRIBUTED before any
    driver pull (PODS'12 §3: MG summaries are mergeable — add
    weights, re-apply the (c+1)-th-largest cap — with total error
    still ≤ n/(c+1) under any merge tree): a √P-way merge round,
    then a final 1-partition merge, so the driver collects exactly
    ONE c-sized summary regardless of input partition count. The
    corpus is scanned twice but never shuffled on the raw item — the
    only summary shuffles move ≤ (c+1)·P tiny rows, and the single
    wide op is the count over the candidate-filtered stream.
    """
    import math

    import pandas as pd

    c = int(math.ceil(1.0 / min_frac))
    item_t = df.schema[item_col].dataType.simpleString()
    summ_schema = f"{item_col} {item_t}, _wt long, _pn long"

    def _cap(s: "pd.Series") -> "pd.Series":
        if len(s) > c:
            t = s.nlargest(c + 1).iloc[-1]
            s = s - t
            s = s[s > 0]
        return s

    def _emit(s, n_total):
        # _wt/_pn are kept NULL-FREE (0 on the complementary rows, not
        # None): a long column with nulls crosses Arrow→pandas as
        # float64, which corrupts counts past 2^53 BEFORE any cast
        # could save them (ADVICE r6) — null-free longs stay int64
        # end-to-end. The summary row is marked by item_col IS NULL.
        yield pd.DataFrame({
            item_col: list(s.index.astype(object)) + [None],
            "_wt": [int(v) for v in s] + [0],
            "_pn": [0] * len(s) + [int(n_total)]})

    def _mg(batches):
        s = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            col = pdf[item_col].dropna()
            n_part += len(col)
            # concat+groupby, NOT Series.add(fill_value=0): add's
            # index alignment passes through float64, which silently
            # loses precision above 2^53 (ADVICE r6) — weights are
            # exact counts and must stay int64 at every step
            s = _cap(pd.concat([s, col.value_counts()])
                     .groupby(level=0).sum())
        yield from _emit(s, n_part)

    def _merge(batches):
        s = pd.Series(dtype="int64")
        n_total = 0
        for pdf in batches:
            n_total += int(pdf["_pn"].sum())  # int64: null-free column
            rows = pdf[pdf[item_col].notna()]
            if len(rows):
                add = rows.groupby(item_col)["_wt"].sum()
                # concat+groupby keeps int64 exact — see _mg
                s = _cap(pd.concat([s, add]).groupby(level=0).sum())
        yield from _emit(s, n_total)

    summ = df.select(item_col).mapInPandas(_mg, schema=summ_schema)
    n_parts = df.select(item_col).rdd.getNumPartitions()
    if n_parts > 4:
        # √P-way intermediate merge keeps every merge task's input at
        # ≤ √P·(c+1) rows even at 10⁵ input partitions
        summ = (summ.repartition(max(2, math.isqrt(n_parts)))
                .mapInPandas(_merge, schema=summ_schema))
    summaries = (summ.repartition(1)
                 .mapInPandas(_merge, schema=summ_schema)
                 .collect())
    if len(summaries) > c + 2:  # explicit: survives python -O
        raise AssertionError(
            f"MG merge cap violated: {len(summaries)} > {c + 2}")
    n = sum(r["_pn"] for r in summaries if r["_pn"] is not None)
    items = sorted({r[item_col] for r in summaries
                    if r[item_col] is not None})
    if not items or n == 0:
        return (df.select(item_col).limit(0)
                .withColumn(count_col, F.lit(0).cast("long")))
    spark = df.sparkSession
    cand = spark.createDataFrame([(i,) for i in items],
                                 f"{item_col} {item_t}")
    return (df.join(F.broadcast(cand), item_col, "left_semi")
            .groupBy(item_col)
            .agg(F.count(F.lit(1)).alias(count_col))
            .filter(F.col(count_col) > F.lit(float(n) * min_frac)))


def pmi_collocations(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", min_count: int = 5,
                     top_k: int = 50) -> DataFrame:
    """Top collocations (adjacent word pairs) by pointwise mutual
    information: PMI = ln( p(xy) / (p(x)·p(y)) ) with p(xy) over the
    bigram count and p(x) over the token count — the standard
    phrase-mining signal for tokenizer vocab induction and boilerplate
    detection.

    Returns (w1, w2, c_xy, pmi) for pairs seen >= ``min_count`` times,
    the ``top_k`` highest-PMI pairs first (ties by words).

    Scale shape: bigrams are built WITHIN each row's token array (a
    codegen'd transform — the text never self-joins); unigram and
    bigram counts are two map-side-combined aggregates over
    vocabulary-bounded keys; the two corpus totals ride along as
    1-row broadcasts. Ordering compares the exact IEEE ratio (integer
    counts < 2^53 → one correctly-rounded division chain, identical
    across engines) so ranking is engine-stable; ln is only applied
    to the emitted, rounded score.
    """
    ws = F.col("_ws")
    # one tokenization pass feeds the unigram AND bigram branches;
    # the two count tables persist because each is read twice (its
    # own 1-row total plus the candidate join) — without these, every
    # scalar total re-tokenizes the whole corpus
    with_ws = df.select(_lower_words(F.col(text_col)).alias("_ws")) \
        .persist()
    toks = with_ws.select(F.explode(ws).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")).persist()
    n_w = uni.agg(F.sum("c").cast("long").alias("n_w"))
    bg_arr = F.when(
        F.size(ws) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(ws) - 1),
                    lambda i: F.concat(F.element_at(ws, i), F.lit(" "),
                                       F.element_at(ws, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bgc = (with_ws.select(F.explode(bg_arr).alias("bg"))
           .groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy"))
           .persist())
    n_bg = bgc.agg(F.sum("c_xy").cast("long").alias("n_bg"))
    cand = (bgc.filter(F.col("c_xy") >= min_count)
            .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "),
                                           F.lit(1)))
            .withColumn("w2", F.split_part(F.col("bg"), F.lit(" "),
                                           F.lit(2)))
            .join(uni.select(F.col("w").alias("w1"),
                             F.col("c").alias("c_x")), "w1")
            .join(uni.select(F.col("w").alias("w2"),
                             F.col("c").alias("c_y")), "w2")
            .crossJoin(F.broadcast(n_w))
            .crossJoin(F.broadcast(n_bg)))
    ratio = ((F.col("c_xy").cast("double") / F.col("n_bg"))
             / ((F.col("c_x").cast("double") / F.col("n_w"))
                * (F.col("c_y").cast("double") / F.col("n_w"))))
    return (cand.withColumn("_r", ratio)
            .orderBy(F.col("_r").desc(), "w1", "w2")
            .limit(top_k)
            .select("w1", "w2", F.col("c_xy").cast("long").alias("c_xy"),
                    F.round(F.log("_r"), 6).alias("pmi")))

"""Text-analysis operators for large-scale training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — all pure Column
expressions (JVM-side, whole-stage codegen; no Python in the hot path), so
they stream over a 100 TB documents table with zero shuffle until the caller
aggregates.

Beyond the reference's surface (it has no text ops); required by the engine
charter (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Minimal per-language stopword marker sets for the n-gram/stopword
#: language-ID heuristic. Order defines the deterministic tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "a", "and", "of", "is"),
    "es": ("el", "la", "y", "que", "de"),
    "fr": ("le", "la", "et", "est", "les"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token hygiene (portable)."""
    return F.filter(F.split(F.trim(text), "\\s+"), lambda t: t != F.lit(""))


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish subword segmentation: letter runs, digit runs, single symbols."""
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0)


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.lower(F.regexp_replace(F.trim(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text."""
    return F.md5(normalize(text))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: token count, char count, avg token length,
    punctuation ratio, stopword ratio (en markers)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(F.lower(t), "[a-z0-9\\s]", ""))
    stop = F.size(F.filter(toks, lambda x: x.isin(*LANG_MARKERS["en"])))
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        (F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / F.greatest(n_tokens, F.lit(1))).alias(
            "avg_token_len_raw"
        ),
        (punct / F.greatest(n_chars, F.lit(1)).cast("double")).alias("punct_ratio_raw"),
        (stop / F.greatest(n_tokens, F.lit(1)).cast("double")).alias("stopword_ratio_raw"),
    )


def rolling_min_fingerprint(text: Column, gram: int = 8, stride: int = 4) -> Column:
    """Winnowing-style rolling-hash sketch: min hash over char n-grams.

    Hashes the normalized text's ``gram``-char windows at ``stride`` spacing
    and keeps the minimum — a compact content sketch robust to local edits
    (the classic rolling-hash / winnowing fingerprint, here with the
    engine-portable md5 hash64 instead of Rabin-Karp so the DuckDB oracle
    can reproduce it; the window/stride algebra is identical).
    All JVM-side: transform + aggregate over a positions array.
    """
    from projet_data_infrastructure_spark.functions.hashing import hash64

    norm = normalize(text)
    positions = F.sequence(F.lit(1), F.greatest(F.length(norm) - (gram - 1), F.lit(1)), F.lit(stride))
    grams = F.transform(positions, lambda i: F.substring(norm, i, gram))
    hashes = F.transform(grams, lambda g: hash64(g))
    return F.array_min(hashes)


def lang_scores(toks: Column) -> list[tuple[str, Column]]:
    return [
        (lang, F.size(F.filter(toks, lambda x: x.isin(*words))))
        for lang, words in sorted(LANG_MARKERS.items())
    ]


def predict_lang(toks: Column) -> Column:
    """argmax over stopword-hit scores, ties broken by language code order."""
    scores = lang_scores(toks)
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    pred = F.lit("und")
    # reversed so that on ties the alphabetically-first language wins
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


#: PII patterns, most-specific first so e.g. an email is redacted before the
#: phone pattern can eat its digits. Kept to syntax shared by Java regex
#: (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\+?\d[\d \-]{7,}\d", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4s / SSN-shaped ids / phone runs from a text column.

    Chained JVM regexp_replace — no Python in the path; the pattern set is
    engine-portable so the op is oracle-checkable (DuckDB needs the explicit
    'g' flag, Spark replaces all matches by default).
    """
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def stratified_sample_hash(
    df: DataFrame,
    label_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 7,
) -> DataFrame:
    """Per-class Bernoulli sampling with a DETERMINISTIC hash draw.

    Training-data balancing: keep each row with its class's rate, where the
    uniform draw is the portable ``hash64`` of the row id — reproducible
    across cluster sizes, partitionings, and engines (``df.sample`` is
    engine-RNG-specific and partition-dependent). One narrow filter, no
    shuffle; the common downsample-the-majority-class step at corpus scale.
    """
    from projet_data_infrastructure_spark.functions.hashing import hash64

    u = F.pmod(hash64(F.col(id_col), seed=seed), F.lit(1_000_000)) / F.lit(1_000_000.0)
    rate = F.lit(float(default_rate))
    for lbl, r in sorted(rates.items()):
        rate = F.when(F.col(label_col) == lbl, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)


def greedy_pack(
    df: DataFrame,
    cap: int,
    group_col: str = "shard",
    order_col: str = "doc_id",
    n_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing: greedily fill fixed token-capacity windows per
    shard — the sample-packing step before LLM training (documents
    concatenated into ≤cap-token contexts; a doc longer than cap gets its
    own window rather than being split).

    The fold is inherently sequential (each assignment depends on the
    running fill), so this is a legitimate Python boundary: ONE Arrow-
    batched ``applyInPandas`` per shard, a tight loop over the shard's
    precomputed token counts — the counts themselves are JVM-side. Shards
    are hash-assigned and independently packed, so at 100 TB the work is
    embarrassingly parallel across shards and each shard's state is one
    integer. Deterministic: (shard, order_col) fixes the fold order."""
    import pandas as pd

    out_schema = f"{group_col} long, {order_col} long, {n_col} long, pack_id long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        packs: list[int] = []
        pack_id = 0
        cum = 0
        for n in pdf[n_col]:
            if cum + n > cap and cum > 0:
                pack_id += 1
                cum = 0
            packs.append(pack_id)
            cum += int(n)
        return pdf.assign(pack_id=packs)[
            [group_col, order_col, n_col, "pack_id"]
        ]

    return df.groupBy(group_col).applyInPandas(pack, out_schema)


def mixture_resample_hash(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Importance-resample toward a UNIFORM class mixture, deterministically.

    The complement of :func:`stratified_sample_hash`'s fixed rates: per-class
    acceptance is DERIVED from the data — ``rate_c = min(1, (total/k) / n_c)``
    (k classes), so over-represented classes are thinned toward the uniform
    share and the rarest class is kept whole. The class-count aggregate is
    ≤k rows, broadcast back onto the corpus; the accept draw is the portable
    ``hash64`` of the row id — reproducible across engines, partitionings,
    and cluster sizes. One small shuffle (the class counts), one broadcast
    join, one narrow filter — the domain-rebalancing step every training-
    mixture pipeline runs at 100 TB.
    """
    from projet_data_infrastructure_spark.functions.hashing import hash64
    from projet_data_infrastructure_spark.plans._portable import pround

    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").cast("double").alias("total"), F.count(F.lit(1)).cast("double").alias("k")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        label_col,
        pround(
            F.least(F.lit(1.0), F.col("total") / (F.col("k") * F.col("n").cast("double"))),
            6,
        ).alias("rate"),
    )
    u = F.pmod(hash64(F.col(id_col), seed=seed), F.lit(1_000_000)) / F.lit(1_000_000.0)
    return df.join(F.broadcast(rates), label_col).filter(u < F.col("rate"))


def gopher_metrics(toks: Column) -> dict[str, Column]:
    """The Gopher/MassiveText quality-gate metrics (Rae et al. 2021, §A1.1)
    as pure Column expressions over a token array: word count, mean word
    length, fraction of words containing an alphabetic character, and
    English stopword hits. Map-only — shared by the batch flags query and
    the streaming curation pipeline so both gates are one definition."""
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda acc, v: acc + v
    )
    return {
        "n_words": n,
        "mean_len": sum_len / n1.cast("double"),
        "alpha_ratio": F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / n1.cast("double"),
        "stop_hits": F.size(F.filter(toks, lambda x: x.isin(*LANG_MARKERS["en"]))),
    }


def gopher_keep(m: dict[str, Column]) -> Column:
    """The combined Gopher keep decision over :func:`gopher_metrics`."""
    return (
        (m["n_words"] >= 50)
        & (m["n_words"] <= 100000)
        & (m["mean_len"] >= 3.0)
        & (m["mean_len"] <= 10.0)
        & (m["alpha_ratio"] >= 0.8)
        & (m["stop_hits"] >= 2)
    )

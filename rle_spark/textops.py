"""Training-data text operators: tokenization, dedup (exact / MinHash
band LSH), quality scoring, language ID, token counting.

All pure DataFrame-API transforms (JVM-side, whole-stage codegen —
no Python in the hot path). Hash functions are md5-based so a DuckDB
oracle can reproduce every value exactly:
    token_id(w) = conv(substr(md5(w),1,8),16,10) % vocab
matches DuckDB ('0x'||substr(md5(w),1,8))::BIGINT % vocab.

Scale notes: every op here is a narrow map or a single hash-partition
aggregation; dedup joins group by a hash key, so AQE skew handling +
the band hash's uniformity keep reducers balanced at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_VOCAB = 50257

# tiny fixed stopword sets for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "und", "das", "von", "mit", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "en", "du", "que"],
}
LANGS = ["en", "es", "de", "fr"]


def md5_bucket(col: Column, mod: int | None = None) -> Column:
    """Deterministic 32-bit hash from md5 (DuckDB-reproducible)."""
    h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    return (h % F.lit(mod)) if mod else h


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def tokenize_documents(docs: DataFrame, vocab: int = DEFAULT_VOCAB) -> DataFrame:
    """documents(text, ...) -> token table (doc_id, tokens, n_tok, source).

    The deterministic word->id derivation (split on space, md5-based
    vocab id) that turns the driver's documents table into the engine's
    input shape (BASELINE.json input_hint)."""
    toks = F.transform(
        words_col(F.col("text")),
        lambda w: (F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
                   % F.lit(vocab)).cast("int"),
    )
    return (docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),  # materialize once; size() reads the column
        F.col("source"))
        .select("doc_id", "tokens",
                F.size("tokens").cast("int").alias("n_tok"), "source"))


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: groups with >1 doc."""
    return (docs.select(F.md5(F.col("text")).alias("text_hash"))
            .groupBy("text_hash").agg(F.count("*").alias("n_dups"))
            .filter(F.col("n_dups") > 1))


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """Word k-gram shingles per doc (docs with < k words drop out).

    Plan shape: posexplode -> lead window per doc. Everything stays in
    whole-stage codegen (higher-order-function lambdas execute
    interpreted per element in Spark — measured ~50x slower here), and
    the explode keeps memory per task at O(words), not O(docs)."""
    from pyspark.sql import Window
    wr = docs.select("doc_id", F.posexplode(words_col(F.col("text")))
                     .alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", j).over(win) for j in range(1, k)]
    lastw = F.lead("w", k - 1).over(win)
    return (wr.select("doc_id", lastw.alias("_last"),
                      F.concat_ws(" ", *parts).alias("shingle"))
            .filter(F.col("_last").isNotNull())
            .select("doc_id", "shingle"))


def minhash_signatures(docs: DataFrame, bands: int = 4, k: int = 3) -> DataFrame:
    """MinHash per band: min over shingles of md5(band || ':' || shingle).

    One row per doc: (doc_id, b0..b{bands-1}). Banded min-hash = the
    LSH construction; equal band value => likely-near-duplicate pair."""
    sh = shingles(docs, k)
    aggs = [
        F.min(md5_bucket(F.concat(F.lit(f"{b}:"), F.col("shingle"))))
        .alias(f"b{b}")
        for b in range(bands)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def near_dup_buckets(docs: DataFrame, bands: int = 4, k: int = 3) -> DataFrame:
    """LSH buckets with >1 doc in any band (candidate near-dup groups).

    Single pass: bands are exploded from one signature row (a unionAll
    of per-band projections would recompute the minhash aggregation
    once per band)."""
    sig = minhash_signatures(docs, bands, k)
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("band_hash"))
        for b in range(bands)])
    exploded = (sig.select(F.explode(band_structs).alias("bh"))
                .select("bh.band", "bh.band_hash"))
    return (exploded.groupBy("band", "band_hash")
            .agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") > 1))


SIMHASH_BITS = 60  # 15 hex chars of md5: fits signed 64-bit in every engine


def simhash64(docs: DataFrame) -> DataFrame:
    """SimHash over words: per-bit majority vote of 60-bit word hashes.

    The word hash is the top 15 hex chars of md5 (not xxhash64) so the
    DuckDB oracle reproduces it exactly; 60 bits keeps every
    intermediate in signed-BIGINT range on both engines. Used for
    near-dup candidate keys at hamming-ball radius 0 (exact simhash
    match)."""
    w = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("w"))
    w = w.withColumn(
        "h", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long"))

    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = w.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(SIMHASH_BITS):
        bit = (F.when(F.col(f"v{b}") > 0,
                      F.shiftleft(F.lit(1).cast("long"), b))
               .otherwise(F.lit(0).cast("long")))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_oracle_sql() -> str:
    """DuckDB equivalent of simhash64 over the documents view."""
    votes = ",\n        ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS))
    bits = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS))
    return f"""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      h AS (SELECT doc_id,
                   ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM w),
      v AS (SELECT doc_id,
        {votes}
        FROM h GROUP BY doc_id)
      SELECT doc_id, CAST({bits} AS BIGINT) AS simhash
      FROM v ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# quality / language features
# ---------------------------------------------------------------------------


def quality_features(docs: DataFrame) -> DataFrame:
    """Integer-valued per-doc quality features (oracle-safe).

    Stopword counting goes through an explode + conditional-sum
    aggregation (codegen'd) instead of a per-element lambda filter."""
    stops = (docs.select("doc_id",
                         F.explode(words_col(F.col("text"))).alias("w"))
             .groupBy("doc_id")
             .agg(F.sum(F.when(F.lower(F.col("w"))
                               .isin(*STOPWORDS["en"]), 1).otherwise(0))
                  .cast("long").alias("n_stopwords_en")))
    base = docs.select(
        "doc_id", "source", "lang",
        F.size(words_col(F.col("text"))).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), "[.,!?;:]", "")))
        .cast("long").alias("n_punct"),
    )
    return base.join(stops, "doc_id", "left").fillna({"n_stopwords_en": 0})


def langid_heuristic(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID: argmax hits over the 4 lists; ties
    break in LANGS order; zero hits -> 'und'.

    One explode + one hash aggregation with four conditional sums —
    scales linearly in total words and stays in codegen."""
    wr = docs.select("doc_id", "lang",
                     F.explode(words_col(F.lower(F.col("text")))).alias("w"))
    aggs = [
        F.sum(F.when(F.col("w").isin(*STOPWORDS[lang]), 1).otherwise(0))
        .alias(f"_h_{lang}")
        for lang in LANGS
    ]
    with_hits = wr.groupBy("doc_id", "lang").agg(*aggs)
    hits = {lang: F.col(f"_h_{lang}") for lang in LANGS}
    best = F.greatest(*[hits[lang] for lang in LANGS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANGS:
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return with_hits.select("doc_id", "lang", pred.alias("lang_pred"))


def token_count_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token counts + char/punct totals per source."""
    q = quality_features(docs)
    return (q.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_words").alias("total_words"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("n_punct").alias("total_punct"),
                 F.sum("n_stopwords_en").alias("total_stopwords_en")))


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup + rolling-hash fingerprinting
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, min_pct: int = 20,
                        df_cap: int | None = 1000) -> DataFrame:
    """Exact pairwise word-k-gram Jaccard via an inverted shingle index.

    Candidate pairs = docs sharing at least one shingle (exact: any
    pair with Jaccard > 0 shares one), produced by a self-join on the
    shingle key — a hash-partition join whose cost tracks posting-list
    sizes, not N^2. `df_cap` drops shingles occurring in more than
    df_cap docs (stop-shingles): the standard scale knob that bounds
    the worst posting list at df_cap^2 pairs — ON by default (1000),
    because one boilerplate shingle otherwise quadratically explodes
    the join at scale; pass None for the exact all-shingles join.
    Jaccard over the capped shingle set is exact for the capped set
    (the SQL oracle applies the identical cap). jaccard_pct is an
    integer percent
    (floor(100*|A∩B| / |A∪B|)) so the SQL oracle compares exactly.
    """
    sh = shingles(docs, k).distinct()
    if df_cap is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
               .filter(F.col("df") > df_cap).select("shingle"))
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (sh.alias("a").join(sh.alias("b"), "shingle")
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_inter")))
    ca = counts.select(F.col("doc_id").alias("doc_a"),
                       F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"),
                       F.col("n_sh").alias("n_b"))
    return (inter.join(ca, "doc_a").join(cb, "doc_b")
            .select("doc_a", "doc_b",
                    F.expr("CAST(FLOOR(100.0 * n_inter / "
                           "(n_a + n_b - n_inter)) AS BIGINT)")
                    .alias("jaccard_pct"))
            .filter(F.col("jaccard_pct") >= F.lit(min_pct)))


FINGERPRINT_WINDOW = 32


def doc_fingerprint(docs: DataFrame, window: int = FINGERPRINT_WINDOW) -> DataFrame:
    """Rolling-window content fingerprint per doc: the minimum of
    md5 over every `window`-char substring (min-sampling of a rolling
    hash, the winnowing-style construction). Identical/overlapping
    content collides on the fingerprint regardless of position.
    Pure codegen expression — no UDF, no shuffle beyond the scan."""
    expr = (f"array_min(transform(sequence(1, greatest(length(text) - "
            f"{window - 1}, 1)), i -> md5(substr(text, i, {window}))))")
    return docs.select("doc_id", F.expr(expr).alias("fingerprint"))

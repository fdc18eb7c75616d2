"""Deduplication operators for large-scale corpus curation: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (100 TB corpus):
- Exact dedup is one hash-groupBy — the shuffle keys on the content hash, so
  AQE handles skew (identical boilerplate docs collapse into one hot key →
  skew-split).
- MinHash/LSH and SimHash avoid the O(n²) pair space by shuffling on BAND
  buckets / bit chunks: only candidates sharing a bucket meet, and the
  verify step is per-bucket local. Everything is Column expressions —
  xxhash64 is Spark's JVM-side 64-bit hash, array higher-order functions
  build signatures without Python.
- Pair outputs are canonicalized (left id < right id) so downstream
  aggregation dedups trivially.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text

def _spread(df: DataFrame) -> DataFrame:
    """Small-input parallelism guard for CPU-bound signature computation.

    A single small parquet file scans as ONE input split = one task, which
    serializes the heavy per-row work (shingling, 32-way minhash, 64-bit
    simhash folds) no matter how many cores exist. Repartition only when the
    scan yields fewer partitions than the cluster's default parallelism — a
    no-op at 100 TB (thousands of splits); locally it unlocks all cores.
    The shuffle moves each doc's text once, which the signature compute
    dominates by orders of magnitude."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per exact (normalized) content hash.
    Returns (hash, keep_id, n_dups). One shuffle, map-side partial agg."""
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        docs.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# shingles + minhash + LSH
# ---------------------------------------------------------------------------


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles of the normalized text (array<string>, distinct)."""
    toks = F.split(normalize_text(text), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.array_join(toks, " "))))


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """num_hashes-wide MinHash signature: h_i = min over shingles of
    xxhash64(shingle, i). array<bigint>, pure JVM."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    bucket_cap: int = 64,
    metrics: dict | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    signature → `bands` bands of num_hashes/bands rows; docs sharing any
    band hash become a candidate pair; pairs are then verified with exact
    shingle Jaccard. Returns (a, b, jaccard) with a < b.

    Shuffle profile: explode(bands) → groupBy(band, band_hash) — the pair
    space never materializes globally, only within buckets.

    Oversized buckets (boilerplate explosions — at 100 TB exactly where dup
    mass lives) are NOT silently dropped: the first ``bucket_cap`` rows of a
    bucket form the full clique join (O(cap²)), and every row BEYOND the cap
    pairs with the bucket's rank-1 anchor (O(bucket) instead of O(bucket²)).
    A giant bucket of near-identical docs therefore still links every member
    to the anchor (connected-component dedup recovers the group); only
    beyond-cap rows that match *neither* the anchor *nor* any other band
    escape — the documented residue of the star approximation. Pass
    ``metrics`` (a dict) to get ``CAPPED_BUCKET_ROWS`` counted (one extra
    action — the repo's "no silent caps" rule made observable).
    """
    rows_per_band = num_hashes // bands
    docs = _spread(docs)
    base = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k_shingle).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    # bucket-local pairs: self-join per (band, band_hash) over the capped
    # head; overflow rows star-join the bucket anchor (rank 1)
    w = Window.partitionBy("band", "bh").orderBy("id")
    ranked = banded.withColumn("_r", F.row_number().over(w))
    capped = ranked.where(F.col("_r") <= bucket_cap)
    overflow = ranked.where(F.col("_r") > bucket_cap)
    if metrics is not None:
        metrics["CAPPED_BUCKET_ROWS"] = overflow.count()
    left = capped.select("band", "bh", F.col("id").alias("a"), F.col("sh").alias("sh_a"))
    right = capped.select("band", "bh", F.col("id").alias("b"), F.col("sh").alias("sh_b"))
    anchors = capped.where(F.col("_r") == 1).select(
        "band", "bh", F.col("id").alias("a"), F.col("sh").alias("sh_a")
    )
    star = anchors.join(
        overflow.select("band", "bh", F.col("id").alias("b"), F.col("sh").alias("sh_b")),
        ["band", "bh"],
    ).where(F.col("a") != F.col("b"))
    # canonicalize star pairs to a < b (anchor has the bucket-min id, but ids
    # are compared globally, so enforce it anyway)
    star = star.select(
        F.least("a", "b").alias("a"),
        F.greatest("a", "b").alias("b"),
        F.when(F.col("a") < F.col("b"), F.col("sh_a")).otherwise(F.col("sh_b")).alias("sh_a"),
        F.when(F.col("a") < F.col("b"), F.col("sh_b")).otherwise(F.col("sh_a")).alias("sh_b"),
    )
    pairs = (
        left.join(right, ["band", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .unionByName(star)
        .dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return pairs.select(
        "a", "b", F.round(inter / union, 4).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via shingle inverted index — no LSH approximation)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    with_counts: bool = False,
) -> DataFrame:
    """EXACT shingle-Jaccard pairs ≥ threshold via prefix filtering (the
    PPJoin family's candidate pruning, kept to its Spark-friendly core):

    1. order every doc's shingle set by a GLOBAL rarity order (frequency,
       then shingle);
    2. a pair with jaccard ≥ t must share ≥1 shingle among each side's
       first ``n − ⌈t·n⌉ + 1`` shingles in that order (pigeonhole) — so the
       inverted-index self-join runs only over those PREFIXES, whose
       entries are by construction the RAREST shingles (a shingle in f
       prefixes contributes f² candidate rows, so stop-shingles never
       explode the join the way a naive shingle self-join does);
    3. candidates verify exactly via ``array_intersect`` on the full
       shingle arrays.

    Unlike a frequency-cap heuristic, this is exact at every threshold.
    """
    docs = _spread(docs)
    base = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k_shingle).alias("sh")
    ).withColumn("n", F.size("sh"))
    inv = base.select("id", "n", F.explode("sh").alias("s"))
    freq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("id").orderBy(F.asc("f"), F.asc("s"))
    prefix_len = F.col("n") - F.ceil(F.col("n") * F.lit(threshold)).cast("int") + 1
    pref = (
        inv.join(freq, "s")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= prefix_len)
        .select("id", "s", "n")
    )
    cands = (
        pref.alias("l")
        .join(pref.alias("r"), "s")
        .where(
            (F.col("l.id") < F.col("r.id"))
            # length filter: jaccard ≥ t forces t·|A| ≤ |B| ≤ |A|/t
            & (F.col("r.n") >= F.ceil(F.col("l.n") * F.lit(threshold)))
            & (F.col("l.n") >= F.ceil(F.col("r.n") * F.lit(threshold)))
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    left = base.select(F.col("id").alias("a"), F.col("sh").alias("_sha"), F.col("n").alias("na"))
    right = base.select(F.col("id").alias("b"), F.col("sh").alias("_shb"), F.col("n").alias("nb"))
    out_cols = ["a", "b", "jaccard"] + (["shared", "union_n"] if with_counts else [])
    return (
        cands.join(left, "a")
        .join(right, "b")
        .withColumn("shared", F.size(F.array_intersect("_sha", "_shb")).cast("long"))
        .withColumn("union_n", (F.col("na") + F.col("nb") - F.col("shared")).cast("long"))
        # filter on the UNROUNDED ratio (exact IEEE division both here and in
        # the DuckDB oracle); round only the reported value
        .where(F.col("shared") / F.col("union_n") >= threshold)
        .withColumn("jaccard", F.round(F.col("shared") / F.col("union_n"), 4))
        .select(*out_cols)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the whitespace tokens of normalized text.

    Per bit i: sign of Σ_tokens (bit_i(xxhash64(token)) ? +1 : −1); packed
    into one bigint. All array higher-order functions — executes in codegen.
    """
    toks = F.split(normalize_text(text), " ")
    # Hash each token EXACTLY ONCE (transform), then fold the 64 bit-counters
    # over the hashed array — instantiating xxhash64(t) inside each per-bit
    # branch would re-hash every token 64× (Catalyst does not CSE across
    # lambda instantiations; measured ~10× slower at sf0.1). Bit positions
    # are Python-level literals (F.shiftright requires a static shift), and
    # ±1 is (bit*2 − 1) — branch-free.
    hashed = F.transform(toks, lambda t: F.xxhash64(t))
    bits_pm1 = lambda h: F.array(
        *[
            (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
            for i in range(64)
        ]
    )
    counts = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bits_pm1(h), lambda a, b: a + b),
    )
    # masks: bit 63 is the sign bit of a signed long
    masks = F.array(*[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)])
    packed = F.aggregate(
        F.zip_with(counts, masks, lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return packed


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidate generation: split the 64-bit signature into 4 × 16-bit chunks;
    by pigeonhole, hamming ≤ 3 ⇒ at least one chunk identical — join on
    (chunk_idx, chunk_value), verify exact hamming with bit_count(xor).
    """
    sig = _spread(docs).select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig"))
    chunks = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftright(F.col("sig"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    l = chunks.select("ci", "cv", F.col("id").alias("a"), F.col("sig").alias("sig_a"))
    r = chunks.select("ci", "cv", F.col("id").alias("b"), F.col("sig").alias("sig_b"))
    cand = l.join(r, ["ci", "cv"]).where(F.col("a") < F.col("b")).dropDuplicates(["a", "b"])
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("a", "b", hamming.alias("hamming")).where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold, LSH-bucketed.

    Random-hyperplane LSH: `bits` sign bits from deterministic pseudo-random
    hyperplanes (hash-derived coefficients, no RNG state needed); vectors
    share a bucket iff all bits equal — then exact cosine verifies. High
    thresholds ⇒ near-identical vectors ⇒ almost always same bucket.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # hyperplane j coefficient for dim i: hash-derived in [-0.5, 0.5)
    def plane_dot(j: int) -> Column:
        return F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: x * ((F.pmod(F.xxhash64(i, F.lit(j), F.lit(seed)), 1000) / 1000.0) - 0.5),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    bucket = sum(
        (F.when(plane_dot(j) >= 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(bits)),
        F.lit(0),
    )
    base = _spread(emb).select(F.col(id_col).alias("id"), v.alias("v"), bucket.alias("bucket"))
    l = base.select("bucket", F.col("id").alias("a"), F.col("v").alias("va"))
    r = base.select("bucket", F.col("id").alias("b"), F.col("v").alias("vb"))
    pairs = l.join(r, "bucket").where(F.col("a") < F.col("b"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 4)
    return pairs.select("a", "b", cos.alias("cosine")).where(F.col("cosine") >= threshold)


def embedding_cosine_pairs_brute(
    emb: DataFrame, threshold: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact O(n²) variant — correctness baseline / oracle twin for small n."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"))
    l = base.select(F.col("id").alias("a"), F.col("v").alias("va"))
    r = base.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    pairs = l.crossJoin(r).where(F.col("a") < F.col("b"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 4)
    return pairs.select("a", "b", cos.alias("cosine")).where(F.col("cosine") >= threshold)

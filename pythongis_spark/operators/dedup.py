"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design: every method is (1) a cheap JVM-side or Arrow-batched
signature pass, (2) a bucket equi-join that only pairs up collision
candidates (never O(N²)), (3) an exact verify on candidates, (4) an
iterative connected-components pass to elect one keeper per duplicate
cluster — all DataFrame ops, shuffle keys are the bucket hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE = (1 << 61) - 1

# Buckets larger than this emit hub-star candidates instead of all
# pairs (see _capped_pair_ids). Web corpora make this non-optional:
# one boilerplate page repeated B times is a single bucket whose
# self-join yields B²/2 rows — at B = 10⁶ that is 5·10¹¹ pairs from
# ONE bucket.
DEFAULT_BUCKET_CAP = 256


def _capped_pair_ids(banded: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Distinct candidate (a_id, b_id) pairs from an (_id, band, bucket)
    frame, with per-bucket pair blowup explicitly bounded:

    * buckets with ≤ ``bucket_cap`` members: full self-join (every
      colliding pair once, a_id < b_id) — unchanged semantics;
    * oversized buckets: a hub star — every member pairs with the
      bucket's min id only, O(B) candidates instead of O(B²);
    * ``bucket_cap=None`` disables the cap entirely (exact candidate
      semantics, caller accepts the B² risk).

    RECALL CONTRACT of the capped path: a duplicate cluster whose
    members reach the hub through the exact verify stays connected
    (connected components links it transitively through the hub). What
    is NOT guaranteed: if an oversized bucket holds members of a
    DIFFERENT cluster than the hub's, and those members collide in no
    other sub-cap bucket, their pairs are lost — capping trades that
    tail recall for a hard output bound (the reference, single-node,
    has no analog; a web-scale engine cannot emit B² pairs per
    boilerplate bucket). Pass ``bucket_cap=None`` where exactness
    matters more than the bound.

    Both the size count and the hub are window functions over the SAME
    (band, bucket) partitioning the self-join shuffles on — no extra
    shuffle. Use :func:`lsh_bucket_histogram` to see what would be
    capped for a given frame.
    """
    if bucket_cap is None:
        L = banded.select(F.col("_id").alias("a_id"), "band", "bucket")
        Rt = banded.select(F.col("_id").alias("b_id"), "band", "bucket")
        return (
            L.join(Rt, ["band", "bucket"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
        )
    w = Window.partitionBy("band", "bucket")
    tagged = banded.withColumn("_bsz", F.count("*").over(w))
    small = tagged.filter(F.col("_bsz") <= bucket_cap)
    L = small.select(F.col("_id").alias("a_id"), "band", "bucket")
    Rt = small.select(F.col("_id").alias("b_id"), "band", "bucket")
    normal = (
        L.join(Rt, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    star = (
        tagged.filter(F.col("_bsz") > bucket_cap)
        .withColumn("_hub", F.min("_id").over(w))
        .filter(F.col("_id") != F.col("_hub"))
        .select(F.col("_hub").alias("a_id"), F.col("_id").alias("b_id"))
    )
    return normal.union(star).distinct()


def lsh_bucket_histogram(banded: DataFrame, bucket_cap: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """Diagnostic for the bucket cap: per bucket-size decile, how many
    buckets / members / candidate pairs, and whether the cap bites.
    Returns a small aggregated DataFrame (run .show() on it)."""
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    return (
        sizes.withColumn("capped", F.col("bsz") > bucket_cap)
        .groupBy("capped")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("bsz").alias("n_members"),
            F.max("bsz").alias("max_bucket"),
            F.sum(F.col("bsz") * (F.col("bsz") - 1) / 2).alias("uncapped_pairs"),
        )
    )


def _stable_hash64(s: str) -> int:
    """Process-independent 64-bit string hash (python's builtin ``hash``
    is salted per process — useless on executors)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "ignore"), digest_size=8).digest(), "little"
    )


# ------------------------------------------------------------------
# exact dedup
# ------------------------------------------------------------------

def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact key; adds group size.

    Pure hash groupBy — map-side partial aggregation, one shuffle."""
    return (
        df.groupBy(*cols)
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
    )


def dedup_exact_rows(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """The surviving rows themselves (keeper per key)."""
    keep = dedup_exact(df, cols, id_col).select(F.col("keeper_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ------------------------------------------------------------------
# shingling + minhash (Arrow-batched numpy)
# ------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hashes of char k-grams of the normalized text."""
    s = " ".join(text.lower().split())
    data = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return np.array([_stable_hash64(s) & MERSENNE], dtype=np.uint64)
    B = np.uint64(1000003)
    M = np.uint64(MERSENNE)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        h = (h * B + data[j : n - k + 1 + j].astype(np.uint64)) & M
    return np.unique(h)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 5,
    out: str = "sig",
) -> DataFrame:
    """MinHash signature (num_perm 64-bit mins over universal-hashed char
    shingles), numpy-vectorized per document."""
    a, b = _minhash_params(num_perm)

    @F.pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        out_rows = []
        M = np.uint64(MERSENNE)
        for t in texts.to_numpy(object):
            if t is None:
                out_rows.append(None)
                continue
            sh = _shingle_hashes(t, shingle_k)
            # (num_perm, n_shingles) universal hash, min per row
            vals = (a[:, None] * sh[None, :] + b[:, None]) % M
            out_rows.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out_rows, index=texts.index)

    return df.withColumn(out, sig(F.col(text_col)))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + exact verify.

    banding: signature split into ``bands`` bands of r=num_perm/bands
    rows; band hash → bucket equi-join (self-join produces each colliding
    pair once, a.id < b.id); verify = exact Jaccard of shingle sets ≥
    threshold (recomputed per pair in an Arrow batch).
    Output: (a_id, b_id, jaccard).

    Buckets larger than ``bucket_cap`` emit hub-star candidates instead
    of all pairs — bounded output on boilerplate-heavy corpora; see
    :func:`_capped_pair_ids` for the exact recall contract
    (``bucket_cap=None`` disables the cap)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    # Scale contract: the text column must NOT ride through the ×bands
    # explode / bucket shuffle / pair distinct — at corpus scale that
    # shuffles the whole corpus ~bands times. Band-join on ids only,
    # distinct the id pairs, then join the text back exactly once per
    # side for the exact-Jaccard verify.
    sigs = minhash_signatures(df, text_col, num_perm, shingle_k).select(
        F.col(id_col).alias("_id"), "sig"
    )
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sigs.select("_id", "sig", band_idx).select(
        "_id", "band",
        F.xxhash64(
            F.slice("sig", F.col("band") * r + 1, r), F.col("band")
        ).alias("bucket"),
    )
    pair_ids = _capped_pair_ids(banded, bucket_cap)
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_txt"))
    pairs = (
        pair_ids.join(texts, pair_ids.a_id == texts._tid)
        .select("a_id", "b_id", F.col("_txt").alias("a_txt"))
        .join(texts, F.col("b_id") == texts._tid)
        .select("a_id", "b_id", "a_txt", F.col("_txt").alias("b_txt"))
    )

    @F.pandas_udf("double")
    def jaccard(a_txt: pd.Series, b_txt: pd.Series) -> pd.Series:
        out = np.zeros(len(a_txt))
        av = a_txt.to_numpy(object)
        bv = b_txt.to_numpy(object)
        for i in range(len(av)):
            sa = _shingle_hashes(av[i], shingle_k)
            sb = _shingle_hashes(bv[i], shingle_k)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            out[i] = inter / union if union else 1.0
        return pd.Series(out, index=a_txt.index)

    return (
        pairs.withColumn("jaccard", jaccard(F.col("a_txt"), F.col("b_txt")))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ------------------------------------------------------------------
# simhash
# ------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    """64-bit SimHash over word hashes (Charikar 2002): sum ±1 per bit
    weighted by term frequency.

    Fully JVM-side (no Python): words via split, 60-bit word hash from
    md5 (an engine-portable hash — DuckDB computes the identical value,
    which is what makes the driver's oracle gate possible), per-bit sign
    sums via nested higher-order array functions, bit assembly via OR.
    Null text → null; no words → 0 (reference-style)."""
    txt = F.col(text_col)
    words = F.filter(
        F.split(F.trim(F.lower(txt)), r"\s+"), lambda w: w != F.lit("")
    )
    # 60-bit word hash: int(md5(w).hex[:15], 16) — portable across engines.
    # Bits 60..63 are therefore always 0 in every word hash, so their sign
    # sums are always negative and the simhash uses bits 0..59 only.
    wh = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
    )
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(60)])
    zeros = F.array_repeat(F.lit(0).cast("long"), 60)
    sums = F.aggregate(
        wh,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    val = F.aggregate(
        F.zip_with(
            sums,
            masks,
            lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a.bitwiseOR(v),
    )
    return df.withColumn(out, F.when(txt.isNull(), None).otherwise(val))


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate pairs by Hamming distance over ANY 64-bit
    signature column (simhash, image perceptual hash, audio
    fingerprint): bucket by each of ``n_bands`` equal bit-slices,
    candidate pairs from colliding buckets only, verify with JVM
    ``bit_count(xor)`` — pure Catalyst end to end, the only shuffle is
    the (band, bucket) equi-join.

    EXACT (not approximate) for ``max_hamming <= n_bands - 1`` by
    pigeonhole: a pair differing in fewer bit positions than there are
    bands leaves at least one band untouched, so it collides in that
    band's bucket. Larger radii degrade to recall-bounded LSH (raise
    ``n_bands`` to restore the guarantee at quadratically more
    candidates). The guarantee also requires every collision bucket to
    stay ≤ ``bucket_cap`` — oversized buckets are hub-starred (see
    :func:`_capped_pair_ids` for the precise recall contract); pass
    ``bucket_cap=None`` for unconditional exactness at the B² risk.

    Returns (a_id, b_id, hamming) with a_id < b_id; null hashes drop.
    """
    if 64 % n_bands != 0 or not 2 <= n_bands <= 64:
        raise ValueError(f"n_bands={n_bands} must divide 64")
    w_bits = 64 // n_bands
    mask = (1 << w_bits) - 1
    s = df.select(
        F.col(id_col).alias("_id"), F.col(hash_col).cast("long").alias("_h")
    )
    bands = (
        s.select(
            "_id", "_h",
            F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        )
        .withColumn(
            "bucket",
            F.expr(f"shiftrightunsigned(_h, band * {w_bits})").bitwiseAND(
                F.lit(mask)
            ),
        )
        .select("_id", "band", "bucket")
    )
    pair_ids = _capped_pair_ids(bands, bucket_cap)
    sh = s.select(F.col("_id").alias("_sid"), "_h")
    return (
        pair_ids.join(sh, pair_ids.a_id == sh._sid)
        .select("a_id", "b_id", F.col("_h").alias("_ah"))
        .join(sh, F.col("b_id") == sh._sid)
        .select(
            "a_id", "b_id",
            F.bit_count(F.col("_ah").bitwiseXOR(F.col("_h"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs with simhash hamming ≤ k: 4 16-bit bands over the
    simhash signature — see :func:`hamming_neardup_pairs` for the
    pigeonhole exactness + bucket-cap recall contract."""
    s = simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    return hamming_neardup_pairs(
        s, "_id", "simhash", max_hamming, n_bands=4, bucket_cap=bucket_cap
    )


# ------------------------------------------------------------------
# n-gram jaccard join (bucket by rare shingles)
# ------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_shingles_per_doc: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """EXACT Jaccard-threshold pairs via AllPairs prefix filtering
    (Bayardo/Ma/Srikant, WWW'07 — public): each document indexes only
    its ``|S| − ⌈τ·|S|⌉ + 1`` shingles that come FIRST in a global
    (document-frequency asc, hash) order. Completeness: for any pair
    with jaccard ≥ τ the overlap is ≥ ⌈τ·|S|⌉ on both sides, so the
    globally smallest shared shingle has at least ⌈τ|S|⌉ − 1 shared
    shingles after it in each doc's order — it lies inside BOTH
    prefixes, and the candidate join finds it. Rare-first ordering
    pushes stop-phrase shingles out of prefixes, so boilerplate does
    not explode the index. Exact verify keeps precision 1.0; the
    default is therefore exact in BOTH directions at any scale (the
    former sampled/hub-capped mode remains available by passing
    ``max_shingles_per_doc``/``bucket_cap`` — a documented recall
    tradeoff for corpora where even prefixes are too hot).

    Note the inherent output bound: B identical documents genuinely
    have B²/2 qualifying pairs — run exact dedup first (SCALING.md)."""

    @F.pandas_udf("array<long>")
    def all_shingles(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.to_numpy(object):
            if t is None:
                out.append(None)
            else:
                sh = _shingle_hashes(t, shingle_k)
                if max_shingles_per_doc is not None:
                    sh = np.sort(sh)[:max_shingles_per_doc]
                out.append(sh.astype(np.int64).tolist())
        return pd.Series(out, index=texts.index)

    # Inverted index carries (id, shingle-hash) only — never the text.
    # Text joins back once per side for the exact verify.
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    exploded = base.select(
        "_id", F.explode(all_shingles(F.col("_txt"))).alias("bucket")
    )
    if max_shingles_per_doc is not None:
        # legacy bounded mode: sampled signature, optional hub-star cap
        inv = exploded.select("_id", F.lit(0).alias("band"), "bucket")
        pair_ids = _capped_pair_ids(inv, bucket_cap)
    else:
        # AllPairs prefix: rank each doc's shingles by (global df, hash),
        # keep n − ceil(τ·n) + 1 of them
        from pyspark.sql import Window

        dfreq = exploded.groupBy("bucket").agg(F.count("*").alias("_df"))
        ranked = (
            exploded.join(dfreq, "bucket")
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("_id").orderBy("_df", "bucket")
                ),
            )
            .withColumn("_n", F.count("*").over(Window.partitionBy("_id")))
        )
        prefix = ranked.filter(
            F.col("_rk") <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
        ).select("_id", "bucket")
        a = prefix.select(F.col("_id").alias("a_id"), "bucket")
        b = prefix.select(F.col("_id").alias("b_id"), "bucket")
        pair_ids = (
            a.join(b, "bucket")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
        )
    texts = base.select(F.col("_id").alias("_tid"), "_txt")
    pairs = (
        pair_ids.join(texts, pair_ids.a_id == texts._tid)
        .select("a_id", "b_id", F.col("_txt").alias("a_txt"))
        .join(texts, F.col("b_id") == texts._tid)
        .select("a_id", "b_id", "a_txt", F.col("_txt").alias("b_txt"))
    )

    @F.pandas_udf("double")
    def jac(a_txt: pd.Series, b_txt: pd.Series) -> pd.Series:
        out = np.zeros(len(a_txt))
        av, bv = a_txt.to_numpy(object), b_txt.to_numpy(object)
        for i in range(len(av)):
            sa = _shingle_hashes(av[i], shingle_k)
            sb = _shingle_hashes(bv[i], shingle_k)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            out[i] = inter / union if union else 1.0
        return pd.Series(out, index=a_txt.index)

    return (
        pairs.withColumn("jaccard", jac(F.col("a_txt"), F.col("b_txt")))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ------------------------------------------------------------------
# embedding cosine near-dup
# ------------------------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 42,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate embedding pairs: random-hyperplane LSH bucket join
    (+1-bit multiprobe via band split) then exact cosine verify.

    For cos θ ≥ 0.95, collision prob per plane ≈ 1 − θ/π ≈ 0.90; two
    6-bit bands give ≥ ~75% recall per band pair (documented: LSH recall
    is probabilistic; the exact variant below is the ground truth).
    Oversized buckets (embedding farms / zero vectors) are hub-starred
    (``bucket_cap``; see :func:`_capped_pair_ids`)."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    rng = np.random.Generator(np.random.PCG64(seed))
    H = rng.standard_normal((planes, dim))

    @F.pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        bits = (mat @ H.T) > 0
        vals = np.zeros(len(mat), dtype=np.int64)
        for i in range(planes):
            vals |= bits[:, i].astype(np.int64) << i
        return pd.Series(vals, index=vecs.index)

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")).withColumn(
        "sig", sig(F.col("_v"))
    )
    half = planes // 2
    banded = base.select(
        "_id", "_v",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.col("sig").bitwiseAND(F.lit((1 << half) - 1)).alias("bucket")),
                F.struct(F.lit(1).alias("band"), F.shiftrightunsigned(F.col("sig"), half).alias("bucket")),
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    pair_ids = _capped_pair_ids(banded, bucket_cap)
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    pairs = (
        pair_ids.join(vecs, pair_ids.a_id == vecs._vid)
        .select("a_id", "b_id", F.col("_v").alias("a_v"))
        .join(vecs, F.col("b_id") == vecs._vid)
        .select("a_id", "b_id", "a_v", F.col("_v").alias("b_v"))
    )

    @F.pandas_udf("double")
    def cos(a_v: pd.Series, b_v: pd.Series) -> pd.Series:
        A = np.array(a_v.tolist(), dtype=np.float64)
        B = np.array(b_v.tolist(), dtype=np.float64)
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        den = np.where(den == 0, 1.0, den)
        return pd.Series(num / den, index=a_v.index)

    return (
        pairs.withColumn("cosine", cos(F.col("a_v"), F.col("b_v")))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


# ------------------------------------------------------------------
# connected components → duplicate clusters
# ------------------------------------------------------------------

def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): for every node u, connect each strictly
    larger neighbour to min(Γ(u) ∪ {u})."""
    sym = edges.union(
        edges.select(F.col("u").alias("v"), F.col("v").alias("u")).select("u", "v")
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.least("mv", "u").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient each edge large→small, then per node u
    connect every neighbour (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    j = oriented.join(mins, "u")
    to_min = j.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return to_min.union(self_edge).distinct()


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over (a_id, b_id) edges via alternating
    large-star / small-star rounds — O(log n) rounds regardless of
    component diameter (min-label propagation is O(diameter), which
    silently truncates long transitive near-dup chains).

    Convergence is detected with a cheap (count, hash-sum) checksum of
    the edge set per round; superseded cached edge sets are unpersisted.
    Raises RuntimeError if the edge set is still moving after
    ``max_iter`` rounds rather than returning wrong labels silently.
    Returns (id, component) with component = min id in the component.
    """
    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _checksum(e: DataFrame):
        # bit_xor is order-independent and cannot overflow (unlike sum
        # of hashes under ANSI arithmetic); edge sets are distinct so
        # duplicate-cancellation is not a concern.
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    # Each round references the previous edge set several times (unions +
    # self-joins), so without lineage truncation the logical plan grows
    # exponentially and Catalyst analysis dominates. localCheckpoint
    # materializes each round and cuts the lineage (on a real cluster a
    # reliable checkpoint dir would make this restart-safe too).
    edges = edges.localCheckpoint(eager=True)
    prev_sum = _checksum(edges)
    if prev_sum[0] == 0:
        return edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    converged = False
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur_sum = _checksum(nxt)
        edges = nxt
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds"
        )
    # At convergence every edge points node → component root (the min id);
    # roots themselves appear only on the v side.
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("component")).union(
        edges.select(F.col("v").alias("id"), F.col("v").alias("component"))
    ).distinct()
    return labels


def exact_substring_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplication (Lee et al. 2021, arXiv:2107.06499
    "Deduplicating Training Data Makes Language Models Better", public
    method, token-window form): every k-token window occurring ≥
    ``min_count`` times ANYWHERE in the corpus (cross- or within-doc)
    marks its token span as duplicated. Per doc emits integer coverage
    signals plus ``text_clean`` — the document with every duplicated
    span stripped (what the ExactSubstr dedup pass would train on).

    Plan: k-gram explode (no shuffle) → ONE corpus-wide shuffle (count
    per gram, window over the gram partition) → (doc, position)
    distinct for span coverage → left join back; the strip is a pure
    higher-order array rebuild. At 10^12 docs swap the gram string for
    an 8-byte hash (the ``hash_grams`` path in :func:`decontaminate`)
    — kept as the string here so the DuckDB oracle replays
    byte-for-byte.

    Returns (id, n_tokens, n_gram_starts, n_hot_starts, n_dup_tokens,
    text_clean).
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")),
        " ",
    )
    base = (
        df.select(id_col, text_col)
        .withColumn("_t", toks)
        .withColumn("_nt", F.size("_t"))
    )
    grams = (
        base.select(
            id_col, "_t",
            F.explode(
                F.when(
                    F.col("_nt") >= k,
                    F.sequence(F.lit(1), F.col("_nt") - k + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("s"),
        )
        .withColumn("_g", F.array_join(F.slice(F.col("_t"), F.col("s"), k), " "))
        .select(id_col, "s", "_g")
    )
    w = Window.partitionBy("_g")
    hot_starts = (
        grams.withColumn("_c", F.count("*").over(w))
        .filter(F.col("_c") >= min_count)
        .select(id_col, "s")
    )
    n_hot = hot_starts.groupBy(id_col).agg(F.count("*").alias("n_hot_starts"))
    cov = hot_starts.select(
        id_col, F.explode(F.sequence(F.col("s"), F.col("s") + k - 1)).alias("p")
    ).distinct()
    cps = cov.groupBy(id_col).agg(F.collect_set("p").alias("_cps"))
    empty = F.array().cast("array<int>")
    out = (
        base.join(n_hot, id_col, "left")
        .join(cps, id_col, "left")
        .withColumn("_cps", F.coalesce(F.col("_cps"), empty))
        .withColumn("n_tokens", F.col("_nt"))
        .withColumn("n_gram_starts", F.greatest(F.col("_nt") - k + 1, F.lit(0)))
        .withColumn("n_hot_starts", F.coalesce(F.col("n_hot_starts"), F.lit(0)))
        .withColumn("n_dup_tokens", F.size("_cps"))
        .withColumn(
            "text_clean",
            F.array_join(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.col("_nt")),
                        lambda i: F.when(
                            ~F.array_contains(F.col("_cps"), i),
                            F.element_at(F.col("_t"), i),
                        ),
                    ),
                    lambda x: x.isNotNull(),
                ),
                " ",
            ),
        )
    )
    return out.select(
        id_col, "n_tokens", "n_gram_starts", "n_hot_starts", "n_dup_tokens",
        "text_clean",
    )


# ---------------------------------------------------------------------------
# train/eval decontamination (n-gram overlap anti-join)


def word_ngrams(text: Column, n: int, lowercase: bool = True) -> Column:
    """All word ``n``-grams of ``text`` as an array<string> column, pure
    Catalyst: normalize (lower, non-alphanumeric runs → single space,
    trim), split on single spaces, then slide an ``n`` window with a
    higher-order ``transform``. Texts with fewer than ``n`` words yield
    an empty array (a document too short to contain a full n-gram
    cannot collide on one). Expressible 1:1 in ANSI SQL (DuckDB
    ``string_split_regex`` + ``list_transform``), which is what the
    oracle gate runs."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    norm = F.lower(text) if lowercase else text
    toks = F.split(F.trim(F.regexp_replace(norm, "[^a-z0-9A-Z]+", " ")), " ")
    win = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, win).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 13,
    hash_grams: bool = True,
    broadcast_eval: bool = True,
    keep: bool = True,
) -> DataFrame:
    """Drop every training document sharing ANY word ``n``-gram with the
    eval/benchmark set — the standard contamination filter (GPT-3 §C /
    PaLM use 13-gram overlap; public methodology). Returns the
    surviving train rows (``keep=True``) or the contaminated ones
    (``keep=False``, for auditing what was removed).

    Scale shape: the eval side collapses to DISTINCT grams (benchmarks
    are small — broadcast by default, so the train-side explode never
    shuffles: scan → generate → broadcast-semi-join, fully pushed
    down). ``hash_grams=True`` joins on ``xxhash64(gram)`` instead of
    the gram string — an 8-byte key instead of ~100 bytes; a hash
    collision can only over-remove (never under-remove), the right
    failure direction for decontamination. The oracle gate runs
    ``hash_grams=False`` (string equality) for SQL expressibility.
    """
    grams = word_ngrams(F.col(text_col), n)
    gram = F.explode(grams).alias("_g")
    tg = train.select(F.col(id_col), gram)
    eg = eval_df.select(gram).distinct()
    if hash_grams:
        tg = tg.withColumn("_g", F.xxhash64("_g"))
        eg = eg.select(F.xxhash64("_g").alias("_g"))
    if broadcast_eval:
        eg = F.broadcast(eg)
    bad = tg.join(eg, "_g", "left_semi").select(id_col).distinct()
    how = "left_anti" if keep else "left_semi"
    return train.join(bad, id_col, how)


def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    hash_key: bool = True,
    keep: bool = True,
) -> DataFrame:
    """Snapshot-incremental exact dedup: drop every row of ``new_df``
    whose normalized text (lowercase, alnum+space, squeezed — the same
    normalization as :func:`~pythongis_spark.operators.text.fingerprint`)
    already occurs in ``seen_df`` — the standard "dedup this crawl
    against the corpus so far" pass of an incremental ingest.

    Scale shape: the seen side collapses to DISTINCT keys before the
    join (one map-side-combined aggregate); the anti-join then shuffles
    8-byte hashes instead of document text when ``hash_key=True``
    (xxhash64 — a collision only over-removes, the right failure
    direction for dedup; Spark's runtime bloom-filter join pruning
    applies on top). The oracle gate runs ``hash_key=False`` (string
    keys) for SQL expressibility. ``keep=False`` returns the dropped
    rows for auditing."""
    norm = lambda c: F.trim(  # noqa: E731
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    # NULL text must behave identically on both key paths: xxhash64(NULL)
    # collapses to the seed constant (every NULL would match every NULL),
    # while string keys never join on NULL — so NULL-text rows get a NULL
    # key unconditionally (kept by left_anti, never reported by left_semi)
    key = norm(F.col(text_col))
    if hash_key:
        key = F.xxhash64(key)
    key = F.when(F.col(text_col).isNotNull(), key)
    tagged = new_df.withColumn("_k", key)
    seen_keys = seen_df.where(F.col(text_col).isNotNull()).select(
        norm(F.col(text_col)).alias("_k"))
    if hash_key:
        seen_keys = seen_keys.select(F.xxhash64("_k").alias("_k"))
    seen_keys = seen_keys.distinct()
    how = "left_anti" if keep else "left_semi"
    return tagged.join(seen_keys, "_k", how).drop("_k")

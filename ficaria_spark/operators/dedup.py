"""Deduplication for web-scale corpora: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale shapes (the whole point of each design):
* exact        — one hash-groupBy; map-side partial agg; no data movement of
                 texts (only 16-byte digests shuffle).
* ngram-jaccard — set-similarity join: explode distinct shingles → self-join
                 on shingle → count common → filter. Shuffles (doc, shingle)
                 pairs; prune super-common shingles (stopword shingles) to
                 kill the quadratic hot-key blowup.
* minhash+LSH  — signatures via one projection (all hash functions evaluated
                 per shingle in one pass), banding → candidates join only
                 within buckets: near-linear. Verification re-computes exact
                 Jaccard on candidates only.
* simhash      — 64-bit signature per doc via one mapInPandas (vectorized bit
                 ops); near-dups = equal band keys on rotations.
* embedding    — cosine over LSH/bucketed candidates (see similarity.py).
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ficaria_spark.operators.text import word_tokens

_LOG = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                *, normalize: bool = True) -> DataFrame:
    """Keep one representative (min id) per exact (normalized) text.

    Returns the group table (content_hash, keep_id, n_copies); join back on
    keep_id for the surviving rows. Digest-only shuffle.
    """
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    return (
        df.select(F.md5(t).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact set-similarity join)
# ---------------------------------------------------------------------------

def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             *, k: int = 3) -> DataFrame:
    """Distinct word k-gram digests per doc: (id, shingle)."""
    base = df.select(F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("__w"))
    n = F.size("__w")
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    sh = F.transform(idx, lambda i: F.md5(F.array_join(F.slice(F.col("__w"), i + 1, k), " ")))
    return base.select("id", F.explode(F.array_distinct(sh)).alias("shingle"))


def hot_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 *, k: int = 3, max_shingle_freq: int = 1000) -> DataFrame:
    """Audit table of the shingles ``ngram_jaccard_pairs`` would prune:
    (shingle, count) for every shingle shared by more than ``max_shingle_freq``
    docs. Run this to see what the frequency guard drops."""
    sh = shingles(df, text_col, id_col, k=k)
    return sh.groupBy("shingle").count().where(F.col("count") > max_shingle_freq)


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        *, k: int = 3, threshold: float = 0.8,
                        max_shingle_freq: int | None = 1000) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(shingles_a, shingles_b) ≥ threshold.

    ``max_shingle_freq`` drops shingles shared by more than that many docs
    before the join — the standard guard against quadratic blowup on
    boilerplate shingles at corpus scale (a single shingle in N docs otherwise
    yields an N²-row self-join). The default is a finite guard; pass ``None``
    only for exact small-corpus runs. Pruning slightly *underestimates*
    Jaccard for docs containing hot shingles (they leave both the intersection
    and the union). Use :func:`hot_shingles` to audit exactly what is dropped;
    at INFO log level the pruned-shingle count is also computed and logged.
    """
    sh = shingles(df, text_col, id_col, k=k)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").count()
        if _LOG.isEnabledFor(logging.INFO):
            n_pruned = freq.where(F.col("count") > max_shingle_freq).count()
            _LOG.info(
                "ngram_jaccard_pairs: pruning %d shingles with doc-freq > %d",
                n_pruned, max_shingle_freq,
            )
        keep = freq.where(F.col("count") <= max_shingle_freq)
        sh = sh.join(F.broadcast(keep.select("shingle")), "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       *, k: int = 3, num_hashes: int = 64, seed: int = 13) -> DataFrame:
    """(id, signature array<long>) — min over shingles of (a·x + b) mod p per
    hash function. Computed in one mapInPandas pass (vectorized NumPy over the
    shingle×hash matrix per batch); no shuffle."""
    a_params, b_params = _hash_params(num_hashes, seed)
    # materialize the words array ONCE per row: referencing the split()
    # expression inside the shingle lambda would re-evaluate it per shingle
    # (measured O(words²) per doc — 9s for 5k docs)
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
    )
    n = F.size("__w")
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    # shingle value: native xxhash64 of the joined k-gram — an order of
    # magnitude cheaper than md5→hex→conv and just as collision-safe for
    # signature purposes (deterministic within the engine)
    sh = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(F.col("__w"), i + 1, k), " "))
    )
    base = words.select("id", F.array_distinct(sh).alias("sh"))

    au = a_params.astype(np.uint64)
    bu = b_params.astype(np.uint64)

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"id": pdf.get("id", []), "signature": []})
                continue
            # fully vectorized over the batch: flatten every doc's shingles,
            # hash the unique flat array once, then segment-min per doc
            # (np.minimum.reduceat) — no per-row Python.
            lens = pdf["sh"].map(len).to_numpy()
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["sh"] if len(a)]
            ) if lens.sum() else np.empty(0, dtype=np.int64)
            sigs = np.full((len(pdf), num_hashes), _MERSENNE, dtype=np.uint64)
            if len(flat):
                hv = (flat[:, None].astype(np.uint64) * au[None, :] + bu[None, :]) \
                     % np.uint64(_MERSENNE)  # (total_shingles, num_hashes)
                nz = lens > 0
                starts = np.zeros(nz.sum(), dtype=np.int64)
                starts[1:] = np.cumsum(lens[nz])[:-1]
                sigs[nz] = np.minimum.reduceat(hv, starts, axis=0)
            yield pd.DataFrame(
                {"id": pdf["id"], "signature": list(sigs.astype(np.int64))})

    return base.mapInPandas(sign, "id long, signature array<long>")


def minhash_lsh_candidates(sigs: DataFrame, *, bands: int = 16) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket.
    Join happens ONLY within buckets → near-linear in corpus size."""
    n_hashes_col = F.size("signature")
    rows_per_band = (n_hashes_col / bands).cast("int")
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.slice("signature", bi * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.bucket") == F.col("y.bucket"))
               & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        *, k: int = 3, num_hashes: int = 64, bands: int = 16,
                        threshold: float = 0.8, seed: int = 13) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates → estimated
    Jaccard (signature agreement) filter ≥ threshold."""
    sigs = minhash_signatures(df, text_col, id_col, k=k, num_hashes=num_hashes, seed=seed)
    cands = minhash_lsh_candidates(sigs, bands=bands)
    s1 = sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    s2 = sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda p, q: (p == q).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    ) / F.size("sig_a")
    return (
        cands.join(s1, "id_a").join(s2, "id_b")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            *, seed: int = 29) -> DataFrame:
    """64-bit SimHash per doc (vectorized bit-count over word hashes)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_tokens(F.col(text_col)), lambda w: F.xxhash64(F.lower(w), F.lit(seed))
        ).alias("hashes"),
    )

    shifts = np.arange(64, dtype=np.uint64)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            if len(pdf):
                # vectorized: flatten all word hashes, expand to a bit matrix
                # once, segment-sum the votes per doc (np.add.reduceat)
                lens = pdf["hashes"].map(len).to_numpy()
                nz = lens > 0
                if lens.sum():
                    flat = np.concatenate(
                        [np.asarray(a, dtype=np.int64) for a in pdf["hashes"] if len(a)]
                    ).view(np.uint64)
                    bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
                    starts = np.zeros(nz.sum(), dtype=np.int64)
                    starts[1:] = np.cumsum(lens[nz])[:-1]
                    ones = np.add.reduceat(bits, starts, axis=0)  # (docs, 64)
                    votes = 2 * ones - lens[nz][:, None]
                    packed = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(
                        axis=1, dtype=np.uint64)
                    out[nz] = packed.astype(np.int64)
            yield pd.DataFrame({"id": pdf["id"], "simhash": out})

    return base.mapInPandas(sig, "id long, simhash long")


def simhash_near_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       *, max_hamming: int = 3, seed: int = 29) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via banded pigeonhole:
    the 64 bits are split into ``bands = max_hamming + 1`` contiguous slices, so
    any pair within the radius agrees on at least one full band — candidates
    join only inside band buckets, guaranteeing recall for the requested radius.

    Cost/recall contract: wider radii mean narrower bands (64 // bands bits),
    i.e. coarser buckets and more candidates. That is the price of exact recall;
    callers wanting cheaper approximate behaviour should lower ``max_hamming``.
    """
    if not 0 <= max_hamming <= 31:
        # bands must be ≥ 2 bits wide for the bucket key to prune anything
        raise ValueError(f"max_hamming must be in [0, 31], got {max_hamming}.")
    sigs = simhash(df, text_col, id_col, seed=seed)
    bands = max_hamming + 1
    base_w, extra = divmod(64, bands)
    widths = [base_w + (1 if b < extra else 0) for b in range(bands)]
    offsets = np.concatenate([[0], np.cumsum(widths)[:-1]]).tolist()
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned("simhash", int(offsets[b]))
            .bitwiseAND(F.lit((1 << widths[b]) - 1))
            .alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        "id", "simhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "simhash", "bb.band", "bb.bucket")
    x, y = banded.alias("x"), banded.alias("y")
    pairs = (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.bucket") == F.col("y.bucket"))
               & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"),
                F.col("x.simhash").alias("sh_a"), F.col("y.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

"""Deterministic synthetic text corpora for dedup scale audits.

The sf* ``documents`` table is right for correctness gates but wrong
for measuring candidate growth: its 31-word vocabulary makes most
pairs collide (the documented ppjoin/simhash adversarial case), so a
candidate-count audit on it measures the corpus, not the operator.
This generator builds an arbitrarily large corpus with a REALISTIC
shape — zipf-distributed tokens over a large vocabulary, a known
near-duplicate rate, and a boilerplate stratum that exercises the
hot-bucket cap — from pure Catalyst expressions over ``range(n)``:
xxhash64-mixed draws, no RNG, no Python in the row path. Identical
corpus every run, every host, any partitioning.

Structure, by ``r = pmod(doc_id, 20)``:

- ``r == 7`` (5%): **boilerplate doc** — a 40-token header shared by
  every such doc (same token stream for all) plus 20 private tokens.
  Most of these docs' minhash band keys collapse onto the header's
  minima, forming exactly the giant LSH buckets the
  ``max_bucket_size`` cap exists for at 100 TB.
- ``r == 1`` (5%): **near-duplicate** of ``doc_id - 1`` — the same
  token stream with ONE position replaced, so each (20k, 20k+1) pair
  has Jaccard ~ (L-1)/(L+1) over shingles: a guaranteed, linearly
  growing population of true near-dups for the blockers to find.
- otherwise (90%): **unique doc** — 30-79 tokens drawn zipf(s~1)
  from a ``vocab``-word vocabulary by inverse CDF
  (``rank = floor(V^u)``, ``u`` uniform from xxhash64 — P(rank) ~
  1/rank), the standard natural-text frequency shape.

Reference behavior measured against: the candidate-bounding design
claims in operators/dedup.py (MinHash+LSH, SimHash banding) and
operators/ppjoin.py — this corpus turns those claims into numbers
(bench.py ``dedup_scale``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_VOCAB = 50_000
NEARDUP_RESIDUE = 1     # pmod(doc_id, 20) of the near-dup stratum
BOILER_RESIDUE = 7      # pmod(doc_id, 20) of the boilerplate stratum
BOILER_HEADER_TOKENS = 40
BOILER_PRIVATE_TOKENS = 20
MIN_TOKENS, TOKEN_SPREAD = 30, 50  # doc length in [30, 80)
_BOILER_SEED = -977     # fixed seed shared by every boilerplate header


def _tok(seed: str, vocab: int, i: str = "i") -> str:
    """One zipf-ranked token ``w<rank>`` for position ``i`` of the
    token stream keyed by ``seed`` (inverse-CDF zipf: u uniform in
    (0, 1) -> rank = floor(vocab^u), pmf ~ 1/rank)."""
    u = (f"(CAST(pmod(xxhash64(({seed}) * 131 + {i}), 1000003) AS DOUBLE)"
         " + 0.5) / 1000003.0")
    return (f"concat('w', CAST(floor(power(CAST({vocab} AS DOUBLE), {u}))"
            " AS BIGINT))")


def _doc_len(seed: str) -> str:
    return (f"(CAST({MIN_TOKENS} AS BIGINT)"
            f" + pmod(xxhash64(({seed}) * 7919 + 1), {TOKEN_SPREAD}))")


def _tokens(seed: str, vocab: int) -> str:
    return (f"transform(sequence(0, {_doc_len(seed)} - 1), "
            f"i -> {_tok(seed, vocab)})")


def zipf_corpus(spark: SparkSession, n: int,
                vocab: int = DEFAULT_VOCAB,
                partitions: int | None = None) -> DataFrame:
    """(doc_id, text) corpus of ``n`` docs with the structure above.

    Pure Catalyst (one ``range`` scan + string expressions inside
    whole-stage codegen): generation is embarrassingly parallel and
    linear — the same expression would generate a 10^11-doc corpus on
    a real cluster without a shuffle.
    """
    if partitions is None:
        partitions = 2 * spark.sparkContext.defaultParallelism
    unique = f"concat_ws(' ', {_tokens('id', vocab)})"
    # near-dup of id-1: same stream, one position (keyed by id) swapped
    # for a token drawn from a different seed.
    prev_len = _doc_len("id - 1")
    neardup = (
        f"concat_ws(' ', transform(sequence(0, {prev_len} - 1), i -> "
        f"IF(i = pmod(xxhash64(id * 53), {prev_len}), "
        f"{_tok('id * 977 + 7', vocab)}, {_tok('id - 1', vocab)})))"
    )
    boiler = (
        f"concat_ws(' ', "
        f"transform(sequence(0, {BOILER_HEADER_TOKENS - 1}), "
        f"i -> {_tok(str(_BOILER_SEED), vocab)}), "
        f"transform(sequence(0, {BOILER_PRIVATE_TOKENS - 1}), "
        f"i -> {_tok('id * 3 + 1', vocab)}))"
    )
    text = (f"CASE pmod(id, 20) "
            f"WHEN {BOILER_RESIDUE} THEN {boiler} "
            f"WHEN {NEARDUP_RESIDUE} THEN {neardup} "
            f"ELSE {unique} END")
    return spark.range(n).repartition(partitions).selectExpr(
        "id AS doc_id", f"{text} AS text")

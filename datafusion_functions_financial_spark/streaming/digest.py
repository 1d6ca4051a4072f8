"""Streaming Merkle-bucket digest: the continuously-maintained table
fingerprint. The batch digest (operators/digest.py) is a SUM of
per-row LCG signatures per key bucket — commutative and associative —
so the identical aggregate runs unchanged as a Structured Streaming
stateful query: state is exactly ``n_buckets`` rows of three int64
registers no matter how much data flows through, and after replaying
any prefix of a table the stream's state equals the batch digest of
that prefix bit-for-bit (no watermark needed; late or out-of-order
rows commute into the sums).

Use it as the ingestion-integrity monitor: keep the digest query
running over the ingest stream, and at checkpoint time compare its
sink contents against ``operators.digest.bucket_digests`` of the
landed table with ``digest_compare`` — zero rows means every row the
stream saw is in the table exactly once (the comparison runs on the
sink contents or in foreachBatch, the drift.py pattern, since a
stream-side full-outer join is not expressible in-flight).

Output mode: ``complete`` (or ``update``) — the digest is a running
total, not a windowed emission; the bounded bucket cardinality makes
complete mode cheap by construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..operators.digest import bucket_digests

__all__ = ["digest_stream"]


def digest_stream(stream: DataFrame, key_expr: str,
                  sig_exprs: Sequence[str],
                  n_buckets: int = 256) -> DataFrame:
    """(bucket, n_rows, digest, digest2) as a streaming aggregate —
    the same relation ``operators.digest.bucket_digests`` builds in
    batch, kept incrementally. State: ``n_buckets`` rows, O(1) in the
    stream length."""
    if not stream.isStreaming:
        raise ValueError("digest_stream expects a streaming DataFrame; "
                         "use operators.digest.bucket_digests for batch")
    return bucket_digests(stream, key_expr, sig_exprs, n_buckets)

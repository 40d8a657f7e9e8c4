"""Generate the pinned Murmur3Partitioner token fixture for the B9 oracle.

``token(pk)`` is not expressible in DuckDB SQL, so the driver's
correctness gate needs a precomputed ground-truth table to join against.
This script generates tokens for every ``o_orderkey`` appearing in any
testdata sf (keys are dense 0..N-1; sf0.1 tops out at 149999) using the
PURE-PYTHON SCALAR model (``murmur3_token_py``) — a different code path
from the vectorized numpy batch the registered query executes, so the
fixture is an independent implementation, not a self-check.

The scalar model itself is pinned to two PUBLIC ground-truth vectors
before generating anything (script aborts on mismatch):

* MurmurHash3_x64_128 h1 of b"foo" = -2129773440516405919 — the
  canonical x64_128 test value reproduced by every faithful port (tail
  bytes < 0x80, where Cassandra's signed-tail variant coincides with
  canonical C).
* Cassandra Murmur3Partitioner token of ``int 1`` (4-byte big-endian) =
  -4069959284402364209 — the widely documented partitioner token for
  key 1.

Output: tests/fixtures/murmur3_tokens_orders.parquet (o_orderkey BIGINT,
token BIGINT), ~150k rows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from cql_xmlpipe_spark.functions.murmur3 import murmur3_token_py

N_KEYS = 150_000  # max o_orderkey across sf0.001/sf0.01/sf0.1 is 149999

EXTERNAL_VECTORS = [
    (b"foo", -2129773440516405919),
    ((1).to_bytes(4, "big", signed=True), -4069959284402364209),
]


def main() -> None:
    for data, want in EXTERNAL_VECTORS:
        got = murmur3_token_py(data)
        assert got == want, f"scalar model diverges from public vector {data!r}: {got} != {want}"

    keys = list(range(N_KEYS))
    tokens = [murmur3_token_py(k.to_bytes(8, "big", signed=True)) for k in keys]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "murmur3_tokens_orders.parquet",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(
        pa.table({"o_orderkey": pa.array(keys, pa.int64()),
                  "token": pa.array(tokens, pa.int64())}),
        out,
        compression="zstd",
    )
    print(f"wrote {out}: {N_KEYS} rows")


if __name__ == "__main__":
    main()

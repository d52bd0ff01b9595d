"""Dictionary-encoded string columns: (sorted dict, int32 codes).

The TPU-native answer to SURVEY.md §7's #1 idiomatic-design decision
(var-length data in a fixed-shape world) and the reference's dictionary
handling on scan inputs (native/core/src/execution/operators/scan.rs:100
unpacks Arrow dictionary arrays; here we KEEP the encoding end-to-end).

Design:

- The dictionary is built ONCE at staging (host side) and kept as **host
  numpy** — a trace-time constant. Because the engine stages each table once
  and every downstream batch derives from staged tables, the dictionary is
  known when expressions compile, so:
  * predicates against string literals become int32 code compares
    (the literal's code is computed on the host at trace time);
  * GROUP BY keys have a *provably tiny* key domain → the dense
    aggregation path (no sort, no capacity hints);
  * sort keys are ONE int32 limb instead of width/8 int64 limbs.
- The dictionary is **sorted by unsigned byte order, shorter-prefix
  first** (Spark's UTF8String binary order), so codes are
  order-isomorphic to string order: `<`/`min`/`ORDER BY` work on codes.
- Codes survive every layout op (sort payloads, join gathers, shuffle
  all_to_all) at 4 bytes/row; a TPC-H comment column would otherwise drag
  ~200 bytes/row through every exchange.

Decode (codes → padded bytes) happens lazily, only for consumers that need
raw bytes (LIKE, substring, hashes, casts). Columns whose cardinality
exceeds ``comet.scan.dictionary.maxSize`` stay in padded form.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np

__all__ = ["StringDict", "encode_padded", "DICT_DISABLE_ENV"]

DICT_DISABLE_ENV = "COMET_TPU_NO_DICT"


class StringDict:
    """An immutable, lexicographically sorted string dictionary.

    Stored as host numpy (values (K, w) uint8 zero-padded + lengths (K,)
    int32). Hashable by content digest so it can ride a pytree *meta* field
    (jit cache keys include it; the arrays enter compiled programs as
    constants only where decoded)."""

    __slots__ = ("values", "lengths", "_digest", "_keys")

    def __init__(self, values: np.ndarray, lengths: np.ndarray):
        assert values.ndim == 2 and values.dtype == np.uint8
        self.values = values
        self.lengths = lengths.astype(np.int32)
        h = hashlib.blake2b(digest_size=16)
        h.update(values.tobytes())
        h.update(self.lengths.tobytes())
        h.update(str(values.shape).encode())
        self._digest = h.digest()
        self._keys: Optional[list] = None  # lazy: sorted list of bytes

    # -- pytree-meta contract ---------------------------------------------------------
    def __hash__(self) -> int:
        return hash(self._digest)

    def __eq__(self, other) -> bool:
        return isinstance(other, StringDict) and self._digest == other._digest

    def __repr__(self) -> str:
        return f"StringDict(size={self.size}, width={self.width})"

    @property
    def size(self) -> int:
        return self.values.shape[0]

    @property
    def width(self) -> int:
        return self.values.shape[1]

    # -- host-side lookups (trace time) -------------------------------------------------
    def _key_list(self) -> list:
        if self._keys is None:
            self._keys = [
                bytes(self.values[i, : self.lengths[i]]) for i in range(self.size)
            ]
        return self._keys

    def insertion_point(self, value: bytes, side: str = "left") -> int:
        """#entries strictly < value (side=left) or <= value (side=right)."""
        import bisect

        ks = self._key_list()
        return (
            bisect.bisect_left(ks, value)
            if side == "left"
            else bisect.bisect_right(ks, value)
        )

    def code_of(self, value: bytes) -> Optional[int]:
        i = self.insertion_point(value, "left")
        if i < self.size and self._key_list()[i] == value:
            return i
        return None

    def value_of(self, code: int) -> bytes:
        return self._key_list()[code]

    # -- device decode ------------------------------------------------------------------
    def decode_arrays(self, codes, target_width: Optional[int] = None):
        """codes (cap,) int32 → (mat (cap, w) uint8, lens (cap,) int32).
        One small-table gather; callers keep this off hot paths."""
        import jax.numpy as jnp

        w = target_width or self.width
        vals = self.values
        if w != self.width:
            v2 = np.zeros((self.size, w), np.uint8)
            cw = min(w, self.width)
            v2[:, :cw] = vals[:, :cw]
            vals = v2
        if self.size == 0:
            cap = codes.shape[0]
            return jnp.zeros((cap, w), jnp.uint8), jnp.zeros(cap, jnp.int32)
        idx = jnp.clip(codes, 0, self.size - 1)
        mat = jnp.take(jnp.asarray(vals), idx, axis=0)
        lens = jnp.take(jnp.asarray(self.lengths), idx, axis=0)
        return mat, lens


def union_ranks(a: "StringDict", b: "StringDict") -> Tuple[np.ndarray, np.ndarray]:
    """Map each dict's codes into ranks of the merged (sorted, deduped)
    value order, so codes from TWO different dictionaries become directly
    comparable int32 keys (join keys across tables: one tiny constant-table
    remap instead of decoding both sides to byte matrices)."""
    ka, kb = a._key_list(), b._key_list()
    merged = sorted(set(ka) | set(kb))
    pos = {v: i for i, v in enumerate(merged)}
    ra = np.fromiter((pos[v] for v in ka), np.int32, len(ka))
    rb = np.fromiter((pos[v] for v in kb), np.int32, len(kb))
    return ra, rb


def encode_padded(
    mat: np.ndarray, lens: np.ndarray, max_size: int
) -> Optional[Tuple[np.ndarray, StringDict]]:
    """Host-side dictionary encoding of a padded (n, w) uint8 matrix.

    Returns (codes int32, StringDict) with the dict sorted by unsigned byte
    order (shorter-prefix first), or None when cardinality > max_size.
    Sort correctness: rows are compared as zero-padded bytes with the
    big-endian length appended, which orders equal-prefix shorter strings
    first and keeps embedded-NUL strings exact."""
    n, w = mat.shape
    if n == 0:
        return None
    lens = lens.astype(np.int32)
    # zero out padding bytes beyond each row's length so equal strings with
    # dirty padding collapse; staging already guarantees this, but encoding
    # must not trust it
    pos = np.arange(w, dtype=np.int32)
    clean = np.where(pos[None, :] < lens[:, None], mat, 0).astype(np.uint8)
    len_be = lens.astype(">i4").view(np.uint8).reshape(n, 4)
    keyed = np.concatenate([clean, len_be], axis=1)
    uniq, inv = np.unique(keyed, axis=0, return_inverse=True)
    k = uniq.shape[0]
    if k > max_size:
        return None
    dvals = np.ascontiguousarray(uniq[:, :w])
    dlens = uniq[:, w:].copy().view(">i4").reshape(k).astype(np.int32)
    return inv.astype(np.int32).reshape(n), StringDict(dvals, dlens)

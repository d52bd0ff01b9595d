"""Device split / split_part / substring_index for literal delimiters.

Reference: native/spark-expr/src/string_funcs/split.rs (regex-based split),
string_funcs substring_index; Spark semantics:

- split(str, regex, -1): all fields, trailing empties KEPT (Spark SQL's
  default limit). Only literal patterns take this device path (the regex
  ones keep the host bridge — ir/functions.py gates at build time).
- split_part(str, delim, k): 1-based; negative counts from the end; k=0 is
  an ANSI error; |k| > n_fields returns ''.
- substring_index(str, delim, n): n>0 → prefix before the n-th occurrence
  (left-to-right non-overlapping, the successive-indexOf contract); n<0 →
  suffix after the |n|-th occurrence from the right (single-byte delimiters
  only on device: right-scan non-overlap of longer delimiters differs and
  keeps the host bridge); n=0 → ''.

TPU formulation: occurrence mask via L static shifted compares (VPU), the
non-overlap resolution as a W-step lax.scan with a countdown carry (W =
static string width), field boundaries through one (rows, E, W) one-hot
contraction, and each field extracted with one take_along_axis per output
plane — no data-dependent shapes anywhere. Dict-encoded inputs evaluate
over the K dictionary rows via _eval_on_dict (evaluator.py)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["nonoverlap_matches", "split_fields", "split_device",
           "split_part_device", "substring_index_device", "soundex_device"]


_SOUNDEX_LUT = np.zeros(256, np.int8)
for _c, _v in [("BFPV", 1), ("CGJKQSXZ", 2), ("DT", 3), ("L", 4),
               ("MN", 5), ("R", 6)]:
    for _ch in _c:
        _SOUNDEX_LUT[ord(_ch)] = _v


def soundex_device(mat: jax.Array, lens: jax.Array, validity: jax.Array,
                   out_w: int):
    """American Soundex (the host-bridge algorithm, byte-exact for ASCII):
    first letter + up to three digit codes, duplicate codes collapsed, H/W
    transparent to the previous-code state, non-letters resetting it.
    Rows whose first byte is not an ASCII letter pass through unchanged
    (the Spark isLetter guard; non-ASCII alphabetics also pass through
    here — documented deviation, docs/compatibility.md). Single W-step
    scan, no gathers."""
    n, W = mat.shape
    up = jnp.where((mat >= 97) & (mat <= 122), mat - 32, mat)
    is_letter = (up >= 65) & (up <= 90)
    codes = jnp.asarray(_SOUNDEX_LUT)[up].astype(jnp.int32)  # (n, W)
    hw = (up == 72) | (up == 87)
    j = jnp.arange(W, dtype=jnp.int32)
    live = j[None, :] < lens[:, None]
    alpha0 = is_letter[:, 0] & (lens > 0)

    def step(carry, col):
        prev, k, c1, c2, c3 = carry
        code, lv, ishw = col
        emit = lv & (code > 0) & (code != prev) & (k < 3)
        c1 = jnp.where(emit & (k == 0), code, c1)
        c2 = jnp.where(emit & (k == 1), code, c2)
        c3 = jnp.where(emit & (k == 2), code, c3)
        k = k + emit.astype(jnp.int32)
        prev = jnp.where(lv & ~ishw, code, prev)
        return (prev, k, c1, c2, c3), None

    init = (codes[:, 0], jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32))
    (prev, k, c1, c2, c3), _ = jax.lax.scan(
        step, init, (codes[:, 1:].T, live[:, 1:].T, hw[:, 1:].T))
    zero = jnp.int32(ord("0"))
    out = jnp.zeros((n, out_w), jnp.uint8)
    out = out.at[:, 0].set(up[:, 0].astype(jnp.uint8))
    out = out.at[:, 1].set((zero + c1).astype(jnp.uint8))
    out = out.at[:, 2].set((zero + c2).astype(jnp.uint8))
    out = out.at[:, 3].set((zero + c3).astype(jnp.uint8))
    src = mat if mat.shape[1] == out_w else jnp.pad(
        mat, ((0, 0), (0, max(out_w - W, 0))))[:, :out_w]
    outb = jnp.where(alpha0[:, None], out, src)
    outl = jnp.where(alpha0, 4, lens).astype(jnp.int32)
    return outb, outl, validity


def nonoverlap_matches(mat: jax.Array, lens: jax.Array,
                       delim: bytes) -> jax.Array:
    """(rows, W) uint8 × lengths → bool mask of non-overlapping
    left-to-right literal matches (True at each match start)."""
    n, W = mat.shape
    d = np.frombuffer(delim, np.uint8)
    L = len(d)
    pad = jnp.pad(mat, ((0, 0), (0, L)))
    occ = jnp.ones((n, W), bool)
    for k in range(L):
        occ = occ & (pad[:, k: k + W] == d[k])
    j = jnp.arange(W, dtype=jnp.int32)
    occ = occ & ((j[None, :] + L) <= lens[:, None])
    if L == 1:
        return occ
    # left-to-right non-overlap: a match claims the next L-1 positions
    def step(cool, occ_col):
        take = occ_col & (cool == 0)
        cool = jnp.where(take, L - 1, jnp.maximum(cool - 1, 0))
        return cool, take

    _, real_t = jax.lax.scan(step, jnp.zeros(n, jnp.int32), occ.T)
    return real_t.T


def split_fields(mat: jax.Array, lens: jax.Array, delim: bytes,
                 max_parts: int) -> Tuple[jax.Array, jax.Array, jax.Array,
                                          jax.Array]:
    """Field boundaries under non-overlapping literal matches.

    Returns (starts (n,E), ends (n,E), n_fields (n,), overflow (n,)) where
    E = max_parts; fields beyond n_fields carry (len, len) empty spans."""
    L = len(delim)
    real = nonoverlap_matches(mat, lens, delim)
    n, W = mat.shape
    E = max_parts
    j = jnp.arange(W, dtype=jnp.int32)
    rank = jnp.cumsum(real.astype(jnp.int32), axis=1) - 1
    ms = jnp.arange(E, dtype=jnp.int32)
    oh = real[:, None, :] & (rank[:, None, :] == ms[None, :, None])
    pos = jnp.sum(oh * j[None, None, :], axis=-1).astype(jnp.int32)
    has = jnp.any(oh, axis=-1)
    n_matches = jnp.sum(real, axis=1).astype(jnp.int32)
    n_fields = n_matches + 1
    ends = jnp.where(has, pos, lens[:, None])
    starts_tail = jnp.where(has, pos + L, lens[:, None])[:, : E - 1]
    starts = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), starts_tail], axis=1)
    overflow = n_fields > E
    return starts, ends, n_fields, overflow


def _extract_span(mat: jax.Array, starts: jax.Array, ends: jax.Array,
                  out_w: int) -> Tuple[jax.Array, jax.Array]:
    """Gather [start, end) byte spans → ((..., out_w) bytes, lengths).
    starts/ends may be (n,) or (n, E)."""
    W = mat.shape[1]
    flen = jnp.clip(ends - starts, 0, out_w).astype(jnp.int32)
    c = jnp.arange(out_w, dtype=jnp.int32)
    if starts.ndim == 1:
        idx = starts[:, None] + c[None, :]
        src = mat
    else:
        n, E = starts.shape
        idx = starts[:, :, None] + c[None, None, :]
        src = jnp.broadcast_to(mat[:, None, :], (n, E, W))
    got = jnp.take_along_axis(src, jnp.clip(idx, 0, W - 1), axis=-1)
    keep = c < flen[..., None]
    return jnp.where(keep, got, 0).astype(jnp.uint8), flen


def split_device(mat, lens, validity, delim: bytes, max_parts: int,
                 out_w: int):
    """→ (field_counts (n,), list_valid, elem_bytes (n,E,out_w),
    elem_lens (n,E), elem_valid (n,E), overflow (n,) bool)."""
    starts, ends, n_fields, overflow = split_fields(mat, lens, delim,
                                                    max_parts)
    eb, el = _extract_span(mat, starts, ends, out_w)
    E = max_parts
    ms = jnp.arange(E, dtype=jnp.int32)
    present = ms[None, :] < n_fields[:, None]
    counts = jnp.minimum(n_fields, E)
    return (jnp.where(validity, counts, 0), validity, eb,
            jnp.where(present, el, 0), present & validity[:, None],
            overflow & validity)


def split_part_device(mat, lens, validity, delim: bytes, part: int,
                      max_parts: int, out_w: int):
    """→ (bytes (n,out_w), lengths, validity, overflow, zero_part_err).
    part is a static literal (the Spark signature's int argument)."""
    starts, ends, n_fields, overflow = split_fields(mat, lens, delim,
                                                    max_parts)
    n = mat.shape[0]
    if part == 0:
        zero = jnp.ones(n, bool) & validity
        return (jnp.zeros((n, out_w), jnp.uint8), jnp.zeros(n, jnp.int32),
                validity, jnp.zeros(n, bool), zero)
    k = (jnp.full(n, part, jnp.int32) if part > 0
         else n_fields + jnp.int32(part + 1))
    ok = (k >= 1) & (k <= n_fields)
    f = jnp.clip(k - 1, 0, max_parts - 1)
    s = jnp.take_along_axis(starts, f[:, None], axis=1)[:, 0]
    e = jnp.take_along_axis(ends, f[:, None], axis=1)[:, 0]
    b, fl = _extract_span(mat, jnp.where(ok, s, 0),
                          jnp.where(ok, e, 0), out_w)
    return (b, jnp.where(ok, fl, 0), validity, overflow & validity,
            jnp.zeros(n, bool))


def substring_index_device(mat, lens, validity, delim: bytes, count: int,
                           max_parts: int, out_w: int):
    """→ (bytes (n,out_w), lengths, validity, overflow)."""
    n = mat.shape[0]
    L = len(delim)
    if count == 0:
        return (jnp.zeros((n, out_w), jnp.uint8), jnp.zeros(n, jnp.int32),
                validity, jnp.zeros(n, bool))
    if count > 0:
        starts, ends, n_fields, overflow = split_fields(mat, lens, delim,
                                                        max_parts)
        have = n_fields > count  # count-th delimiter exists
        f = jnp.clip(jnp.int32(count) - 1, 0, max_parts - 1)
        end = jnp.take_along_axis(ends, jnp.full((n, 1), f), axis=1)[:, 0]
        end = jnp.where(have, end, lens)
        b, fl = _extract_span(mat, jnp.zeros(n, jnp.int32), end, out_w)
        return b, fl, validity, overflow & validity
    # count < 0: occurrences from the right (single-byte delimiters only —
    # gated in ir/functions.py)
    assert L == 1, "right-scan substring_index requires a 1-byte delimiter"
    occ = nonoverlap_matches(mat, lens, delim)
    n_matches = jnp.sum(occ, axis=1).astype(jnp.int32)
    want = n_matches + jnp.int32(count)  # left rank of the cut match
    have = want >= 0
    rank = jnp.cumsum(occ.astype(jnp.int32), axis=1) - 1
    j = jnp.arange(mat.shape[1], dtype=jnp.int32)
    oh = occ & (rank == jnp.clip(want, 0, None)[:, None])
    pos = jnp.sum(oh * j[None, :], axis=1).astype(jnp.int32)
    start = jnp.where(have, pos + L, 0)
    b, fl = _extract_span(mat, start, lens, out_w)
    return b, fl, validity, jnp.zeros(n, bool)

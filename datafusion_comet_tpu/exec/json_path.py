"""Device-side JSON-path extraction (get_json_object) over byte matrices.

Reference surface: native/spark-expr/src/json_funcs/ evaluates Spark
get_json_object per row in native code. The TPU formulation is fully
vectorized over the (rows, width) uint8 matrix — no per-row host work:

- a quote-parity cumsum marks in-string bytes (backslash-escaped quotes
  handled by a previous-byte shift),
- a brace/bracket cumsum assigns every byte its container depth,
- each path step (`.key` / `[index]`) narrows a per-row [start, end) value
  span: key steps match `"key"` openers at the container's depth whose next
  non-space byte after the closing quote is ':'; index steps hop comma
  separators at the container's depth,
- the final span is rendered with Spark semantics: strings unquoted,
  `null` → SQL NULL, numbers/booleans/objects/arrays as the raw source
  span.

Supported subset (the host bridge in ir/functions.py remains the general
path): paths of `.key` and `[i]` steps (no wildcards/recursive descent),
documents without backslash escape sequences *inside* matched strings, and
valid JSON (malformed rows produce unspecified spans rather than NULL —
the host bridge validates). Spark re-serializes object/array results
compactly; this kernel returns the source span, identical for compact
source documents (docs/compatibility.md notes the whitespace deviation).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import ColumnVector

__all__ = ["parse_path", "device_get_json_object"]

_STEP = re.compile(r"\.([A-Za-z_][A-Za-z0-9_\-]*)|\[(\d+)\]|\['([^']*)'\]")


def parse_path(path: str) -> Optional[List[Union[str, int]]]:
    """Parse a Spark JSON path into key/index steps; None when the path
    uses features outside the device subset (wildcards, '..', quotes with
    escapes) — callers fall back to the host bridge."""
    if not path.startswith("$"):
        return None
    steps: List[Union[str, int]] = []
    pos = 1
    while pos < len(path):
        m = _STEP.match(path, pos)
        if m is None:
            return None
        if m.group(1) is not None:
            steps.append(m.group(1))
        elif m.group(2) is not None:
            steps.append(int(m.group(2)))
        else:
            steps.append(m.group(3))
        pos = m.end()
    return steps


def _take(a: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-row gather a[r, idx[r]] with clamped index."""
    return jnp.take_along_axis(a, jnp.clip(idx, 0, a.shape[1] - 1)[:, None],
                               axis=1)[:, 0]


def device_json_array_length(cv: ColumnVector) -> ColumnVector:
    """json_array_length on device: top-level element count of a JSON
    array via the same quote-parity + depth cumsums as the path kernel.

    Validation: first/last non-ws bytes are the '['/']' pair, depth stays
    >=1 inside the span and ends at 0, quotes balance. Deviation
    (docs/compatibility.md): token-level garbage a full parser would
    reject (e.g. ``[1,,2]``) still counts commas where Spark returns
    NULL."""
    import jax

    data = cv.data
    n, w = data.shape
    lens = cv.lengths.astype(jnp.int32)
    pos = jnp.arange(w, dtype=jnp.int32)
    in_len = pos[None, :] < lens[:, None]
    d = jnp.where(in_len, data, 0).astype(jnp.uint8)

    quote = d == ord('"')
    esc = jnp.concatenate(
        [jnp.zeros((n, 1), bool), (d == ord("\\"))[:, :-1]], axis=1)
    q = quote & ~esc
    cs = jnp.cumsum(q.astype(jnp.int32), axis=1)
    inside = ((cs - q.astype(jnp.int32)) % 2) == 1

    opens = ((d == ord("{")) | (d == ord("["))) & ~inside
    closes = ((d == ord("}")) | (d == ord("]"))) & ~inside
    depth = jnp.cumsum(opens.astype(jnp.int32) - closes.astype(jnp.int32),
                       axis=1)

    ws = (d == 32) | (d == 9) | (d == 10) | (d == 13)
    nonws = ~ws & in_len
    big = jnp.int32(w + 8)
    nw_pos = jnp.where(nonws, pos[None, :], big)
    first_nw = jnp.min(nw_pos, axis=1)
    last_nw = jnp.max(jnp.where(nonws, pos[None, :], -1), axis=1)

    def char_at(idx):
        return _take(d, jnp.clip(idx, 0, w - 1))

    is_arr = (char_at(first_nw) == ord("[")) & (first_nw < big)
    closes_ok = char_at(last_nw) == ord("]")
    depth_end = _take(depth, jnp.clip(last_nw, 0, w - 1))
    span = (pos[None, :] >= first_nw[:, None]) & (pos[None, :] < last_nw[:, None])
    min_depth = jnp.min(jnp.where(span, depth, big), axis=1)
    balanced = (cs[:, -1] % 2 == 0) & (depth_end == 0) & (min_depth >= 1)
    # empty array: next non-ws strictly after '[' is the closing ']'
    after_open = jnp.min(jnp.where(nonws & (pos[None, :] > first_nw[:, None]),
                                   pos[None, :], big), axis=1)
    empty = after_open == last_nw
    commas = jnp.sum(
        (d == ord(",")) & ~inside & (depth == 1) & span, axis=1
    ).astype(jnp.int32)
    count = jnp.where(empty, 0, commas + 1)
    valid = cv.validity & is_arr & closes_ok & balanced & (lens > 0)
    return ColumnVector(jnp.where(valid, count, 0), valid, None, T.INT32)


def device_get_json_object(cv: ColumnVector, steps: Sequence[Union[str, int]],
                           out_t: T.DataType) -> ColumnVector:
    data = cv.data
    n, w = data.shape
    lens = cv.lengths.astype(jnp.int32)
    pos = jnp.arange(w, dtype=jnp.int32)
    in_len = pos[None, :] < lens[:, None]
    d = jnp.where(in_len, data, 0).astype(jnp.uint8)

    quote = d == ord('"')
    esc = jnp.concatenate(
        [jnp.zeros((n, 1), bool), (d == ord("\\"))[:, :-1]], axis=1)
    q = quote & ~esc
    cs = jnp.cumsum(q.astype(jnp.int32), axis=1)
    inside = ((cs - q.astype(jnp.int32)) % 2) == 1  # string-state BEFORE byte

    opens = ((d == ord("{")) | (d == ord("["))) & ~inside
    closes = ((d == ord("}")) | (d == ord("]"))) & ~inside
    depth = jnp.cumsum(opens.astype(jnp.int32) - closes.astype(jnp.int32), axis=1)

    ws = (d == 32) | (d == 9) | (d == 10) | (d == 13)
    nonws = ~ws & in_len
    big = jnp.int32(w + 8)
    nw_pos = jnp.where(nonws, pos[None, :], big)
    # next non-ws at-or-after i / strictly-after i (suffix cummin)
    at_or_after = jax.lax.cummin(nw_pos[:, ::-1], axis=1)[:, ::-1]
    after = jnp.concatenate([at_or_after[:, 1:],
                             jnp.full((n, 1), big, jnp.int32)], axis=1)
    # previous non-ws at-or-before i (prefix cummax)
    before = jax.lax.cummax(jnp.where(nonws, pos[None, :], -1)[:, :], axis=1)

    def char_at(idx):
        return _take(d, idx)

    def next_nonws_after(idx):
        return _take(after, idx)

    def next_nonws_at(idx):
        return _take(at_or_after, idx)

    def first_in(mask, lo, hi):
        m = mask & (pos[None, :] >= lo[:, None]) & (pos[None, :] < hi[:, None])
        return jnp.argmax(m, axis=1).astype(jnp.int32), jnp.any(m, axis=1)

    # current value span [v0, ve) — starts as the whole (trimmed) document
    v0 = next_nonws_at(jnp.zeros(n, jnp.int32))
    last = _take(before, lens - 1)
    ve = (last + 1).astype(jnp.int32)
    ok = cv.validity & jnp.any(nonws, axis=1)

    pad = jnp.zeros((n, 8), jnp.uint8)

    for step in steps:
        dsel = _take(depth, v0)  # depth inside the container (after its open byte)
        # value-terminator bytes of this container: ',' at dsel, or the
        # container's own close (depth drops to dsel-1)
        end_mask = ~inside & (
            ((d == ord(",")) & (depth == dsel[:, None]))
            | (((d == ord("}")) | (d == ord("]"))) & (depth == (dsel - 1)[:, None]))
        )
        if isinstance(step, str):
            kb = np.frombuffer(step.encode("utf-8"), np.uint8)
            k = len(kb)
            dk = jnp.concatenate([d, pad[:, : k + 2]], axis=1)
            match = jnp.ones((n, w), bool)
            for j, byte in enumerate(kb):  # static unroll: key bytes
                match &= dk[:, 1 + j : 1 + j + w] == byte
            match &= dk[:, 1 + k : 1 + k + w] == ord('"')  # closing quote
            is_key = match & q & ~inside & (depth == dsel[:, None])
            is_obj = char_at(v0) == ord("{")
            mpos, found = first_in(is_key, v0 + 1, ve)
            # verify the colon on the first candidate; if it fails (a string
            # VALUE matched), step to the next candidate once more — string
            # values equal to `"key"` followed by ':' cannot occur in valid
            # JSON, so one retry suffices for the `{"a": "a", "a2": ...}`
            # shape where the matched text is a value, not a key.
            for _ in range(2):
                cpos = next_nonws_after(mpos + k + 1)
                colon_ok = char_at(cpos) == ord(":")
                mpos2, found2 = first_in(is_key, mpos + 1, ve)
                retry = found & ~colon_ok & found2
                mpos = jnp.where(retry, mpos2, mpos)
                found = found & (colon_ok | retry)
            cpos = next_nonws_after(mpos + k + 1)
            colon_ok = char_at(cpos) == ord(":")
            vs = next_nonws_after(cpos)
            enew, has_end = first_in(end_mask, vs, ve + 1)
            ok = ok & is_obj & found & colon_ok & has_end
            v0 = vs
            ve_raw = enew
        else:
            is_arr = char_at(v0) == ord("[")
            cur = next_nonws_after(v0)
            found = is_arr & (char_at(cur) != ord("]"))  # non-empty array
            comma_mask = ~inside & (d == ord(",")) & (depth == dsel[:, None])
            for _ in range(int(step)):  # static unroll: element index
                cpos, has = first_in(comma_mask, cur, ve)
                found = found & has
                cur = next_nonws_after(cpos)
            enew, has_end = first_in(end_mask, cur, ve + 1)
            ok = ok & found & has_end
            v0 = cur
            ve_raw = enew
        # trim trailing whitespace inside the span
        lastn = _take(before, jnp.maximum(ve_raw - 1, 0))
        ve = jnp.maximum(lastn + 1, v0).astype(jnp.int32)

    # render: strip quotes for strings; `null` -> SQL NULL; else raw span
    first_c = char_at(v0)
    is_str = first_c == ord('"')
    span = ve - v0
    nul = (span == 4) \
        & (char_at(v0) == ord("n")) & (char_at(v0 + 1) == ord("u")) \
        & (char_at(v0 + 2) == ord("l")) & (char_at(v0 + 3) == ord("l"))
    start = jnp.where(is_str, v0 + 1, v0)
    out_len_row = jnp.where(is_str, jnp.maximum(span - 2, 0), span)
    ow = out_t.byte_width
    gather = jnp.clip(start[:, None] + jnp.arange(ow, dtype=jnp.int32)[None, :], 0, w - 1)
    out = jnp.take_along_axis(d, gather, axis=1)
    out_len_row = jnp.minimum(out_len_row, ow).astype(jnp.int32)
    opos = jnp.arange(ow, dtype=jnp.int32)
    out = jnp.where(opos[None, :] < out_len_row[:, None], out, 0)
    # unescape string results (Spark returns the decoded value): drop the
    # backslash of \" and \\ pairs by stable-compacting the kept bytes
    bs = out == ord("\\")
    esc2 = jnp.concatenate([jnp.zeros((n, 1), bool), bs[:, :-1]], axis=1)
    escaper = bs & ~esc2  # a backslash that starts an escape pair
    drop = is_str[:, None] & escaper & (opos[None, :] < out_len_row[:, None])
    keep_pos = jnp.where(drop, jnp.int32(ow + 1), opos[None, :])
    order = jnp.argsort(keep_pos, axis=1, stable=True)
    unesc = jnp.take_along_axis(out, order, axis=1)
    out = jnp.where(is_str[:, None], unesc, out)
    out_len_row = out_len_row - jnp.where(
        is_str, drop.sum(axis=1).astype(jnp.int32), 0)
    out = jnp.where(opos[None, :] < out_len_row[:, None], out, 0)
    validity = ok & ~nul
    return ColumnVector(out, validity, jnp.where(validity, out_len_row, 0), out_t)

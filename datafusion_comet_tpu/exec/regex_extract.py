"""Device regexp_extract for linear (backtracking-free) patterns.

Reference contract: Spark regexp_extract via java.util.regex — leftmost
match, greedy quantifiers, group ``idx`` substring, "" on no match /
unmatched group (reference kernel:
native/spark-expr/src/string_funcs/regexp_extract.rs).

TPU-first formulation: a tagged-DFA is replaced by a *segment chain* —
patterns that are one concatenation of literal runs and class-repeats
(optionally inside single-level capture groups) evaluate as a vectorized
position chain: per-class run-length tables (one reverse cummax per class),
then one take_along_axis per segment advances every candidate start
position at once; the leftmost surviving start is an argmin. Greedy-per-
segment equals java.util.regex EXACTLY when no backtracking can occur,
which ``linearize`` guarantees by rejecting any variable-length segment
whose charset intersects the first-byte set of a following *required*
segment. Everything else (alternation, nested/repeated groups, overlapping
var-length segments) falls back to the host bridge (ir/functions.py).

Rows are processed in tiles via lax.map so the (rows × width) position
tables never exceed a bounded HBM footprint.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import FrozenSet, List, Optional, Tuple

import numpy as np

from datafusion_comet_tpu.exec.regex_dfa import (
    _DIGIT, _DOT, _SPACE, _WORD, _ALL)

__all__ = ["linearize", "extract_device"]


@dataclasses.dataclass(frozen=True)
class Seg:
    charset: Optional[FrozenSet[int]]  # None => literal
    lit: Optional[bytes]
    mn: int
    mx: Optional[int]  # None = unbounded
    group: Optional[int]  # enclosing single-level group id (1-based)

    @property
    def variable(self) -> bool:
        return self.mx is None or self.mx > self.mn


@dataclasses.dataclass(frozen=True)
class LinearPattern:
    segs: Tuple[Seg, ...]
    anchored_start: bool
    anchored_end: bool
    n_groups: int


class _Reject(Exception):
    pass


def _parse(pattern: str) -> LinearPattern:
    b = pattern.encode("utf-8")
    i = 0
    segs: List[Seg] = []
    group = None
    n_groups = 0
    anchored_start = False
    anchored_end = False

    def atom() -> Tuple[Optional[FrozenSet[int]], Optional[bytes]]:
        nonlocal i
        c = b[i]
        if c == ord("."):
            i += 1
            return _DOT, None
        if c == ord("["):
            i += 1
            neg = i < len(b) and b[i] == ord("^")
            if neg:
                i += 1
            out: set = set()
            first = True
            while i < len(b) and (b[i] != ord("]") or first):
                first = False
                if b[i] == ord("\\") and i + 1 < len(b):
                    out |= _escape_set(b[i + 1])
                    i += 2
                    continue
                lo = b[i]
                if i + 2 < len(b) and b[i + 1] == ord("-") and b[i + 2] != ord("]"):
                    hi = b[i + 2]
                    out |= set(range(lo, hi + 1))
                    i += 3
                else:
                    out.add(lo)
                    i += 1
            if i >= len(b):
                raise _Reject("unterminated class")
            i += 1  # ']'
            return (frozenset(_ALL - out) if neg else frozenset(out)), None
        if c == ord("\\") and i + 1 < len(b):
            nxt = b[i + 1]
            i += 2
            es = _escape_set(nxt)
            if len(es) == 1:
                return None, bytes([next(iter(es))])
            return es, None
        if c in b"(){}|*+?^$":
            raise _Reject(f"unexpected {chr(c)}")
        i += 1
        return None, bytes([c])

    def postfix() -> Optional[Tuple[int, Optional[int]]]:
        nonlocal i
        if i >= len(b):
            return None
        c = b[i]
        if c == ord("*"):
            i += 1
            return (0, None)
        if c == ord("+"):
            i += 1
            return (1, None)
        if c == ord("?"):
            i += 1
            return (0, 1)
        if c == ord("{"):
            j = b.find(b"}", i)
            if j < 0:
                raise _Reject("unterminated brace")
            body = b[i + 1 : j].decode()
            i = j + 1
            if "," in body:
                m_s, n_s = body.split(",", 1)
                mn = int(m_s) if m_s else 0
                mx = int(n_s) if n_s.strip() else None
            else:
                mn = mx = int(body)
            return (mn, mx)
        return None

    while i < len(b):
        c = b[i]
        if c == ord("^"):
            if segs or group is not None:
                raise _Reject("interior ^")
            anchored_start = True
            i += 1
            continue
        if c == ord("$"):
            if i != len(b) - 1:
                raise _Reject("interior $")
            anchored_end = True
            i += 1
            continue
        if c == ord("|"):
            raise _Reject("alternation")
        if c == ord("("):
            if group is not None:
                raise _Reject("nested group")
            if b[i : i + 3] == b"(?:":
                raise _Reject("non-capturing group")  # keep it simple
            n_groups += 1
            group = n_groups
            i += 1
            continue
        if c == ord(")"):
            if group is None:
                raise _Reject("unbalanced )")
            group = None
            i += 1
            if postfix() is not None:
                raise _Reject("repeated group")
            continue
        cs, lit = atom()
        rep = postfix()
        if rep is None:
            if lit is not None and segs and segs[-1].lit is not None \
                    and segs[-1].group == group and segs[-1].mn == segs[-1].mx == 1:
                prev = segs.pop()
                segs.append(Seg(None, prev.lit + lit, 1, 1, group))
            else:
                segs.append(Seg(cs, lit, 1, 1, group))
            continue
        mn, mx = rep
        if lit is not None:
            cs = frozenset(lit)
            lit = None
        segs.append(Seg(cs, lit, mn, mx, group))
    if group is not None:
        raise _Reject("unbalanced (")
    return LinearPattern(tuple(segs), anchored_start, anchored_end, n_groups)


def _escape_set(c: int) -> FrozenSet[int]:
    m = {
        ord("d"): _DIGIT, ord("D"): frozenset(_ALL - _DIGIT),
        ord("w"): _WORD, ord("W"): frozenset(_ALL - _WORD),
        ord("s"): _SPACE, ord("S"): frozenset(_ALL - _SPACE),
        ord("n"): frozenset({0x0A}), ord("t"): frozenset({0x09}),
        ord("r"): frozenset({0x0D}),
    }
    if c in m:
        return m[c]
    return frozenset({c})


def _first_set(seg: Seg) -> FrozenSet[int]:
    if seg.lit is not None:
        return frozenset(seg.lit[:1])
    return seg.charset or frozenset()


@lru_cache(maxsize=256)
def linearize(pattern: str, idx: int = 1) -> Optional[LinearPattern]:
    """Compile ``pattern`` for the device chain, or None when it needs the
    host bridge (unsupported syntax, possible backtracking, or group idx
    out of range)."""
    try:
        lp = _parse(pattern)
    except (_Reject, ValueError, IndexError):
        return None
    if idx > lp.n_groups:
        return None
    segs = lp.segs
    for i, s in enumerate(segs):
        if not s.variable or s.charset is None:
            continue
        # greedy-no-backtrack soundness: the charset of a variable segment
        # must be disjoint from the first bytes of every following segment
        # up to and including the first REQUIRED one
        for t in segs[i + 1:]:
            if s.charset & _first_set(t):
                return None
            if t.mn > 0:
                break
        else:
            # pattern tail all-optional: greedy eats to end — fine unless
            # the pattern is end-anchored with overlap (handled above)
            pass
    return lp


def _match_tables(mat, lens, lp: "LinearPattern", tabs, idxW):
    """Per-start-position match tables for one row tile: (ok (r,W) — a
    greedy match starts here, start, cur — its end position, gstart/gend —
    group span tables). The shared core of extract and replace."""
    import jax
    import jax.numpy as jnp

    W = mat.shape[1]
    in_len = idxW[None, :] < lens[:, None]

    runs = {}
    for cs, tab in tabs.items():
        M = jnp.take(tab, mat.astype(jnp.int32)) & in_len
        Mr = M[:, ::-1]
        brk = jnp.where(~Mr, idxW[None, :], -1)
        lastbrk = jax.lax.cummax(brk, axis=1)
        runs[cs] = (idxW[None, :] - lastbrk)[:, ::-1]

    lits = {}
    for s in lp.segs:
        if s.lit is not None and s.lit not in lits:
            ok = jnp.ones((mat.shape[0], W), bool)
            for k, byte in enumerate(s.lit):
                eq = mat == np.uint8(byte)
                # match byte k at position p+k: shift left by k
                if k:
                    eq = jnp.concatenate(
                        [eq[:, k:], jnp.zeros((mat.shape[0], k), bool)],
                        axis=1)
                ok = ok & eq
            # all bytes must lie inside the string
            ok = ok & ((idxW[None, :] + len(s.lit)) <= lens[:, None])
            lits[s.lit] = ok

    cur = jnp.broadcast_to(idxW[None, :], mat.shape).astype(jnp.int32)
    ok = cur <= lens[:, None]  # a match may start at any pos ≤ len
    if lp.anchored_start:
        ok = ok & (cur == 0)
    start = cur
    gstart = {}
    gend = {}
    for s in lp.segs:
        if s.group is not None and s.group not in gstart:
            gstart[s.group] = cur
        safe = jnp.clip(cur, 0, W - 1)
        inb = cur < W
        if s.lit is not None:
            hit = jnp.take_along_axis(lits[s.lit], safe, axis=1) & inb
            ok = ok & hit
            cur = cur + len(s.lit)
        else:
            r = jnp.where(inb, jnp.take_along_axis(runs[s.charset], safe,
                                                   axis=1), 0)
            take = r if s.mx is None else jnp.minimum(r, s.mx)
            ok = ok & (r >= s.mn)
            cur = cur + take
        if s.group is not None:
            gend[s.group] = cur  # overwritten until the group closes
    if lp.anchored_end:
        ok = ok & (cur == lens[:, None])
    return ok, start, cur, gstart, gend


def _charset_tables(lp: "LinearPattern"):
    import jax.numpy as jnp

    charsets = []
    for s in lp.segs:
        if s.charset is not None and s.charset not in charsets:
            charsets.append(s.charset)
    return {
        cs: jnp.asarray(np.array([b in cs for b in range(256)], bool))
        for cs in charsets
    }


def min_match_len(lp: "LinearPattern") -> int:
    """Minimum bytes a match can span (0 = can match empty — replace
    rejects those: Java advances one char on empty matches, a semantic the
    vectorized scan doesn't model)."""
    return sum((len(s.lit) if s.lit is not None else s.mn) for s in lp.segs)


def replace_device(data, lengths, validity, lp: "LinearPattern",
                   repl: bytes, out_width: int):
    """regexp_replace with a LITERAL replacement over all non-overlapping
    leftmost greedy matches: the per-position match table marks every
    candidate, a W-step scan resolves non-overlap (carry = next allowed
    start), kept bytes and replacement bytes scatter to their computed
    output columns (OOB drops via scatter mode). Returns (out_bytes,
    out_lens, overflow (n,) — output exceeded out_width)."""
    import jax
    import jax.numpy as jnp

    n, W = data.shape
    R = len(repl)
    tile = max(1, min(n, (1 << 22) // max(W, 1)))
    pad = (-n) % tile
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    nt = (n + pad) // tile
    tabs = _charset_tables(lp)
    idxW = jnp.arange(W, dtype=jnp.int32)
    repl_arr = np.frombuffer(repl, np.uint8)

    def tile_fn(args):
        mat, lens = args
        r = mat.shape[0]
        ok, start, cur, _, _ = _match_tables(mat, lens, lp, tabs, idxW)
        mlen = jnp.clip(cur - start, 1, None)  # min_match_len>0 enforced

        # non-overlap left-to-right: a candidate is real iff it starts at
        # or after the previous real match's end
        def step(nxt, col):
            ok_j, end_j, j = col
            take = ok_j & (j >= nxt)
            nxt = jnp.where(take, end_j, nxt)
            return nxt, take

        _, real_t = jax.lax.scan(
            step, jnp.zeros(r, jnp.int32),
            (ok.T, cur.T, idxW))
        real = real_t.T  # (r, W)

        in_len = idxW[None, :] < lens[:, None]
        # bytes inside any real match are dropped: mark via +1/-1 fences
        inc = jnp.zeros((r, W + 1), jnp.int32)
        rows = jnp.broadcast_to(jnp.arange(r)[:, None], (r, W))
        inc = inc.at[rows, jnp.where(real, idxW[None, :], W)].add(
            jnp.where(real, 1, 0))
        ends = jnp.clip(jnp.where(real, cur, W), 0, W)
        inc = inc.at[rows, ends].add(jnp.where(real, -1, 0))
        inside = jnp.cumsum(inc[:, :W], axis=1) > 0
        kept = in_len & ~inside

        kept_before_inc = jnp.cumsum(kept.astype(jnp.int32), axis=1)
        real_before_inc = jnp.cumsum(real.astype(jnp.int32), axis=1)
        out = jnp.zeros((r, out_width), jnp.uint8)
        # kept byte j → column (#kept ≤ j) - 1 + R × (#real starts ≤ j)
        kcol = kept_before_inc - 1 + R * real_before_inc
        kcol = jnp.where(kept, kcol, out_width)  # OOB → dropped
        out = out.at[rows, kcol].set(jnp.where(kept, mat, 0), mode="drop")
        # replacement for match at j → base = (#kept < j) + R × (#real < j)
        base = (kept_before_inc - kept.astype(jnp.int32)) + \
            R * (real_before_inc - 1)
        for k in range(R):
            c = jnp.where(real, base + k, out_width)
            out = out.at[rows, c].set(
                jnp.where(real, jnp.uint8(repl_arr[k]), 0), mode="drop")
        out_len = (jnp.sum(kept, axis=1) +
                   R * jnp.sum(real, axis=1)).astype(jnp.int32)
        overflow = out_len > out_width
        return out, jnp.minimum(out_len, out_width), overflow

    data_t = data.reshape(nt, tile, W)
    lens_t = lengths.reshape(nt, tile)
    out_b, out_l, ovf = jax.lax.map(tile_fn, (data_t, lens_t))
    out_b = out_b.reshape(nt * tile, out_width)[:n]
    out_l = out_l.reshape(nt * tile)[:n]
    ovf = ovf.reshape(nt * tile)[:n]
    return out_b, out_l, ovf & validity


def extract_all_device(data, lengths, validity, lp: "LinearPattern",
                       idx: int, max_parts: int, out_width: int):
    """regexp_extract_all: every non-overlapping leftmost greedy match's
    group ``idx`` as a padded LIST<STRING> plane. Returns (counts (n,),
    elem_bytes (n, E, out_width), elem_lens (n, E), elem_valid (n, E),
    overflow (n,) — more than E matches)."""
    import jax
    import jax.numpy as jnp

    n, W = data.shape
    E_ = max_parts
    tile = max(1, min(n, (1 << 21) // max(W, 1)))
    pad = (-n) % tile
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    nt = (n + pad) // tile
    tabs = _charset_tables(lp)
    idxW = jnp.arange(W, dtype=jnp.int32)

    def tile_fn(args):
        mat, lens = args
        r = mat.shape[0]
        ok, start, cur, gstart, gend = _match_tables(mat, lens, lp, tabs,
                                                     idxW)

        def step(nxt, col):
            ok_j, end_j, j = col
            take = ok_j & (j >= nxt)
            nxt = jnp.where(take, jnp.maximum(end_j, j + 1), nxt)
            return nxt, take

        _, real_t = jax.lax.scan(step, jnp.zeros(r, jnp.int32),
                                 (ok.T, cur.T, idxW))
        real = real_t.T
        s_tab = start if idx == 0 else gstart[idx]
        e_tab = cur if idx == 0 else gend[idx]
        rank = jnp.cumsum(real.astype(jnp.int32), axis=1) - 1
        ms = jnp.arange(E_, dtype=jnp.int32)
        oh = real[:, None, :] & (rank[:, None, :] == ms[None, :, None])
        s_m = jnp.sum(oh * s_tab[:, None, :], axis=-1).astype(jnp.int32)
        e_m = jnp.sum(oh * e_tab[:, None, :], axis=-1).astype(jnp.int32)
        has = jnp.any(oh, axis=-1)
        n_m = jnp.sum(real, axis=1).astype(jnp.int32)
        flen = jnp.where(has, jnp.clip(e_m - s_m, 0, out_width), 0)
        c = jnp.arange(out_width, dtype=jnp.int32)
        src = jnp.clip(s_m[:, :, None] + c[None, None, :], 0, W - 1)
        got = jnp.take_along_axis(
            jnp.broadcast_to(mat[:, None, :], (r, E_, W)), src, axis=-1)
        got = jnp.where(c[None, None, :] < flen[:, :, None], got, 0)
        return (jnp.minimum(n_m, E_), got.astype(jnp.uint8),
                flen.astype(jnp.int32), has, n_m > E_)

    data_t = data.reshape(nt, tile, W)
    lens_t = lengths.reshape(nt, tile)
    cnt, eb, el, ev, ovf = jax.lax.map(tile_fn, (data_t, lens_t))
    m = nt * tile
    return (cnt.reshape(m)[:n], eb.reshape(m, E_, out_width)[:n],
            el.reshape(m, E_)[:n], ev.reshape(m, E_)[:n],
            ovf.reshape(m)[:n] & validity)


def extract_device(data, lengths, validity, lp: LinearPattern, idx: int,
                   out_width: int):
    """(n, W) uint8 bytes + lengths → (out_bytes (n, out_width), out_lens,
    out_valid) for group ``idx`` of the leftmost greedy match."""
    import jax
    import jax.numpy as jnp

    n, W = data.shape
    tile = max(1, min(n, (1 << 22) // max(W, 1)))
    # pad rows to a multiple of the tile
    pad = (-n) % tile
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    nt = (n + pad) // tile

    # per-distinct-charset 256-entry membership tables (trace constants)
    charsets = []
    for s in lp.segs:
        if s.charset is not None and s.charset not in charsets:
            charsets.append(s.charset)
    tabs = {
        cs: jnp.asarray(np.array([b in cs for b in range(256)], bool))
        for cs in charsets
    }

    idxW = jnp.arange(W, dtype=jnp.int32)

    def tile_fn(args):
        mat, lens = args
        ok, start, cur, gstart, gend = _match_tables(mat, lens, lp, tabs,
                                                     idxW)
        W = mat.shape[1]
        big = jnp.int32(W + 1)
        j_star = jnp.argmin(jnp.where(ok, start, big), axis=1)
        found = jnp.any(ok, axis=1)
        jcol = j_star[:, None]
        if idx == 0:
            s0 = jnp.take_along_axis(start, jcol, axis=1)[:, 0]
            e0 = jnp.take_along_axis(cur, jcol, axis=1)[:, 0]
        else:
            s0 = jnp.take_along_axis(gstart[idx], jcol, axis=1)[:, 0]
            e0 = jnp.take_along_axis(gend[idx], jcol, axis=1)[:, 0]
        glen = jnp.where(found, jnp.clip(e0 - s0, 0, out_width), 0)
        oidx = jnp.arange(out_width, dtype=jnp.int32)
        src = jnp.clip(s0[:, None] + oidx[None, :], 0, W - 1)
        out = jnp.take_along_axis(mat, src, axis=1)[:, :out_width]
        out = jnp.where(oidx[None, :] < glen[:, None], out, 0).astype(jnp.uint8)
        return out, glen.astype(jnp.int32)

    data_t = data.reshape(nt, tile, W)
    lens_t = lengths.reshape(nt, tile)
    out_b, out_l = jax.lax.map(tile_fn, (data_t, lens_t))
    out_b = out_b.reshape(nt * tile, out_width)[:n]
    out_l = out_l.reshape(nt * tile)[:n]
    return out_b, out_l, validity

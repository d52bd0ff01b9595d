"""Device format_number: fixed-decimal + thousands-grouped rendering.

Spark's format_number(v, d) (reference: spark-expr string formatting via
Java String.format("%,.df")): round to d decimals (HALF_EVEN — Python
round/jnp.round parity with the retained host bridge), comma-group the
integer part, always emit d fractional digits.

TPU formulation: the value becomes one scaled int64 magnitude; every
output character position maps STATICALLY (given d) to a digit power,
comma slot, '.', or sign in a right-aligned frame — a static unrolled
column loop of int div/mod ops — and ONE take_along_axis left-aligns the
frame. Non-finite floats render 'nan'/'inf'/'-inf' (the Python format
behavior of the host bridge); values whose scaled magnitude overflows
int64 raise through the ANSI error channel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["format_grouped", "scale_to_int"]


def scale_to_int(data: jax.Array, in_scale: int, decimals: int
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(unscaled int64 at scale ``in_scale``) → (|m| at scale ``decimals``,
    negative, overflow). HALF_EVEN when downscaling."""
    v = data.astype(jnp.int64)
    neg = v < 0
    mag = jnp.where(neg, -v, v)
    if decimals >= in_scale:
        f = 10 ** (decimals - in_scale)
        lim = (2**63 - 1) // f
        ovf = mag > lim
        m = mag * jnp.int64(f)
    else:
        q = 10 ** (in_scale - decimals)
        t = mag // q
        r = mag % q
        half = q // 2
        rup = (r > half) | ((r == half) & (t % 2 == 1))
        m = t + rup.astype(jnp.int64)
        ovf = jnp.zeros_like(neg)
    return m, neg, ovf


def format_grouped(mag: jax.Array, neg: jax.Array, decimals: int,
                   width: int,
                   is_nan=None, is_inf=None
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(|m| scaled-int64, negative) → (chars (n, width) uint8, lengths,
    too_wide). ``mag`` holds value×10^decimals."""
    n = mag.shape[0]
    d = decimals
    base = d + (1 if d else 0)
    # digits of the integer part (power >= d); int64 holds <= 19 digits
    NI = 19
    ip = mag // jnp.int64(10 ** d) if d else mag
    ni = jnp.ones(n, jnp.int32)
    for k in range(1, NI):  # 10^19 would overflow int64; ip <= 9.2e18
        ni = jnp.where(ip >= jnp.int64(10 ** k), k + 1, ni)
    length = base + ni + (ni - 1) // 3 + neg.astype(jnp.int32)

    wmax = base + NI + (NI - 1) // 3 + 1  # 27 + base
    cols = []
    for r in range(wmax):
        if d and r < d:
            ch = ((mag // jnp.int64(10 ** r)) % 10 + ord("0")).astype(jnp.int32)
        elif d and r == d:
            ch = jnp.full(n, ord("."), jnp.int32)
        else:
            rp = r - base
            if rp % 4 == 3:  # comma slot
                emit = ni > 3 * (rp // 4 + 1)
                ch = jnp.where(emit, ord(","), 0)
            else:
                j = rp - rp // 4  # integer digit index from the right
                p = d + j
                if p >= 19:  # 10^19 overflows int64; such digits are 0
                    ch = jnp.zeros(n, jnp.int32)
                else:
                    dig = ((mag // jnp.int64(10 ** p)) % 10 + ord("0"))
                    ch = jnp.where(j < ni, dig.astype(jnp.int32), 0)
        # the sign overwrites the first empty slot: right-offset length-1
        ch = jnp.where(neg & (r == length - 1), ord("-"), ch)
        ch = jnp.where(r < length, ch, 0)
        cols.append(ch)
    rev = jnp.stack(cols, axis=1)  # (n, wmax) right-aligned, reversed
    k = jnp.arange(width, dtype=jnp.int32)
    idx = jnp.clip(length[:, None] - 1 - k[None, :], 0, wmax - 1)
    out = jnp.take_along_axis(rev, idx, axis=1)[:, :width]
    out = jnp.where(k[None, :] < length[:, None], out, 0).astype(jnp.uint8)
    lens = length
    if is_nan is not None:
        NAN = np.frombuffer(b"nan", np.uint8)
        INF = np.frombuffer(b"-inf", np.uint8)
        for i, c in enumerate(NAN):
            if i < width:
                out = out.at[:, i].set(
                    jnp.where(is_nan, c, out[:, i]))
        inf_chars = jnp.where(neg[:, None],
                              jnp.asarray(INF)[None, :],
                              jnp.pad(jnp.asarray(INF[1:]), (0, 1))[None, :])
        for i in range(4):
            if i < width:
                out = out.at[:, i].set(
                    jnp.where(is_inf, inf_chars[:, i], out[:, i]))
        lens = jnp.where(is_nan, 3, lens)
        lens = jnp.where(is_inf, jnp.where(neg, 4, 3), lens)
    too_wide = lens > width
    return out, jnp.minimum(lens, width).astype(jnp.int32), too_wide

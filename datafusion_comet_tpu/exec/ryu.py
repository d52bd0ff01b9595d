"""Java shortest-representation float/double → string (Ryu) on device.

Spark's ``cast(float|double as string)`` must produce Java's
``Double.toString`` / ``Float.toString`` output: the SHORTEST decimal digit
string that round-trips, formatted plainly for 1e-3 <= |v| < 1e7 and as
``d.dddE±x`` scientific otherwise (reference kernel:
native/spark-expr/src/conversion_funcs/cast.rs float-to-string paths).

TPU-first formulation of the Ryu algorithm (Adams, PLDI'18):
- no f64 bitcast exists under the TPU X64 rewrite, so the (mantissa,
  exponent) decomposition is arithmetic (sortkeys.f64_decompose);
- the 64x128 multiply-shift against the precomputed 5^±q tables runs on
  int64 lanes via utils/int128's 32-bit-limb multiplies;
- the data-dependent digit-stripping loop becomes two fixed 17-iteration
  masked loops (every lane runs all iterations; VPU div/mod only);
- per-lane table entries are two gathers (hi/lo) indexed by q.

Known deviation (documented): TPU flushes f64 subnormals to zero, so
subnormal inputs print "0.0" on TPU (exact on CPU backend where tests run).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu.utils import int128 as I128

__all__ = ["shortest_digits", "format_java"]

_POW5_INV_BITCOUNT = 125
_POW5_BITCOUNT = 125


def _pow5bits(e: int) -> int:
    # ceil(log2(5^e)) + 1-ish bound used by ryu; exact for 0 <= e <= 3528
    return ((e * 1217359) >> 19) + 1


def _build_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    inv_hi = np.zeros(342, np.int64)
    inv_lo = np.zeros(342, np.int64)
    for q in range(342):
        pow5 = 5 ** q
        j = _pow5bits(q) - 1 + _POW5_INV_BITCOUNT
        inv = (1 << j) // pow5 + 1
        inv_hi[q] = np.int64(np.uint64((inv >> 64) & 0xFFFFFFFFFFFFFFFF))
        inv_lo[q] = np.int64(np.uint64(inv & 0xFFFFFFFFFFFFFFFF))
    pw_hi = np.zeros(326, np.int64)
    pw_lo = np.zeros(326, np.int64)
    for i in range(326):
        pow5 = 5 ** i
        ln = pow5.bit_length()
        if ln > _POW5_BITCOUNT:
            ent = pow5 >> (ln - _POW5_BITCOUNT)
        else:
            ent = pow5 << (_POW5_BITCOUNT - ln)
        pw_hi[i] = np.int64(np.uint64((ent >> 64) & 0xFFFFFFFFFFFFFFFF))
        pw_lo[i] = np.int64(np.uint64(ent & 0xFFFFFFFFFFFFFFFF))
    return inv_hi, inv_lo, pw_hi, pw_lo


_INV_HI, _INV_LO, _PW_HI, _PW_LO = _build_tables()
_POW5_SMALL = np.array([5 ** i for i in range(27)], np.int64)  # 5^26 < 2^63


def _lshr(x: jax.Array, s: jax.Array) -> jax.Array:
    """Logical right shift of u64-in-int64 by per-lane s in [0, 63]."""
    return jnp.where(s == 0, x, (x >> s) & ((jnp.int64(1) << (64 - s)) - 1))


def _mul_shift64(m: jax.Array, mul_hi: jax.Array, mul_lo: jax.Array,
                 j: jax.Array) -> jax.Array:
    """(m * (mul_hi<<64 | mul_lo)) >> j for 64 < j < 128; result fits u64.
    m is nonnegative (< 2^56); mul limbs are u64 stored in int64."""
    b0_hi, _ = I128._mul_ulimb(mul_lo, m)   # keep only high 64 of m*lo
    b2_hi, b2_lo = I128._mul_ulimb(mul_hi, m)
    s_lo, carry = I128._u64_add_carry(b2_lo, b0_hi)
    s_hi = b2_hi + carry
    s = j - 64  # in (0, 64)
    # (s_hi:s_lo) >> s, result < 2^64
    lo_part = _lshr(s_lo, s)
    hi_part = jnp.where(s == 0, jnp.int64(0), s_hi << (64 - s))
    return lo_part | hi_part


def _mult_pow5(val: jax.Array, p: jax.Array) -> jax.Array:
    """val % 5^p == 0 (p in [0, 26]; direct modulus, values < 2^58)."""
    d = jnp.take(jnp.asarray(_POW5_SMALL), jnp.clip(p, 0, 26))
    return (val % d) == 0


def shortest_digits(
    mant: jax.Array, e2raw: jax.Array, mant_is_zero: jax.Array,
    min_exp: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Core Ryu: IEEE (mantissa-with-hidden-bit, e2 = unbiased_exp - mbits)
    → (digits int64, decimal exponent e10) such that value = digits * 10^e10
    and digits is the shortest round-tripping representation.

    mant: int64 significand including the hidden bit (2^52|m52 for doubles,
    2^23|m23 for floats); e2raw: int32 binary exponent of the LSB;
    mant_is_zero: the stored fraction bits were zero (boundary shift);
    min_exp: True where the value is at the format's minimum exponent
    (lower boundary is a full ulp there)."""
    m2 = mant.astype(jnp.int64)
    e2 = e2raw.astype(jnp.int32) - 2
    even = (m2 & 1) == 0
    accept = even
    # boundary below is half-ulp except at a power-of-two mantissa (unless
    # at the minimum exponent)
    mm_shift = jnp.where(mant_is_zero & ~min_exp, 0, 1).astype(jnp.int64)
    mv = 4 * m2
    mp = 4 * m2 + 2
    mm = 4 * m2 - 1 - mm_shift

    # ---- branch e2 >= 0 -------------------------------------------------
    e2p = jnp.maximum(e2, 0)
    q_a = (e2p * 78913) >> 18
    q_a = jnp.maximum(q_a - (e2p > 3), 0)
    k_a = _POW5_INV_BITCOUNT + (((q_a * 1217359) >> 19) + 1) - 1
    j_a = -e2p + q_a + k_a
    qa_c = jnp.clip(q_a, 0, 341)
    ih = jnp.take(jnp.asarray(_INV_HI), qa_c)
    il = jnp.take(jnp.asarray(_INV_LO), qa_c)
    vr_a = _mul_shift64(mv, ih, il, j_a)
    vp_a = _mul_shift64(mp, ih, il, j_a)
    vm_a = _mul_shift64(mm, ih, il, j_a)
    e10_a = q_a
    small_a = q_a <= 21
    mv_div5 = (mv % 5) == 0
    vr_tz_a = small_a & mv_div5 & _mult_pow5(mv, q_a)
    vm_tz_a = small_a & ~mv_div5 & accept & _mult_pow5(mm, q_a)
    vp_dec_a = small_a & ~mv_div5 & ~accept & _mult_pow5(mp, q_a)
    vp_a = vp_a - vp_dec_a.astype(jnp.int64)

    # ---- branch e2 < 0 --------------------------------------------------
    ne2 = jnp.maximum(-e2, 0)
    q_b = (ne2 * 732923) >> 20
    q_b = jnp.maximum(q_b - (ne2 > 1), 0)
    i_b = ne2 - q_b
    k_b = (((i_b * 1217359) >> 19) + 1) - _POW5_BITCOUNT
    j_b = q_b - k_b
    ib_c = jnp.clip(i_b, 0, 325)
    ph = jnp.take(jnp.asarray(_PW_HI), ib_c)
    pl = jnp.take(jnp.asarray(_PW_LO), ib_c)
    vr_b = _mul_shift64(mv, ph, pl, j_b)
    vp_b = _mul_shift64(mp, ph, pl, j_b)
    vm_b = _mul_shift64(mm, ph, pl, j_b)
    e10_b = q_b + e2
    q_le1 = q_b <= 1
    vr_tz_b = jnp.where(q_le1, True,
                        (q_b < 63) & ((mv & ((jnp.int64(1) << jnp.minimum(q_b, 62)) - 1)) == 0))
    vm_tz_b = q_le1 & accept & (mm_shift == 1)
    vp_dec_b = q_le1 & ~accept
    vp_b = vp_b - vp_dec_b.astype(jnp.int64)

    pos = e2 >= 0
    vr = jnp.where(pos, vr_a, vr_b)
    vp = jnp.where(pos, vp_a, vp_b)
    vm = jnp.where(pos, vm_a, vm_b)
    e10 = jnp.where(pos, e10_a, e10_b)
    vr_tz = jnp.where(pos, vr_tz_a, vr_tz_b)
    vm_tz = jnp.where(pos, vm_tz_a, vm_tz_b)

    # ---- digit stripping (two fixed masked loops) -----------------------
    removed = jnp.zeros_like(vr, jnp.int32)
    last = jnp.zeros_like(vr)

    def strip1(_, st):
        vr, vp, vm, vm_tz, vr_tz, last, removed = st
        go = (vp // 10) > (vm // 10)
        vm_tz = vm_tz & jnp.where(go, (vm % 10) == 0, True)
        vr_tz = vr_tz & jnp.where(go, last == 0, True)
        last = jnp.where(go, vr % 10, last)
        vr = jnp.where(go, vr // 10, vr)
        vp = jnp.where(go, vp // 10, vp)
        vm = jnp.where(go, vm // 10, vm)
        removed = removed + go.astype(jnp.int32)
        return vr, vp, vm, vm_tz, vr_tz, last, removed

    vr, vp, vm, vm_tz, vr_tz, last, removed = jax.lax.fori_loop(
        0, 18, strip1, (vr, vp, vm, vm_tz, vr_tz, last, removed))

    def strip2(_, st):
        vr, vp, vm, vr_tz, last, removed, active = st
        go = active & ((vm % 10) == 0)
        vr_tz = vr_tz & jnp.where(go, last == 0, True)
        last = jnp.where(go, vr % 10, last)
        vr = jnp.where(go, vr // 10, vr)
        vp = jnp.where(go, vp // 10, vp)
        vm = jnp.where(go, vm // 10, vm)
        removed = removed + go.astype(jnp.int32)
        return vr, vp, vm, vr_tz, last, removed, go

    vr, vp, vm, vr_tz, last, removed, _ = jax.lax.fori_loop(
        0, 18, strip2, (vr, vp, vm, vr_tz, last, removed, vm_tz))

    last = jnp.where(vr_tz & (last == 5) & ((vr % 2) == 0), 4, last)
    round_up = ((vr == vm) & (~accept | ~vm_tz)) | (last >= 5)
    out = vr + round_up.astype(jnp.int64)
    return out, e10 + removed


def format_java(digits: jax.Array, e10: jax.Array, negative: jax.Array,
                is_zero: jax.Array, is_nan: jax.Array, is_inf: jax.Array,
                width: int) -> Tuple[jax.Array, jax.Array]:
    """Digits*10^e10 → Java toString chars: plain for -3 <= sciExp <= 6,
    scientific 'd.dddE±x' otherwise; specials NaN/±Infinity/±0.0.

    Returns (chars (cap, width) uint8, lengths (cap,) int32)."""
    cap = digits.shape[0]
    MAXD = 17
    d = jnp.where(is_zero | is_nan | is_inf, 0, digits)
    # little-endian digit planes + count
    digs = []
    x = d
    for _ in range(MAXD):
        digs.append(x % 10)
        x = x // 10
    digs = jnp.stack(digs, axis=1)  # (cap, 17) little-endian
    nd = MAXD - jnp.argmax(jnp.flip(digs, axis=1) != 0, axis=1).astype(jnp.int32)
    nd = jnp.where(d == 0, 1, nd)
    sci = e10 + nd - 1  # scientific exponent = floor(log10 |v|)
    sci = jnp.where(is_zero, 0, sci)
    plain = (sci >= -3) & (sci <= 6)

    pos = jnp.arange(width)[None, :]
    sgn = negative.astype(jnp.int32)[:, None]

    def digit_at(big_idx):
        """big-endian digit index (0 = most significant) → ascii, 0-padded
        beyond nd."""
        li = nd[:, None] - 1 - big_idx
        ok = (big_idx >= 0) & (li >= 0) & (li < MAXD)
        ch = jnp.take_along_axis(digs, jnp.clip(li, 0, MAXD - 1).astype(jnp.int32), axis=1)
        return jnp.where(ok, ch + ord("0"), ord("0"))

    # ---- plain layout ----------------------------------------------------
    # int part length: sci+1 if sci >= 0 else 1 (the "0")
    int_len = jnp.where(sci >= 0, sci + 1, 1)[:, None]
    # fraction digits: for sci >= 0: max(nd - (sci+1), 1) (at least '.0');
    # for sci < 0: zeros(-sci-1) + nd digits
    frac_len = jnp.where(
        sci >= 0, jnp.maximum(nd - (sci + 1), 1), (-sci - 1) + nd)[:, None]
    plain_len = sgn + int_len + 1 + frac_len
    p_idx = pos - sgn
    in_int = p_idx < int_len
    is_dot = p_idx == int_len
    f_idx = p_idx - int_len - 1  # 0-based fraction position
    # integer digits: big-endian index = p_idx; for sci<0 the single "0"
    int_ch = jnp.where(sci[:, None] >= 0, digit_at(p_idx), ord("0"))
    # pad integer positions beyond nd with '0' (digit_at already 0-pads)
    # fraction: for sci>=0 → digit index sci+1+f_idx (or '0' pad when nd
    # exhausted); for sci<0 → leading zeros then digits
    frac_big = jnp.where(sci[:, None] >= 0, sci[:, None] + 1 + f_idx,
                         f_idx - (-sci[:, None] - 1))
    frac_ch = jnp.where(frac_big < 0, ord("0"), digit_at(frac_big))
    plain_ch = jnp.where(in_int, int_ch, jnp.where(is_dot, ord("."), frac_ch))
    plain_ch = jnp.where((pos == 0) & negative[:, None], ord("-"), plain_ch)
    plain_ch = jnp.where(pos < plain_len, plain_ch, 0)

    # ---- scientific layout ------------------------------------------------
    # [-] d0 . d1..  (or '0' if nd==1) E [-] e-digits
    mant_frac = jnp.maximum(nd - 1, 1)[:, None]
    aexp = jnp.abs(sci)
    elen = jnp.where(aexp >= 100, 3, jnp.where(aexp >= 10, 2, 1))[:, None]
    eneg = (sci < 0)[:, None]
    sci_len = sgn + 1 + 1 + mant_frac + 1 + eneg.astype(jnp.int32) + elen
    m_idx = pos - sgn
    sci_ch = jnp.where(m_idx == 0, digit_at(jnp.zeros_like(pos)),  # d0
                       jnp.int32(0))
    sci_ch = jnp.where(m_idx == 1, ord("."), sci_ch)
    fpos = m_idx - 2
    in_frac = (fpos >= 0) & (fpos < mant_frac)
    frac_digit = jnp.where(nd[:, None] == 1, ord("0"), digit_at(1 + fpos))
    sci_ch = jnp.where(in_frac, frac_digit, sci_ch)
    e_at = sgn + 2 + mant_frac
    sci_ch = jnp.where(pos == e_at, ord("E"), sci_ch)
    sci_ch = jnp.where((pos == e_at + 1) & eneg, ord("-"), sci_ch)
    ed0 = e_at + 1 + eneg.astype(jnp.int32)
    e_idx = pos - ed0
    a = aexp[:, None]
    e_digit = jnp.where(
        e_idx == elen - 1, a % 10,
        jnp.where(e_idx == elen - 2, (a // 10) % 10, (a // 100) % 10))
    in_e = (e_idx >= 0) & (e_idx < elen)
    sci_ch = jnp.where(in_e, e_digit + ord("0"), sci_ch)
    sci_ch = jnp.where((pos == 0) & negative[:, None], ord("-"), sci_ch)
    sci_ch = jnp.where(pos < sci_len, sci_ch, 0)

    chars = jnp.where(plain[:, None], plain_ch, sci_ch)
    lens = jnp.where(plain, plain_len[:, 0], sci_len[:, 0])

    # ---- specials ----------------------------------------------------------
    spec = np.zeros((4, width), np.uint8)
    for i, s in enumerate([b"NaN", b"Infinity", b"-Infinity", b"0.0"]):
        spec[i, : len(s)] = np.frombuffer(s, np.uint8)
    slen = np.array([3, 8, 9, 3], np.int32)
    neg_zero = np.zeros(width, np.uint8)
    neg_zero[:4] = np.frombuffer(b"-0.0", np.uint8)
    sel = jnp.where(is_nan, 0, jnp.where(is_inf & ~negative, 1,
                    jnp.where(is_inf & negative, 2, 3)))
    spec_ch = jnp.take(jnp.asarray(spec), sel, axis=0)
    spec_ch = jnp.where((is_zero & negative)[:, None], jnp.asarray(neg_zero)[None, :], spec_ch)
    spec_len = jnp.take(jnp.asarray(slen), sel)
    spec_len = jnp.where(is_zero & negative, 4, spec_len)
    any_spec = is_nan | is_inf | is_zero
    chars = jnp.where(any_spec[:, None], spec_ch, chars)
    lens = jnp.where(any_spec, spec_len, lens)
    return chars.astype(jnp.uint8), lens.astype(jnp.int32)


def double_to_string(x: jax.Array, width: int) -> Tuple[jax.Array, jax.Array]:
    """float64 → Java Double.toString chars/lengths."""
    from datafusion_comet_tpu.exec.sortkeys import f64_decompose

    xd = x.astype(jnp.float64)
    is_nan = jnp.isnan(xd)
    is_inf = jnp.isinf(xd)
    is_zero = xd == 0.0
    neg = (xd < 0.0) | (jnp.where(is_zero, 1.0 / jnp.where(is_zero, xd, 1.0), 0.0) < 0.0)
    finite = ~is_nan & ~is_inf & ~is_zero
    # subnormals: f64_decompose needs a normal input — scale by 2^1074
    # exactly (two 2^537 steps; powers of two, no rounding) and rebias
    tiny = finite & (jnp.abs(xd) < 2.0 ** -1022)
    # x * 2^1074 is exactly the raw ieee mantissa of a subnormal (integer
    # < 2^52); scale in two exact power-of-two steps to avoid inf constants
    xs = jnp.abs(xd) * (2.0 ** 537) * (2.0 ** 537)
    e, m52 = f64_decompose(jnp.where(finite & ~tiny, xd, 1.0))
    e = e.astype(jnp.int32)
    mant = jnp.where(tiny, xs.astype(jnp.int64),
                     (jnp.int64(1) << 52) | m52.astype(jnp.int64))
    e2 = jnp.where(tiny, -1074, e - 52)
    mant_zero = jnp.where(tiny, False, m52 == 0.0)
    digits, e10 = shortest_digits(mant, e2, mant_zero, tiny | (e <= -1022))
    return format_java(digits, e10, neg, is_zero, is_nan, is_inf, width)


def float_to_string(x: jax.Array, width: int) -> Tuple[jax.Array, jax.Array]:
    """float32 → Java Float.toString chars/lengths (f32 bitcast is native)."""
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.int32)
    is_nan = jnp.isnan(xf)
    is_inf = jnp.isinf(xf)
    mant_bits = bits & ((1 << 23) - 1)
    exp_bits = (bits >> 23) & 0xFF
    neg = bits < 0
    is_zero = (exp_bits == 0) & (mant_bits == 0)
    denorm = (exp_bits == 0) & (mant_bits != 0)
    mant = jnp.where(denorm, mant_bits, (1 << 23) | mant_bits).astype(jnp.int64)
    e2 = jnp.where(denorm, 1 - 127 - 23, exp_bits - 127 - 23).astype(jnp.int32)
    digits, e10 = shortest_digits(mant, e2, (mant_bits == 0) & ~denorm,
                                  (exp_bits <= 1))
    return format_java(digits, e10, neg, is_zero, is_nan, is_inf, width)

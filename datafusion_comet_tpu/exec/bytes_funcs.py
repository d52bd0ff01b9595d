"""Device-side byte-level functions: hex/unhex, base64, encode/decode,
bin/conv, and the digest family (md5/sha1/sha2/crc32).

All kernels are vectorized over the padded (cap, w) uint8 byte matrices —
no gathers on the row axis (see docs/tuning.md). Per-round digest constants
are compile-time Python scalars or scalar-indexed small tables, never
row-indexed lookups. Reference behavior: Spark's Hex/Unhex/Base64/
UnBase64/Encode/Decode/Bin/Conv/Md5/Sha1/Sha2/Crc32 expressions
(reference kernels: native/spark-expr/src/math_funcs/unhex.rs,
string_funcs/base64.rs; the digests are delegated to DataFusion built-ins
by the reference planner — planner.rs create_expr scalar functions).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import ColumnVector

__all__ = [
    "hex_of_int",
    "hex_of_bytes",
    "unhex",
    "base64_encode",
    "base64_decode",
    "bin_of_int",
    "conv",
    "crc32",
    "md5",
    "sha1",
    "sha2",
]

_HEX_UC = b"0123456789ABCDEF"


def _u8(x) -> jax.Array:
    return x.astype(jnp.uint8)


def _nibble_char(nib: jax.Array) -> jax.Array:
    """4-bit value -> uppercase hex ASCII, branch-free (no table gather)."""
    nib = nib.astype(jnp.int32)
    return _u8(jnp.where(nib < 10, nib + ord("0"), nib - 10 + ord("A")))


def hex_of_bytes(mat: jax.Array, lens: jax.Array, out_t: T.DataType) -> Tuple[jax.Array, jax.Array]:
    """hex(binary): every input byte becomes two uppercase hex chars."""
    cap, w = mat.shape
    hi = _nibble_char(mat >> 4)
    lo = _nibble_char(mat & 0xF)
    out = jnp.stack([hi, lo], axis=2).reshape(cap, 2 * w)
    out_w = out_t.byte_width
    if out_w != 2 * w:
        out = _fit_width(out, out_w)
    out_len = (lens * 2).astype(jnp.int32)
    pos = jnp.arange(out.shape[1])[None, :]
    return jnp.where(pos < out_len[:, None], out, 0), out_len


def hex_of_int(v: jax.Array, out_t: T.DataType) -> Tuple[jax.Array, jax.Array]:
    """hex(bigint): uppercase, no leading zeros; negatives render as the
    16-digit two's-complement form (Spark Hex on LongType)."""
    u = v.astype(jnp.int64)
    digits = []
    for k in range(15, -1, -1):
        digits.append(_nibble_char((u >> (4 * k)) & 0xF))
    mat = jnp.stack(digits, axis=1)  # (cap, 16) most-significant first
    nz = mat != ord("0")
    any_nz = jnp.any(nz, axis=1)
    first = jnp.where(any_nz, jnp.argmax(nz, axis=1), 15).astype(jnp.int32)
    out_len = (16 - first).astype(jnp.int32)
    # left-shift each row by `first` without a row gather: roll via matmul-free
    # take_along_axis on the narrow 16-wide axis (w=16 so this is cheap)
    pos = jnp.arange(16)[None, :]
    src = jnp.clip(first[:, None] + pos, 0, 15)
    out = jnp.take_along_axis(mat, src, axis=1)
    out = jnp.where(pos < out_len[:, None], out, 0)
    out_w = out_t.byte_width
    if out_w != 16:
        out = _fit_width(out, out_w)
    return out, out_len


def _hex_val(c: jax.Array) -> jax.Array:
    """ASCII byte -> hex digit value, 255 when invalid (reference
    unhex.rs HEX_LUT, computed branch-free instead of a table)."""
    c = c.astype(jnp.int32)
    v = jnp.where((c >= ord("0")) & (c <= ord("9")), c - ord("0"), 255)
    v = jnp.where((c >= ord("A")) & (c <= ord("F")), c - ord("A") + 10, v)
    v = jnp.where((c >= ord("a")) & (c <= ord("f")), c - ord("a") + 10, v)
    return v


def unhex(mat: jax.Array, lens: jax.Array, out_t: T.DataType) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """unhex(str) -> (bytes, out_lens, invalid_mask). Odd-length input gets an
    implicit leading 0 nibble (Spark/reference semantics, unhex.rs:66-74);
    any non-hex digit marks the row invalid (caller nulls it / ANSI-errors)."""
    cap, w = mat.shape
    vals = _hex_val(mat)  # (cap, w)
    pos = jnp.arange(w)[None, :]
    in_str = pos < lens[:, None]
    invalid = jnp.any((vals == 255) & in_str, axis=1)
    # Conceptual padded string: one leading 0 nibble when len is odd. Output
    # byte i pairs nibbles (2i-odd, 2i+1-odd) of the input.
    odd = (lens & 1).astype(jnp.int32)
    out_w = out_t.byte_width
    opos = jnp.arange(out_w)[None, :]
    i_hi = 2 * opos - odd[:, None]
    i_lo = i_hi + 1
    vw = jnp.where(in_str, vals, 0)
    hi = jnp.take_along_axis(vw, jnp.clip(i_hi, 0, w - 1), axis=1)
    hi = jnp.where(i_hi >= 0, hi, 0)  # the implicit leading nibble
    lo = jnp.take_along_axis(vw, jnp.clip(i_lo, 0, w - 1), axis=1)
    out_len = ((lens + 1) // 2).astype(jnp.int32)
    data = _u8((hi << 4) | lo)
    data = jnp.where(opos < out_len[:, None], data, 0)
    return data, out_len, invalid


# ---------------------------------------------------------------------------
# base64 (RFC 4648 alphabet; chunk=True wraps at 76 chars with CRLF, matching
# java.util.Base64.getMimeEncoder / Spark's chunkBase64String default —
# reference string_funcs/base64.rs LINE_LEN)
# ---------------------------------------------------------------------------

_B64_LINE = 76


def _b64_char(v: jax.Array) -> jax.Array:
    v = v.astype(jnp.int32)
    c = jnp.where(v < 26, v + ord("A"), 0)
    c = jnp.where((v >= 26) & (v < 52), v - 26 + ord("a"), c)
    c = jnp.where((v >= 52) & (v < 62), v - 52 + ord("0"), c)
    c = jnp.where(v == 62, ord("+"), c)
    c = jnp.where(v == 63, ord("/"), c)
    return _u8(c)


def _b64_val(c: jax.Array) -> jax.Array:
    c = c.astype(jnp.int32)
    v = jnp.where((c >= ord("A")) & (c <= ord("Z")), c - ord("A"), -1)
    v = jnp.where((c >= ord("a")) & (c <= ord("z")), c - ord("a") + 26, v)
    v = jnp.where((c >= ord("0")) & (c <= ord("9")), c - ord("0") + 52, v)
    v = jnp.where(c == ord("+"), 62, v)
    v = jnp.where(c == ord("/"), 63, v)
    return v


def _fit_width(mat: jax.Array, out_w: int) -> jax.Array:
    cap, w = mat.shape
    if out_w == w:
        return mat
    if out_w < w:
        return mat[:, :out_w]
    return jnp.pad(mat, ((0, 0), (0, out_w - w)))


def base64_encode(
    mat: jax.Array, lens: jax.Array, out_t: T.DataType, chunk: bool
) -> Tuple[jax.Array, jax.Array]:
    cap, w = mat.shape
    n3 = (w + 2) // 3
    pad_w = n3 * 3
    m = _fit_width(mat, pad_w).astype(jnp.int32)
    pos = jnp.arange(pad_w)[None, :]
    m = jnp.where(pos < lens[:, None], m, 0)
    trip = m.reshape(cap, n3, 3)
    word = (trip[:, :, 0] << 16) | (trip[:, :, 1] << 8) | trip[:, :, 2]
    c0 = _b64_char(word >> 18)
    c1 = _b64_char((word >> 12) & 63)
    c2 = _b64_char((word >> 6) & 63)
    c3 = _b64_char(word & 63)
    quad = jnp.stack([c0, c1, c2, c3], axis=2).reshape(cap, n3 * 4)
    enc_len = ((lens + 2) // 3 * 4).astype(jnp.int32)
    qpos = jnp.arange(n3 * 4)[None, :]
    # '=' padding: the last (3*len%3-adjusted) chars of the active region
    rem = lens % 3
    n_eq = jnp.where(rem == 0, 0, 3 - rem)
    is_pad = (qpos >= enc_len[:, None] - n_eq[:, None]) & (qpos < enc_len[:, None])
    quad = jnp.where(is_pad, ord("="), quad)
    quad = jnp.where(qpos < enc_len[:, None], quad, 0)
    if not chunk:
        out_w = out_t.byte_width
        return _fit_width(quad, out_w), enc_len
    # CRLF wrap: output position of encoded char i is i + 2*(i // 76)
    out_w = out_t.byte_width
    # build by scattering along the narrow width axis via comparison: for each
    # output position j, the source char index is j - 2*line(j) where lines
    # are 78 output bytes (76 chars + CRLF) except the last
    opos = jnp.arange(out_w)
    line = opos // (_B64_LINE + 2)
    in_line = opos % (_B64_LINE + 2)
    src_idx = line * _B64_LINE + jnp.minimum(in_line, _B64_LINE - 1)
    is_cr = in_line == _B64_LINE
    is_lf = in_line == _B64_LINE + 1
    src = jnp.clip(src_idx, 0, n3 * 4 - 1)[None, :].repeat(cap, 0)
    g = jnp.take_along_axis(_fit_width(quad, max(n3 * 4, 1)), src, axis=1)
    out = jnp.where(is_cr[None, :], ord("\r"), jnp.where(is_lf[None, :], ord("\n"), g))
    n_lines_m1 = jnp.maximum((enc_len - 1) // _B64_LINE, 0)
    out_len = jnp.where(enc_len > 0, enc_len + 2 * n_lines_m1, 0).astype(jnp.int32)
    out = jnp.where(opos[None, :] < out_len[:, None], _u8(out), 0)
    return out, out_len


def base64_decode(
    mat: jax.Array, lens: jax.Array, out_t: T.DataType
) -> Tuple[jax.Array, jax.Array]:
    """unbase64: non-alphabet bytes (incl. '=', CR/LF) are skipped, then
    groups of 4 sextets decode to 3 bytes; a trailing partial group of k
    sextets yields k-1 bytes (commons-codec behavior Spark relies on)."""
    cap, w = mat.shape
    pos = jnp.arange(w)[None, :]
    in_str = pos < lens[:, None]
    vals = jnp.where(in_str, _b64_val(mat), -1)
    keep = vals >= 0
    # compact the kept sextets to the left via narrow-axis take_along_axis
    order = jnp.where(keep, pos, w + pos)  # kept first, stable
    perm = jnp.argsort(order, axis=1)
    sext = jnp.take_along_axis(jnp.where(keep, vals, 0), perm, axis=1)
    n_kept = keep.sum(axis=1).astype(jnp.int32)
    n4 = (w + 3) // 4
    sx = _fit_width(sext, n4 * 4).reshape(cap, n4, 4)
    word = (sx[:, :, 0] << 18) | (sx[:, :, 1] << 12) | (sx[:, :, 2] << 6) | sx[:, :, 3]
    b0 = _u8(word >> 16)
    b1 = _u8((word >> 8) & 0xFF)
    b2 = _u8(word & 0xFF)
    dec = jnp.stack([b0, b1, b2], axis=2).reshape(cap, n4 * 3)
    rem = n_kept % 4
    out_len = (n_kept // 4 * 3 + jnp.maximum(rem - 1, 0)).astype(jnp.int32)
    out_w = out_t.byte_width
    dec = _fit_width(dec, out_w)
    opos = jnp.arange(out_w)[None, :]
    return jnp.where(opos < out_len[:, None], dec, 0), out_len


# ---------------------------------------------------------------------------
# bin / conv
# ---------------------------------------------------------------------------


def bin_of_int(v: jax.Array, out_t: T.DataType) -> Tuple[jax.Array, jax.Array]:
    """bin(bigint): binary string, negatives as 64-bit two's complement."""
    u = v.astype(jnp.int64)
    bits = [jnp.where(((u >> k) & 1) != 0, ord("1"), ord("0")) for k in range(63, -1, -1)]
    mat = _u8(jnp.stack(bits, axis=1))  # (cap, 64) msb first
    nz = mat != ord("0")
    any_nz = jnp.any(nz, axis=1)
    first = jnp.where(any_nz, jnp.argmax(nz, axis=1), 63).astype(jnp.int32)
    out_len = (64 - first).astype(jnp.int32)
    pos = jnp.arange(64)[None, :]
    src = jnp.clip(first[:, None] + pos, 0, 63)
    out = jnp.take_along_axis(mat, src, axis=1)
    out = jnp.where(pos < out_len[:, None], out, 0)
    return _fit_width(out, out_t.byte_width), out_len


def _digit_val(c: jax.Array) -> jax.Array:
    """ASCII -> base-36 digit value, 99 when invalid."""
    c = c.astype(jnp.int32)
    v = jnp.where((c >= ord("0")) & (c <= ord("9")), c - ord("0"), 99)
    v = jnp.where((c >= ord("A")) & (c <= ord("Z")), c - ord("A") + 10, v)
    v = jnp.where((c >= ord("a")) & (c <= ord("z")), c - ord("a") + 10, v)
    return v


def conv(
    mat: jax.Array,
    lens: jax.Array,
    from_base: int,
    to_base: int,
    out_t: T.DataType,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """conv(numStr, fromBase, toBase) with Spark/Hive semantics: leading
    whitespace-free parse, optional '-' sign, digits valid for fromBase up to
    the first invalid char; value accumulates into an unsigned 64-bit with
    saturation at u64::MAX; negative toBase renders signed. Returns
    (bytes, lens, null_mask) — null when no valid digits (Spark NULL).
    Bases must be plan-time literals in [2,36] (like RLike patterns)."""
    cap, w = mat.shape
    pos = jnp.arange(w)[None, :]
    in_str = pos < lens[:, None]
    neg = in_str[:, 0] & (mat[:, 0] == ord("-")) if w > 0 else jnp.zeros(cap, bool)
    start = neg.astype(jnp.int32)
    dv = _digit_val(mat)
    valid_digit = (dv < from_base) & in_str & (pos >= start[:, None])
    # digits end at the first invalid position at/after start
    bad = (~valid_digit) & (pos >= start[:, None])
    first_bad = jnp.where(jnp.any(bad, axis=1), jnp.argmax(bad, axis=1), w).astype(jnp.int32)
    use = valid_digit & (pos < first_bad[:, None])
    n_digits = (first_bad - start).astype(jnp.int32)
    # Horner over the width axis in uint64 with saturation (Java's
    # unsigned-long accumulation clamps at MAX on overflow)
    acc = jnp.zeros(cap, jnp.uint64)
    maxu = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    fb = jnp.uint64(from_base)
    for j in range(w):
        d = dv[:, j].astype(jnp.uint64)
        u = use[:, j]
        # overflow check: acc > (MAX - d) / base
        limit = (maxu - d) // fb
        over = acc > limit
        nxt = jnp.where(over, maxu, acc * fb + d)
        acc = jnp.where(u, nxt, acc)
    null_out = n_digits <= 0
    # negate (two's complement u64) for '-' input
    acc = jnp.where(neg, (~acc) + jnp.uint64(1), acc)
    signed_out = to_base < 0
    tb = abs(to_base)
    if signed_out:
        sval = acc.astype(jnp.int64)
        out_neg = sval < 0
        mag = jnp.where(out_neg, (-sval).astype(jnp.uint64), acc)
    else:
        out_neg = jnp.zeros(cap, bool)
        mag = acc
    # emit digits most-significant first: 64 positions suffice for base>=2
    n_out = 64
    digs: List[jax.Array] = []
    cur = mag
    tbu = jnp.uint64(tb)
    for _ in range(n_out):
        digs.append((cur % tbu).astype(jnp.int32))
        cur = cur // tbu
    digs_arr = jnp.stack(digs[::-1], axis=1)  # msb first
    ch = jnp.where(digs_arr < 10, digs_arr + ord("0"), digs_arr - 10 + ord("A"))
    nz = digs_arr != 0
    any_nz = jnp.any(nz, axis=1)
    first_nz = jnp.where(any_nz, jnp.argmax(nz, axis=1), n_out - 1).astype(jnp.int32)
    mag_len = (n_out - first_nz).astype(jnp.int32)
    out_len = mag_len + out_neg.astype(jnp.int32)
    out_w = out_t.byte_width
    opos = jnp.arange(out_w)[None, :]
    src = jnp.clip(first_nz[:, None] + opos - out_neg.astype(jnp.int32)[:, None], 0, n_out - 1)
    body = jnp.take_along_axis(_fit_width(_u8(ch), max(n_out, out_w)) if out_w > n_out else _u8(ch), src, axis=1)[:, :out_w]
    out = jnp.where(out_neg[:, None] & (opos == 0), ord("-"), body)
    out = jnp.where(opos < out_len[:, None], _u8(out), 0)
    return out, out_len, null_out


# ---------------------------------------------------------------------------
# crc32
# ---------------------------------------------------------------------------


def crc32(mat: jax.Array, lens: jax.Array) -> jax.Array:
    """CRC-32 (IEEE 802.3, the zlib/Spark polynomial) over the live bytes of
    each row. Bitwise formulation — a 256-entry table would be a row gather
    (docs/tuning.md). Loop over the width axis via fori_loop; per step the
    8 bit-iterations are unrolled."""
    cap, w = mat.shape
    poly = jnp.uint32(0xEDB88320)

    def step(j, crc):
        byte = jax.lax.dynamic_slice_in_dim(mat, j, 1, axis=1)[:, 0]
        active = j < lens
        c = crc ^ byte.astype(jnp.uint32)
        for _ in range(8):
            c = (c >> 1) ^ (poly & (jnp.uint32(0) - (c & 1)))
        return jnp.where(active, c, crc)

    crc = jax.lax.fori_loop(0, w, step, jnp.full(cap, 0xFFFFFFFF, jnp.uint32))
    return (crc ^ jnp.uint32(0xFFFFFFFF)).astype(jnp.int64)


# ---------------------------------------------------------------------------
# digests: md5 / sha1 / sha2  (vectorized over rows; blocks + rounds are
# lax.fori_loops with scalar-indexed constant tables)
# ---------------------------------------------------------------------------


def _padded_blocks_u32(
    mat: jax.Array, lens: jax.Array, little_endian_len: bool
) -> Tuple[jax.Array, jax.Array, int]:
    """Merkle–Damgård padding for 64-byte-block digests, built per row with
    wheres (no dynamic shapes): returns (words (cap, nb, 16) uint32 in the
    digest's word order, n_blocks (cap,), nb_static)."""
    cap, w = mat.shape
    nb = (w + 9 + 63) // 64
    padded_w = nb * 64
    m = _fit_width(mat, padded_w)
    pos = jnp.arange(padded_w)[None, :]
    L = lens[:, None]
    data = jnp.where(pos < L, m, 0)
    data = jnp.where(pos == L, 0x80, data)
    n_blocks = ((lens + 8) // 64 + 1).astype(jnp.int32)
    bitlen = (lens.astype(jnp.uint64) * 8)
    # length field occupies the last 8 bytes of each row's final block
    len_start = n_blocks[:, None] * 64 - 8
    in_len_field = (pos >= len_start) & (pos < len_start + 8)
    byte_idx = jnp.clip(pos - len_start, 0, 7)
    if little_endian_len:
        shift = byte_idx * 8
    else:
        shift = (7 - byte_idx) * 8
    len_byte = ((bitlen[:, None] >> shift.astype(jnp.uint64)) & jnp.uint64(0xFF)).astype(jnp.uint8)
    data = jnp.where(in_len_field, len_byte, data)
    b = data.reshape(cap, nb, 16, 4).astype(jnp.uint32)
    if little_endian_len:  # md5: little-endian words
        words = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    else:  # sha: big-endian words
        words = (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]
    return words, n_blocks, nb


def _rotl32(x: jax.Array, n) -> jax.Array:
    n = jnp.uint32(n) if isinstance(n, int) else n.astype(jnp.uint32)
    return (x << n) | (x >> (jnp.uint32(32) - n))


_MD5_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
_MD5_K = [int(abs(__import__("math").sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)]


def _hex_lower(words_le_bytes: jax.Array, out_t: T.DataType) -> Tuple[jax.Array, jax.Array]:
    """(cap, n) byte matrix -> lowercase hex string matrix (cap, 2n)."""
    cap, n = words_le_bytes.shape
    hi = (words_le_bytes >> 4).astype(jnp.int32)
    lo = (words_le_bytes & 0xF).astype(jnp.int32)

    def ch(v):
        return _u8(jnp.where(v < 10, v + ord("0"), v - 10 + ord("a")))

    out = jnp.stack([ch(hi), ch(lo)], axis=2).reshape(cap, 2 * n)
    out = _fit_width(out, out_t.byte_width)
    return out, jnp.full(cap, 2 * n, jnp.int32)


def md5(mat: jax.Array, lens: jax.Array, out_t: T.DataType) -> Tuple[jax.Array, jax.Array]:
    cap, _ = mat.shape
    words, n_blocks, nb = _padded_blocks_u32(mat, lens, little_endian_len=True)
    s_tab = jnp.asarray(_MD5_S, jnp.uint32)
    k_tab = jnp.asarray(_MD5_K, jnp.uint32)
    init = (
        jnp.full(cap, 0x67452301, jnp.uint32),
        jnp.full(cap, 0xEFCDAB89, jnp.uint32),
        jnp.full(cap, 0x98BADCFE, jnp.uint32),
        jnp.full(cap, 0x10325476, jnp.uint32),
    )

    def block_step(bi, state):
        a0, b0, c0, d0 = state
        blk = jax.lax.dynamic_index_in_dim(words, bi, axis=1, keepdims=False)  # (cap, 16)

        def round_step(i, abcd):
            a, b, c, d = abcd
            r = i // 16
            f = jnp.where(
                r == 0,
                (b & c) | (~b & d),
                jnp.where(
                    r == 1,
                    (d & b) | (~d & c),
                    jnp.where(r == 2, b ^ c ^ d, c ^ (b | ~d)),
                ),
            )
            g = jnp.where(
                r == 0,
                i,
                jnp.where(r == 1, (5 * i + 1) % 16, jnp.where(r == 2, (3 * i + 5) % 16, (7 * i) % 16)),
            )
            m = jax.lax.dynamic_index_in_dim(blk, g, axis=1, keepdims=False)
            tmp = f + a + k_tab[i] + m
            a_new = b + _rotl32(tmp, s_tab[i])
            return d, a_new, b, c

        a, b, c, d = jax.lax.fori_loop(0, 64, round_step, (a0, b0, c0, d0))
        live = bi < n_blocks
        return (
            jnp.where(live, a0 + a, a0),
            jnp.where(live, b0 + b, b0),
            jnp.where(live, c0 + c, c0),
            jnp.where(live, d0 + d, d0),
        )

    a, b, c, d = jax.lax.fori_loop(0, nb, block_step, init)
    # output bytes little-endian per word
    parts = []
    for word in (a, b, c, d):
        for k in range(4):
            parts.append(_u8((word >> (8 * k)) & 0xFF))
    return _hex_lower(jnp.stack(parts, axis=1), out_t)


def sha1(mat: jax.Array, lens: jax.Array, out_t: T.DataType) -> Tuple[jax.Array, jax.Array]:
    cap, _ = mat.shape
    words, n_blocks, nb = _padded_blocks_u32(mat, lens, little_endian_len=False)
    init = tuple(
        jnp.full(cap, v, jnp.uint32)
        for v in (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0)
    )

    def block_step(bi, state):
        h0, h1, h2, h3, h4 = state
        blk = jax.lax.dynamic_index_in_dim(words, bi, axis=1, keepdims=False)  # (cap, 16)

        def round_step(i, carry):
            a, b, c, d, e, win = carry  # win: (cap, 16) rolling schedule
            wi = jax.lax.cond(
                i < 16,
                lambda: jax.lax.dynamic_index_in_dim(blk, i, axis=1, keepdims=False),
                lambda: _rotl32(win[:, 13] ^ win[:, 8] ^ win[:, 2] ^ win[:, 0], 1),
            )
            win = jnp.concatenate([win[:, 1:], wi[:, None]], axis=1)
            r = i // 20
            f = jnp.where(
                r == 0,
                (b & c) | (~b & d),
                jnp.where(r == 2, (b & c) | (b & d) | (c & d), b ^ c ^ d),
            )
            k = jnp.where(
                r == 0,
                jnp.uint32(0x5A827999),
                jnp.where(
                    r == 1,
                    jnp.uint32(0x6ED9EBA1),
                    jnp.where(r == 2, jnp.uint32(0x8F1BBCDC), jnp.uint32(0xCA62C1D6)),
                ),
            )
            tmp = _rotl32(a, 5) + f + e + k + wi
            return tmp, a, _rotl32(b, 30), c, d, win

        win0 = jnp.zeros((cap, 16), jnp.uint32)
        a, b, c, d, e, _ = jax.lax.fori_loop(0, 80, round_step, (h0, h1, h2, h3, h4, win0))
        live = bi < n_blocks
        return tuple(
            jnp.where(live, h + x, h) for h, x in zip((h0, h1, h2, h3, h4), (a, b, c, d, e))
        )

    hs = jax.lax.fori_loop(0, nb, block_step, init)
    parts = []
    for word in hs:
        for k in range(3, -1, -1):
            parts.append(_u8((word >> (8 * k)) & 0xFF))
    return _hex_lower(jnp.stack(parts, axis=1), out_t)


_SHA256_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
    0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3, 0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
    0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
    0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13, 0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
    0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
    0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208, 0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]

_SHA224_H = [0xC1059ED8, 0x367CD507, 0x3070DD17, 0xF70E5939, 0xFFC00B31, 0x68581511, 0x64F98FA7, 0xBEFA4FA4]
_SHA256_H = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A, 0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]


def _rotr32(x, n):
    return (x >> jnp.uint32(n)) | (x << (jnp.uint32(32 - n)))


def _sha256_core(mat: jax.Array, lens: jax.Array, h_init: List[int], out_words: int, out_t: T.DataType):
    cap, _ = mat.shape
    words, n_blocks, nb = _padded_blocks_u32(mat, lens, little_endian_len=False)
    k_tab = jnp.asarray(_SHA256_K, jnp.uint32)
    init = tuple(jnp.full(cap, v, jnp.uint32) for v in h_init)

    def block_step(bi, state):
        blk = jax.lax.dynamic_index_in_dim(words, bi, axis=1, keepdims=False)

        def round_step(i, carry):
            a, b, c, d, e, f, g, h, win = carry
            wi = jax.lax.cond(
                i < 16,
                lambda: jax.lax.dynamic_index_in_dim(blk, i, axis=1, keepdims=False),
                lambda: (
                    (_rotr32(win[:, 14], 17) ^ _rotr32(win[:, 14], 19) ^ (win[:, 14] >> jnp.uint32(10)))
                    + win[:, 9]
                    + (_rotr32(win[:, 1], 7) ^ _rotr32(win[:, 1], 18) ^ (win[:, 1] >> jnp.uint32(3)))
                    + win[:, 0]
                ),
            )
            win = jnp.concatenate([win[:, 1:], wi[:, None]], axis=1)
            s1 = _rotr32(e, 6) ^ _rotr32(e, 11) ^ _rotr32(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1 + ch + k_tab[i] + wi
            s0 = _rotr32(a, 2) ^ _rotr32(a, 13) ^ _rotr32(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = s0 + maj
            return (t1 + t2, a, b, c, d + t1, e, f, g, win)

        win0 = jnp.zeros((cap, 16), jnp.uint32)
        out = jax.lax.fori_loop(0, 64, round_step, state + (win0,))
        live = bi < n_blocks
        return tuple(jnp.where(live, h + x, h) for h, x in zip(state, out[:8]))

    hs = jax.lax.fori_loop(0, nb, block_step, init)
    parts = []
    for word in hs[:out_words]:
        for k in range(3, -1, -1):
            parts.append(_u8((word >> (8 * k)) & 0xFF))
    return _hex_lower(jnp.stack(parts, axis=1), out_t)


def sha2(mat: jax.Array, lens: jax.Array, bits: int, out_t: T.DataType):
    """sha2(expr, bitLength): 0/256 -> sha256, 224 -> sha224. 384/512 use
    64-bit words — emulated-u64 rounds are implemented via two-limb u32
    (see _sha512_core)."""
    if bits in (0, 256):
        return _sha256_core(mat, lens, _SHA256_H, 8, out_t)
    if bits == 224:
        return _sha256_core(mat, lens, _SHA224_H, 7, out_t)
    if bits in (384, 512):
        return _sha512_core(mat, lens, bits, out_t)
    raise NotImplementedError(f"sha2 bit length {bits}")


_SHA512_K = [
    0x428A2F98D728AE22, 0x7137449123EF65CD, 0xB5C0FBCFEC4D3B2F, 0xE9B5DBA58189DBBC,
    0x3956C25BF348B538, 0x59F111F1B605D019, 0x923F82A4AF194F9B, 0xAB1C5ED5DA6D8118,
    0xD807AA98A3030242, 0x12835B0145706FBE, 0x243185BE4EE4B28C, 0x550C7DC3D5FFB4E2,
    0x72BE5D74F27B896F, 0x80DEB1FE3B1696B1, 0x9BDC06A725C71235, 0xC19BF174CF692694,
    0xE49B69C19EF14AD2, 0xEFBE4786384F25E3, 0x0FC19DC68B8CD5B5, 0x240CA1CC77AC9C65,
    0x2DE92C6F592B0275, 0x4A7484AA6EA6E483, 0x5CB0A9DCBD41FBD4, 0x76F988DA831153B5,
    0x983E5152EE66DFAB, 0xA831C66D2DB43210, 0xB00327C898FB213F, 0xBF597FC7BEEF0EE4,
    0xC6E00BF33DA88FC2, 0xD5A79147930AA725, 0x06CA6351E003826F, 0x142929670A0E6E70,
    0x27B70A8546D22FFC, 0x2E1B21385C26C926, 0x4D2C6DFC5AC42AED, 0x53380D139D95B3DF,
    0x650A73548BAF63DE, 0x766A0ABB3C77B2A8, 0x81C2C92E47EDAEE6, 0x92722C851482353B,
    0xA2BFE8A14CF10364, 0xA81A664BBC423001, 0xC24B8B70D0F89791, 0xC76C51A30654BE30,
    0xD192E819D6EF5218, 0xD69906245565A910, 0xF40E35855771202A, 0x106AA07032BBD1B8,
    0x19A4C116B8D2D0C8, 0x1E376C085141AB53, 0x2748774CDF8EEB99, 0x34B0BCB5E19B48A8,
    0x391C0CB3C5C95A63, 0x4ED8AA4AE3418ACB, 0x5B9CCA4F7763E373, 0x682E6FF3D6B2B8A3,
    0x748F82EE5DEFB2FC, 0x78A5636F43172F60, 0x84C87814A1F0AB72, 0x8CC702081A6439EC,
    0x90BEFFFA23631E28, 0xA4506CEBDE82BDE9, 0xBEF9A3F7B2C67915, 0xC67178F2E372532B,
    0xCA273ECEEA26619C, 0xD186B8C721C0C207, 0xEADA7DD6CDE0EB1E, 0xF57D4F7FEE6ED178,
    0x06F067AA72176FBA, 0x0A637DC5A2C898A6, 0x113F9804BEF90DAE, 0x1B710B35131C471B,
    0x28DB77F523047D84, 0x32CAAB7B40C72493, 0x3C9EBE0A15C9BEBC, 0x431D67C49C100D4C,
    0x4CC5D4BECB3E42B6, 0x597F299CFC657E2A, 0x5FCB6FAB3AD6FAEC, 0x6C44198C4A475817,
]

_SHA384_H = [
    0xCBBB9D5DC1059ED8, 0x629A292A367CD507, 0x9159015A3070DD17, 0x152FECD8F70E5939,
    0x67332667FFC00B31, 0x8EB44A8768581511, 0xDB0C2E0D64F98FA7, 0x47B5481DBEFA4FA4,
]
_SHA512_H = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B, 0xA54FF53A5F1D36F1,
    0x510E527FADE682D1, 0x9B05688C2B3E6C1F, 0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]


def _rotr64(x, n):
    # x is uint64 (XLA emulates on TPU)
    return (x >> jnp.uint64(n)) | (x << jnp.uint64(64 - n))


def _sha512_core(mat: jax.Array, lens: jax.Array, bits: int, out_t: T.DataType):
    cap, w = mat.shape
    # 128-byte blocks, 16-byte length field (we only fill the low 8 bytes —
    # inputs are < 2^61 bytes by construction)
    nb = (w + 17 + 127) // 128
    padded_w = nb * 128
    m = _fit_width(mat, padded_w)
    pos = jnp.arange(padded_w)[None, :]
    L = lens[:, None]
    data = jnp.where(pos < L, m, 0)
    data = jnp.where(pos == L, 0x80, data)
    n_blocks = ((lens + 16) // 128 + 1).astype(jnp.int32)
    bitlen = lens.astype(jnp.uint64) * 8
    len_start = n_blocks[:, None] * 128 - 8
    in_len = (pos >= len_start) & (pos < len_start + 8)
    byte_idx = jnp.clip(pos - len_start, 0, 7)
    len_byte = ((bitlen[:, None] >> ((7 - byte_idx) * 8).astype(jnp.uint64)) & jnp.uint64(0xFF)).astype(jnp.uint8)
    data = jnp.where(in_len, len_byte, data)
    b = data.reshape(cap, nb, 16, 8).astype(jnp.uint64)
    words = jnp.zeros((cap, nb, 16), jnp.uint64)
    for k in range(8):
        words = words | (b[..., k] << jnp.uint64((7 - k) * 8))
    k_tab = jnp.asarray([jnp.uint64(v) for v in _SHA512_K], jnp.uint64)
    h_init = _SHA384_H if bits == 384 else _SHA512_H
    init = tuple(jnp.full(cap, jnp.uint64(v), jnp.uint64) for v in h_init)

    def block_step(bi, state):
        blk = jax.lax.dynamic_index_in_dim(words, bi, axis=1, keepdims=False)

        def round_step(i, carry):
            a, bb, c, d, e, f, g, h, win = carry
            wi = jax.lax.cond(
                i < 16,
                lambda: jax.lax.dynamic_index_in_dim(blk, i, axis=1, keepdims=False),
                lambda: (
                    (_rotr64(win[:, 14], 19) ^ _rotr64(win[:, 14], 61) ^ (win[:, 14] >> jnp.uint64(6)))
                    + win[:, 9]
                    + (_rotr64(win[:, 1], 1) ^ _rotr64(win[:, 1], 8) ^ (win[:, 1] >> jnp.uint64(7)))
                    + win[:, 0]
                ),
            )
            win = jnp.concatenate([win[:, 1:], wi[:, None]], axis=1)
            s1 = _rotr64(e, 14) ^ _rotr64(e, 18) ^ _rotr64(e, 41)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1 + ch + k_tab[i] + wi
            s0 = _rotr64(a, 28) ^ _rotr64(a, 34) ^ _rotr64(a, 39)
            maj = (a & bb) ^ (a & c) ^ (bb & c)
            t2 = s0 + maj
            return (t1 + t2, a, bb, c, d + t1, e, f, g, win)

        win0 = jnp.zeros((cap, 16), jnp.uint64)
        out = jax.lax.fori_loop(0, 80, round_step, state + (win0,))
        live = bi < n_blocks
        return tuple(jnp.where(live, h + x, h) for h, x in zip(state, out[:8]))

    hs = jax.lax.fori_loop(0, nb, block_step, init)
    out_words = 6 if bits == 384 else 8
    parts = []
    for word in hs[:out_words]:
        for k in range(7, -1, -1):
            parts.append(_u8((word >> jnp.uint64(8 * k)) & jnp.uint64(0xFF)))
    return _hex_lower(jnp.stack(parts, axis=1), out_t)

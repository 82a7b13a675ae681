"""Pure-Python Apache DataSketches HLL union kernel.

Spark's ``hll_sketch_agg`` / ``hll_union_agg`` (the engine's
``hll_union_all`` merge operator, ``functions/merge_operators.py``)
serialize Apache DataSketches ``HllSketch`` images. The Spark-free
Arrow readers (``arrow/dataset.py``) need to FOLD those partials when
a count-distinct MV is read mid-refresh (multiple generations per
bucket) — without a JVM and without the optional ``datasketches``
wheel. This module re-implements exactly the subset of the
DataSketches union the engine can encounter:

- serialization version 1, family 7 (HLL), updatable (non-compact)
  images — what Spark writes;
- equal ``lgConfigK`` across inputs (Spark's default 12 everywhere;
  mismatches refuse loudly rather than downsample);
- target HLL type HLL_8 — the only type Spark emits;
- LIST / SET / HLL current modes, including the LIST→SET→HLL
  promotions of the union gadget.

The implementation is validated BYTE-FOR-BYTE against Spark's own
``hll_union_agg`` output across a cardinality sweep spanning every
mode boundary (tests/test_hll_kernel.py): same registers, same
HIP/KxQ doubles (IEEE ops replayed in the same order), same coupon
hash-table placement. Byte equality is what makes the folded sketch
interchangeable with a compacted one — ``hll_sketch_estimate`` over
it returns the identical estimate.

Format/semantics source: the public Apache DataSketches memory
layout (PreambleUtil) as observed in spark-4.1.2's bundled jar, and
the union gadget behavior probed empirically (see the test file's
sweep). No reference-repo code involved — the reference delegates
sketches to the same library (rust/lakesoul-io merge_operator.rs
keeps engine-neutral merge families).
"""

from __future__ import annotations

import struct

_KEY_MASK_26 = (1 << 26) - 1
_LIST, _SET, _HLL = 0, 1, 2
_HLL_8 = 2
_EMPTY_FLAG = 4
_OOO_FLAG = 16
_COMPACT_FLAG = 8
_FAMILY_HLL = 7
_SER_VER = 1


def _inv_pow2(v: int) -> float:
    return 2.0 ** -v


# On SET→HLL promotion DataSketches overwrites the HIP accumulator
# with the coupon-collision-corrected estimate of the (fixed) coupon
# count at the promotion threshold — cubic interpolation over its
# CouponMapping table, NOT the raw count and NOT the closed-form
# -K'·ln(1-m/K') curve (which differs in the 9th decimal). Promotion
# always fires at exactly 3·2^(lgK-5)+1 coupons, so per lgK this is
# ONE constant; the value below is Spark 4.1.2's own output at the
# lgK=12 boundary, byte-verified by tests/test_hll_kernel.py. Other
# lgK values never promote here (the engine writes lgK=12 partials);
# they refuse loudly rather than drift by a ULP.
_PROMOTION_HIP = {12: 385.00036716501364}


class _ParsedSketch:
    __slots__ = ("lgk", "mode", "ooo", "coupons", "regs",
                 "hip", "kxq0", "kxq1", "num_at_cur_min", "cur_min")

    def __init__(self):
        self.coupons = []
        self.regs = None


def _parse(b: bytes) -> _ParsedSketch | None:
    """Parse an updatable DataSketches HLL image. None for empty."""
    if b is None or len(b) < 8:
        return None
    pre_ints, ser_ver, fam, lgk, _lg_arr, flags, b6, mode_b = b[:8]
    if ser_ver != _SER_VER or fam != _FAMILY_HLL:
        raise ValueError(
            f"not a DataSketches HLL image (serVer={ser_ver}, "
            f"family={fam})"
        )
    if flags & _COMPACT_FLAG:
        raise ValueError(
            "compact HLL image — this kernel folds Spark's updatable "
            "images; read the table via LakeSoulTable.to_df()"
        )
    if flags & _EMPTY_FLAG:
        return None
    cur_mode = mode_b & 3
    tgt = (mode_b >> 2) & 3
    p = _ParsedSketch()
    p.lgk = lgk
    p.mode = cur_mode
    p.ooo = bool(flags & _OOO_FLAG)
    if cur_mode == _LIST:
        count = b6
        arr = struct.unpack_from(f"<{count}i", b, 8)
        p.coupons = [c for c in arr if c != 0]
        return p
    if cur_mode == _SET:
        (count,) = struct.unpack_from("<i", b, 8)
        n_ints = (len(b) - 12) // 4
        arr = struct.unpack_from(f"<{n_ints}i", b, 12)
        p.coupons = [c for c in arr if c != 0]
        if len(p.coupons) != count:
            raise ValueError("corrupt SET image: count != stored coupons")
        return p
    if cur_mode == _HLL:
        if tgt != _HLL_8:
            raise ValueError(
                f"HLL image with target type {tgt} — Spark emits HLL_8 "
                "only; read the table via LakeSoulTable.to_df()"
            )
        # HLL preamble: curMin lives in BYTE 6 (it is <= 64); the int
        # at offset 36 is the HLL_4 aux-exception count (always 0 for
        # HLL_8). Misreading them only shows on SATURATED sketches
        # (every register nonzero, ~35k+ distinct at lgK=12), where
        # curMin rises above 0 — covered by the saturation test.
        p.cur_min = b6
        p.hip, p.kxq0, p.kxq1 = struct.unpack_from("<ddd", b, 8)
        (p.num_at_cur_min,) = struct.unpack_from("<i", b, 32)
        k = 1 << lgk
        p.regs = bytearray(b[40:40 + k])
        if len(p.regs) != k:
            raise ValueError("corrupt HLL_8 image: truncated registers")
        return p
    raise ValueError(f"unknown HLL current mode {cur_mode}")


class _Gadget:
    """The union gadget: an HLL_8-target sketch replaying the exact
    DataSketches state machine (list→set→hll promotions, coupon hash
    placement, HIP/KxQ incremental doubles) so serialization is
    byte-identical to Spark's."""

    def __init__(self, lgk: int):
        self.lgk = lgk
        self.k = 1 << lgk
        self.mode = _LIST
        self.list_arr = [0] * 8          # LIST: insertion order
        self.list_count = 0
        self.set_arr: list[int] | None = None
        self.set_count = 0
        self.lg_arr = 3
        self.regs: bytearray | None = None
        self.hip = 0.0
        self.kxq0 = 0.0
        self.kxq1 = 0.0
        self.cur_min = 0
        self.num_at_cur_min = 0
        self.ooo = False
        self.rebuild = False
        self.empty = True

    # ------------------------------------------------------- coupons

    def coupon_update(self, coupon: int) -> None:
        self.empty = False
        if self.mode == _LIST:
            for i in range(self.list_count):
                if self.list_arr[i] == coupon:
                    return
            self.list_arr[self.list_count] = coupon
            self.list_count += 1
            if self.list_count >= 8:
                self._promote_list_to_set()
            return
        if self.mode == _SET:
            idx = self._set_find(coupon)
            if idx >= 0:
                return
            self.set_arr[~idx] = coupon
            self.set_count += 1
            # grow at 4*count > 3*capacity; at the lgK-3 cap, promote
            if 4 * self.set_count > 3 * (1 << self.lg_arr):
                if self.lg_arr == self.lgk - 3:
                    self._promote_set_to_hll()
                else:
                    self._grow_set()
            return
        self._hll_coupon_update(coupon)

    def _set_find(self, coupon: int) -> int:
        arr = self.set_arr
        mask = (1 << self.lg_arr) - 1
        probe = coupon & mask
        loop = probe
        stride = ((coupon & _KEY_MASK_26) >> self.lg_arr) | 1
        while True:
            v = arr[probe]
            if v == 0:
                return ~probe
            if v == coupon:
                return probe
            probe = (probe + stride) & mask
            if probe == loop:
                raise ValueError("coupon hash set full — corrupt image")

    def _promote_list_to_set(self) -> None:
        coupons = self.list_arr[:self.list_count]
        self.mode = _SET
        self.lg_arr = 5
        self.set_arr = [0] * 32
        self.set_count = 0
        for c in coupons:
            idx = self._set_find(c)
            if idx < 0:
                self.set_arr[~idx] = c
                self.set_count += 1

    def _grow_set(self) -> None:
        old = self.set_arr
        self.lg_arr += 1
        self.set_arr = [0] * (1 << self.lg_arr)
        for c in old:
            if c != 0:
                idx = self._set_find(c)
                self.set_arr[~idx] = c

    def _coupon_iter(self):
        """Current coupons in DataSketches iterator order (array scan)."""
        if self.mode == _LIST:
            return list(self.list_arr[:self.list_count])
        return [c for c in self.set_arr if c != 0]

    def _promote_set_to_hll(self) -> None:
        if self.lgk not in _PROMOTION_HIP:
            raise ValueError(
                f"HLL promotion constant unknown for lgK={self.lgk} "
                "(the engine writes lgK=12 sketches) — read the table "
                "via LakeSoulTable.to_df()"
            )
        coupons = self._coupon_iter()
        self._init_hll()
        for c in coupons:
            self._hll_coupon_update(c)
        # after the exact-coupon replay, HIP is RESET to the coupon
        # estimate at the promotion count (see _PROMOTION_HIP)
        self.hip = _PROMOTION_HIP[self.lgk]

    def _init_hll(self) -> None:
        self.mode = _HLL
        self.regs = bytearray(self.k)
        self.hip = 0.0
        self.kxq0 = float(self.k)
        self.kxq1 = 0.0
        self.cur_min = 0
        self.num_at_cur_min = self.k
        self.set_arr = None
        self.list_count = 0

    # ----------------------------------------------------- HLL array

    def _hll_coupon_update(self, coupon: int) -> None:
        new_v = (coupon >> 26) & 0x3F
        slot = coupon & (self.k - 1)
        old_v = self.regs[slot]
        if new_v <= old_v:
            return
        self.regs[slot] = new_v
        # HIP uses the PRE-update KxQ; then subtract old, add new
        kxq0, kxq1 = self.kxq0, self.kxq1
        self.hip += self.k / (kxq0 + kxq1)
        if old_v < 32:
            self.kxq0 = kxq0 - _inv_pow2(old_v)
        else:
            self.kxq1 = kxq1 - _inv_pow2(old_v)
        if new_v < 32:
            self.kxq0 = self.kxq0 + _inv_pow2(new_v)
        else:
            self.kxq1 = self.kxq1 + _inv_pow2(new_v)
        if old_v == 0:
            self.num_at_cur_min -= 1

    # -------------------------------------------------------- update

    def update(self, src: _ParsedSketch) -> None:
        if src is None:
            return
        if src.lgk != self.lgk:
            raise ValueError(
                f"cannot union HLL sketches of different lgK "
                f"({src.lgk} vs {self.lgk}) without downsampling — "
                "read the table via LakeSoulTable.to_df()"
            )
        if src.mode != _HLL:
            for c in src.coupons:
                self.coupon_update(c)
            return
        self.empty = False
        if self.mode != _HLL:
            # gadget still coupon-mode: the gadget BECOMES a copy of
            # the HLL source, then the old coupons replay into it
            coupons = self._coupon_iter()
            self.mode = _HLL
            self.regs = bytearray(src.regs)
            self.hip = src.hip
            self.kxq0 = src.kxq0
            self.kxq1 = src.kxq1
            self.cur_min = src.cur_min
            self.num_at_cur_min = src.num_at_cur_min
            self.ooo = src.ooo
            self.set_arr = None
            self.list_count = 0
            for c in coupons:
                self._hll_coupon_update(c)
            return
        # HLL ∪ HLL: slot-wise max; KxQ stale until rebuild; HIP is
        # ZEROED eagerly (observed: Spark's merge output carries 0.0,
        # and later coupon updates increment from there)
        regs, srcregs = self.regs, src.regs
        for i in range(self.k):
            if srcregs[i] > regs[i]:
                regs[i] = srcregs[i]
        self.hip = 0.0
        self.rebuild = True
        self.ooo = True

    def _check_rebuild(self) -> None:
        if not self.rebuild:
            return
        cur_min = 64
        num_at_cur_min = 0
        kxq0 = float(1 << self.lgk)
        kxq1 = 0.0
        for v in self.regs:
            if v > 0:
                if v < 32:
                    kxq0 += _inv_pow2(v) - 1.0
                else:
                    kxq0 -= 1.0
                    kxq1 += _inv_pow2(v)
            if v > cur_min:
                continue
            if v < cur_min:
                cur_min = v
                num_at_cur_min = 1
            else:
                num_at_cur_min += 1
        self.cur_min = cur_min
        self.num_at_cur_min = num_at_cur_min
        self.kxq0 = kxq0
        self.kxq1 = kxq1
        self.rebuild = False

    # ----------------------------------------------------- serialize

    def to_updatable_bytes(self) -> bytes | None:
        if self.empty:
            return None
        mode_with_tgt = self.mode | (_HLL_8 << 2)
        if self.mode == _LIST:
            out = bytearray(8 + 8 * 4)
            out[0:8] = bytes((2, _SER_VER, _FAMILY_HLL, self.lgk, 3, 0,
                              self.list_count, mode_with_tgt))
            struct.pack_into("<8i", out, 8, *self.list_arr)
            return bytes(out)
        if self.mode == _SET:
            n = 1 << self.lg_arr
            out = bytearray(12 + n * 4)
            out[0:8] = bytes((3, _SER_VER, _FAMILY_HLL, self.lgk,
                              self.lg_arr, 0, 0, mode_with_tgt))
            struct.pack_into("<i", out, 8, self.set_count)
            struct.pack_into(f"<{n}i", out, 12, *self.set_arr)
            return bytes(out)
        self._check_rebuild()
        out = bytearray(40 + self.k)
        flags = _OOO_FLAG if self.ooo else 0
        # byte 6 = curMin; int@32 = numAtCurMin; int@36 = HLL_4 aux
        # exception count, always 0 for HLL_8
        out[0:8] = bytes((10, _SER_VER, _FAMILY_HLL, self.lgk, 0, flags,
                          self.cur_min, mode_with_tgt))
        struct.pack_into("<ddd", out, 8, self.hip, self.kxq0, self.kxq1)
        struct.pack_into("<ii", out, 32, self.num_at_cur_min, 0)
        out[40:] = self.regs
        return bytes(out)


# DataSketches HarmonicNumbers.tableOfExactHarmonicNumbers — the
# first 25 partial sums as the library's exact double constants
# (decompiled from the bundled jar; must match bit-for-bit, a
# recomputed sum can differ in the last ULP)
_EXACT_HARMONIC = (
    0.0, 1.0, 1.5, 1.8333333333333333, 2.0833333333333335,
    2.283333333333333, 2.45, 2.592857142857143, 2.717857142857143,
    2.828968253968254, 2.9289682539682538, 3.019877344877345,
    3.103210678210678, 3.180133755133755, 3.2515623265623264,
    3.3182289932289932, 3.3807289932289932, 3.4395525226407577,
    3.4951080781963135, 3.547739657143682, 3.597739657143682,
    3.6453587047627294, 3.690813250217275, 3.73429151108684,
    3.7759581777535067,
)
_EULER_MASCHERONI = 0.5772156649015329


def _harmonic_number(n: int) -> float:
    """DataSketches HarmonicNumbers.harmonicNumber: exact table below
    25, asymptotic expansion above (same term order — IEEE-identical)."""
    import math

    if n < 25:
        return _EXACT_HARMONIC[n]
    x = float(n)
    invx2 = 1.0 / (x * x)
    s = math.log(x) + _EULER_MASCHERONI + 1.0 / (2.0 * x)
    pw = invx2
    s = s - pw * 0.08333333333333333      # 1/12
    pw = pw * invx2
    s = s + pw * 0.008333333333333333     # 1/120
    pw = pw * invx2
    s = s - pw * 0.003968253968253968     # 1/252
    pw = pw * invx2
    s = s + pw * 0.004166666666666667     # 1/240
    return s


def _cubic_interpolate(x0, y0, x1, y1, x2, y2, x3, y3, x) -> float:
    """4-point Lagrange cubic, DataSketches CubicInterpolation's exact
    expression shape (term = (y·numer)/denom, left-associated sums)."""
    l0n = (x - x1) * (x - x2) * (x - x3)
    l1n = (x - x0) * (x - x2) * (x - x3)
    l2n = (x - x0) * (x - x1) * (x - x3)
    l3n = (x - x0) * (x - x1) * (x - x2)
    l0d = (x0 - x1) * (x0 - x2) * (x0 - x3)
    l1d = (x1 - x0) * (x1 - x2) * (x1 - x3)
    l2d = (x2 - x0) * (x2 - x1) * (x2 - x3)
    l3d = (x3 - x0) * (x3 - x1) * (x3 - x2)
    t0 = (y0 * l0n) / l0d
    t1 = (y1 * l1n) / l1d
    t2 = (y2 * l2n) / l2d
    t3 = (y3 * l3n) / l3d
    return ((t0 + t1) + t2) + t3


def _cubic_x_arr_y_stride(x_arr, y_stride: float, x: float) -> float:
    """CubicInterpolation.usingXArrAndYStride: y-values are the
    implicit arithmetic sequence ``y_stride·i``; the 4-point window is
    centered on the straddle except at the array ends."""
    from bisect import bisect_right

    n1 = len(x_arr) - 1
    if x == x_arr[n1]:
        return y_stride * n1
    # findStraddle: the i with x_arr[i] <= x < x_arr[i+1] (the table
    # is strictly increasing, so bisect matches the recursive search)
    offset = bisect_right(x_arr, x) - 1
    if offset == len(x_arr) - 2:
        offset -= 2
    elif offset != 0:
        offset -= 1
    return _cubic_interpolate(
        x_arr[offset], y_stride * offset,
        x_arr[offset + 1], y_stride * (offset + 1),
        x_arr[offset + 2], y_stride * (offset + 2),
        x_arr[offset + 3], y_stride * (offset + 3),
        x,
    )


def _composite_estimate(p: _ParsedSketch) -> float:
    """DataSketches HllEstimators.hllCompositeEstimate — what Spark's
    ``hll_sketch_estimate`` computes for an out-of-order (merged)
    HLL-mode sketch: the raw Flajolet estimate bias-corrected through
    the empirical CompositeInterpolationXTable (hll_tables.py,
    extracted from the bundled jar), with the harmonic bitmap
    estimator taking over below the measured crossover."""
    import math

    from lakesoul_spark.functions.hll_tables import X_ARRS, Y_STRIDES

    lgk = p.lgk
    if not 4 <= lgk <= 3 + len(X_ARRS):
        raise ValueError(
            f"no composite-estimator table for lgK={lgk} — regenerate "
            "hll_tables.py (tools/extract_hll_tables.py)"
        )
    k = 1 << lgk
    kxq = p.kxq0 + p.kxq1
    if lgk == 4:
        corr = 0.673
    elif lgk == 5:
        corr = 0.697
    elif lgk == 6:
        corr = 0.709
    else:
        corr = 0.7213 / (1.0 + 1.079 / k)
    raw = corr * k * k / kxq
    x_arr = X_ARRS[lgk - 4]
    y_stride = float(Y_STRIDES[lgk - 4])
    n1 = len(x_arr) - 1
    if raw < x_arr[0]:
        return 0.0
    if raw > x_arr[n1]:
        return raw * ((y_stride * n1) / x_arr[n1])
    adj = _cubic_x_arr_y_stride(x_arr, y_stride, raw)
    if adj > 3.0 * k:
        return adj
    # linear-counting (bitmap) estimate from empty-register count
    num_unhit = p.num_at_cur_min if p.cur_min == 0 else 0
    if num_unhit == 0:
        lin = k * math.log(k / 0.5)
    else:
        num_hit = k - num_unhit
        lin = k * (_harmonic_number(k) - _harmonic_number(k - num_hit))
    avg = (adj + lin) / 2.0
    crossover = 0.718 if lgk == 4 else 0.672 if lgk == 5 else 0.64
    return adj if avg > crossover * k else lin


def estimate(image: bytes | None) -> float:
    """Cardinality estimate of a DataSketches HLL image WITHOUT Spark
    or the datasketches wheel — what a Torch/Ray worker calls on the
    sketch the arrow fold handed it. EXACTLY the value Spark's
    ``hll_sketch_estimate`` rounds to its long result, in every
    regime:

    - coupon modes (LIST/SET, < 385 distinct at lgK=12): the closed
      collision-corrected form ``-K'·ln(1 - m/K')`` with K' = 3·2^26 —
      within ~1e-9 relative of Spark's table-interpolated value (both
      round to the same integer count for any real workload);
    - HLL mode, in-order (built by one stream / coupon-mode unions):
      the HIP accumulator, bit-identical;
    - HLL mode, out-of-order (HLL×HLL merges): the composite
      estimator with the library's own bias-correction interpolation
      tables (hll_tables.py, extracted from the bundled DataSketches
      jar) — bit-identical to Spark's, since the register array (a
      slot-wise max) is union-order-insensitive and the composite
      estimate is a pure function of it.

    ``None`` (SQL null / empty) estimates 0.0."""
    import math

    p = _parse(image)
    if p is None:
        return 0.0
    if p.mode != _HLL:
        m = len(p.coupons)
        kp = 3.0 * (1 << 26)
        return -kp * math.log1p(-m / kp)
    if not p.ooo:
        return p.hip
    return _composite_estimate(p)


def union_sketches(images, lg_max_k: int = 12) -> bytes | None:
    """Union DataSketches HLL images (order-sensitive, like feeding
    them to ``hll_union_agg`` in row order). ``None``/empty inputs are
    skipped; returns ``None`` when nothing remains — matching SQL
    aggregate null semantics."""
    gadget = None
    for img in images:
        src = _parse(img) if img is not None else None
        if src is None:
            continue
        if gadget is None:
            gadget = _Gadget(max(src.lgk, 0) if lg_max_k is None
                             else lg_max_k)
        gadget.update(src)
    return gadget.to_updatable_bytes() if gadget is not None else None

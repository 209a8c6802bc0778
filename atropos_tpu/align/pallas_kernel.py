"""Pallas TPU kernel for the batched semi-global adapter DP.

The XLA version (:mod:`atropos_tpu.align.batched`) expresses the column
scan as ~40 separate HLO ops per column; every op round-trips VMEM and
pays dispatch overhead. This kernel runs the entire j-loop *inside* one
Pallas program: the DP state (two planes of shape [m+1, B_BLK]) lives in
registers/VMEM for the whole read batch block and the per-column update
is fused into one vector pipeline.

Three representation tricks keep the per-column op count minimal:

- **Scaled-packed cell state.** The cost plane is carried as
  ``pack = cost * SUB_BASE`` (sub-key bits zeroed between columns), so
  all cost arithmetic/comparisons happen directly on the packed value —
  no integer divide or multiply anywhere in the column loop; tie-break
  sub-keys are added into the low bits only while candidates compete
  within a column, then masked off before writeback.

- **Dead-cost clamping + single-word fused state.** Along any DP path the
  cost is non-decreasing, and every observable result (band membership,
  candidate selection, early exit, final-column selection) only inspects
  cells with cost <= k. Any cell whose cost exceeds k is therefore
  permanently dead: its exact value can never surface, only its "> k"
  property. We clamp all cost arithmetic at ``k + 1`` (deletion/insertion
  unit costs included), which shrinks the cost field to a few bits — small
  enough that the ENTIRE cell state (cost, tie-break sub-key, origin,
  matches) packs into one int32 word (:func:`_fused_layout`), so candidate
  selection is a single ``min`` and the column update runs one arithmetic
  stream instead of parallel pack/pay streams. Configurations whose bit
  budget exceeds 29 fall back to the two-plane int32 kernel below.

- **Bounded insertion relaxation.** The within-column insertion chain
  (an inclusive min-affine scan down the rows) is computed by
  ``d_max = floor(k / ins_cost)`` sequential relaxation steps
  ``P[i] = min(P[i], P[i-1] + ins_cost)`` (match cells are immune —
  they are forced constants). This is bit-exact: a chain of t insertions
  adds ``t * ins_cost`` to a non-decreasing path cost, so contributions
  from more than ``d_max`` rows above can never surface, and cells the
  truncation leaves higher are > k and only produce > k descendants.

The grid partitions the read batch into lane-sized blocks; each program
aligns the adapter against its block independently (pure data
parallelism, no cross-program communication). Reads cross the host-device
link as raw uint8 bytes (one byte per base) and are widened to the state
dtype on device, minimizing PCIe/ICI transfer volume.

Semantics are bit-identical to ``oracle.Aligner.locate`` — validated by
the differential tests in ``tests/test_pallas_align.py``.
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atropos_tpu.align.batched import (
    _error_thresholds,
    _translation_lut,
)
from atropos_tpu.align.flags import (
    ACGT_TABLE,
    IUPAC_TABLE,
    START_WITHIN_SEQ1,
    START_WITHIN_SEQ2,
    STOP_WITHIN_SEQ1,
    STOP_WITHIN_SEQ2,
)

NEG_LARGE = -(2 ** 30)

# column-loop unroll factor (env-tunable for experiments). Measured on
# v5e: unroll>1 regresses badly (bigger program, worse scheduling), so
# the default stays 1.
import os as _os


def _env_int(name, default, validate=None):
    """Read an int tunable from the environment at import time; fall back
    to (and warn about) the default on unparsable or invalid values rather
    than crashing the import."""
    raw = _os.environ.get(name)
    if raw is None:
        return default
    try:
        value = int(raw)
    except ValueError:
        value = None
    if value is None or (validate is not None and not validate(value)):
        import warnings

        warnings.warn(
            "%s=%r is invalid; using default %d" % (name, raw, default)
        )
        return default
    return value


UNROLL = _env_int("ATROPOS_TPU_PALLAS_UNROLL", 1, lambda v: v >= 1)


def _pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


def _bits(x):
    """Number of bits needed to represent values 0..x."""
    return max(1, int(x).bit_length())


def _fused_layout(m, k, L):
    """Bit layout for the single-word cell state, or None if it doesn't fit.

    Field widths: cost C = bits(3k+3) (the within-column bound under the
    dead-cost clamp: writeback base k+1, + deletion unit <= k+1, + d_max
    relaxation shifts <= k), sub-key S = bits(2m+1), origin O =
    bits(L+m) for origin+m (origin ranges [-m, L]), matches T = bits(m).
    The relaxation blocker adds 1<<30, so the real-value range must stay
    below 2**30 - that is, C+S+O+T <= 29 (int16 vector compares are
    unsupported on current TPU targets, so there is no narrower variant).
    The fused kernel additionally packs (matches, cost) into one best-key
    word as ``matches * 2048 + (1023 - cost)``, which requires cost <= 1023
    (always true in practice: large k forces the field budget over 29 long
    before k reaches 1023, but guard anyway).
    """
    C = _bits(3 * k + 3)
    S = _bits(2 * m + 1)
    O = _bits(L + m)
    T = _bits(m)
    if C + S + O + T > 29 or k + 1 > 1023:
        return None
    return dict(
        T=T,
        ORG_SHIFT=T,
        SUB_SHIFT=T + O,
        COST_SHIFT=T + O + S,
        O_MASK=(1 << O) - 1,
        T_MASK=(1 << T) - 1,
        SUB_FIELD=((1 << S) - 1) << (T + O),
        LOW_MASK=(1 << (T + O)) - 1,
    )


def _fp_threshold(thresholds, shift=16):
    """Fixed-point multiplier NUM such that, for every length in range,

        cost <= thresholds[length]  <=>  (cost << shift) <= length * NUM

    or None when no single multiplier reproduces the table exactly.
    Replaces the k-step boundary lookup (2k vector ops) with one multiply
    and one compare in the per-column hot loop. The equivalence holds iff
    ``floor(length * NUM >> shift) == thresholds[length]`` for all
    lengths, which pins NUM to an (often nonempty) integer interval.
    """
    lo, hi = 0, None
    for length in range(1, len(thresholds)):
        t = int(thresholds[length])
        lo = max(lo, -((-t << shift) // length))  # ceil(t * 2^s / length)
        top = (((t + 1) << shift) - 1) // length
        hi = top if hi is None else min(hi, top)
    if hi is None:
        return None
    if lo > hi:
        return None
    m = len(thresholds) - 1
    if m * lo >= (1 << 31):
        return None
    return lo


def _dp_kernel_fused(
    reads_ref,      # [L, B_BLK] int32 (translated query bytes, col-major)
    lengths_ref,    # [1, B_BLK] int32
    out_ref,        # [8, B_BLK] int32
    *,
    m,
    k,
    flags,
    min_overlap,
    ins_cost,
    del_cost,
    compare_ascii,
    L,
    ref_bytes,      # tuple of m ints (static)
    thresholds,     # tuple of m+1 ints (static)
    layout,
):
    """Single-plane variant of the DP column loop.

    The whole cell state rides ONE int32 word:

        state = cost << COST_SHIFT | sub << SUB_SHIFT
              | (origin + m) << ORG_SHIFT | matches

    which is only possible because of the dead-cost clamp (cost <= k+1
    needs just a few bits). Candidate selection becomes a plain ``min``:
    the (cost, sub) key occupies the high bits, and the payload bits
    below can never decide a comparison — any two candidates competing
    for a cell originate at distinct DP rows (so their sub-keys differ),
    except when both carry the value of the SAME origin row through
    equal-length insertion chains, in which case the full words are
    identical and min is trivially exact. This halves the vector-op count
    per column versus the two-plane kernel (one arithmetic stream instead
    of parallel pack/pay streams).
    """
    start_in_ref = bool(flags & START_WITHIN_SEQ1)
    start_in_query = bool(flags & START_WITHIN_SEQ2)
    stop_in_ref = bool(flags & STOP_WITHIN_SEQ1)
    stop_in_query = bool(flags & STOP_WITHIN_SEQ2)

    COST_SHIFT = layout["COST_SHIFT"]
    SUB_SHIFT = layout["SUB_SHIFT"]
    ORG_SHIFT = layout["ORG_SHIFT"]
    O_MASK = layout["O_MASK"]
    T_MASK = layout["T_MASK"]
    SUB_FIELD = layout["SUB_FIELD"]
    LOW_MASK = layout["LOW_MASK"]
    COST_UNIT = 1 << COST_SHIFT
    SUB_UNIT = 1 << SUB_SHIFT
    ORG_UNIT = 1 << ORG_SHIFT
    BIG = 1 << 30  # relaxation blocker: beats any real state value

    CLAMP = k + 1
    CLAMP_STATE = CLAMP * COST_UNIT
    del_unit = min(del_cost, CLAMP)

    B = lengths_ref.shape[1]
    M1 = m + 1

    n = lengths_ref[0:1, :]  # [1, B]
    max_n = n if start_in_query else jnp.minimum(n, m + k)
    min_n = jnp.zeros_like(n) if stop_in_query else jnp.maximum(0, n - m - k)

    rows = lax.broadcasted_iota(jnp.int32, (M1, B), 0)

    # initial column (reference ``_align.pyx:333-352``)
    if not start_in_ref and not start_in_query:
        cost0 = jnp.maximum(rows, min_n) * ins_cost
        origin0 = jnp.zeros((M1, B), jnp.int32)
    elif start_in_ref and not start_in_query:
        cost0 = jnp.broadcast_to(min_n * ins_cost, (M1, B))
        origin0 = jnp.minimum(0, min_n - rows)
    elif not start_in_ref and start_in_query:
        cost0 = rows * ins_cost
        origin0 = jnp.maximum(0, min_n - rows)
    else:
        cost0 = jnp.minimum(rows, min_n) * ins_cost
        origin0 = min_n - rows
    state0 = jnp.minimum(cost0, CLAMP) * COST_UNIT + (origin0 + m) * ORG_UNIT

    last0 = jnp.full((1, B), m if start_in_ref else min(m, k + 1), jnp.int32)
    # Best-candidate state: one packed key word ``matches * 2048 +
    # (1023 - cost)`` (strictly monotone in the reference's max-matches /
    # min-cost order; cost <= k+1 <= 1023 by _fused_layout), plus the
    # query_stop / origin payload. key = -1 means "no candidate yet", and
    # a column-loop candidate always has ref_stop == m, so ref_stop needs
    # no per-column word at all. An exact match (cost 0, matches == m)
    # yields the maximum possible key, which no later candidate can beat
    # under the strict > comparison — this reproduces the scalar early
    # exit without a separate `done` freeze.
    best0 = (
        jnp.full((1, B), -1, jnp.int32),     # packed (matches, cost) key
        n,                                   # query_stop
        jnp.zeros((1, B), jnp.int32),        # origin
    )

    # adapter chars built in-kernel from static ints via iota-select
    iota_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    ref_col = jnp.zeros((m, 1), jnp.int32)
    for r, byte in enumerate(ref_bytes):
        ref_col = jnp.where(iota_m == r, int(byte), ref_col)

    t_arrv = list(thresholds)
    boundaries = [
        idx for idx in range(1, M1) if t_arrv[idx] > t_arrv[idx - 1]
    ]
    fp_num = _fp_threshold(t_arrv)

    def cost_ok(cost, length):
        """cost <= thresholds[length], via the fixed-point form when one
        exists (1 mul + 1 compare) else the k-step boundary lookup."""
        if fp_num is not None:
            return (cost << 16) <= length * fp_num
        out = jnp.full(length.shape, int(t_arrv[0]), jnp.int32)
        for b_idx in boundaries:
            step = int(t_arrv[b_idx] - t_arrv[b_idx - 1])
            out = out + (length >= b_idx).astype(jnp.int32) * step
        return cost <= out

    d_max = 0 if ins_cost > k else min(M1 - 1, k // ins_cost)
    SHIFT = min(ins_cost, CLAMP) * COST_UNIT

    pos_i = rows[1:M1, 0:1]  # [m, 1]
    # per-row candidate constants: add cost + sub-key (+1 match) in one go
    match_const = (m + pos_i) * SUB_UNIT + 1
    mm_const = COST_UNIT + (m - pos_i) * SUB_UNIT
    del_const = del_unit * COST_UNIT + (m + pos_i) * SUB_UNIT

    def column(j, carry):
        state, last, best = carry
        b_key, b_query_stop, b_origin = best
        qc = reads_ref[pl.ds(j - 1, 1), :]  # [1, B]
        active = (j > min_n) & (j <= max_n)

        # row 0 (reference ``_align.pyx:385-388``); stored sub bits are
        # zero, so adding m*SUB_UNIT sets the sub-key exactly
        if start_in_query:
            # origin := j, keep cost + matches
            new0 = (
                (state[0:1, :] & ~((O_MASK << ORG_SHIFT) | SUB_FIELD))
                + ((j + m) * ORG_UNIT + m * SUB_UNIT)
            )
        else:
            # cost := min(j*ins, clamp), keep origin + matches
            new0 = (state[0:1, :] & LOW_MASK) + (
                jnp.minimum(j * ins_cost, CLAMP) * COST_UNIT + m * SUB_UNIT
            )

        if compare_ascii:
            eq = ref_col == qc
        else:
            eq = (ref_col & qc) != 0

        diag = state[0:m, :]
        cand_match = diag + match_const
        cand_mm = diag + mm_const
        cand_del = state[1:M1, :] + del_const
        elem = jnp.where(eq, cand_match, jnp.minimum(cand_mm, cand_del))

        cur = jnp.concatenate([new0, elem], axis=0)
        # insertion relaxation over rows 1..m: sources shift down one row
        # per step; match cells are immune (blocked via BIG)
        if d_max:
            blocked = jnp.where(eq, BIG, SHIFT)
            for _ in range(d_max):
                cand = cur[0:m, :] + blocked
                cur = jnp.concatenate(
                    [cur[0:1, :], jnp.minimum(cand, cur[1:M1, :])], axis=0
                )

        rows_le_last = rows <= last
        write = rows_le_last & (active != 0)
        # zero the sub-key field and saturate dead costs at k+1 (payload
        # of dead cells is zeroed too - never observable)
        cur_w = jnp.minimum(cur & ~SUB_FIELD, CLAMP_STATE)
        state = jnp.where(write, cur_w, state)

        in_band = rows_le_last & (state < CLAMP_STATE)
        L_idx = jnp.max(jnp.where(in_band, rows, -1), axis=0, keepdims=True)
        new_last = jnp.minimum(L_idx + 1, m)

        if stop_in_query:
            at_bottom = active & (L_idx == m)
            state_m = state[m : m + 1, :]
            cost_m = jnp.right_shift(state_m, COST_SHIFT)
            org_m = (jnp.right_shift(state_m, ORG_SHIFT) & O_MASK) - m
            mat_m = state_m & T_MASK
            # origin + m is non-negative by construction, so the length
            # m + min(origin, 0) is already in [0, m]: no clip needed
            length_m = m + jnp.minimum(org_m, 0)
            key_m = mat_m * 2048 + (1023 - cost_m)
            ok = (
                at_bottom
                & (length_m >= min_overlap)
                & cost_ok(cost_m, length_m)
                & (key_m > b_key)
            )
            b_key = jnp.where(ok, key_m, b_key)
            b_query_stop = jnp.where(ok, j, b_query_stop)
            b_origin = jnp.where(ok, org_m, b_origin)

        last = jnp.where(active, new_last, last)
        best = (b_key, b_query_stop, b_origin)
        return (state, last, best)

    state, last, best = lax.fori_loop(
        1, L + 1, column, (state0, last0, best0), unroll=UNROLL
    )
    cost_c = jnp.right_shift(state, COST_SHIFT)
    org_c = (jnp.right_shift(state, ORG_SHIFT) & O_MASK) - m
    mat_c = state & T_MASK
    b_key, b_query_stop, b_origin = best

    # final-column scan (reference ``_align.pyx:461-474``)
    first_i = 0 if stop_in_ref else m
    lengths_i = rows + jnp.minimum(org_c, 0)
    lt = jnp.clip(lengths_i, 0, m)

    valid = (
        (rows >= first_i)
        & (lengths_i >= min_overlap)
        & cost_ok(cost_c, lt)
        & (jnp.broadcast_to(max_n == n, (M1, B)))
    )
    keyc = mat_c * 2048 + (1023 - cost_c)  # cost_c <= k+1 <= 1023
    key = keyc * (m + 2) + (m + 1 - rows)
    key = jnp.where(valid, key, NEG_LARGE)
    best_key = jnp.max(key, axis=0, keepdims=True)
    any_valid = best_key > NEG_LARGE
    sel = (key == best_key) & valid
    best_idx = jnp.max(jnp.where(sel, rows, -1), axis=0, keepdims=True)
    pick = rows == best_idx
    take = lambda arr: jnp.max(
        jnp.where(pick, arr, NEG_LARGE), axis=0, keepdims=True
    )
    cand_key = take(keyc)
    cand_org = take(org_c)
    # ties keep the column-loop candidate (an earlier query_stop), exactly
    # the reference's preference order
    better = any_valid & (cand_key > b_key)
    b_key = jnp.where(better, cand_key, b_key)
    b_ref_stop = jnp.where(better, best_idx, jnp.int32(m))
    b_query_stop = jnp.where(better, n, b_query_stop)
    b_origin = jnp.where(better, cand_org, b_origin)

    found_mask = b_key >= 0
    b_matches = jnp.where(found_mask, jnp.right_shift(b_key, 11), 0)
    b_cost = jnp.where(found_mask, 1023 - (b_key & 2047), m + n)
    found = found_mask.astype(jnp.int32)
    start1 = jnp.where(b_origin >= 0, 0, -b_origin)
    start2 = jnp.where(b_origin >= 0, b_origin, 0)

    out_ref[0:1, :] = found
    out_ref[1:2, :] = start1
    out_ref[2:3, :] = b_ref_stop
    out_ref[3:4, :] = start2
    out_ref[4:5, :] = b_query_stop
    out_ref[5:6, :] = b_matches
    out_ref[6:7, :] = b_cost
    out_ref[7:8, :] = jnp.zeros((1, B), jnp.int32)


def _dp_kernel(
    reads_ref,      # [L, B_BLK] state-dtype (translated query bytes, col-major)
    lengths_ref,    # [1, B_BLK] int32
    out_ref,        # [8, B_BLK] int32
    *,
    m,
    k,
    flags,
    min_overlap,
    ins_cost,
    del_cost,
    compare_ascii,
    L,
    ref_bytes,      # tuple of m ints (static)
    thresholds,     # tuple of m+1 ints (static)
    state_dtype,
):
    start_in_ref = bool(flags & START_WITHIN_SEQ1)
    start_in_query = bool(flags & START_WITHIN_SEQ2)
    stop_in_ref = bool(flags & STOP_WITHIN_SEQ1)
    stop_in_query = bool(flags & STOP_WITHIN_SEQ2)

    SUB_BASE = _pow2(2 * m + 2)
    LOG_SUB = SUB_BASE.bit_length() - 1
    SUB_MASK = SUB_BASE - 1
    PAY_BASE = _pow2(m + 1)
    LOG_PAY = PAY_BASE.bit_length() - 1
    PAY_MASK = PAY_BASE - 1
    # dead-cost clamp: cells with cost > k are permanently dead and only
    # their "> k" property is observable, so all cost arithmetic saturates
    # at k+1 (see module docstring)
    CLAMP = k + 1
    CLAMP_PACK = CLAMP * SUB_BASE
    del_unit = min(del_cost, CLAMP)

    B = lengths_ref.shape[1]
    M1 = m + 1

    n = lengths_ref[0:1, :]  # [1, B]
    if start_in_query:
        max_n = n
    else:
        max_n = jnp.minimum(n, m + k)
    if stop_in_query:
        min_n = jnp.zeros_like(n)
    else:
        min_n = jnp.maximum(0, n - m - k)

    rows = lax.broadcasted_iota(jnp.int32, (M1, B), 0)

    # initial column (reference ``_align.pyx:333-352``)
    if not start_in_ref and not start_in_query:
        cost0 = jnp.maximum(rows, min_n) * ins_cost
        origin0 = jnp.zeros((M1, B), jnp.int32)
    elif start_in_ref and not start_in_query:
        cost0 = jnp.broadcast_to(min_n * ins_cost, (M1, B))
        origin0 = jnp.minimum(0, min_n - rows)
    elif not start_in_ref and start_in_query:
        cost0 = rows * ins_cost
        origin0 = jnp.maximum(0, min_n - rows)
    else:
        cost0 = jnp.minimum(rows, min_n) * ins_cost
        origin0 = min_n - rows
    pack0 = (jnp.minimum(cost0, CLAMP) * SUB_BASE).astype(state_dtype)
    pay0 = ((origin0 + m) * PAY_BASE).astype(state_dtype)

    last0 = jnp.full((1, B), m if start_in_ref else min(m, k + 1), jnp.int32)
    done0 = jnp.zeros((1, B), jnp.int32)

    best0 = (
        jnp.full((1, B), m, jnp.int32),     # ref_stop
        n,                                   # query_stop
        m + n,                               # cost
        jnp.zeros((1, B), jnp.int32),        # origin
        jnp.zeros((1, B), jnp.int32),        # matches
    )

    # adapter chars / thresholds built in-kernel from static ints via
    # iota-select (Pallas kernels cannot capture array constants)
    iota_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    ref_col = jnp.zeros((m, 1), jnp.int32)
    for r, byte in enumerate(ref_bytes):
        ref_col = jnp.where(iota_m == r, int(byte), ref_col)
    ref_col = ref_col.astype(state_dtype)
    # thresholds[len] = floor(err*len) is a monotone step function with at
    # most k steps; represent it as its step boundaries so a lookup is k
    # adds of (len >= boundary) instead of an m+1-way one-hot select
    t_arrv = list(thresholds)
    boundaries = [
        idx for idx in range(1, M1) if t_arrv[idx] > t_arrv[idx - 1]
    ]

    def thresh_of(length):
        out = jnp.full(length.shape, int(t_arrv[0]), jnp.int32)
        for b_idx in boundaries:
            step = int(t_arrv[b_idx] - t_arrv[b_idx - 1])
            out = out + (length >= b_idx).astype(jnp.int32) * step
        return out

    # Insertion relaxation distance bound (see module docstring): only
    # chains of at most floor(k/ins_cost) insertions can ever be
    # observable. For the common TruSeq case (m=33, k=3, ins_cost=1) this
    # is 3 cheap relaxation steps.
    d_max = 0 if ins_cost > k else min(M1 - 1, k // ins_cost)
    SHIFT = min(ins_cost, CLAMP) * SUB_BASE

    pos_i = rows[1:M1, 0:1].astype(state_dtype)
    sub_diag = m + pos_i      # diagonal-born candidates (match or mismatch)
    sub_del = m + pos_i       # deletion-born candidates
    sub_diag_mm = m - pos_i   # mismatch diagonal candidates

    def column(j, carry):
        pack_c, pay_c, last, best, done = carry
        b_ref_stop, b_query_stop, b_cost, b_origin, b_matches = best
        qc = reads_ref[pl.ds(j - 1, 1), :]  # [1, B] state-dtype
        active = (j > min_n) & (j <= max_n) & (done == 0)

        # row 0 (reference ``_align.pyx:385-388``); state sub-bits are
        # zero, so adding the sub-key is exact
        if start_in_query:
            new0_pack = pack_c[0:1, :] + state_dtype(m)
            new0_pay = ((j + m) * PAY_BASE).astype(state_dtype) + (
                pay_c[0:1, :] & PAY_MASK
            )
        else:
            new0_pack = jnp.broadcast_to(
                (jnp.minimum(j * ins_cost, CLAMP) * SUB_BASE + m).astype(
                    state_dtype
                ),
                (1, B),
            )
            new0_pay = pay_c[0:1, :]

        if compare_ascii:
            eq = ref_col == qc
        else:
            eq = (ref_col & qc) != 0

        # local candidate per cell: match -> forced diag; mismatch ->
        # min(diag + 1, old + del_cost), diag winning ties. All cost
        # arithmetic happens on the scaled pack directly.
        diag_pack = pack_c[0:m, :]
        diag_pay = pay_c[0:m, :]
        del_pack = pack_c[1:M1, :] + (del_unit * SUB_BASE + sub_del)
        diag_mm_pack = diag_pack + (SUB_BASE + sub_diag_mm)
        pick_diag = diag_mm_pack <= del_pack
        loc_pack = jnp.where(pick_diag, diag_mm_pack, del_pack)
        loc_pay = jnp.where(pick_diag, diag_pay, pay_c[1:M1, :])

        elem_pack = jnp.where(eq, diag_pack + sub_diag, loc_pack)
        elem_pay = jnp.where(eq, diag_pay + state_dtype(1), loc_pay)

        pack = jnp.concatenate([new0_pack, elem_pack], axis=0)
        pay = jnp.concatenate([new0_pay, elem_pay], axis=0)
        # insertion relaxation over rows 1..m (row 0 and match cells are
        # immune: a match cell's value is forced to the diagonal)
        for _ in range(d_max):
            cand = pack[0:m, :] + state_dtype(SHIFT)
            tail_pack = pack[1:M1, :]
            take = (cand < tail_pack) & (~eq)
            pack = jnp.concatenate(
                [pack[0:1, :], jnp.where(take, cand, tail_pack)], axis=0
            )
            pay = jnp.concatenate(
                [pay[0:1, :], jnp.where(take, pay[0:m, :], pay[1:M1, :])],
                axis=0,
            )

        rows_le_last = rows <= last
        write = rows_le_last & (active != 0)
        # mask sub-key bits and saturate dead costs at k+1 so next-column
        # arithmetic stays within the state dtype's bounds
        pack_w = jnp.minimum(pack & ~SUB_MASK, state_dtype(CLAMP_PACK))
        pack_c = jnp.where(write, pack_w, pack_c)
        pay_c = jnp.where(write, pay, pay_c)

        in_band = rows_le_last & (pack_c < state_dtype((k + 1) * SUB_BASE))
        L_idx = jnp.max(jnp.where(in_band, rows, -1), axis=0, keepdims=True)
        new_last = jnp.minimum(L_idx + 1, m)

        if stop_in_query:
            at_bottom = active & (L_idx == m)
            pay_m = pay_c[m : m + 1, :].astype(jnp.int32)
            org_m = jnp.right_shift(pay_m, LOG_PAY) - m
            mat_m = pay_m & PAY_MASK
            # clip like the final-column path: the PAY_BASE packing keeps
            # origin >= -m, but an out-of-range payload must reject (the
            # boundary form of thresh_of would otherwise extrapolate)
            length_m = jnp.clip(m + jnp.minimum(org_m, 0), 0, m)
            cost_m = jnp.right_shift(
                pack_c[m : m + 1, :].astype(jnp.int32), LOG_SUB
            )
            thresh_m = thresh_of(length_m)
            ok = (
                at_bottom
                & (length_m >= min_overlap)
                & (cost_m <= thresh_m)
                & ((mat_m > b_matches) | ((mat_m == b_matches) & (cost_m < b_cost)))
            )
            b_ref_stop = jnp.where(ok, m, b_ref_stop)
            b_query_stop = jnp.where(ok, j, b_query_stop)
            b_cost = jnp.where(ok, cost_m, b_cost)
            b_origin = jnp.where(ok, org_m, b_origin)
            b_matches = jnp.where(ok, mat_m, b_matches)
            done = jnp.where(
                ok & (cost_m == 0) & (mat_m == m), jnp.int32(1), done
            )

        last = jnp.where(active, new_last, last)
        best = (b_ref_stop, b_query_stop, b_cost, b_origin, b_matches)
        return (pack_c, pay_c, last, best, done)

    pack_c, pay_c, last, best, done = lax.fori_loop(
        1, L + 1, column, (pack0, pay0, last0, best0, done0),
        unroll=UNROLL,
    )
    cost_c = jnp.right_shift(pack_c.astype(jnp.int32), LOG_SUB)
    b_ref_stop, b_query_stop, b_cost, b_origin, b_matches = best

    pay32 = pay_c.astype(jnp.int32)
    org_c = pay32 // PAY_BASE - m
    mat_c = pay32 % PAY_BASE

    # final-column scan (reference ``_align.pyx:461-474``)
    first_i = 0 if stop_in_ref else m
    lengths_i = rows + jnp.minimum(org_c, 0)
    lt = jnp.clip(lengths_i, 0, m)
    # per-cell threshold lookup via the step-boundary form (k adds
    # instead of an m+1-way one-hot select; no gathers inside the kernel)
    thresh_cells = thresh_of(lt)

    valid = (
        (rows >= first_i)
        & (lengths_i >= min_overlap)
        & (cost_c <= thresh_cells)
        & (jnp.broadcast_to(max_n == n, (M1, B)))
    )
    cost_clamped = jnp.minimum(cost_c, 1023)
    key = mat_c * 2048 + (1023 - cost_clamped)
    key = key * (m + 2) + (m + 1 - rows)
    key = jnp.where(valid, key, NEG_LARGE)
    best_key = jnp.max(key, axis=0, keepdims=True)
    any_valid = best_key > NEG_LARGE
    sel = (key == best_key) & valid
    best_idx = jnp.max(jnp.where(sel, rows, -1), axis=0, keepdims=True)
    pick = rows == best_idx
    take = lambda arr: jnp.max(
        jnp.where(pick, arr, NEG_LARGE), axis=0, keepdims=True
    )
    cand_cost = take(cost_c)
    cand_mat = take(mat_c)
    cand_org = take(org_c)
    better = any_valid & (
        (cand_mat > b_matches) | ((cand_mat == b_matches) & (cand_cost < b_cost))
    )
    b_ref_stop = jnp.where(better, best_idx, b_ref_stop)
    b_query_stop = jnp.where(better, n, b_query_stop)
    b_cost = jnp.where(better, cand_cost, b_cost)
    b_origin = jnp.where(better, cand_org, b_origin)
    b_matches = jnp.where(better, cand_mat, b_matches)

    found = (b_cost != (m + n)).astype(jnp.int32)
    start1 = jnp.where(b_origin >= 0, 0, -b_origin)
    start2 = jnp.where(b_origin >= 0, b_origin, 0)

    out_ref[0:1, :] = found
    out_ref[1:2, :] = start1
    out_ref[2:3, :] = b_ref_stop
    out_ref[3:4, :] = start2
    out_ref[4:5, :] = b_query_stop
    out_ref[5:6, :] = b_matches
    out_ref[6:7, :] = b_cost
    out_ref[7:8, :] = jnp.zeros((1, B), jnp.int32)


class PallasAligner:
    """Pallas-kernel counterpart of :class:`BatchAligner` (same result
    contract, same bit-exact semantics; the comparison mode — raw byte
    equality vs IUPAC bitwise-AND — is a static kernel parameter exactly
    as in the scalar kernel)."""

    # batch tile width; must stay a positive multiple of the 128-lane TPU
    # tile or Mosaic rejects the layout at compile time. 256 measured best
    # on v5e at saturating batches (round-4 sweep, tools/sweep_kernel.py:
    # 13.2-14.0M reads/s at BATCH=65536 vs 12.2M for 512; table in
    # PERF.md)
    BLOCK = _env_int(
        "ATROPOS_TPU_PALLAS_BLOCK", 256, lambda v: v > 0 and v % 128 == 0
    )
    INTERPRET = False  # set True for CPU interpret-mode testing

    def __init__(
        self,
        reference,
        max_error_rate,
        flags,
        wildcard_ref=False,
        wildcard_query=False,
        min_overlap=1,
        indel_cost=1,
    ):
        self.reference = reference
        self.max_error_rate = max_error_rate
        self.flags = flags
        self.min_overlap = min_overlap
        self.indel_cost = indel_cost
        m = len(reference)
        self.m = m
        self.k = int(max_error_rate * m)

        ref_b = reference.encode("ascii")
        if wildcard_ref:
            ref_b = ref_b.translate(IUPAC_TABLE)
        elif wildcard_query:
            ref_b = ref_b.translate(ACGT_TABLE)
        self._ref_np = np.frombuffer(ref_b, dtype=np.uint8).astype(np.int32)
        self._thresholds_np = _error_thresholds(m, max_error_rate)
        self._query_lut_np = _translation_lut(
            wildcard_ref, wildcard_query, for_query=True
        )
        self._compare_ascii = not (wildcard_ref or wildcard_query)
        self._kernels = {}

    def _get_kernel(self, L, B, ndev=1):
        key = (L, B, ndev)
        if key not in self._kernels:
            m = self.m
            if self._compare_ascii:
                ref_bytes = tuple(
                    int(b) for b in self.reference.encode("ascii")
                )
            else:
                ref_bytes = tuple(int(b) for b in self._ref_np)
            common = dict(
                m=m,
                k=self.k,
                flags=self.flags,
                min_overlap=self.min_overlap,
                ins_cost=self.indel_cost,
                del_cost=self.indel_cost,
                compare_ascii=self._compare_ascii,
                L=L,
                ref_bytes=ref_bytes,
                thresholds=tuple(int(t) for t in self._thresholds_np),
            )
            layout = _fused_layout(m, self.k, L)
            if layout is not None:
                kernel = functools.partial(
                    _dp_kernel_fused, layout=layout, **common
                )
            else:
                # wide configurations (very long adapters/reads): two-plane
                # int32 state (int16 vector compares are unsupported on
                # current TPU targets, so there is no narrower fallback)
                kernel = functools.partial(
                    _dp_kernel, state_dtype=jnp.int32, **common
                )
            # per-shard batch width: the grid runs over this device's slice
            B_shard = B // ndev
            grid = (B_shard // self.BLOCK,)
            blk = self.BLOCK

            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, B_shard), jnp.int32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((L, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, blk), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                interpret=self.INTERPRET,
            )

            def widened(reads_u8, lens, _call=call):
                # bytes cross the link as uint8; widen on device
                return _call(reads_u8.astype(jnp.int32), lens)

            entry = widened
            if ndev > 1:
                # multi-chip: split the batch (lane) axis over the local
                # mesh; each device runs the identical kernel on its slice
                from jax.sharding import PartitionSpec as P

                from atropos_tpu.parallel import (
                    READS_AXIS,
                    _shard_map,
                    data_parallel_mesh,
                )

                entry = _shard_map(
                    widened,
                    data_parallel_mesh(),
                    in_specs=(P(None, READS_AXIS), P(None, READS_AXIS)),
                    out_specs=P(None, READS_AXIS),
                )
            self._kernels[key] = jax.jit(entry)
        return self._kernels[key]

    def locate_device(self, reads_T_dev, lengths_row_dev):
        """Device-resident variant for async pipelines: reads come
        pre-transposed as a [L, B] uint8 device array (already
        wildcard-translated unless ``compare_ascii``), lengths as [1, B]
        int32; B must be a multiple of BLOCK. Returns the raw [8, B]
        int32 device array (rows: found, start1, stop1, start2, stop2,
        matches, cost, 0) without synchronizing with the host."""
        L, B = reads_T_dev.shape
        if B % self.BLOCK:
            raise ValueError(
                "device batch %d not a multiple of BLOCK %d" % (B, self.BLOCK)
            )
        return self._get_kernel(L, B, 1)(reads_T_dev, lengths_row_dev)

    def locate_batch(self, reads_u8, lengths):
        """Align the adapter against every read; same contract as
        ``BatchAligner.locate_batch``."""
        from atropos_tpu.parallel import SHARD_COUNTS, data_parallel_mesh

        reads_u8 = np.asarray(reads_u8)
        lengths = np.asarray(lengths, dtype=np.int32)
        batch, L = reads_u8.shape
        mesh = data_parallel_mesh()
        ndev = mesh.devices.size if mesh is not None else 1
        if ndev > 1:
            SHARD_COUNTS["sharded_calls"] += 1
        tile = self.BLOCK * ndev
        pad_b = ((batch + tile - 1) // tile) * tile
        L_pad = max(8, L)

        if self._compare_ascii:
            translated = reads_u8
        else:
            translated = self._query_lut_np[reads_u8]

        reads_T = np.zeros((L_pad, pad_b), dtype=np.uint8)
        reads_T[:L, :batch] = translated.T
        len_pad = np.zeros((1, pad_b), dtype=np.int32)
        len_pad[0, :batch] = lengths

        kernel = self._get_kernel(L_pad, pad_b, ndev)
        out = np.asarray(kernel(jnp.asarray(reads_T), jnp.asarray(len_pad)))
        return dict(
            found=out[0, :batch].astype(bool),
            start1=out[1, :batch],
            stop1=out[2, :batch],
            start2=out[3, :batch],
            stop2=out[4, :batch],
            matches=out[5, :batch],
            cost=out[6, :batch],
        )


# ---------------------------------------------------------------------------
# Pallas diagonal match-count kernel (insert matcher's device core)
# ---------------------------------------------------------------------------


def _diag_counts_kernel(refs_ref, queries_ref, len_ref, out_ref, *, W):
    """counts[s, b] = sum_t<(len_b - s) [ref[s+t, b] == query[t, b]].

    Whole-loop on-chip variant of ``batched._diagonal_match_counts``
    (reference no-indel MultiAligner collapse, ``_align.pyx:548-787``):
    the reference plane rotates one sublane per step (pltpu.roll) while
    the query plane stays fixed, so every diagonal is one masked
    vector-compare + sublane reduction.
    """
    queries = queries_ref[...]
    lens = len_ref[0:1, :]
    rows = lax.broadcasted_iota(jnp.int32, queries.shape, 0)

    def step(s, ref_cur):
        eq = (ref_cur == queries) & (rows < (lens - s))
        out_ref[pl.ds(s, 1), :] = jnp.sum(
            eq.astype(jnp.int32), axis=0, keepdims=True
        )
        # pltpu.roll wants a non-negative shift: W-1 forward == 1 backward
        return pltpu.roll(ref_cur, W - 1, 0)

    lax.fori_loop(0, W, step, refs_ref[...], unroll=1)


def _i32_const(x):
    """Python int -> int32 two's-complement constant (avoids the jit
    argument-overflow error for values with bit 31 set)."""
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= (1 << 31) else x


_FIELD_ONES = 0x11111111  # one bit per 4-bit field


def _packed_diag_kernel(pref_ref, pq_ref, out_ref, *, W, RW, OUTR):
    """Bit-packed diagonal match counter.

    Inputs are 4-bit symbol codes packed 8 per int32 word along the
    position axis (``pref``/``pq``: [PAD, B] / [RW, B]); out-of-range
    positions carry distinct sentinel codes (ref 14, query 15), so the
    valid-range condition ``t < len - s`` needs NO masking — sentinels
    simply never compare equal. Output: [OUTR, B] int32 with FOUR 8-bit
    diagonal counts per word (counts <= W <= 255).

    Each diagonal s reads the ref plane at a STATIC word offset and
    STATIC bit shift (s = 8*(s//8) + s%8), making every diagonal an
    independent ~20-op dataflow with no loop carry, no pltpu.roll, and
    no sequential dependence — and the packed output keeps the written
    block 4x smaller than a [W, B] counts plane, which measures as the
    dominant cost of the unpacked kernel (26 MB -> 6.5 MB per 64k
    batch: 2.6M -> 8.0M pairs/s on v5e). Field equality is branch-free
    bit arithmetic: x = a ^ b; a 4-bit field is equal iff all four bits
    of x are zero; the per-word equal-field count is the classic
    multiply-popcount ``(eq * 0x11111111) >> 28``."""
    P = pref_ref[...]
    Q = pq_ref[0:RW, :]

    def counts_for(s):
        a, sh = s // 8, 4 * (s % 8)
        lo = P[a : a + RW, :]
        if sh:
            hi = P[a + 1 : a + 1 + RW, :]
            shifted = ((lo >> sh) & _i32_const((1 << (32 - sh)) - 1)) | (
                hi << (32 - sh)
            )
        else:
            shifted = lo
        x = shifted ^ Q
        nz = x | (x >> 1) | (x >> 2) | (x >> 3)
        eq = jnp.bitwise_not(nz) & _FIELD_ONES
        cnt = jnp.right_shift(eq * _FIELD_ONES, 28) & 15
        return jnp.sum(cnt, axis=0, keepdims=True)

    for o in range(OUTR):
        word = jnp.zeros((1, P.shape[1]), jnp.int32)
        for f in range(4):
            s = o * 4 + f
            if s < W:
                word = word | (counts_for(s) << (8 * f))
        out_ref[pl.ds(o, 1), :] = word


class PallasPackedInsertMatcher:
    """Packed-code diagonal matcher: encodes both byte planes into a
    shared <=14-symbol code alphabet (plus per-plane sentinels), packs 8
    codes per int32, and runs :func:`_packed_diag_kernel`. Bit-identical
    counts to ``batched._diagonal_match_counts`` whenever the combined
    alphabet fits (the caller checks :meth:`usable` and falls back to
    :class:`PallasInsertMatcher` otherwise)."""

    BLOCK = _env_int(
        "ATROPOS_TPU_PALLAS_BLOCK", 256, lambda v: v > 0 and v % 128 == 0
    )
    INTERPRET = False
    MAX_SYMBOLS = 14  # codes 0..13; 14/15 are the ref/query sentinels

    def __init__(self, symbols):
        """``symbols``: iterable of the byte values that may appear in
        EITHER plane (ref bytes after complement, query bytes raw)."""
        self.symbols = tuple(sorted(set(int(s) for s in symbols)))
        self._kernels = {}

    def usable(self, W):
        return len(self.symbols) <= self.MAX_SYMBOLS and W <= 255

    def _get_kernel(self, W, B):
        key = (W, B)
        if key not in self._kernels:
            RW = -(-W // 8)
            PAD = RW + (W - 1) // 8 + 2
            OUTR = -(-W // 4)
            grid = (B // self.BLOCK,)
            blk = self.BLOCK
            self._kernels[key] = pl.pallas_call(
                functools.partial(
                    _packed_diag_kernel, W=W, RW=RW, OUTR=OUTR
                ),
                out_shape=jax.ShapeDtypeStruct((OUTR, B), jnp.int32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((PAD, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((PAD, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((OUTR, blk), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                interpret=self.INTERPRET,
            )
        return self._kernels[key]

    def _encode_pack(self, plane_T, lengths_row, sentinel, W):
        """[W, B] int32 byte plane -> [PAD, B] packed 4-bit code plane
        (traced; composes into the caller's jitted step)."""
        RW = -(-W // 8)
        PAD = RW + (W - 1) // 8 + 2
        B = plane_T.shape[1]
        code = jnp.full((W, B), sentinel, jnp.int32)
        for ci, sym in enumerate(self.symbols):
            code = jnp.where(plane_T[:W] == sym, ci, code)
        t_iota = lax.broadcasted_iota(jnp.int32, (W, B), 0)
        code = jnp.where(t_iota < lengths_row, code, sentinel)
        rows = []
        for r in range(RW):
            acc = jnp.zeros((1, B), jnp.int32)
            for f in range(8):
                t = r * 8 + f
                if t < W:
                    acc = acc | (code[t : t + 1, :] << (4 * f))
                else:
                    acc = acc | jnp.int32(_i32_const(sentinel << (4 * f)))
            rows.append(acc)
        pad = jnp.full(
            (PAD - RW, B), jnp.int32(_i32_const(sentinel * _FIELD_ONES))
        )
        return jnp.concatenate(rows + [pad], axis=0)

    def counts_packed(self, refs_T, queries_T, lengths_row):
        """[ceil(W/4), B] int32: four 8-bit diagonal counts per word
        (count of diagonal s in byte s%4 of word s//4). Device arrays
        in/out; traced-composable."""
        W, B = queries_T.shape
        if B % self.BLOCK:
            raise ValueError(
                "batch %d not a multiple of BLOCK %d" % (B, self.BLOCK)
            )
        pref = self._encode_pack(
            refs_T.astype(jnp.int32), lengths_row, 14, W
        )
        pq = self._encode_pack(
            queries_T.astype(jnp.int32), lengths_row, 15, W
        )
        return self._get_kernel(W, B)(pref, pq)

    def counts(self, refs_T, queries_T, lengths_row):
        """[W, B] counts plane (unpacked), same contract as
        ``batched._diagonal_match_counts``."""
        W, _ = queries_T.shape
        packed = self.counts_packed(refs_T, queries_T, lengths_row)
        parts = [
            jnp.right_shift(packed, 8 * f) & 0xFF for f in range(4)
        ]
        stacked = jnp.stack(parts, axis=1).reshape(
            packed.shape[0] * 4, packed.shape[1]
        )
        return stacked[:W]


class PallasInsertMatcher:
    """Device dispatch for the insert diagonal counts: the Pallas kernel
    on accelerator backends, the XLA scan (bit-identical) elsewhere.
    Same contract as ``batched._diagonal_match_counts``."""

    BLOCK = _env_int(
        "ATROPOS_TPU_PALLAS_BLOCK", 256, lambda v: v > 0 and v % 128 == 0
    )
    INTERPRET = False

    def __init__(self):
        self._kernels = {}

    def _get_kernel(self, W, B):
        key = (W, B)
        if key not in self._kernels:
            grid = (B // self.BLOCK,)
            blk = self.BLOCK
            call = pl.pallas_call(
                functools.partial(_diag_counts_kernel, W=W),
                out_shape=jax.ShapeDtypeStruct((W, B), jnp.int32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((W, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((W, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((W, blk), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                interpret=self.INTERPRET,
            )
            self._kernels[key] = call
        return self._kernels[key]

    def counts(self, refs_T, queries_T, lengths_row):
        """[W, B] match counts (device arrays in, device array out)."""
        W, B = queries_T.shape
        if B % self.BLOCK:
            from atropos_tpu.align.batched import _diagonal_match_counts

            return _diagonal_match_counts(refs_T, queries_T, lengths_row)
        return self._get_kernel(W, B)(
            refs_T.astype(jnp.int32),
            queries_T.astype(jnp.int32),
            lengths_row.astype(jnp.int32),
        )

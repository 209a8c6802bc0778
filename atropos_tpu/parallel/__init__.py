"""Multi-device / multi-host scale-out.

The reference's parallelism is single-node fork+Queue data parallelism
over reads (``atropos/commands/multicore.py``). Here the same axis —
reads — is sharded over a ``jax.sharding.Mesh``: each device (and each
host, via per-host input sharding) processes its slice of the read batch
with the same batched kernels, and the summary statistics are fixed-shape
tensors merged with ``psum`` collectives, replacing the reference's
pickled-summary ``merge_dicts`` control plane.

``sharded_trim_step`` is the device-side "training step" of this
framework: align every adapter against the local read shard, apply
quality trimming, derive keep-intervals, and reduce the trim statistics
across the mesh.
"""
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atropos_tpu.align.batched import (
    _initial_state_np,
    _locate_kernel,
    _quality_trim_kernel,
)

READS_AXIS = "reads"

#: telemetry: number of batched-aligner calls that ran sharded over the
#: local device mesh, and number of resolved batches whose psum-reduced
#: device counters were verified against the host-derived statistics
#: (tests and the multi-chip dryrun assert the CLI trim path actually
#: shards AND runs its statistics through collectives).
SHARD_COUNTS = {"sharded_calls": 0, "psum_counter_checks": 0}

_DP_MESH_CACHE = []  # [] = undecided, [None] = off, [Mesh] = on


def data_parallel_mesh():
    """The in-process data-parallel mesh over all local devices, or None.

    This is what replaces the reference's one-node worker pool
    (``atropos/commands/multicore.py:235-402``): instead of forking
    ``threads-1`` workers, one process shards every kernel batch over the
    local chips. Enabled by default whenever more than one accelerator
    device is visible; on CPU backends virtual devices are host threads
    (no speedup), so sharding there must be forced with
    ``ATROPOS_TPU_SHARD=1`` (as the sharding tests and the multi-chip
    dryrun do). ``ATROPOS_TPU_SHARD=0`` disables sharding everywhere.
    """
    if _DP_MESH_CACHE:
        return _DP_MESH_CACHE[0]
    mode = os.environ.get("ATROPOS_TPU_SHARD", "").strip().lower()
    if mode in ("0", "false", "no", "off"):
        _DP_MESH_CACHE.append(None)
        return None
    force = mode in ("1", "true", "yes", "on")
    devices = jax.local_devices()
    if len(devices) < 2 or (not force and devices[0].platform == "cpu"):
        _DP_MESH_CACHE.append(None)
    else:
        _DP_MESH_CACHE.append(make_mesh(devices))
    return _DP_MESH_CACHE[0]


def reset_data_parallel_mesh():
    """Forget the cached mesh decision (tests flip ATROPOS_TPU_SHARD)."""
    _DP_MESH_CACHE.clear()


def make_mesh(devices=None, axis_name=READS_AXIS):
    """Build a 1-D device mesh over the read (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh, *arrays):
    """Place [B, ...] arrays with the batch dimension sharded over the
    mesh's read axis."""
    out = []
    for arr in arrays:
        spec = P(READS_AXIS, *([None] * (arr.ndim - 1)))
        out.append(jax.device_put(arr, NamedSharding(mesh, spec)))
    return tuple(out)


def build_sharded_trim_step(
    mesh,
    *,
    m,
    k,
    flags,
    min_overlap,
    ins_cost,
    quality_cutoff=(0, 20),
    quality_base=33,
    max_len_hist=512,
    with_psum=True,
):
    """Compile a full sharded trim step over the mesh.

    The step consumes a sharded read batch (sequence bytes, qualities,
    lengths and the host-built DP initial state), runs quality trimming
    and adapter alignment on every shard, resolves per-read keep
    intervals, and returns them together with globally ``psum``-reduced
    statistics (trimmed-read count, bp histograms). ``with_psum=False``
    keeps the statistics per-shard (no collectives) — the scaling bench
    uses the pair to isolate collective cost from compute.
    """
    kernel = functools.partial(
        _locate_kernel,
        m=m,
        k=k,
        flags=flags,
        min_overlap=min_overlap,
        ins_cost=ins_cost,
        del_cost=ins_cost,
        compare_ascii=True,
    )

    def step(reads, quals, lengths, ref_arr, thresholds, cost0, pay0, last0, done0):
        # quality trimming (reference op order runs Q before A)
        cf = jnp.full((reads.shape[0],), quality_cutoff[0], jnp.int32)
        cb = jnp.full((reads.shape[0],), quality_cutoff[1], jnp.int32)
        q_start, q_stop = _quality_trim_kernel(quals, lengths, cf, cb, quality_base)

        out = kernel(
            reads, lengths, ref_arr, thresholds, cost0, pay0, last0, done0
        )

        # 3' adapter trim: keep [0, rstart) of the quality-trimmed read
        keep_start = q_start
        keep_stop = jnp.where(
            out["found"], jnp.minimum(q_stop, out["start2"]), q_stop
        )
        keep_stop = jnp.maximum(keep_stop, keep_start)

        # shard statistics -> global psum over the mesh
        trimmed = out["found"].astype(jnp.int32)
        new_len = keep_stop - keep_start
        length_hist = jnp.zeros(max_len_hist, jnp.int32).at[
            jnp.clip(new_len, 0, max_len_hist - 1)
        ].add(1)
        stats = dict(
            records=jnp.array(reads.shape[0], jnp.int32),
            trimmed=jnp.sum(trimmed),
            bp_kept=jnp.sum(new_len),
            length_hist=length_hist,
        )
        if with_psum:
            stats = jax.lax.psum(stats, READS_AXIS)
        else:
            # identical compute, no collective: per-shard partials come
            # back stacked along the mesh axis instead of reduced
            stats = dict(
                records=stats["records"][None],
                trimmed=stats["trimmed"][None],
                bp_kept=stats["bp_kept"][None],
                length_hist=stats["length_hist"][None, :],
            )
        return dict(keep_start=keep_start, keep_stop=keep_stop, **stats)

    in_spec = (
        P(READS_AXIS, None),  # reads
        P(READS_AXIS, None),  # quals
        P(READS_AXIS),        # lengths
        P(None),              # ref
        P(None),              # thresholds
        P(None, READS_AXIS),  # cost0 [m+1, B]
        P(None, READS_AXIS),  # pay0
        P(None, READS_AXIS),  # last0
        P(None, READS_AXIS),  # done0
    )
    if with_psum:
        out_spec = dict(
            keep_start=P(READS_AXIS),
            keep_stop=P(READS_AXIS),
            records=P(),
            trimmed=P(),
            bp_kept=P(),
            length_hist=P(),
        )
    else:
        out_spec = dict(
            keep_start=P(READS_AXIS),
            keep_stop=P(READS_AXIS),
            records=P(READS_AXIS),
            trimmed=P(READS_AXIS),
            bp_kept=P(READS_AXIS),
            length_hist=P(READS_AXIS, None),
        )

    sharded = _shard_map(
        step, mesh=mesh, in_specs=in_spec, out_specs=out_spec
    )
    return jax.jit(sharded)


def _shard_map(fn, mesh, in_specs, out_specs):
    """shard_map across jax versions (promoted out of experimental)."""
    if hasattr(jax, "shard_map"):
        try:
            return jax.shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        except TypeError:
            return jax.shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs
            )
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)

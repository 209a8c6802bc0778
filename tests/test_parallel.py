"""Multi-device sharding tests on a virtual 8-device CPU mesh."""
import numpy as np

import jax
import pytest


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices; run with "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    return jax.devices()[:8]


def test_graft_entry_single(eight_devices):
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["found"].shape == (256,)


def test_dryrun_multichip(eight_devices):
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_sharded_matches_single_device(eight_devices):
    """The sharded trim step must produce the same intervals and stats as
    a 1-device mesh run."""
    import __graft_entry__ as graft
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from atropos_tpu.align.batched import _error_thresholds, _initial_state_np
    from atropos_tpu.align.flags import (
        START_WITHIN_SEQ2,
        STOP_WITHIN_SEQ1,
        STOP_WITHIN_SEQ2,
    )
    from atropos_tpu.parallel import build_sharded_trim_step, make_mesh, shard_batch

    BACK = START_WITHIN_SEQ2 | STOP_WITHIN_SEQ2 | STOP_WITHIN_SEQ1
    adapter = "AGATCGGAAGAGC"
    m, mer = len(adapter), 0.1
    k = int(mer * m)
    batch, read_len = 64, 48
    reads, quals, lengths = graft._example_batch(batch, read_len, seed=3)
    ref_arr = jnp.asarray(
        np.frombuffer(adapter.encode(), dtype=np.uint8).astype(np.int32)
    )
    thresholds = jnp.asarray(_error_thresholds(m, mer))
    cost0, pay0, last0, done0 = _initial_state_np(
        lengths, m=m, k=k, flags=BACK, ins_cost=1
    )

    results = []
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        step = build_sharded_trim_step(
            mesh, m=m, k=k, flags=BACK, min_overlap=3, ins_cost=1,
            quality_cutoff=(0, 20), max_len_hist=64,
        )
        put = lambda arr, spec: jax.device_put(
            jnp.asarray(arr), NamedSharding(mesh, spec)
        )
        out = step(
            put(reads.astype(np.int32), P("reads", None)),
            put(quals.astype(np.int32), P("reads", None)),
            put(lengths, P("reads")),
            put(ref_arr, P(None)),
            put(thresholds, P(None)),
            put(cost0, P(None, "reads")),
            put(pay0, P(None, "reads")),
            put(last0, P(None, "reads")),
            put(done0, P(None, "reads")),
        )
        jax.block_until_ready(out)
        results.append({key: np.asarray(val) for key, val in out.items()})

    single, sharded = results
    for key in ("keep_start", "keep_stop", "length_hist"):
        np.testing.assert_array_equal(single[key], sharded[key])
    assert int(single["trimmed"]) == int(sharded["trimmed"])
    assert int(single["bp_kept"]) == int(sharded["bp_kept"])
    assert int(sharded["records"]) == batch


def test_cli_trim_shards_over_local_mesh(eight_devices, tmp_path, monkeypatch):
    """One ``atropos trim`` invocation shards its aligner batches over all
    local devices: with sharding forced on the virtual 8-device mesh, a
    golden conformance case stays byte-identical AND the sharded kernel
    is what actually ran (telemetry counter moves)."""
    from atropos_tpu import parallel
    from .conformance_utils import run_trim

    monkeypatch.setenv("ATROPOS_TPU_SHARD", "1")
    parallel.reset_data_parallel_mesh()
    before = parallel.SHARD_COUNTS["sharded_calls"]
    try:
        mesh = parallel.data_parallel_mesh()
        assert mesh is not None and mesh.devices.size == 8
        run_trim(
            tmp_path,
            "-b TTAGACATATCTCCGTCG",
            "small.fastq",
            "small.fastq",
        )
    finally:
        parallel.reset_data_parallel_mesh()
    assert parallel.SHARD_COUNTS["sharded_calls"] > before


def test_sharded_aligner_matches_unsharded(eight_devices, monkeypatch):
    """BatchAligner.locate_batch must return identical results sharded
    over the mesh and unsharded, including a batch size that does not
    divide the device count (exercises the padding path)."""
    from atropos_tpu import parallel
    from atropos_tpu.align.batched import BatchAligner, encode_reads
    from atropos_tpu.align.flags import (
        START_WITHIN_SEQ2,
        STOP_WITHIN_SEQ1,
        STOP_WITHIN_SEQ2,
    )

    BACK = START_WITHIN_SEQ2 | STOP_WITHIN_SEQ2 | STOP_WITHIN_SEQ1
    rng = np.random.RandomState(11)
    reads = [
        "".join("ACGT"[b] for b in rng.randint(0, 4, size=rng.randint(20, 70)))
        for _ in range(37)  # deliberately not a multiple of 8
    ]
    reads[3] = reads[3][:25] + "AGATCGGAAGAGC" + reads[3][25:]
    enc, lengths = encode_reads(reads, pad_to=80)

    def locate(shard):
        monkeypatch.setenv("ATROPOS_TPU_SHARD", "1" if shard else "0")
        parallel.reset_data_parallel_mesh()
        try:
            aligner = BatchAligner("AGATCGGAAGAGC", 0.1, BACK, min_overlap=3)
            out = aligner.locate_batch(enc, lengths)
            return {key: np.asarray(val) for key, val in out.items()}
        finally:
            parallel.reset_data_parallel_mesh()

    plain, sharded = locate(False), locate(True)
    for key in plain:
        np.testing.assert_array_equal(plain[key], sharded[key], err_msg=key)

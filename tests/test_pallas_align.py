"""Differential parity tests: Pallas DP kernel vs the scalar oracle.

Runs in Pallas interpret mode on CPU (exact same program the TPU runs,
minus Mosaic codegen)."""
import random

import numpy as np
import pytest

import jax

from atropos_tpu.align import oracle
from atropos_tpu.align.batched import encode_reads
from .test_batched_align import FLAG_CASES, PREFIX, SUFFIX, _random_read


def _make_pallas(aligner_args):
    from atropos_tpu.align import pallas_kernel

    cls = pallas_kernel.PallasAligner
    obj = cls(
        aligner_args["reference"],
        aligner_args["max_error_rate"],
        aligner_args["flags"],
        wildcard_ref=aligner_args.get("wildcard_ref", False),
        wildcard_query=aligner_args.get("wildcard_query", False),
        min_overlap=aligner_args.get("min_overlap", 1),
        indel_cost=aligner_args.get("indel_cost", 1),
    )
    if jax.default_backend() == "cpu":
        # interpret mode for CPU testing
        obj.INTERPRET = True
    return obj


def _assert_parity(aligner_args, reads, label):
    scalar = oracle.Aligner(**aligner_args)
    pallas = _make_pallas(aligner_args)
    arr, lengths = encode_reads(reads)
    out = pallas.locate_batch(arr, lengths)
    out = {key: np.asarray(val) for key, val in out.items()}
    for idx, read in enumerate(reads):
        expected = scalar.locate(read)
        got = (
            tuple(
                int(out[key][idx])
                for key in ("start1", "stop1", "start2", "stop2", "matches", "cost")
            )
            if out["found"][idx]
            else None
        )
        assert got == expected, "{}: read {} ({!r}): {} != {}".format(
            label, idx, read, got, expected
        )


@pytest.mark.parametrize("name,flags", FLAG_CASES)
@pytest.mark.parametrize("indel_cost", [1, 100000])
def test_pallas_parity(name, flags, indel_cost):
    rng = random.Random(hash((name, indel_cost, "pallas")) & 0xFFFF)
    adapter = "TTAGACATATCTCCGTCG"
    reads = [_random_read(rng, adapter, flags) for _ in range(50)]
    reads += ["", "A", adapter, adapter * 2, adapter[:4]]
    _assert_parity(
        dict(
            reference=adapter,
            max_error_rate=0.1,
            flags=flags,
            min_overlap=3,
            indel_cost=indel_cost,
        ),
        reads,
        "pallas/{}/ic{}".format(name, indel_cost),
    )


@pytest.mark.parametrize("name,flags", FLAG_CASES[:2])
def test_pallas_parity_wildcards(name, flags):
    rng = random.Random(hash((name, "wc")) & 0xFFFF)
    adapter = "ACGTNNNACGTRYK"
    reads = [_random_read(rng, "ACGTACGACGTAGA", flags) for _ in range(30)]
    _assert_parity(
        dict(
            reference=adapter,
            max_error_rate=0.1,
            flags=flags,
            wildcard_ref=True,
            min_overlap=3,
        ),
        reads,
        "pallas-wc/" + name,
    )


@pytest.mark.parametrize("max_error_rate", [0.0, 0.049, 0.2, 0.34])
@pytest.mark.parametrize("indel_cost", [1, 2, 3])
def test_pallas_scan_window_edges(max_error_rate, indel_cost):
    """The insertion scan is truncated to distance floor(k/ins_cost); pin
    bit-exactness at the window boundaries with reads whose adapter hit
    carries insertion runs of exactly k, k+1 and 2k bases (chains at and
    just past the provable out-of-band cutoff)."""
    adapter = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"  # m=33 -> k up to 11
    k = int(max_error_rate * len(adapter))
    rng = random.Random(hash((max_error_rate, indel_cost)) & 0xFFFF)
    reads = []
    for run in {max(1, k), k + 1, 2 * k + 1}:
        for cut in (8, 16, len(adapter)):
            frag = adapter[:cut]
            pos = rng.randint(2, max(3, cut - 2))
            ins = "".join(rng.choice("ACGT") for _ in range(run))
            prefix = "".join(rng.choice("ACGT") for _ in range(20))
            reads.append(prefix + frag[:pos] + ins + frag[pos:])
    reads += [_random_read(rng, adapter, FLAG_CASES[0][1]) for _ in range(30)]
    _assert_parity(
        dict(
            reference=adapter,
            max_error_rate=max_error_rate,
            flags=FLAG_CASES[0][1],
            min_overlap=3,
            indel_cost=indel_cost,
        ),
        reads,
        "pallas-window/e{}/ic{}".format(max_error_rate, indel_cost),
    )


def test_pallas_literal_n():
    """ASCII mode must treat 'N'=='N' as a match (exact byte compare)."""
    _assert_parity(
        dict(
            reference="NNNNNN",
            max_error_rate=0.2,
            flags=FLAG_CASES[0][1],
            min_overlap=3,
        ),
        ["ACGTNNNNNNACGT", "NNNNNN", "ACGTACGT"],
        "pallas-literalN",
    )


def test_pallas_insert_counts_match_xla():
    """The Pallas diagonal match-count kernel (insert matcher core) must
    equal the XLA scan exactly (interpret mode on CPU)."""
    import numpy as np

    import jax.numpy as jnp

    from atropos_tpu.align.batched import _diagonal_match_counts
    from atropos_tpu.align.pallas_kernel import PallasInsertMatcher

    rng = np.random.default_rng(5)
    W, B = 64, 256
    bases = np.frombuffer(b"ACGT", np.uint8)
    refs = bases[rng.integers(0, 4, size=(W, B))].astype(np.int32)
    queries = bases[rng.integers(0, 4, size=(W, B))].astype(np.int32)
    # make some diagonals real matches
    queries[:, :64] = refs[:, :64]
    lengths = rng.integers(0, W + 1, size=(1, B)).astype(np.int32)

    matcher = PallasInsertMatcher()
    matcher.INTERPRET = True
    matcher.BLOCK = 128
    got = np.asarray(
        matcher.counts(
            jnp.asarray(refs), jnp.asarray(queries), jnp.asarray(lengths)
        )
    )
    want = np.asarray(
        _diagonal_match_counts(
            jnp.asarray(refs), jnp.asarray(queries), jnp.asarray(lengths)
        )
    )
    assert np.array_equal(got, want)


@pytest.mark.parametrize("W", [33, 64, 100, 255])
def test_packed_insert_counts_match_xla(W):
    """The bit-packed diagonal matcher (4-bit codes, 8/word, sentinel
    out-of-range handling, packed-4 output) must equal the XLA scan
    exactly, across widths incl. non-multiples of 8 and varied
    alphabets (interpret mode on CPU)."""
    import numpy as np

    import jax.numpy as jnp

    from atropos_tpu.align.batched import _diagonal_match_counts
    from atropos_tpu.align.pallas_kernel import PallasPackedInsertMatcher

    rng = np.random.default_rng(W)
    B = 256
    alphabet = np.frombuffer(b"ACGTNacgtn", np.uint8)
    refs = alphabet[rng.integers(0, len(alphabet), size=(W, B))].astype(
        np.int32
    )
    queries = alphabet[rng.integers(0, len(alphabet), size=(W, B))].astype(
        np.int32
    )
    queries[:, :32] = refs[:, :32]
    lengths = rng.integers(0, W + 1, size=(1, B)).astype(np.int32)

    matcher = PallasPackedInsertMatcher(alphabet)
    matcher.INTERPRET = True
    matcher.BLOCK = 128
    assert matcher.usable(W)
    got = np.asarray(
        matcher.counts(
            jnp.asarray(refs), jnp.asarray(queries), jnp.asarray(lengths)
        )
    )
    want = np.asarray(
        _diagonal_match_counts(
            jnp.asarray(refs), jnp.asarray(queries), jnp.asarray(lengths)
        )
    )
    assert np.array_equal(got, want)


def test_packed_insert_matcher_usability_gates():
    from atropos_tpu.align.pallas_kernel import PallasPackedInsertMatcher

    small = PallasPackedInsertMatcher(b"ACGTN")
    assert small.usable(255)
    assert not small.usable(256)  # counts must fit a byte
    wide = PallasPackedInsertMatcher(bytes(range(40, 60)))  # 20 symbols
    assert not wide.usable(100)

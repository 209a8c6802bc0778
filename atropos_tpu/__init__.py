"""atropos_tpu — a TPU-native NGS read-trimming framework.

A from-scratch rebuild of the capabilities of Atropos (jdidion/atropos) as a
TPU-first engine: reads are encoded as padded struct-of-array device batches,
the semi-global adapter-alignment DP runs as a batched column-scan kernel
vectorized over (reads x adapter-rows) on the VPU, quality trimming is a
masked prefix-scan, statistics are fixed-shape tensors merged with ``psum``
collectives, and multi-host scale-out is data-parallel read sharding over a
``jax.sharding.Mesh`` instead of fork+Queue multiprocessing.

Layer map (mirrors the reference's layering, reference SURVEY.md §1):

- ``atropos_tpu.util``      — host-side primitives (merge algebra, RMP, ...)
- ``atropos_tpu.align``     — alignment kernels: NumPy oracle + JAX/Pallas
- ``atropos_tpu.io``        — sequence I/O (FASTA/FASTQ/SAM), device batches
- ``atropos_tpu.adapters``  — adapter parsing/matching/caching
- ``atropos_tpu.commands``  — trim/detect/error/qc pipelines, CLI, reports
- ``atropos_tpu.parallel``  — device-mesh sharding + collective stat merge
"""

__version__ = "0.1.0"


class AtroposError(Exception):
    """Base exception for expected errors (analog of the reference's
    ``atropos.AtroposError``)."""


def check_importability():  # pragma: no cover
    """The reference checks its compiled Cython extensions here
    (``atropos/__init__.py``). Our accelerated path is JAX; it is always
    importable, so this only verifies jax presence lazily."""
    try:
        import jax  # noqa: F401
        return True
    except ImportError:
        return False

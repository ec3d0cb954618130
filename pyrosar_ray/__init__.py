"""pyrosar_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query and data-processing
capabilities of johntruckenbrodt/pyroSAR (reference at /root/reference,
studied for behavior only), re-expressed as ray.data.Dataset pipelines:

- scene metadata records and footprint geometry as Arrow rows
  (reference model: pyroSAR/drivers.py:215, pyroSAR/config.py:20-25)
- the Archive catalog as Parquet-backed Datasets with select/insert
  semantics (reference: pyroSAR/archive.py:135-1346)
- tile-grid grammars (SRTM/AW3D30/Copernicus/...) as vectorized
  kernels (reference: pyroSAR/drivers.py:535-558, pyroSAR/auxdata.py:1360-1549)
- image payloads as binary columns processed by actor-pool
  map_batches stages

Everything here is built on public Ray Data / PyArrow / NumPy APIs.
"""

__version__ = "0.1.0"


def _tune_allocator() -> None:
    """Keep large numpy buffers on the heap for reuse.

    glibc's default 128 KiB mmap threshold makes every multi-MB numpy
    array a fresh mmap/munmap pair, so each batch re-faults all its
    pages — measured ~1000x slowdown on large-array kernels in
    page-fault-throttled environments. Raising M_MMAP_THRESHOLD (and
    disabling eager trim) lets freed buffers be reused warm. Called at
    import time, so every Ray worker that deserializes one of our UDFs
    gets the tuned allocator.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: 1 GiB
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: keep freed heap
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_allocator()


def _install_log_filters() -> None:
    """Drop two known-cosmetic Ray Data log lines.

    1. ``Failed to hash the schemas (for deduplication)``: pyarrow's
       ``Schema.__hash__`` raises ``unhashable type: 'dict'`` whenever a
       schema carries key/value metadata (the testdata parquet files all
       carry a ``pandas`` block); Ray's schema-dedup fast path catches
       the error and warns. Purely an optimization miss.
    2. ``Operator produced a RefBundle with a different schema`` when
       the NEW schema is empty: a reduce partition that received no
       rows emits a schema-less empty block. Only the empty-new-schema
       form is dropped — a real schema drift (two non-empty schemas)
       still warns.

    Installed at import time (every Ray worker that deserializes one of
    our UDFs imports the package); ``bench.py`` additionally registers
    it as a ``worker_process_setup_hook`` so pure-internal tasks
    (ReadParquet splits, empty reduces) are covered too.
    """
    import logging

    class _DropCosmetic(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            if "Failed to hash the schemas (for deduplication)" in msg:
                return False
            if "different schema than the previous one" in msg and (
                "new schema: ." in msg or "new schema: None." in msg
            ):
                return False
            return True

    for name in (
        "ray.data._internal.arrow_ops.transform_pyarrow",
        "ray.data._internal.execution.streaming_executor_state",
    ):
        logger = logging.getLogger(name)
        if not any(isinstance(f, _DropCosmetic) for f in logger.filters):
            logger.addFilter(_DropCosmetic())


_install_log_filters()


# Note on shuffle strategy: push-based shuffle was evaluated as the
# package default (it halves an ISOLATED small groupby-Sum at 32 CPUs)
# but measured consistently SLOWER inside full pipelines here —
# spatial_join 8.5s vs 7.8s, doc_minhash_pairs 7.3s vs 5.8s at sf0.1 —
# because the extra merge-task wave competes with the pipeline's own
# map stages for cores. The Ray default (sort-based) stays; callers can
# opt in per-session via DataContext.use_push_based_shuffle.

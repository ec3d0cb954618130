"""Worker-crash resilience: a task killed mid-batch is retried and the
job completes with EXACT output.

Ray Data's streaming executor retries tasks whose worker process dies
(distinct from an application exception, which fails the job). The
engine leans on that for its resume story — idempotent sinks + lineage
— so pin the behavior: a map_batches UDF hard-kills its process
(os._exit) on the FIRST attempt, the retried task succeeds, and the
result is bit-identical to an uninjected run. The crash marker is a
filesystem sentinel, not worker state, so exactly one attempt dies no
matter which worker draws the poisoned block.
"""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages import table_from_pandas


def _pipeline(df, crash_file=None):
    import pyarrow as pa

    def _double(batch: pa.Table) -> pa.Table:
        if crash_file is not None and not os.path.exists(crash_file):
            # claim the crash atomically; O_EXCL makes exactly one
            # attempt die even if two tasks race
            try:
                fd = os.open(crash_file, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
        x = batch["x"].to_numpy()
        return pa.table({"x": batch["x"], "y": pa.array(x * 2)})

    ds = ray.data.from_pandas(df).repartition(8)
    return (
        ds.map_batches(_double, batch_format="pyarrow")
        .groupby("x")
        .count()
        .to_pandas()
        .sort_values("x", ignore_index=True)
    )


def test_task_retry_after_worker_kill(ray_session):
    df = pd.DataFrame({"x": np.arange(400, dtype=np.int64) % 37})
    expect = _pipeline(df, crash_file=None)
    with tempfile.TemporaryDirectory() as td:
        crash = os.path.join(td, "crashed")
        got = _pipeline(df, crash_file=crash)
        assert os.path.exists(crash), "injection never fired"
    pd.testing.assert_frame_equal(got, expect)


def test_table_from_pandas_strips_metadata():
    # the exchange-poisoning regression guard (schema-hash fix)
    tab = table_from_pandas(pd.DataFrame({"a": [1, 2]}))
    assert tab.schema.metadata is None
    hash(tab.schema)  # raises on metadata-carrying schemas

"""Ray Data pipeline stages (map_batches transforms, joins, groupbys)."""


def table_from_pandas(df):
    """``pa.Table.from_pandas`` minus the ``b'pandas'`` schema metadata.

    Ray's exchange stages deduplicate block schemas via ``hash(schema)``;
    the pandas metadata blob makes that raise (``unhashable type: 'dict'``)
    so every shuffle over such blocks logs a "Failed to hash the schemas"
    warning and skips the fast path. Nothing downstream reads the blob —
    strip it at the only place we convert pandas frames to Arrow blocks.
    """
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
        None
    )


def collect_arrow(ds, empty_schema=None):
    """Materialize a SMALL Dataset into one pyarrow Table on the driver.

    Ray's exchange splits can emit 0-column empty blocks (the same
    internal wart ``stages.groups`` documents), and ``pa.concat_tables``
    rejects mixing those with typed blocks — so drop empty blocks
    first. If every block is empty, fall back to any schema-bearing
    block's 0-row slice, then to ``empty_schema`` (a {name: pa.DataType}
    dict). Callers own the size contract (driver-bounded results only —
    the cost-based fast paths that already disclose a bound).
    """
    import pyarrow as pa
    import ray

    tabs = ray.get(ds.to_arrow_refs())
    full = [t for t in tabs if t.num_rows]
    if full:
        return pa.concat_tables(full)
    for t in tabs:
        if t.num_columns:
            return t.slice(0, 0)
    if empty_schema is not None:
        return pa.table(
            {c: pa.array([], type=t) for c, t in empty_schema.items()}
        )
    raise ValueError(
        "collect_arrow: dataset is empty with no schema-bearing blocks; "
        "pass empty_schema"
    )


def drop_empty_blocks(ds):
    """Rebuild a MATERIALIZED Dataset without Ray's 0-column empty
    boundary blocks.

    Sort-based exchanges (groupby().map_groups — equi_join's local
    stage rides on one) emit empty boundary splits as 0-COLUMN blocks
    (a Ray internal; the same wart ``collect_arrow`` and
    ``stages.groups`` document). Feeding those into ANOTHER exchange
    hits the schema-unification slow path — measured 1.5 s → 23 s for
    an identical 10M-row degree aggregate inside the distributed k-core
    peel loop. Driver cost is one metadata walk over the block refs (no
    block is fetched); only sensible between a materialized exchange
    output and a following exchange in an iterative loop.
    """
    import ray

    refs = []
    dropped = False
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                dropped = True
            else:
                refs.append(block_ref)
    if not dropped or not refs:
        return ds
    return ray.data.from_arrow_refs(refs)


def physical_select(ds, cols):
    """``select_columns`` as a PHYSICAL map_batches projection.

    ``Dataset.select_columns`` plans a lazy Project whose ``schema()`` can
    report the UN-projected upstream columns on this Ray version when the
    upstream schema itself needs execution to resolve (join outputs,
    map_batches chains) — execution applies the projection, the reported
    schema doesn't. Any stage that PLANS columns from ``schema()``
    (equi_join/broadcast_equi_join tag builders, the spatial/interval
    joins) then references a phantom column and dies with a KeyError
    mid-exchange. Feeding one of those stages? Use this instead; the
    closure pins the projection into the block transform, so schema
    inference and execution cannot disagree. Plain ``select_columns``
    stays fine for map_batches/groupby/aggregate consumers, which never
    plan from the lazy schema.
    """
    cols = list(cols)

    def _proj(batch):
        return batch.select(cols)

    return ds.map_batches(_proj, batch_format="pyarrow")

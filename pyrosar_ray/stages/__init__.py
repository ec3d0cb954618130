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

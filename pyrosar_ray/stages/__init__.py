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

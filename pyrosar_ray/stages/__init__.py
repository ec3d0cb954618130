"""Ray Data pipeline stages (map_batches transforms, joins, groupbys)."""

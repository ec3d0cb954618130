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

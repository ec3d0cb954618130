"""Datacube merge + ingestion-spec semantics."""

import json

import pandas as pd
import pytest
import ray.data

from pyrosar_ray.stages.datacube import (
    ingestion_spec,
    merge_measurements,
    product_definition,
    write_product_sidecar,
)


def _rows(mismatch=False):
    return pd.DataFrame(
        {
            "outname_base": ["A", "A", "B"],
            "polarization": ["VV", "VH", "VV"],
            "path": ["a_vv.tif", "a_vh.tif", "b_vv.tif"],
            "crs": ["EPSG:4326", "EPSG:32632" if mismatch else "EPSG:4326", "EPSG:4326"],
        }
    )


def test_merge_measurements():
    out = merge_measurements(ray.data.from_pandas(_rows())).to_pandas()
    out = out.sort_values("outname_base")
    assert out["outname_base"].tolist() == ["A", "B"]
    a = json.loads(out.iloc[0]["measurements"])
    assert a == {"VH": "a_vh.tif", "VV": "a_vv.tif"}


def test_merge_attribute_guard():
    with pytest.raises(Exception):
        merge_measurements(ray.data.from_pandas(_rows(mismatch=True))).to_pandas()


def test_ingestion_spec_tile_size():
    spec = ingestion_spec("s1_gamma0", resolution=(20.0, 20.0), chunking=(2000, 2000))
    assert spec["storage"]["tile_size"] == {"x": 40000.0, "y": 40000.0}
    assert spec["storage"]["resolution"]["y"] == -20.0


def test_sidecar_roundtrip(tmp_path):
    spec = product_definition("s1_gamma0", ["VV", "VH"])
    path = write_product_sidecar(spec, str(tmp_path / "product.yml"))
    text = open(path).read()
    assert "s1_gamma0" in text and "VH" in text

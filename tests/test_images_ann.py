"""Image plumbing + ANN stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pyrosar_ray.sources.images import average_phash, images_from_documents, synth_image
from pyrosar_ray.stages.ann import brute_force_topk, lsh_topk
from pyrosar_ray.stages.images import (
    block_mean_resize,
    decode_image,
    image_features,
    phash_near_dup_pairs,
)


def test_synth_image_deterministic():
    a, w, h = synth_image(123)
    b, _, _ = synth_image(123)
    assert np.array_equal(a, b) and a.shape == (h, w, 3)


def test_decode_raw_roundtrip():
    arr, w, h = synth_image(5)
    assert np.array_equal(decode_image(arr.tobytes(), w, h, "raw"), arr)


def test_decode_png_via_codec():
    from pyrosar_ray.functions.png import encode_png

    arr, w, h = synth_image(5)
    assert np.array_equal(decode_image(encode_png(arr), w, h, "png"), arr)


def test_decode_jpeg_roundtrip_and_truncation():
    from pyrosar_ray.functions.jpeg import encode_jpeg, psnr

    arr, w, h = synth_image(5)
    out = decode_image(encode_jpeg(arr, quality=98), w, h, "jpeg")
    assert out.shape == arr.shape and psnr(arr, out) >= 40.0
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff", 4, 4, "jpeg")


def test_block_mean_resize_constant():
    arr = np.full((32, 16, 3), 77, dtype=np.uint8)
    out = block_mean_resize(arr, 8, 8)
    assert out.shape == (8, 8, 3) and np.all(out == 77)


def test_image_features_and_neardup(sf_dir):
    images = images_from_documents(sf_dir)
    feats = image_features(images, concurrency=2).to_pandas()
    assert len(feats) == 500
    # caption passthrough: byte equality with the source documents
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    merged = feats.assign(doc_id=feats["image_id"].str[4:].astype(int)).merge(docs, on="doc_id")
    assert (merged["caption"] == merged["text"]).all()
    # recomputed phash equals the stored one (decode is lossless for raw)
    stored = images.select_columns(["image_id", "phash"]).to_pandas()
    joined = feats.merge(stored, on="image_id", suffixes=("_new", "_stored"))
    assert (joined["phash_new"] == joined["phash_stored"]).all()

    pairs = phash_near_dup_pairs(images.select_columns(["image_id", "phash"])).to_pandas()
    # planted dups: ids ending in 9 pair with id-1
    planted = {
        (f"img-{i-1:012d}", f"img-{i:012d}") for i in docs["doc_id"] if i % 10 == 9 and i - 1 in set(docs["doc_id"])
    }
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert planted <= found
    assert (pairs[pairs["hamming"] == 0].shape[0]) >= len(planted)


def _embedding_table(n=200, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    mat = rng.standard_normal((n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(mat.astype(np.float32))),
        }
    ), mat


def test_brute_force_topk_matches_numpy():
    tab, mat = _embedding_table()
    qids = np.array([0, 50], dtype=np.int64)
    qmat = mat[[0, 50]]
    out = (
        brute_force_topk(ray.data.from_arrow(tab), qids, qmat, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qi, qid in enumerate([0, 50]):
        sims = norm @ norm[qid]
        sims[qid] = -np.inf
        want = np.argsort(-sims, kind="stable")[:5]
        got = out[out["query_id"] == qid]["neighbor_id"].to_numpy()
        assert got.tolist() == want.tolist()


def test_lsh_topk_schema_and_recall():
    tab, mat = _embedding_table()
    qids = np.array([3], dtype=np.int64)
    out = lsh_topk(ray.data.from_arrow(tab), qids, mat[[3]], k=5).to_pandas()
    assert list(out.columns) == ["query_id", "neighbor_id", "rank"]
    assert 0 < len(out) <= 5
    assert 3 not in out["neighbor_id"].tolist()


def test_lsh_topk_matches_bucket_oracle():
    """New vectorized kernel vs a scalar per-bucket oracle: exact match."""
    from pyrosar_ray.stages.ann import HyperplaneLSH, _normalize

    rng = np.random.RandomState(7)
    n, dim, nbits, k = 200, 16, 4, 5
    mat = rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table({"vec_id": ids, "embedding": pa.array(mat.tolist(),
                    type=pa.list_(pa.float64()))})
    qids = np.array([0, 17, 63, 140], dtype=np.int64)
    got = (
        lsh_topk(ray.data.from_arrow(tab), qids, mat[qids], k=k, nbits=nbits)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )

    lsh = HyperplaneLSH(dim, nbits)
    norm = _normalize(mat)
    buckets = lsh.buckets(norm)
    rows = []
    for q in qids:
        cand = ids[(buckets == buckets[q]) & (ids != q)]
        sims = norm[cand] @ norm[q]
        order = sorted(zip(-sims, cand))[:k]
        for rank, (_, nid) in enumerate(order, 1):
            rows.append((q, nid, rank))
    import pandas as pd

    expect = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    pd.testing.assert_frame_equal(
        got[["query_id", "neighbor_id", "rank"]], expect, check_dtype=False
    )


def test_cosine_threshold_pairs_matches_bruteforce():
    from pyrosar_ray.stages.ann import _normalize, cosine_threshold_pairs

    rng = np.random.RandomState(3)
    mat = rng.standard_normal((60, 8))
    ids = np.arange(60, dtype=np.int64)
    tab = pa.table({"vec_id": ids, "embedding": pa.array(mat.tolist(),
                    type=pa.list_(pa.float64()))})
    qids = np.array([0, 7], dtype=np.int64)
    got = (
        cosine_threshold_pairs(ray.data.from_arrow(tab), qids, mat[qids], threshold=0.3)
        .to_pandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    norm = _normalize(mat)
    sims = norm @ norm[qids].T
    expect = [
        (int(q), int(i), sims[i, k])
        for k, q in enumerate(qids)
        for i in ids
        if i != q and sims[i, k] >= 0.3
    ]
    assert list(map(tuple, got[["query_id", "neighbor_id"]].to_numpy())) == [
        (q, i) for q, i, _ in sorted(expect)
    ]
    np.testing.assert_allclose(
        got["cos"].to_numpy(), [s for _, _, s in sorted(expect)]
    )


def test_ivf_topk_exact_vs_scalar(ray_session):
    """ivf_topk == a scalar reference implementing the same contract
    (integer quantization, argmax-cell assignment, nprobe probing,
    integer-dot ranking)."""
    import numpy as np
    import ray.data as rd

    from pyrosar_ray.stages.ann import ivf_centroids, ivf_topk, quantize_embeddings

    rng = np.random.RandomState(5)
    n, dim, ncells, nprobe, k = 400, 16, 8, 3, 5
    emb = rng.randn(n, dim).astype(np.float32) * 0.3
    ids = np.arange(n, dtype=np.int64) * 3  # non-contiguous ids
    corpus = rd.from_items(
        [{"vec_id": int(i), "embedding": e.tolist()} for i, e in zip(ids, emb)]
    ).repartition(7)
    qsel = ids % 30 == 0
    out = ivf_topk(
        corpus, ids[qsel], emb[qsel], k=k, ncells=ncells, nprobe=nprobe
    ).to_pandas()

    cents = ivf_centroids(ncells, dim)
    q = quantize_embeddings(emb.astype(np.float64))
    cells = np.argmax(q @ cents.T, axis=1)
    expect = {}
    for qi in np.flatnonzero(qsel):
        cd = q[qi] @ cents.T
        probed = sorted(range(ncells), key=lambda c: (-cd[c], c))[:nprobe]
        cand = [
            j
            for j in range(n)
            if cells[j] in probed and ids[j] != ids[qi]
        ]
        ranked = sorted(cand, key=lambda j: (-(q[qi] @ q[j]), ids[j]))[:k]
        expect[int(ids[qi])] = [int(ids[j]) for j in ranked]
    got = {
        int(g): df.sort_values("rank")["neighbor_id"].tolist()
        for g, df in out.groupby("query_id")
    }
    assert got == expect
    assert (out.groupby("query_id")["rank"].apply(lambda r: sorted(r.tolist()))
            .apply(lambda r: r == list(range(1, len(r) + 1))).all())


def test_semdedup_rule_small():
    import numpy as np
    import pyarrow as pa
    import ray

    from pyrosar_ray.stages.ann import semdedup

    # vec 1 and 2 nearly identical; 3 orthogonal-ish; 4 = -1 direction
    base = np.zeros(64); base[0] = 1.0
    v2 = base.copy(); v2[1] = 0.05
    v3 = np.zeros(64); v3[1] = 1.0
    v4 = -base
    tab = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "embedding": pa.array([list(v) for v in (base, v2, v3, v4)],
                                  type=pa.list_(pa.float32())),
        }
    )
    out = (
        semdedup(ray.data.from_arrow(tab), threshold=0.9, ncells=8)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    kept = dict(zip(out["vec_id"], out["kept"]))
    assert kept[1] == 1          # smallest id always kept
    # v2 is a near-dup of v1 — dropped only if they share a cell
    same_cell = (
        out.set_index("vec_id").loc[1, "cell"]
        == out.set_index("vec_id").loc[2, "cell"]
    )
    assert kept[2] == (0 if same_cell else 1)
    assert kept[3] == 1 and kept[4] == 1  # dissimilar vectors survive


def test_semdedup_corpus_counts(sf_dir):
    import ray

    from pyrosar_ray.stages.ann import semdedup

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = semdedup(emb, threshold=0.2, ncells=16).to_pandas()
    n = len(out)
    assert out["vec_id"].is_unique
    assert set(out["kept"].unique()) <= {0, 1}
    # per-cell smallest id is always kept
    first = out.sort_values("vec_id").groupby("cell").first()
    assert (first["kept"] == 1).all()


def test_embedding_gram_matches_numpy(sf_dir):
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from pyrosar_ray.stages.ann import (
        embedding_gram,
        gram_to_matrix,
        quantize_embeddings,
    )

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    mat = np.stack(tab["embedding"].to_pylist())
    q = quantize_embeddings(mat)
    want = q.T @ q
    got = embedding_gram(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    ).to_pandas()
    dim = q.shape[1]
    assert len(got) == dim * (dim + 1) // 2
    assert np.array_equal(gram_to_matrix(got, dim), want.astype(np.float64))


def test_image_patches_partition_of_crop():
    """Patch sums partition the cropped pixel sum; partial edges drop."""
    from pyrosar_ray.stages.images import image_patches

    w, h, P = 10, 7, 4  # crop to 8x4
    arr = (np.arange(h * w, dtype=np.int64) % 251).astype(np.uint8).reshape(h, w)
    images = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([9], type=pa.int64()),
                "bytes": pa.array([arr.tobytes()], type=pa.binary()),
                "w": pa.array([w], type=pa.int32()),
                "h": pa.array([h], type=pa.int32()),
                "fmt": pa.array(["raw_gray"]),
            }
        )
    )
    out = image_patches(images, patch=P).to_pandas()
    assert len(out) == (h // P) * (w // P) == 2
    assert out["p_sum"].sum() == arr[: h - h % P, : w - w % P].sum()
    # one patch checked cell-exactly
    p00 = out[(out.py == 0) & (out.px == 0)].iloc[0]
    tile = arr[:P, :P].astype(np.int64)
    assert (p00.p_sum, p00.p_min, p00.p_max) == (
        tile.sum(),
        tile.min(),
        tile.max(),
    )


def test_image_patches_small_image_drops_and_identity():
    from pyrosar_ray.stages.images import image_patches

    tiny = np.full((2, 3), 7, dtype=np.uint8)
    images = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([1, 2], type=pa.int64()),
                "bytes": pa.array(
                    [tiny.tobytes(), np.array([[5]], dtype=np.uint8).tobytes()],
                    type=pa.binary(),
                ),
                "w": pa.array([3, 1], type=pa.int32()),
                "h": pa.array([2, 1], type=pa.int32()),
                "fmt": pa.array(["raw_gray", "raw_gray"]),
            }
        )
    )
    # patch=4 > both dims of every image -> nothing survives the crop
    assert image_patches(images, patch=4).count() == 0
    # patch=1 is the identity explode: one row per pixel, sum==value
    out = image_patches(images, patch=1).to_pandas()
    assert len(out) == 6 + 1
    assert (out.p_sum == out.p_min).all() and (out.p_sum == out.p_max).all()
    with pytest.raises(ValueError):
        image_patches(images, patch=0)


def test_zonal_stats_zones_and_nodata():
    """Pixel centers land in the right 1-degree zones; nodata drops."""
    from pyrosar_ray.functions.tiff import encode_geotiff
    from pyrosar_ray.stages.zonal import zonal_stats

    # 4x2 raster at ulx=10, uly=20, xres=0.5: centers x = 10.25,10.75,
    # 11.25,11.75 -> zones 10,10,11,11; yres=0.5: centers y = 19.75,
    # 19.25 -> zone 19 for both rows
    v = np.array([[1, 2, 3, 4], [5, -9, 7, 8]], dtype=np.float32)
    blob = encode_geotiff(
        v[None], ulx=10.0, uly=20.0, xres=0.5, yres=0.5, nodata=-9.0, tile=8
    )
    rasters = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([1], type=pa.int64()),
                "blob": pa.array([blob], type=pa.binary()),
            }
        )
    )
    out = (
        zonal_stats(rasters)
        .to_pandas()
        .sort_values(["zone_lon", "zone_lat"], ignore_index=True)
    )
    assert out.zone_lon.tolist() == [10, 11]
    assert out.zone_lat.tolist() == [19, 19]
    assert out.px_count.tolist() == [3, 4]  # nodata pixel dropped
    assert out.v_sum.tolist() == [1 + 2 + 5, 3 + 4 + 7 + 8]
    assert out.img_count.tolist() == [1, 1]


def test_zonal_stats_img_count_merges_across_rasters():
    from pyrosar_ray.functions.tiff import encode_geotiff
    from pyrosar_ray.stages.zonal import zonal_stats

    v = np.ones((1, 2), dtype=np.float32)
    blobs = [
        encode_geotiff(
            v[None], ulx=0.0, uly=1.0, xres=0.25, yres=0.25, nodata=None, tile=8
        )
        for _ in range(3)
    ]
    rasters = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([1, 2, 3], type=pa.int64()),
                "blob": pa.array(blobs, type=pa.binary()),
            }
        )
    )
    out = zonal_stats(rasters).to_pandas()
    assert len(out) == 1
    assert int(out.img_count.iloc[0]) == 3
    assert int(out.px_count.iloc[0]) == 6


def test_raster_gradient_stats_golden():
    from pyrosar_ray.stages.images import raster_gradient_stats

    # 3x4 ramp: v = 2*x + 10*y -> gx = 4 everywhere, gy = 20
    y, x = np.mgrid[0:3, 0:4]
    v = (2 * x + 10 * y).astype(np.uint8)
    images = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([7, 8], type=pa.int64()),
                "bytes": pa.array(
                    [v.tobytes(), b"\x00\x00\x00\x00"], type=pa.binary()
                ),
                "w": pa.array([4, 2], type=pa.int32()),
                "h": pa.array([3, 2], type=pa.int32()),
                "fmt": pa.array(["raw_gray", "raw_gray"]),
            }
        )
    )
    out = raster_gradient_stats(images).to_pandas()
    assert out.image_id.tolist() == [7]  # 2x2 image has no interior
    row = out.iloc[0]
    assert row.n_interior == 2
    assert (row.gx_max, row.gy_max) == (4, 20)
    assert row.grad_sum == 2 * (4 + 20)


def test_sample_raster_boundaries_and_nodata():
    """Top/left edges in, bottom/right out; nodata drops; misses drop."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyrosar_ray.functions.tiff import encode_geotiff
    from pyrosar_ray.stages.zonal import sample_raster

    # 4x2 raster at ulx=10, uly=20, xres=0.5, yres=0.5 -> spans
    # lon [10,12), lat (19,20]; v[iy,ix], nodata at (ix,iy)=(1,1)
    v = np.array([[1, 2, 3, 4], [5, -9, 7, 8]], dtype=np.float32)
    blob = encode_geotiff(
        v[None], ulx=10.0, uly=20.0, xres=0.5, yres=0.5, nodata=-9.0, tile=8
    )
    rasters = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([42], type=pa.int64()),
                "blob": pa.array([blob], type=pa.binary()),
            }
        )
    )
    pts = pa.table(
        {
            "point_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "lon": pa.array([10.0, 11.9, 12.0, 10.7, 10.7, 50.0]),
            "lat": pa.array([20.0, 19.1, 19.5, 19.2, 19.0, 0.0]),
        }
    )
    out = (
        sample_raster(rasters, ray.data.from_arrow(pts))
        .to_pandas()
        .sort_values("point_id", ignore_index=True)
    )
    # point 1: exact top-left corner -> pixel (0,0) v=1 (edges in)
    # point 2: (11.9,19.1) -> ix=3, iy=1 -> v=8
    # point 3: lon=12.0 right edge -> OUT
    # point 4: (10.7,19.2) -> ix=1, iy=1 -> nodata, dropped
    # point 5: lat=19.0 bottom edge -> OUT
    # point 6: far away -> OUT
    assert out.point_id.tolist() == [1, 2]
    assert out.v.tolist() == [1, 8]
    assert out.ix.tolist() == [0, 3] and out.iy.tolist() == [0, 1]


def test_pca_project_variance_ordering(sf_dir):
    """Projected variances are eigenvalue-ordered and reconstruct the
    quantized scatter; projections are deterministic across runs."""
    from pyrosar_ray.stages.ann import pca_project

    from pyrosar_ray.pipelines.tables import read_parquet_clean

    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = (
        pca_project(emb, k=3)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert list(out.columns) == ["vec_id", "p0", "p1", "p2"]
    # uncentered scatter along components is non-increasing
    e0 = (out.p0**2).sum()
    e1 = (out.p1**2).sum()
    e2 = (out.p2**2).sum()
    assert e0 >= e1 >= e2 > 0
    # deterministic (sign convention pins the eigenvector orientation)
    again = (
        pca_project(emb, k=3).to_pandas().sort_values("vec_id", ignore_index=True)
    )
    assert np.allclose(out[["p0", "p1", "p2"]], again[["p0", "p1", "p2"]])


def test_curate_multimodal_gates_and_dedup(tmp_path):
    # run over the real sf0.001 fixtures and assert gate/dedup invariants
    from pyrosar_ray.pipelines.curate import curate_multimodal

    out = curate_multimodal("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["w"].astype(int) * out["h"].astype(int) >= 512).all()
    assert (out["caption"].str.count(" ") + 1 >= 10).all()
    # captions unique after first-wins dedup, keeper = min image_id
    assert out["caption"].is_unique
    # no gated row is lost except to dedup: row count == distinct gated captions
    import pyarrow.parquet as pq

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    docs["ident"] = docs["doc_id"].where(docs["doc_id"] % 10 != 9, docs["doc_id"] - 1)
    w = (docs["ident"] % 3).map({0: 16, 1: 24, 2: 32})
    h = ((docs["ident"] // 3) % 3).map({0: 16, 1: 24, 2: 32})
    gated = docs[(w * h >= 512) & (docs["text"].str.count(" ") + 1 >= 10)]
    assert len(out) == gated["text"].nunique()


def test_images_metadata_path_matches_full_source():
    from pyrosar_ray.sources.images import images_from_documents

    full = (
        images_from_documents("/root/testdata/sf0.001")
        .select_columns(["image_id", "w", "h", "fmt", "caption"])
        .to_pandas().sort_values("image_id", ignore_index=True)
    )
    meta = (
        images_from_documents("/root/testdata/sf0.001", with_pixels=False)
        .to_pandas().sort_values("image_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(full, meta)


def test_power_iteration_int_converges_and_is_exact():
    """Integer power iteration on a known Gram: converges to the top
    eigenvector direction; truncating division matches SQL // semantics."""
    import pandas as pd
    import ray.data as rd

    from pyrosar_ray.stages.ann import power_iteration_int

    # G = diag-dominant 3x3 with top eigenvector ~ e0 + 0.5 e1
    full = np.array([[8, 4, 0], [4, 5, 1], [0, 1, 1]], dtype=np.int64)
    rows = [
        {"i": i, "j": j, "s": int(full[i, j])}
        for i in range(3)
        for j in range(i, 3)
    ]
    out = power_iteration_int(rd.from_pandas(pd.DataFrame(rows)), dim=3, iters=30)
    v = out.to_pandas().sort_values("dim_idx")["v"].to_numpy().astype(np.float64)
    ev = np.linalg.eigh(full.astype(np.float64))[1][:, -1]
    ev = ev / np.abs(ev).max()
    got = v / np.abs(v).max()
    if np.sign(got[np.argmax(np.abs(got))]) != np.sign(ev[np.argmax(np.abs(ev))]):
        ev = -ev
    assert np.allclose(got, ev, atol=1e-4)
    # truncation semantics: a negative-heavy Gram exercises tdiv < 0
    # (asymmetric diagonal so the all-ones start isn't an eigenvector)
    neg = [{"i": 0, "j": 0, "s": 1}, {"i": 0, "j": 1, "s": -5}, {"i": 1, "j": 1, "s": 2}]
    out2 = power_iteration_int(rd.from_pandas(pd.DataFrame(neg)), dim=2, iters=10)
    vals = out2.to_pandas().sort_values("dim_idx")["v"].tolist()
    assert min(vals) < 0 < max(vals)  # mixed-sign dominant eigenvector


def test_image_features_skip_policy_counts_corrupt_rows(sf_dir):
    """on_error='skip': poisoned blobs drop their rows (job survives)
    and the cluster-wide collector counts them; default stays strict."""
    import ray

    from pyrosar_ray.sources.images import images_from_documents
    from pyrosar_ray.stages.images import image_features
    from pyrosar_ray.state import metrics

    imgs = images_from_documents(sf_dir).limit(40)

    def _poison(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = [
            b"\x89PNG\r\n\x1a\ngarbage" if int(i[4:]) % 5 == 0 else b
            for i, b in zip(ids, batch["bytes"].to_pylist())
        ]
        fmts = [
            "png" if int(i[4:]) % 5 == 0 else f
            for i, f in zip(ids, batch["fmt"].to_pylist())
        ]
        return batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes",
            pa.array(blobs, type=pa.binary()),
        ).set_column(
            batch.schema.get_field_index("fmt"), "fmt",
            pa.array(fmts, type=pa.string()),
        )

    poisoned = imgs.map_batches(_poison, batch_format="pyarrow")
    metrics.reset()
    out = image_features(poisoned, on_error="skip").to_pandas()
    n_bad = sum(1 for i in range(1, 41) if i % 5 == 0)
    assert len(out) == 40 - n_bad
    assert metrics.snapshot()["image_features/corrupt_rows"] == n_bad
    # strict default: the same corpus raises
    import pytest as _pytest

    with _pytest.raises(Exception):
        image_features(poisoned).to_pandas()


def test_hard_negative_mining_excludes_same_label():
    """Label masking: no returned neighbor shares the query's label, and
    among other-class rows the ranking equals plain brute force."""
    from pyrosar_ray.stages.ann import brute_force_topk, _normalize

    rng = np.random.RandomState(4)
    n, dim = 120, 8
    mat = rng.standard_normal((n, dim))
    labels = (np.arange(n) % 3).astype(np.int64)
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float64())),
            "label": pa.array(labels),
        }
    )
    qids = np.array([0, 31], dtype=np.int64)
    out = (
        brute_force_topk(
            ray.data.from_arrow(tab).repartition(4), qids, mat[qids], k=5,
            query_labels=labels[qids],
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    norm = _normalize(mat)
    for q in qids:
        got = out[out["query_id"] == q]["neighbor_id"].to_numpy()
        assert all(labels[g] != labels[q] for g in got)
        sims = norm @ norm[q]
        cand = [i for i in range(n) if labels[i] != labels[q]]
        want = sorted(cand, key=lambda i: (-sims[i], i))[:5]
        assert got.tolist() == want


def test_pq_assign_matches_bruteforce():
    """PQ code = the true argmin codeword per subspace, ties → lowest."""
    import numpy as np

    from pyrosar_ray.stages.ann import _pq_assign, pq_codebooks

    rng = np.random.default_rng(5)
    books = pq_codebooks(4, 8, 4, seed=13)
    emb = rng.integers(-(10**6), 10**6, size=(50, 16)).astype(np.int64)
    codes, d2min = _pq_assign(emb, books)
    for i in range(len(emb)):
        for s in range(4):
            sub = emb[i, s * 4 : (s + 1) * 4]
            dists = ((books[s] - sub[None, :]) ** 2).sum(axis=1)
            assert codes[i, s] == int(np.argmin(dists))
            assert d2min[i, s] == int(dists.min())


def test_pq_pack_width_guard_and_order():
    import numpy as np
    import pytest

    from pyrosar_ray.stages.ann import pq_pack

    codes = np.array([[1, 2, 3]], dtype=np.int64)
    # 4-bit codes, subspace 0 highest: 0x123
    assert pq_pack(codes, 16)[0] == 0x123
    with pytest.raises(ValueError, match="exceeds exact-DOUBLE"):
        pq_pack(np.zeros((1, 8), dtype=np.int64), 1 << 60)


def test_pq_adc_equals_lut_free_distance():
    """ADC rank == rank by exact ||q_sub - codeword(code)||² computed
    the long way (decode the code, measure) — the LUT is lossless."""
    import numpy as np
    import pandas as pd
    import ray

    from pyrosar_ray.stages.ann import (
        _pq_assign,
        pq_adc_topk,
        pq_codebooks,
        quantize_embeddings,
    )

    rng = np.random.default_rng(9)
    n, d, m, ksub = 80, 16, 4, 8
    mat = rng.uniform(-1, 1, size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    qids = ids[:5]
    out = (
        pq_adc_topk(
            ray.data.from_pandas(df).repartition(3),
            qids,
            mat[:5],
            k=4,
            m=m,
            ksub=ksub,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # reference: decode codes, exact distance, same tie rule
    books = pq_codebooks(m, ksub, d // m)
    emb = quantize_embeddings(mat)
    codes, _ = _pq_assign(emb, books)
    recon = books[np.arange(m)[None, :], codes].reshape(n, d)
    qsub = quantize_embeddings(mat[:5])
    for qi, q in zip(qids, qsub):
        dist = ((recon - q[None, :]) ** 2).sum(axis=1)
        dist[qi] = np.iinfo(np.int64).max  # exclude self
        order = np.lexsort((ids, dist))[:4]
        got = out[out["query_id"] == qi].sort_values("rank")["neighbor_id"]
        assert got.tolist() == ids[order].tolist()


def test_sq_encode_floor_semantics():
    import numpy as np

    from pyrosar_ray.stages.ann import _sq_encode

    emb = np.array([[105514, -366539, 355547, 7]], dtype=np.int64)
    mn = np.array([-366539, -366539, -366539, 7], dtype=np.int64)
    mx = np.array([355547, 355547, 355547, 7], dtype=np.int64)
    codes = _sq_encode(emb, mn, mx)
    # exact floor: (105514+366539)*255 // 722086 = 166 (NOT round→167)
    assert codes.tolist() == [[166, 0, 255, 0]]  # constant dim → code 0


def test_sq_rerank_matches_bruteforce_cascade():
    """The distributed cascade == the single-process reference: top-C
    by code dots, then top-k by exact integer dots, same tie rules."""
    import numpy as np
    import pandas as pd
    import ray

    from pyrosar_ray.stages.ann import (
        _sq_encode,
        quantize_embeddings,
        sq_rerank_topk,
    )

    rng = np.random.default_rng(21)
    n, d, C, k = 120, 12, 8, 3
    mat = rng.uniform(-1, 1, size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(map(list, mat))})
    qsel = ids[::17]
    out = (
        sq_rerank_topk(
            ray.data.from_pandas(df).repartition(5),
            qsel,
            mat[::17],
            k=k,
            candidates=C,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    q = quantize_embeddings(mat)
    mn, mx = q.min(axis=0), q.max(axis=0)
    codes = _sq_encode(q, mn, mx)
    for qid in qsel:
        approx = codes[qid] @ codes.T
        approx[qid] = -(2**62)  # int64.min would overflow under negation
        cand = np.lexsort((ids, -approx))[:C]
        exact = q[cand] @ q[qid]
        order = cand[np.lexsort((cand, -exact))][:k]
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"]
        assert got.tolist() == order.tolist(), qid


def test_subspace_iteration_int_spans_top_eigenspace():
    """The integer orthogonal iteration converges (in span) to the top-k
    eigenspace of the Gram matrix, basis vectors stay mutually
    near-orthogonal, and the arithmetic is reproducible big-int ops."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pyrosar_ray.stages.ann import subspace_iteration_int

    # symmetric PSD matrix with well-separated spectrum
    rng = np.random.default_rng(2)
    b = rng.integers(-5, 6, size=(6, 6)).astype(np.int64)
    m = b @ b.T + np.diag([900, 400, 100, 0, 0, 0]).astype(np.int64)
    rows = [
        {"i": i, "j": j, "s": int(m[i, j])}
        for i in range(6)
        for j in range(i, 6)
    ]
    vs = subspace_iteration_int(
        rd.from_pandas(pd.DataFrame(rows)), dim=6, k=3, iters=30
    )
    v = np.array(vs, dtype=np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    vals, vecs = np.linalg.eigh(m.astype(np.float64))
    top = vecs[:, np.argsort(vals)[::-1][:3]]  # (d, 3)
    # span check: projecting each iterated vector onto the top-3
    # eigenspace loses (almost) nothing
    resid = v.T - top @ (top.T @ v.T)
    assert np.linalg.norm(resid) < 1e-3
    # near-orthogonality of the integer basis
    g = v @ v.T
    off = g - np.diag(np.diag(g))
    assert np.abs(off).max() < 1e-3


def test_subspace_iteration_int_guards():
    import pandas as pd
    import pytest
    import ray.data as rd

    from pyrosar_ray.stages.ann import subspace_iteration_int

    rows = [{"i": 0, "j": 0, "s": 0}, {"i": 1, "j": 1, "s": 0}]
    ds = rd.from_pandas(pd.DataFrame(rows))
    with pytest.raises(ValueError):
        subspace_iteration_int(ds, dim=2, k=1, iters=2)  # zero Gram
    with pytest.raises(ValueError):
        subspace_iteration_int(ds, dim=2, k=3, iters=2)  # k > dim


def test_box_downsample_sum_pool_exact():
    """2x2 block sums equal the numpy pooling reference; odd edges crop."""
    from pyrosar_ray.stages.images import box_downsample_stats

    w, h = 9, 7  # odd both ways: crops to 8x6 -> 4x3 output
    arr = ((np.arange(h * w, dtype=np.int64) * 31) % 251).astype(np.uint8).reshape(h, w)
    images = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([3], type=pa.int64()),
                "bytes": pa.array([arr.tobytes()], type=pa.binary()),
                "w": pa.array([w], type=pa.int32()),
                "h": pa.array([h], type=pa.int32()),
                "fmt": pa.array(["raw_gray"]),
            }
        )
    )
    out = box_downsample_stats(images, factor=2).to_pandas().iloc[0]
    ref = arr[:6, :8].astype(np.int64).reshape(3, 2, 4, 2).sum(axis=(1, 3))
    assert (out.w2, out.h2) == (4, 3)
    flat = ref.reshape(-1)
    assert out.ds_wsum == int((flat * (np.arange(flat.size) + 1)).sum())
    assert out.ds_min == flat.min() and out.ds_max == flat.max()
    # factor=1 is the identity pooling: weighted sum over the raw plane
    ident = box_downsample_stats(images, factor=1).to_pandas().iloc[0]
    raw = arr.astype(np.int64).reshape(-1)
    assert (ident.w2, ident.h2) == (w, h)
    assert ident.ds_wsum == int((raw * (np.arange(raw.size) + 1)).sum())


def test_hist_match_identity_and_monotone():
    """Matching an image whose histogram IS the triangular reference
    leaves levels monotone-nondecreasing; a constant image maps to the
    level whose reference CDF first covers the whole mass."""
    from pyrosar_ray.stages.images import hist_match_stats

    # constant image: cdf(v)=npix for the single level -> lut maps to
    # min g with (g+1)(g+2) >= 2*32896 = 65792 -> g = 255
    const = np.full((4, 4), 9, dtype=np.uint8)
    # ramp image: one pixel of each level 0..15
    ramp = np.arange(16, dtype=np.uint8).reshape(4, 4)
    images = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([1, 2], type=pa.int64()),
                "bytes": pa.array(
                    [const.tobytes(), ramp.tobytes()], type=pa.binary()
                ),
                "w": pa.array([4, 4], type=pa.int32()),
                "h": pa.array([4, 4], type=pa.int32()),
                "fmt": pa.array(["raw_gray"] * 2),
            }
        )
    )
    out = hist_match_stats(images).to_pandas().set_index("image_id")
    assert out.loc[1, "hm_min"] == out.loc[1, "hm_max"] == 255
    # brute-force reference for the ramp
    v = ramp.reshape(-1).astype(np.int64)
    cdf = np.cumsum(np.bincount(v, minlength=256))
    g = np.arange(256, dtype=np.int64)
    lut = np.searchsorted((g + 1) * (g + 2) * 16, cdf * 65792, "left")
    hm = lut[v]
    assert out.loc[2, "hm_wsum"] == int((hm * (np.arange(16) + 1)).sum())
    assert out.loc[2, "hm_min"] == hm.min() and out.loc[2, "hm_max"] == hm.max()
    assert (np.diff(hm) >= 0).all()

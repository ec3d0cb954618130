"""RAKE keyphrases (stages/rake.py) + one-pass CUBE (stages/cube.py)."""

import numpy as np
import pandas as pd

from pyrosar_ray.stages.rake import rake_phrases


def test_rake_hand_worked():
    """Hand-computed RAKE on a tiny doc: segments split at stopwords,
    deg counts segment lengths per occurrence, phrase = word-score sum."""
    doc = "red fox and the red dog in a den"
    # segments: [red fox], [red dog], [den]
    # freq: red 2, fox 1, dog 1, den 1
    # deg:  red 2+2=4, fox 2, dog 2, den 1
    # scores: 'red fox' = 4*1000//2 + 2*1000//1 = 4000
    #         'red dog' = 2000 + 2000 = 4000, 'den' = 1000
    got = rake_phrases(doc, k=3)
    assert got == [("red dog", 4000), ("red fox", 4000), ("den", 1000)]


def test_rake_duplicate_phrase_scored_once():
    doc = "red fox and red fox"
    # freq red 2, fox 2; deg red 4, fox 4; phrase score = 2000+2000
    assert rake_phrases(doc, k=5) == [("red fox", 4000)]


def test_rake_all_stopwords():
    assert rake_phrases("the of and a", k=3) == []


def test_cube_all_grouping_sets(ray_session):
    import ray

    from pyrosar_ray.stages.cube import cube_aggregate

    df = pd.DataFrame(
        {
            "t": ["x", "x", "y", "y", "y"],
            "d": ["m", "n", "m", "m", "n"],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = (
        cube_aggregate(ray.data.from_pandas(df).repartition(3), ["t", "d"], "v")
        .to_pandas()
        .sort_values(["t", "d"], ignore_index=True)
    )
    import duckdb

    want = duckdb.query_df(
        df, "df",
        """
        SELECT COALESCE(t,'ALL') AS t, COALESCE(d,'ALL') AS d,
               COUNT(*) AS n, SUM(floor(v*100+0.5))::BIGINT AS sum_cents
        FROM df GROUP BY CUBE (t, d) ORDER BY t, d
        """,
    ).df()
    assert len(out) == len(want) == 3 * 3  # (x,y,ALL) x (m,n,ALL)
    assert out["t"].tolist() == want["t"].tolist()
    assert out["d"].tolist() == want["d"].tolist()
    assert np.array_equal(out["n"].to_numpy(), want["n"].to_numpy())
    assert np.array_equal(
        out["sum_cents"].to_numpy(), want["sum_cents"].to_numpy()
    )

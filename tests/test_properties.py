"""Property-based parity tests (hypothesis): random inputs, compared
against reference-engine computations (pandas/numpy — the reference's
own substrate), not hand-picked examples.

Spark jobs per example are ~100ms, so max_examples stays small; the
value is in the generator shapes (ties, duplicates, skew), not volume.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from safedata_pipeline_spark.operators import drift as DR
from safedata_pipeline_spark.operators import protect as PR

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# values drawn from a tiny grid force heavy ties — the qcut
# duplicate-edge-drop and KS tie-handling branches
_tied_floats = st.lists(
    st.sampled_from([0.0, 1.0, 1.5, 2.0, 7.25, 100.0]), min_size=12, max_size=60
)
_floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=12,
    max_size=60,
)


@_settings
@given(data=st.one_of(_floats, _tied_floats), bins=st.sampled_from([2, 4, 10]))
def test_quantile_edges_match_pandas_qcut(spark, data, bins):
    """Edge parity with the reference: pd.qcut(duplicates='drop') bins
    by np.quantile edges with exact duplicates removed (privacy.py:17).
    """
    df = spark.createDataFrame([(float(x),) for x in data], "v double")
    got = PR.quantile_edges(df, "v", bins)
    # probs as i/bins, NOT np.linspace: linspace accumulates step error
    # (its 0.6 is one ulp off 6/10), which makes np.quantile interpolate
    # a spurious ~1e-15 edge on tied data that exact-duplicate-drop then
    # keeps — a prob-construction artifact, not a quantile difference
    want_raw = np.quantile(np.array(data), [i / bins for i in range(bins + 1)])
    want = []
    for e in want_raw:
        if not want or float(e) != want[-1]:
            want.append(float(e))
    # last-ulp interpolation differences can still merge/split an edge
    # under exact-duplicate drop; require set-closeness both ways rather
    # than identical edge counts
    got_a, want_a = np.asarray(got), np.asarray(want)
    for e in got_a:
        assert np.isclose(want_a, e, rtol=1e-9, atol=1e-9).any()
    for e in want_a:
        assert np.isclose(got_a, e, rtol=1e-9, atol=1e-9).any()


def _ks_numpy(a, b):
    a, b = np.sort(np.asarray(a, dtype=float)), np.sort(np.asarray(b, dtype=float))
    grid = np.union1d(a, b)
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


@_settings
@given(a=st.one_of(_floats, _tied_floats), b=st.one_of(_floats, _tied_floats))
def test_ks_statistic_matches_numpy_ecdf(spark, a, b):
    da = spark.createDataFrame([(float(x),) for x in a], "v double")
    db = spark.createDataFrame([(float(x),) for x in b], "v double")
    got = DR.ks_statistic(da, db, "v").collect()[0][0]
    assert abs(got - round(_ks_numpy(a, b), 6)) <= 1e-6


@_settings
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 3)),
        min_size=5,
        max_size=40,
    )
)
def test_sdc_suppress_matches_pandas_value_counts(spark, data):
    """Suppression parity: values whose group count < threshold become
    OTHER, exactly the reference's value_counts cut (privacy.py:4-11)."""
    threshold = 3
    vals = [t[0] * (t[1] + 1) for t in data]  # strings like 'aa', 'ccc'
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    got = [r.c for r in PR.sdc_suppress(df, ["c"], threshold=threshold).collect()]
    counts = pd.Series(vals).value_counts(dropna=False)
    rare = set(counts[counts < threshold].index)
    want = ["OTHER" if v in rare else v for v in vals]
    assert sorted(got) == sorted(want)

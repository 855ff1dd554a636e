"""Exact-vs-approx percentile twins (VERDICT r2 item 5): the exact path
is the oracle contract; the approx path is the 100 TB-scale twin whose
rank error is bounded by n/accuracy. These tests pin (a) the approx path
runs and has the same shape, (b) its values track exact closely at test
scale, (c) the exact oracle rows stay untouched by the switch."""

from __future__ import annotations

from franzoxide_spark.queries.extras import q49
from franzoxide_spark.queries.llm import q31


def _by_key(rows, key):
    return {r[key]: r.asDict() for r in rows}


def test_q49_approx_twin_tracks_exact(spark, sf_dir):
    exact = _by_key(q49(spark, sf_dir, exact=True).collect(), "o_orderstatus")
    approx = _by_key(q49(spark, sf_dir, exact=False).collect(), "o_orderstatus")
    assert set(exact) == set(approx)
    for status, e in exact.items():
        a = approx[status]
        assert a["n"] == e["n"]  # counts are exact on both paths
        for p in ("p25", "p50", "p75"):
            # GK rank error <= n/accuracy; at test scale that is a handful
            # of ranks — values must agree within 1% relative
            assert abs(a[p] - e[p]) <= 0.01 * abs(e[p]), (status, p, a[p], e[p])


def test_q31_approx_twin_tracks_exact(spark, sf_dir):
    exact = _by_key(q31(spark, sf_dir, exact=True).collect(), "lang")
    approx = _by_key(q31(spark, sf_dir, exact=False).collect(), "lang")
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        # the > p50 gate may shift by the boundary documents only
        assert abs(a["n_docs"] - e["n_docs"]) <= max(2, 0.02 * e["n_docs"])

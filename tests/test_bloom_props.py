"""Property tests for the bloom-filter arithmetic (io_backends):
pure Python, no Spark session — the fold-composition and
membership-probe invariants the integration tests rely on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dish_data_pipeline_spark.io_backends import (
    BLOOM_K,
    BLOOM_M_MAX,
    _bloom_membership,
)
from dish_data_pipeline_spark.ops.portable import (
    perm_coeffs,
    py_perm,
    py_phash,
)

COEFFS = perm_coeffs(BLOOM_K, 42)


def _build_entry(values, m, dense=False):
    """Python twin of the Spark builder: positions at BLOOM_M_MAX,
    folded to m — exactly the fold the backend performs."""
    bits = set()
    for v in values:
        h = py_phash(str(v))
        for a, b in COEFFS:
            bits.add(py_perm(h, a, b) % BLOOM_M_MAX % m)
    if dense:
        bitmap = 0
        for p in bits:
            bitmap |= 1 << p
        return {"m": m, "hex": f"{bitmap:x}"}
    return {"m": m, "pos": sorted(bits)}


@given(
    st.lists(st.integers(-10**12, 10**12), min_size=1, max_size=60),
    st.sampled_from([1 << 10, 1 << 14, 1 << 18]),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_no_false_negatives(values, m, dense):
    entry = _build_entry(values, m, dense)
    for v in values:
        assert _bloom_membership(entry, py_phash(str(v)), COEFFS)


@given(st.integers(0, 2**60 - 1), st.sampled_from([1 << 10, 1 << 16, 1 << 22]))
@settings(max_examples=500, deadline=None)
def test_fold_composition(h, m):
    # the builder folds positions computed at BLOOM_M_MAX down to m;
    # the prober computes them directly mod m — must agree always
    for a, b in COEFFS:
        assert py_perm(h, a, b) % BLOOM_M_MAX % m == py_perm(h, a, b) % m


@given(
    st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=40),
)
@settings(max_examples=100, deadline=None)
def test_encodings_agree(values):
    m = 1 << 12
    sparse = _build_entry(values, m, dense=False)
    dense = _build_entry(values, m, dense=True)
    probes = values + ["~absent~" + v for v in values]
    for v in probes:
        h = py_phash(str(v))
        assert _bloom_membership(sparse, h, COEFFS) == _bloom_membership(
            dense, h, COEFFS
        )

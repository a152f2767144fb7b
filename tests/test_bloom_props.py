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


def test_m_cap_regression():
    """The builder caps file filter size at BLOOM_M_MAX because build
    positions are folded mod BLOOM_M_MAX: with m > BLOOM_M_MAX the
    fold identity (x % BLOOM_M_MAX) % m == x % m breaks and probes
    hit unset bits (false negatives → silently dropped files). Pin
    both facts: the identity really does fail above the cap, and the
    backend never chooses such an m (the r8 ADVICE bug: a file of
    >=262144 rows at 16 bits/row overflowed the cap)."""
    m_over = BLOOM_M_MAX << 2
    a, b = COEFFS[0]
    broken = any(
        py_perm(h, a, b) % BLOOM_M_MAX % m_over != py_perm(h, a, b) % m_over
        for h in range(10**6, 10**6 + 5000)
    )
    assert broken, "fold identity unexpectedly held above BLOOM_M_MAX"
    # the backend's size rule, as applied in _bloom_for_files
    for n_rows, bpr in [(262144, 16), (10**7, 16), (1, 16), (0, 16)]:
        m = min(BLOOM_M_MAX, max(1024, 1 << (bpr * max(n_rows, 1)).bit_length()))
        assert 1024 <= m <= BLOOM_M_MAX
        assert BLOOM_M_MAX % m == 0  # power-of-two divisor → fold sound


def test_legacy_uncapped_entry_is_never_pruned():
    """Entries written by the pre-cap builder (m > BLOOM_M_MAX) carry
    positions folded mod BLOOM_M_MAX; probing them mod m is unsound.
    The prober must answer 'maybe present' for every probe — sound
    (no pruning) instead of silently dropping files."""
    entry = {"m": BLOOM_M_MAX << 2, "pos": []}  # empty = worst case
    assert _bloom_membership(entry, py_phash("anything"), COEFFS)


@given(
    st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=40),
    st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_no_false_negatives_at_cap(values, dense):
    # m == BLOOM_M_MAX exactly (the capped regime for huge files)
    entry = _build_entry(values, BLOOM_M_MAX, dense)
    for v in values:
        assert _bloom_membership(entry, py_phash(str(v)), COEFFS)


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

"""Property-based invariants (hypothesis) for the pure-python pieces
whose correctness the distributed paths lean on."""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from delta_spark.ops.similarity import lsh_params_for


@given(st.floats(min_value=0.05, max_value=0.99),
       st.sampled_from([1e-3, 1e-6, 1e-9]))
@settings(max_examples=200, deadline=None)
def test_lsh_params_meet_recall_within_budget(threshold, miss):
    """For any threshold: the returned (r, bands) stays inside the bit
    budget and a pair AT the threshold collides in ≥1 band with
    probability ≥ 1 - target_miss (the recall contract the candidates
    stage advertises)."""
    r, b = lsh_params_for(threshold, target_miss=miss)
    assert r >= 1 and b >= 1
    assert r * b <= 512 or r == 1
    p = 1.0 - math.acos(threshold) / math.pi
    assert (1.0 - p ** r) ** b <= miss * (1 + 1e-9)


@given(st.floats(min_value=0.3, max_value=0.98),
       st.integers(min_value=100, max_value=10**9))
@settings(max_examples=200, deadline=None)
def test_lsh_params_corpus_sized(threshold, n):
    """n-aware parameters keep the recall contract, and bucket
    occupancy never grows without bound: scaling the corpus 1000× must
    not leave r unchanged (the cost model tracks log2(n))."""
    r, b = lsh_params_for(threshold, n=n)
    assert r >= 1 and b >= 1
    p = 1.0 - math.acos(threshold) / math.pi
    assert (1.0 - p ** r) ** b <= 1e-6 * (1 + 1e-9)
    r2, _ = lsh_params_for(threshold, n=n * 1000)
    assert r2 >= r


@given(st.floats(min_value=0.3, max_value=0.98))
@settings(max_examples=100, deadline=None)
def test_lsh_params_prefer_selective_bands(threshold):
    """Within the budget, r is maximal: using one more row per band
    must overflow the budget (selectivity is exponential in r, so a
    feasible larger r would mean we left pruning on the table)."""
    r, b = lsh_params_for(threshold)
    p = 1.0 - math.acos(threshold) / math.pi
    r2 = r + 1
    b2 = max(1, math.ceil(math.log(1e-6) / math.log(1.0 - p ** r2)))
    assert r2 * b2 > 512


# ---------------------------------------------------------------------------
# partition-value serialization round trip — the seam TIMESTAMP-typed
# partition columns cross between the log (strings) and the engine

@given(st.integers(min_value=-2**31, max_value=2**31 - 1))
@settings(max_examples=100, deadline=None)
def test_int_partition_value_roundtrip(v):
    from pyspark.sql import types as T

    from delta_spark.util import deserialize_partition_value, serialize_partition_value

    s = serialize_partition_value(v, T.IntegerType())
    assert deserialize_partition_value(s, T.IntegerType()) == v


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=40))
@settings(max_examples=100, deadline=None)
def test_string_partition_dir_roundtrip(v):
    """Hive dir escaping: any string partition value survives the
    escape/unescape pair (special chars, unicode, whitespace)."""
    from delta_spark.util import escape_partition_value, unescape_partition_value

    assert unescape_partition_value(escape_partition_value(v)) == v


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=60, deadline=None)
def test_roaring_bitmap_roundtrip(indexes):
    """The portable DV codec: any row-index set round-trips through the
    protocol's RoaringBitmapArray serialization."""
    import numpy as np

    from delta_spark.dv import deserialize_rbm_array, serialize_rbm_array

    arr = np.array(sorted(set(indexes)), dtype=np.int64)
    got = deserialize_rbm_array(serialize_rbm_array(arr))
    assert list(got) == list(arr)


@given(st.text(alphabet="abc xyz\n\r\t.!", max_size=120))
@settings(max_examples=40, deadline=None)
def test_repetition_ref_formula_bounds(text):
    """The python reference formula the spark op is pinned against
    stays in [0,1] on arbitrary whitespace-heavy input."""
    import re

    lines = [s.strip() for s in text.split("\n") if s.strip()]
    n, nd = len(lines), len(set(lines))
    ch = sum(len(s) for s in lines)
    dch = sum(len(s) for s in set(lines))
    frac = (n - nd) / n if n else 0.0
    cfrac = (ch - dch) / ch if ch else 0.0
    assert 0.0 <= frac <= 1.0 and 0.0 <= cfrac <= 1.0

"""Property test: the pure-Python Jaro-Winkler in operators/linkage.py is
bit-identical to DuckDB's jaro_winkler_similarity on arbitrary strings —
the calibration claim the dedup_fuzzy_jaro_winkler oracle rests on."""

import duckdb
from hypothesis import given, settings, strategies as st

from hudi_acid_verification_spark.operators.linkage import _jaro_winkler

_CON = duckdb.connect()
_ALPHA = st.text(
    alphabet=st.sampled_from("abcdefgh XYZ0123"), min_size=0, max_size=48
)


@settings(max_examples=400, deadline=None)
@given(_ALPHA, _ALPHA)
def test_jaro_winkler_matches_duckdb_bitwise(s1, s2):
    want = _CON.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
    ).fetchone()[0]
    got = _jaro_winkler(s1, s2)
    assert got == want, (s1, s2, got, want)

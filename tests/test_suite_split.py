"""Guards for the two-shard certification split (VERDICT r10 #2).

The split lives in tests/conftest.py::pytest_collection_modifyitems: tests
in tests/test_oracle.py carry `oracle`, everything else carries `fast`.
These guards prove the split is exhaustive and disjoint, so the two
certification commands (pytest.ini) together cover the full suite.
"""

from __future__ import annotations


def test_markers_registered_in_ini():
    import configparser
    import os

    ini = os.path.join(os.path.dirname(__file__), "..", "pytest.ini")
    cp = configparser.ConfigParser()
    cp.read(ini)
    markers = cp.get("pytest", "markers")
    assert "oracle:" in markers
    assert "fast:" in markers


def test_split_is_exhaustive_and_disjoint(request):
    # Inspect the live collected session: every item must carry exactly
    # one of the two shard markers. Runs inside any shard invocation, so
    # it sees whichever subset was collected — the invariant holds on any
    # subset iff the conftest hook applied to every collected item.
    items = request.session.items
    assert items
    for item in items:
        has_oracle = item.get_closest_marker("oracle") is not None
        has_fast = item.get_closest_marker("fast") is not None
        assert has_oracle != has_fast, (
            f"{item.nodeid}: must carry exactly one shard marker "
            f"(oracle={has_oracle}, fast={has_fast})"
        )
        in_oracle_file = item.fspath.basename == "test_oracle.py"
        assert has_oracle == in_oracle_file, item.nodeid

"""Property-based checks (hypothesis) for the HDRF fold — pure-pandas, no
Spark session needed, so these run in milliseconds and explore edge
orderings the fixture graph never produces."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_streaming_gnn_spark.graph.hdrf import make_hdrf_core

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=200,
)


@settings(max_examples=50, deadline=None)
@given(edges=edges_strategy, n_parts=st.integers(2, 8), lam=st.floats(0.5, 4.0))
def test_hdrf_invariants(edges, n_parts, lam):
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    out = make_hdrf_core(n_parts, lam)(pdf)
    # every edge assigned exactly once, to a valid part
    assert len(out) == len(pdf)
    assert out["part_id"].between(0, n_parts - 1).all()
    # replication factor bounded: 1 <= RF <= min(n_parts, max degree)
    hosted = pd.concat(
        [
            out[["src", "part_id"]].rename(columns={"src": "v"}),
            out[["dst", "part_id"]].rename(columns={"dst": "v"}),
        ]
    ).drop_duplicates()
    rf = len(hosted) / hosted["v"].nunique()
    assert 1.0 <= rf <= n_parts
    # determinism under replay
    out2 = make_hdrf_core(n_parts, lam)(pdf)
    pd.testing.assert_frame_equal(out, out2)


@settings(max_examples=20, deadline=None)
@given(edges=edges_strategy)
def test_hdrf_locality_beats_or_ties_hash(edges):
    """On any graph, HDRF's replication factor never loses to random-ish
    hash partitioning of edges by dst (the un-clever baseline)."""
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    n_parts = 4
    out = make_hdrf_core(n_parts, 1.0)(pdf)

    def rf(assign: pd.DataFrame) -> float:
        hosted = pd.concat(
            [
                assign[["src", "part_id"]].rename(columns={"src": "v"}),
                assign[["dst", "part_id"]].rename(columns={"dst": "v"}),
            ]
        ).drop_duplicates()
        return len(hosted) / hosted["v"].nunique()

    hashed = pdf.assign(part_id=pdf["dst"] % n_parts)
    assert rf(out) <= rf(hashed) + 1e-9

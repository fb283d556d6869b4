"""Property-based fidelity test: gap_fill_edges vs an independent
python model of the reference's ``_add_records``
(/root/reference/cal_mobility_matrix.py:105-127) on randomized
trajectories (SURVEY.md §5.3)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.operators.trajectory import (
    gap_fill_edges,
)

BASE = dt.datetime(2024, 1, 1)


def _model(positions, max_fill=24):
    """Independent re-implementation of the five branches: input
    [(hour_idx, region)] sorted per user; output set of
    (region, hour_idx, pre_hour_idx, pre_region)."""
    out = []
    for i, (h, r) in enumerate(positions):
        first = i == 0
        last = i == len(positions) - 1
        if first:
            out.append((r, h, h - 1, 0))
        else:
            ph, pr = positions[i - 1]
            gap = h - ph
            if gap <= 1:
                out.append((r, h, ph, pr))
            elif gap <= max_fill:
                for j in range(1, gap):
                    out.append((pr, ph + j, ph + j - 1, pr))
                out.append((r, h, h - 1, pr))
            else:
                out.append((0, ph + 1, ph, pr))
                out.append((r, h, h - 1, 0))
        if last:
            out.append((0, h + 1, h, r))
    return sorted(out)


trajectories = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=80),  # hour index
        st.integers(min_value=1, max_value=5),  # region
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None)
@given(trajectories)
def test_gap_fill_matches_reference_model(spark, traj):
    traj = sorted(traj)
    rows = [
        (1, BASE + dt.timedelta(hours=h), r) for h, r in traj
    ]
    pos = spark.createDataFrame(
        rows, "user_id long, hour timestamp, region_id int"
    )
    got = sorted(
        (
            r.region_id,
            int((r.hour - BASE).total_seconds() // 3600),
            int((r.pre_hour - BASE).total_seconds() // 3600),
            r.pre_region_id,
        )
        for r in gap_fill_edges(pos).collect()
    )
    assert got == _model(traj)

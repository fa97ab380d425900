"""Pure-Python tests for the scaling-evidence tooling (no Spark).

The scaling verdict in BENCH/BASELINE.md rests on scripts/
stage_occupancy.py's event-log parsing (task-seconds + occupancy) and
scripts/scaling_bench.py's model fits; pin both so the evidence
pipeline can't rot silently.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_stage_occupancy_parse(tmp_path):
    occ = _load("stage_occupancy", "scripts/stage_occupancy.py")
    evdir = tmp_path / "evlog"
    evdir.mkdir()
    events = [
        # stage 1: two tasks 1000ms + 3000ms, wall 2500ms
        {"Event": "SparkListenerTaskEnd", "Stage ID": 1,
         "Task Info": {"Launch Time": 1000, "Finish Time": 2000}},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 1,
         "Task Info": {"Launch Time": 1000, "Finish Time": 4000}},
        {"Event": "SparkListenerStageCompleted",
         "Stage Info": {"Stage ID": 1, "Stage Name": "count at x", "Number of Tasks": 2,
                        "Submission Time": 1000, "Completion Time": 3500}},
        # stage 2: one task, no completion event (skipped in rows, still counted)
        {"Event": "SparkListenerTaskEnd", "Stage ID": 2,
         "Task Info": {"Launch Time": 0, "Finish Time": 500}},
        # junk lines the parser must survive
        42,
        {"Event": "SparkListenerJobStart"},
    ]
    with open(evdir / "events.jsonl", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
        f.write("not json\n")
    rows, total_task_s = occ.parse(str(evdir))
    assert total_task_s == 4.5  # 1 + 3 + 0.5
    assert len(rows) == 1
    wall, sid, name, n, s, mx, md = rows[0]
    assert (sid, n) == (1, 2)
    assert wall == 2.5 and s == 4.0 and mx == 3.0


def test_amdahl_and_bandwidth_fits_recover_planted_params():
    """The two-model fit in scaling_bench.py (inlined formulas): plant
    dT(c) = W/c + S and check the Amdahl fit recovers (W, S) exactly,
    and that linear-in-c task inflation is algebraically identical to
    an Amdahl serial term (the degeneracy BENCH/BASELINE.md documents).
    """
    W, S = 254.0, 15.0
    cn, c4 = 2, 8
    d_n, d_4 = W / cn + S, W / c4 + S
    W_fit = (d_n - d_4) / (1.0 / cn - 1.0 / c4)
    S_fit = d_n - W_fit / cn
    assert abs(W_fit - W) < 1e-9 and abs(S_fit - S) < 1e-9
    # degeneracy: contention model W0*(1+a*c)/c produces the same curve
    a = S / W  # a*W0 == S with W0 == W
    for c in (2, 4, 8):
        assert abs(W * (1 + a * c) / c - (W / c + S)) < 1e-9


def test_occupancy_json_matches_baseline_md():
    """BENCH/occupancy.json (the rendered evidence) must stay
    arithmetically self-consistent: occupancy == task_seconds /
    (wall * cores) for every recorded run."""
    path = os.path.join(REPO, "BENCH", "occupancy.json")
    with open(path) as f:
        data = json.load(f)
    assert len(data["runs"]) >= 2
    for r in data["runs"]:
        expect = r["task_seconds"] / (r["wall_s"] * r["cores"])
        assert abs(expect - r["occupancy"]) < 5e-3

"""bench.py emission-size pins (r13 verdict #1).

BENCH_r13.json recorded ``parsed: null`` — the first unusable bench
artifact in 13 rounds — because the final stdout JSON line carried
per-rep ``times`` arrays for ~53 lanes and overflowed the driver's
2,000-char tail capture, cutting off the line's head (the headline
total and every core query lane). The fix keeps the full protocol
detail in a committed ``tools/bench_detail_r{N}.json`` and prints only
medians + a parallel floors array. These tests pin the budget against
the REAL lane list so lane growth that would re-truncate the artifact
fails here, not in the round artifact.
"""

import json
import re
from pathlib import Path

import bench

REPO = Path(bench.__file__).resolve().parent


def real_lane_names() -> list[str]:
    """Every lane name bench.py can emit: string literals at timed()/
    record() call sites plus the ws-dict query lanes, unioned with the
    last fully-parsed committed artifact's lanes (belt and braces — a
    refactor that moves a call site out of the regexes' shape still
    gets caught by the artifact names)."""
    src = (REPO / "bench.py").read_text()
    names = set(re.findall(r'timed\(\s*"([^"]+)"', src))
    names |= set(re.findall(r'record\("([^"]+)"', src))
    names |= set(re.findall(r'"(q_[a-z0-9_]+)":', src))
    r12 = json.loads((REPO / "BENCH_r12.json").read_text())
    names |= set((r12.get("parsed") or {}).get("queries", {}))
    assert len(names) >= 50, f"lane extraction regressed: {sorted(names)}"
    return sorted(names)


def _fake_lanes(names, val=8.888):
    times = {n: val for n in names}
    lanes = {
        n: {"median": val, "floor": val, "reps": 3, "times": [val] * 3}
        for n in names
    }
    return times, lanes


def test_final_line_fits_with_full_floors_at_todays_lane_set():
    # realistic value widths (observed lane medians are 0.1–25 s, i.e.
    # 5–6 JSON chars after round(,3)) at the CURRENT lane set — the full
    # per-lane floors array must survive, not hit the degradation guard
    names = real_lane_names()
    times, lanes = _fake_lanes(names)
    line = bench.final_line(times, lanes, 888.888, 0.1, "tools/bench_detail_r99.json")
    assert bench.LINE_BUDGET < 2000
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["value"] == 888.888
    assert parsed["queries"] == times
    # floors ride as an array parallel to the queries key order
    assert parsed["floors"] == [8.888] * len(names)
    assert parsed["detail"] == "tools/bench_detail_r99.json"


def test_final_line_degrades_to_deviating_floors_map():
    # +8 future lanes overflow the full-floors budget → the line keeps
    # ONLY the floors that deviate from their median (the lanes
    # floor-based adjudication actually needs) and stays parseable
    names = real_lane_names() + [
        f"future_round_lane_name_{i:02d}" for i in range(8)
    ]
    times, lanes = _fake_lanes(names)
    lanes["index_build"]["floor"] = 2.345  # deviates: must survive
    line = bench.final_line(times, lanes, 888.888, 0.1, "tools/x.json")
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["queries"] == times
    assert "floors" not in parsed
    assert parsed["floors_dev"] == {"index_build": 2.345}


def test_final_line_drops_floors_before_truncating():
    names = [f"lane_with_a_rather_long_name_{i:03d}" for i in range(60)]
    times, lanes = _fake_lanes(names)
    for n in names:
        lanes[n]["floor"] = 1.111  # every lane deviates → dev map huge
    line = bench.final_line(times, lanes, 1.0, 0.1, "tools/x.json")
    parsed = json.loads(line)  # must stay parseable JSON either way
    assert "floors" not in parsed and "floors_dev" not in parsed
    assert parsed["queries"] == times


def test_detail_file_carries_full_protocol(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "0")
    names = ["a_lane", "b_lane"]
    times, lanes = _fake_lanes(names)
    rel = bench.write_detail(times, lanes, 177.776, 0.1)
    out = REPO / rel
    try:
        assert rel == "tools/bench_detail_r00.json"
        body = json.loads(out.read_text())
        assert body["lanes"] == lanes
        assert body["queries"] == times
        assert body["value"] == 177.776
        assert body["protocol"]["headline"] == "sum of per-lane medians"
    finally:
        out.unlink()


def test_round_number_infers_from_bench_artifacts(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    ns = [
        int(m.group(1))
        for p in REPO.glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
    ]
    # during round N the newest artifact on disk is N-1 (the driver
    # writes BENCH_r{N}.json after running bench)
    assert bench._round_number() == max(ns) + 1
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    assert bench._round_number() == 7


def test_final_line_omits_detail_when_write_failed():
    # main() tolerates a failed detail write (read-only checkout,
    # missing tools/) by passing detail_path=None — the stdout line
    # must still emit, parseable, without a null "detail" key (r14
    # review: losing the line to a side-file error would recreate the
    # r13 parsed:null failure through the back door)
    names = real_lane_names()
    times, lanes = _fake_lanes(names)
    line = bench.final_line(times, lanes, 888.888, 0.1, None)
    parsed = json.loads(line)
    assert "detail" not in parsed
    assert parsed["value"] == 888.888
    assert parsed["queries"] == times

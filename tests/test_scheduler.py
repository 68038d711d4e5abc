"""Freshness-scheduler invariants: the driver checks registry entries in
insertion order and truncates its window (50/round observed), so ordering IS
the re-verification policy.  These tests pin the class ranking without
depending on the repo's live CORRECTNESS files."""

from accumulo_wikisearch_spark.entry_queries import _verification_order


def _write_rounds(tmp_path, monkeypatch, rounds: dict[int, dict]):
    import json

    import accumulo_wikisearch_spark.entry_queries as eq

    # _verification_order globs CORRECTNESS_r*.json next to the package's
    # parent; point it at tmp_path instead
    pkg = tmp_path / "accumulo_wikisearch_spark"
    pkg.mkdir()
    (pkg / "entry_queries.py").touch()
    for n, data in rounds.items():
        (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(data))
    monkeypatch.setattr(
        eq, "__file__", str(pkg / "entry_queries.py"), raising=True
    )


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
FAIL = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
ROWS_ONLY = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "err": "no_oracle",
}


def test_failed_first_then_unchecked_then_stalest(tmp_path, monkeypatch):
    _write_rounds(
        tmp_path,
        monkeypatch,
        {
            1: {"a": GREEN, "b": GREEN, "c": GREEN},
            2: {"a": GREEN, "d": FAIL},
        },
    )
    # e never checked; b/c stale (r1); a fresh (r2); d failed (r2)
    order = _verification_order(["a", "b", "c", "d", "e"])
    assert order[0] == "d"          # class 0: failed last check
    assert order[1] == "e"          # class 1: never checked
    assert order[2:4] == ["b", "c"]  # class 2 stalest-first, insertion tiebreak
    assert order[4] == "a"


def test_rows_only_with_new_oracle_leads(tmp_path, monkeypatch):
    """An entry whose latest driver row was rows-only (err=no_oracle) but
    which NOW declares an oracle has an unverified oracle — it must rank
    class 0 until a hash-checked row lands (the r2 ann_topk_lsh/ivf case)."""
    _write_rounds(
        tmp_path,
        monkeypatch,
        {2: {"lsh": ROWS_ONLY, "stream": ROWS_ONLY, "g": GREEN}},
    )
    order = _verification_order(
        ["g", "lsh", "stream"], has_oracle={"g", "lsh"}
    )
    # lsh: rows-only + has oracle -> class 0. stream: rows-only, still
    # genuinely oracle-less -> class 2 (green). g: green class 2.
    assert order[0] == "lsh"
    assert order[1:] == ["g", "stream"]


def test_live_registry_window_covers_pending_entries():
    """With the repo's real CORRECTNESS files: every entry whose latest
    driver status is non-green (incl. oracle-added rows-only) must sit in
    the first 50 registry slots."""
    import json
    import re
    from pathlib import Path

    import __spark_entry__ as m

    names = list(m.queries().keys())
    oracles = set(m.oracle_sql().keys())
    root = Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for p in sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    ):
        try:
            latest.update(
                {k: v for k, v in json.loads(p.read_text()).items() if isinstance(v, dict)}
            )
        except (OSError, ValueError):
            continue
    window = set(names[:50])
    for name, row in latest.items():
        if name not in names:
            continue  # renamed/retired entry
        err = row.get("err")
        pending = (
            (err is not None and err != "no_oracle")
            or (err == "no_oracle" and name in oracles)
            or row.get("hash_match") is False
            or row.get("rows_match") is False
            or row.get("schema_match") is False
        )
        if pending:
            assert name in window, f"{name} pending but outside the 50-slot window"

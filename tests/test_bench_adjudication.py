"""Mover-adjudication reference selection (VERDICT r13 #1): the bench
artifact now embeds a load_summary, `_previous_round_bench` refuses a
load-disqualified local artifact (falling back to the committed
quiet-box snapshot REGISTRY_BENCH.json), and `gen_registry.py
--freeze-bench` refuses to freeze a loaded run. Pure-JSON unit tests --
no Spark session."""

from __future__ import annotations

import json
import os

import pytest

import bench
import gen_registry


def _write(path: str, obj: dict) -> str:
    with open(path, "w") as f:
        json.dump(obj, f)
    return path


def _artifact(
    quiet: bool | None,
    sf: float = 0.1,
    repeat: int = 2,
    agg: str = "min",
) -> dict:
    out = {
        "queries": {"q01_pricing_summary": 1.0},
        "sf": sf,
        "repeat": repeat,
        "agg": agg,
    }
    if quiet is not None:
        out["load_summary"] = {
            "start_load1m": 1.0 if quiet else 9.0,
            "median_load1m": 5.0,
            "max_load1m": 9.6,
            "cpus": 32,
            "quiet": quiet,
        }
    return out


def test_quiet_start_threshold_scales_with_cpus():
    assert bench._quiet_start_threshold(32) == pytest.approx(2.56)
    assert bench._quiet_start_threshold(64) == pytest.approx(5.12)
    # small hosts keep the absolute floor (post-idle decay noise)
    assert bench._quiet_start_threshold(4) == 2.5


def test_artifact_quiet_legacy_and_flagged():
    assert bench._artifact_quiet({}) is True  # legacy: no witness
    assert bench._artifact_quiet(_artifact(quiet=True)) is True
    assert bench._artifact_quiet(_artifact(quiet=False)) is False


@pytest.fixture
def bench_files(tmp_path, monkeypatch):
    """Point the module-level artifact names at tmp files (os.path.join
    with an absolute second arg ignores the first, so absolute paths
    swap the repo-root artifacts without touching them)."""
    local = str(tmp_path / "local.json")
    snap = str(tmp_path / "snap.json")
    monkeypatch.setattr(bench, "LOCAL_ARTIFACT", local)
    monkeypatch.setattr(bench, "BENCH_SNAPSHOT", snap)
    monkeypatch.setattr(gen_registry, "BENCH_SNAPSHOT", snap)
    return local, snap


def test_prev_bench_prefers_quiet_local(bench_files):
    local, snap = bench_files
    _write(local, _artifact(quiet=True))
    _write(snap, _artifact(quiet=True))
    name, obj = bench._previous_round_bench(sf="0.1", repeat=2, agg="min")
    assert name == local


def test_prev_bench_rejects_loaded_local_falls_back_to_snapshot(
    bench_files, capsys
):
    local, snap = bench_files
    _write(local, _artifact(quiet=False))
    _write(snap, _artifact(quiet=True))
    name, obj = bench._previous_round_bench(sf="0.1", repeat=2, agg="min")
    assert name == snap
    assert "LOADED box" in capsys.readouterr().err


def test_prev_bench_rejects_incomparable_local_falls_back(bench_files):
    local, snap = bench_files
    _write(local, _artifact(quiet=True, sf=0.01))  # config-varied run
    _write(snap, _artifact(quiet=True))
    name, obj = bench._previous_round_bench(sf="0.1", repeat=2, agg="min")
    assert name == snap


def test_prev_bench_snapshot_must_be_comparable_too(bench_files):
    local, snap = bench_files
    _write(local, _artifact(quiet=False))
    _write(snap, _artifact(quiet=True, repeat=5))
    got = bench._previous_round_bench(sf="0.1", repeat=2, agg="min")
    # neither local (loaded) nor snapshot (incomparable) qualifies; the
    # driver-wrapper glob fallback may or may not find one -- it must
    # just not return the disqualified files
    if got is not None:
        assert got[0] not in (local, snap)


def test_freeze_bench_refuses_loaded_run(bench_files, tmp_path,
                                         monkeypatch):
    local, snap = bench_files
    monkeypatch.setattr(bench, "LOCAL_ARTIFACT", local)
    _write(local, _artifact(quiet=False))
    with pytest.raises(SystemExit, match="load-inflated"):
        gen_registry.freeze_bench()
    assert not os.path.exists(snap)


def test_freeze_bench_writes_snapshot_from_quiet_run(bench_files):
    local, snap = bench_files
    _write(local, _artifact(quiet=True))
    out = gen_registry.freeze_bench()
    assert out == snap
    with open(snap) as f:
        frozen = json.load(f)
    assert frozen["queries"] == {"q01_pricing_summary": 1.0}
    assert frozen["load_summary"]["quiet"] is True
    assert (frozen["sf"], frozen["repeat"], frozen["agg"]) == (0.1, 2, "min")


def test_committed_snapshot_exists_and_is_quiet():
    """The repo must carry a committed, quiet-qualified snapshot: it is
    both the REGISTRY.md timing source and the adjudication fallback."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)),
        "REGISTRY_BENCH.json",
    )
    assert os.path.exists(path), "run: python gen_registry.py --freeze-bench"
    with open(path) as f:
        snap = json.load(f)
    assert snap.get("queries"), "snapshot has no timings"
    assert bench._artifact_quiet(snap), "committed snapshot is load-inflated"


def test_registry_render_never_reads_mutable_artifact():
    """The staleness-gate regression (VERDICT r13 #1): REGISTRY.md
    rendering must depend only on committed inputs, never on the
    untracked BENCH_LAST_LOCAL.json."""
    import inspect

    src = inspect.getsource(gen_registry.render) + inspect.getsource(
        gen_registry.load_snapshot
    )
    assert "BENCH_LAST_LOCAL" not in src
    assert "LOCAL_ARTIFACT" not in src


# -- per-entry wall budget (VERDICT r15 #6) ---------------------------------

# Entries allowed above the 5 s per-entry budget in the committed
# quiet-box reference, each with a standing justification:
#   z144_triangle_count      exact triangle count is O(|E|^1.5) by
#                            construction; z166 (DOULION estimate) is the
#                            documented cost-cliff alternative.
#   z147_connected_components large-star/small-star fixpoint: O(log^2 n)
#                            rounds x (2 aggregates + 2 joins + lineage
#                            cut) is the 100 TB CC recipe; per-round job
#                            constants dominate at sf0.1.
#   pipeline_e2e_2runs       TWO full ETL runs (cold + warm merge) with
#                            contractual materialization/commit points.
BUDGET_SECONDS = 5.0
BUDGET_ALLOWLIST = {
    "z144_triangle_count",
    "z147_connected_components",
    "pipeline_e2e_2runs",
}


def test_per_entry_budget_over_5s_requires_allowlist():
    """Every entry above 5 s in REGISTRY_BENCH.json must carry a
    documented justification here -- silent suite creep fails loudly."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "REGISTRY_BENCH.json")) as f:
        snap = json.load(f)
    over = {
        n: s
        for n, s in snap["queries"].items()
        if s > BUDGET_SECONDS and n not in BUDGET_ALLOWLIST
    }
    assert not over, (
        f"entries over the {BUDGET_SECONDS}s per-entry budget without an "
        f"allowlist justification: {over} -- optimize them or add a "
        "justified allowlist row"
    )

"""REGISTRY.md staleness gate (VERDICT r12 #6): the committed index
must equal a fresh regeneration from the live REGISTRY + the COMMITTED
bench snapshot REGISTRY_BENCH.json (VERDICT r13 #1: regenerating from
the untracked BENCH_LAST_LOCAL.json meant any bench re-run -- including
the driver's own round-closing run -- flipped this gate red with zero
code changes). Touching the registry (new entry, moved definition,
changed description) without running `python gen_registry.py` fails
here, so the one-pager can never silently drift; running bench.py does
NOT (timings only change when deliberately re-frozen with
--freeze-bench)."""

from __future__ import annotations

import os


def test_registry_md_is_current():
    import gen_registry

    path = os.path.join(os.path.dirname(gen_registry.__file__), "REGISTRY.md")
    assert os.path.exists(path), "run: python gen_registry.py"
    with open(path) as f:
        committed = f.read()
    assert committed == gen_registry.render(), (
        "REGISTRY.md is stale -- run: python gen_registry.py"
    )

"""REGISTRY.md staleness gate (VERDICT r12 #6): the committed index
must equal a fresh regeneration from the live REGISTRY + the committed
bench artifact. Touching the registry (new entry, moved definition,
changed description) without running `python gen_registry.py` fails
here, so the one-pager can never silently drift."""

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

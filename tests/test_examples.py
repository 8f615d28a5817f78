"""Every example in examples/ must RUN end-to-end (VERDICT r10 #5).

The r9 high-severity ADVICE finding was an example that crashed when
actually executed (reads issued after its table was torn down) -- the
class of bug unit tests on the operators cannot catch, because it lives
in the example's own orchestration. This smoke suite executes each
example the way a user does: as a subprocess script, at sf0.001, with a
hard timeout. Output content is NOT asserted (the operators underneath
are oracle-gated elsewhere); the contract here is "runs to completion,
exit 0".

Each example boots its own Spark JVM, so the full sweep costs a few
minutes; set SPARK_GRAFT_SKIP_EXAMPLES=1 to skip locally when iterating
on something unrelated.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES_DIR = os.path.join(REPO, "examples")
SF_SMALL = "/root/testdata/sf0.001"

# script -> argv (quickstart embeds its own fixtures + sf constant)
EXAMPLES = {
    "quickstart.py": [],
    "cdc_materialized_views.py": [SF_SMALL],
    "data_quality_pipeline.py": [SF_SMALL],
    "dedup_ingest_pipeline.py": [SF_SMALL],
    "embedding_pipeline.py": [SF_SMALL],
    "graph_analytics.py": [SF_SMALL],
    # smoke at 1x only; the PERF.md probe runs 1/4/8 at sf0.1
    "graph_scale_probe.py": [SF_SMALL, "1"],
    "ivf_tuning.py": [SF_SMALL],
    # smoke on two cheap entries; the PERF.md row runs the full list
    # (the sf1 build itself is the dominant smoke cost, ~1 min)
    "sf1_scale_probe.py": ["q15_distinct_agg", "q02_top_orders"],
    "retrieval_pipeline.py": [SF_SMALL],
    "train_corpus_pipeline.py": [SF_SMALL],
}


def test_examples_inventory_is_complete():
    """A new example must be added to the smoke sweep (or this reds)."""
    on_disk = sorted(
        f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")
    )
    assert on_disk == sorted(EXAMPLES)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_EXAMPLES") == "1",
    reason="example sweep skipped via SPARK_GRAFT_SKIP_EXAMPLES=1",
)
@pytest.mark.parametrize("script", sorted(EXAMPLES))
def test_example_runs_end_to_end(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, script)]
        + EXAMPLES[script],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"--- stdout tail ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr tail ---\n{proc.stderr[-2000:]}"
    )

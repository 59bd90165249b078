"""Broadcast-audit CI gate (r10 VERDICT item 2).

The q_tpch_q4 failure class — a corpus-sided build whose NARROW
projection rides under the broadcast threshold until the data is a
decade bigger — survived nine rounds of green driver rows because
nothing ever PLANNED against big data in CI. This gate does: every key
in the shuffle-heavy families is planned (not run, except the
inherently-executing CC-loop keys — see tools/broadcast_audit.py's
header) against the
regenerable ~sf1 fixtures, and any BroadcastExchange over a raw corpus
scan must be in ``tools.broadcast_audit.BENIGN`` — the triaged list
with the three-class justification (bounded-by-filter query sets,
honest-estimate dim-side picks that flip automatically, MLlib
internals). A new corpus-sided broadcast build fails HERE, in the same
round that introduces it, instead of in the next decade sweep.

Proof the gate bites (r11, the round it was added): the first raw-
layout audit run flagged four q4-class builds the r10 ingested-layout
triage never saw — salted_join broadcasting the skewed corpus side,
q_funnel's purchase-stage join, attribution_join's batch path, and
q_join_range — all now merge-pinned, and this gate holds them there.

The audit runs on the RAW sf1 layout (plan construction only, no
ingest): the gated families read lineitem/orders/documents/embeddings,
which the engine layout does not rewrite, and raw events coverage is
exactly what caught the four r11 finds.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO_ROOT, ".scale", "sf1")

# Families whose keys join/shuffle corpus tables — the surface where a
# corpus-sided broadcast build can appear. Literal prefixes plus the
# event-pipeline keys the r11 raw-layout audit caught.
GATE_PREFIXES = ("q_tpch_", "q_join_", "q_dedup_", "q_knn_")
GATE_EXTRA = ("q_cross_cosine", "q_funnel", "q_stream_join", "q_kanonymity")


@pytest.fixture(scope="module")
def sf1_dir():
    """~sf1 fixtures, regenerated deterministically from the committed
    sf0.1 testdata when absent (.scale/ is gitignored; ~25 s once)."""
    if not os.path.isdir(os.path.join(SF1, "lineitem.parquet")) and not os.path.isfile(
        os.path.join(SF1, "lineitem.parquet")
    ):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO_ROOT, "tools", "scale_blowup.py"),
                "/root/testdata/sf0.1",
                SF1,
                "10",
            ],
            check=True,
            cwd=REPO_ROOT,
        )
    return SF1


def test_no_new_corpus_broadcast_builds(spark, sf1_dir):
    from document_vector_indexer_spark.queries.registry import all_queries
    from tools.broadcast_audit import BENIGN, run_audit

    keys = [
        k
        for k in all_queries()
        if k.startswith(GATE_PREFIXES) or k in GATE_EXTRA
    ]
    assert len(keys) >= 50, keys  # the families actually resolved
    flags, errors = run_audit(spark, sf1_dir, keys=keys)
    assert not errors, errors
    new = [(k, t, d) for (k, t, d) in flags if (k, t) not in BENIGN]
    assert not new, (
        "NEW corpus-sided broadcast build(s) — the q_tpch_q4 class. "
        "Either pin the join per the r10 durable rule (broadcast only "
        "bounded sides; shuffle_hash only provably partition-bounded "
        "builds; merge for corpus x corpus) or, if genuinely benign, "
        "add the (key, table) pair to tools.broadcast_audit.BENIGN "
        f"with its triage class: {new}"
    )
    # the gate must also keep seeing the benign class at all — if the
    # audit silently stopped flagging anything, it stopped guarding
    assert len(flags) >= 10, flags

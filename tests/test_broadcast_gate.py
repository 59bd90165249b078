"""Broadcast-audit CI gate (r10 VERDICT item 2; registry-driven r12).

The q_tpch_q4 failure class — a corpus-sided build whose NARROW
projection rides under the broadcast threshold until the data is a
decade bigger — survived nine rounds of green driver rows because
nothing ever PLANNED against big data in CI. This gate does: every key
whose plan scans a corpus table AND contains a join (computed FROM the
registry by ``classify_gate_surface``, not a hand-curated family list —
the r11 watch item: a key added outside the listed families silently
escaped the gate, the exact failure mode the gate exists to kill, one
level up) is planned against the regenerable ~sf1 fixtures, and any
BroadcastExchange over a raw corpus scan must be in
``tools.broadcast_audit.BENIGN`` — the triaged list with the
three-class justification (bounded-by-filter query sets, honest-
estimate dim-side picks that flip automatically, MLlib internals). A
new corpus-sided broadcast build fails HERE, in the same round that
introduces it, instead of in the next decade sweep.

Keys the plan audit cannot see through — iterate-until-converged
operators whose loop interiors are executed LogicalRDDs — must appear
in ``AUDIT_EXCLUDED`` with a reason naming where their exchange IS
covered; the exclusion list is pinned here like
``registry.ROWS_ONLY_BY_DESIGN`` (no stale rows, no reason-less rows,
no blind key missing from it). Keys that are VISIBLE AND blind (they
join corpus tables and also embed an executed interior — the CC-based
dedup keys) stay on the audit surface for their visible subtree and
carry their blind-interior reason in ``BLIND_INTERIOR_OK`` (r13,
closing the r12 ADVICE escape where ``blind - visible`` exempted them
without a documented reason).

Proof the gate bites (r11, the round it was added): the first raw-
layout audit run flagged four q4-class builds the r10 ingested-layout
triage never saw — salted_join broadcasting the skewed corpus side,
q_funnel's purchase-stage join, attribution_join's batch path, and
q_join_range — all now merge-pinned, and this gate holds them there.
The r12 registry-driven surface widened coverage from the ~55
family-listed keys to every corpus-join key in the registry (75 at the
time of writing) without hand-listing any of them.

The audit runs on the RAW sf1 layout (plan construction only, no
ingest): the gated keys read lineitem/orders/documents/embeddings,
which the engine layout does not rewrite, and raw events coverage is
exactly what caught the four r11 finds. The surface CLASSIFICATION
runs at the small committed fixtures — join/scan structure is
data-independent; only broadcast *strategy* flips with size.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO_ROOT, ".scale", "sf1")
SF_SMALL = "/root/testdata/sf0.001"


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
    from tools.broadcast_audit import (
        AUDIT_EXCLUDED,
        BENIGN,
        BLIND_INTERIOR_OK,
        classify_gate_surface,
        run_audit,
    )

    visible, blind, cls_errors = classify_gate_surface(spark, SF_SMALL)
    assert not cls_errors, cls_errors

    # Exclusion hygiene, pinned like ROWS_ONLY_BY_DESIGN: every entry
    # names a real registry key that is actually on the gate surface
    # and carries a non-empty reason — stale or reason-less rows fail.
    registry = set(all_queries())
    for key, why in AUDIT_EXCLUDED.items():
        assert key in registry, f"AUDIT_EXCLUDED names unknown key {key}"
        assert why and why.strip(), f"AUDIT_EXCLUDED[{key}] has no reason"
        assert key in (visible | blind), (
            f"AUDIT_EXCLUDED[{key}] is stale — the key no longer plans "
            "with a corpus join or an executed intermediate; drop it"
        )
    # Visible-AND-blind keys (r12 ADVICE: `blind - visible` silently
    # exempted them) stay on the audit surface for their visible
    # subtree but must carry a pinned reason for the blind interior —
    # and the reason must not go stale in either direction.
    for key, why in BLIND_INTERIOR_OK.items():
        assert key in registry, f"BLIND_INTERIOR_OK names unknown key {key}"
        assert why and why.strip(), f"BLIND_INTERIOR_OK[{key}] has no reason"
        assert key in visible and key in blind, (
            f"BLIND_INTERIOR_OK[{key}] is stale — the key is no longer "
            "both visible and blind; drop it (or move it to "
            "AUDIT_EXCLUDED if it went fully blind)"
        )
        assert key not in AUDIT_EXCLUDED, (
            f"{key} in both lists — AUDIT_EXCLUDED would drop its "
            "visible subtree from the audit"
        )
    # EVERY audit-blind key (executed LogicalRDD interior) must be
    # excused with a reason — fully-blind keys in AUDIT_EXCLUDED,
    # visible-and-blind keys in BLIND_INTERIOR_OK. A new
    # iterate-during-construction build cannot silently drop any part
    # of its plan out of coverage.
    unaccounted = blind - set(AUDIT_EXCLUDED) - set(BLIND_INTERIOR_OK)
    assert not unaccounted, (
        "key(s) whose plan embeds an executed intermediate the audit "
        "cannot see, with no documented reason (AUDIT_EXCLUDED for "
        "fully-blind keys, BLIND_INTERIOR_OK for visible-and-blind): "
        f"{sorted(unaccounted)}"
    )

    audited = sorted(visible - set(AUDIT_EXCLUDED))
    # the computed surface must stay a real surface (75 at r12) — a
    # classifier regression that silently empties it must fail loudly
    assert len(audited) >= 60, audited

    flags, errors = run_audit(spark, sf1_dir, keys=audited)
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

#!/usr/bin/env python3
"""Regenerate tests/golden/multimodal_golden.json — the pinned outputs
of the multimodal FAKE decode kernels over a fixed literal input set.

The golden file is the drop-in contract for a future real kernel
(operators/multimodal.py `_require_backend`): the mapInPandas
signature, output schema, null/corrupt-row behavior, and batch-shape
independence must stay identical; only the pixel VALUES may change
when a real decoder replaces `_fake_pixels` (at which point this
golden is regenerated deliberately, in its own commit).

Run: python tools/gen_multimodal_golden.py
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))

OUT = os.path.join(REPO_ROOT, "tests", "golden", "multimodal_golden.json")


def main() -> None:
    from document_vector_indexer_spark.session import get_spark
    from test_multimodal import golden_input_rows, run_golden_ops

    spark = get_spark(app_name="gen-multimodal-golden", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    golden = run_golden_ops(spark, golden_input_rows())
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

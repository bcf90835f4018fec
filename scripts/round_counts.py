#!/usr/bin/env python3
"""Scripted round-summary counts (VERDICT r9 #6): every number quoted
in SCALING.md's round section must reproduce from THIS command, never
from a hand tally (r9's "217 entries" was a hand count that did not
reproduce; the real number was 210).

Usage:
    python scripts/round_counts.py [PYTEST_TAIL_LOG]

Prints registry size, full-oracle vs rows-only split, driver-window
size and its diff vs the latest CORRECTNESS_r*.json, and (when a
pytest tail log is given) the suite totals + wall-clock parsed from
pytest's own summary line.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Every SURVEY.md §2.3 category the driver window must keep >= 1 row
# for (VERDICT r11 #2: the "every family keeps >= 1 row" invariant was
# comment-discipline only and silently failed for TPC-H and file
# sources after the r10 rotation; this table makes it scripted). A
# family matches a window row by name prefix; the round summary FAILS
# if any family's window count hits zero.
WINDOW_FAMILIES: dict[str, tuple[str, ...]] = {
    "ann_pq_serving": ("ann_",),
    "serving_tuning": ("ann_nprobe_autotune", "range_radius_calibration"),
    "ivfsq_serving": ("ivfsq",),
    "binary_quantizer": ("bq_", "ivfbq"),
    "learned_transforms": ("pca", "opq_", "itq"),
    "exact_range_search": ("embedding_range_search", "flat_knn"),
    "index_maintenance": (
        "ivfsq_merge_query", "ivfsq_upsert_query", "index_",
    ),
    "dedup_spans": ("repeated_", "token_span", "cross_source_span"),
    "neardup": ("edit_distance_", "minhash", "simhash", "image_dhash"),
    "multimodal": ("image_", "audio_", "video_"),
    "classifier": ("nb_",),
    "lm_scoring": ("bigram_lm", "kneser_ney_lm", "unigram_ppl", "ccnet_"),
    "tokenizer": ("token_id_",),
    "shards_sinks": ("training_shard", "corpus_shard"),
    "quality_selection": ("quality_", "weighted_sample", "gopher", "dsir"),
    "recall_eval": ("matryoshka", "ann_nprobe_recall"),
    "retrieval": ("hard_negative", "mmr_", "phrase_search", "bm25", "hybrid"),
    "tpch_relational": ("tpch_",),
    "file_sources": ("csv_source", "json_source", "orc_source"),
    "events_temporal": ("events_",),
    "sketches": ("hll_", "kmv_", "cms_", "bloom"),
    "streaming": ("stream_",),
}


def main() -> None:
    import flechasdb_spark.queries as Q

    reg = Q.registry_ordered()
    full = [n for n in reg if Q.ORACLES.get(n)]
    rows_only = [n for n in reg if not Q.ORACLES.get(n)]
    window = list(Q.DRIVER_ORDER)
    print(f"registry_entries {len(reg)}")
    print(f"full_oracles {len(full)}")
    print(f"rows_only {len(rows_only)}" + (f" {rows_only}" if rows_only else ""))
    print(f"driver_window {len(window)}")
    assert list(reg)[: len(window)] == window, "window is not the registry head"

    empty = []
    for fam, prefixes in WINDOW_FAMILIES.items():
        n = sum(1 for w in window if any(w.startswith(p) for p in prefixes))
        if n == 0:
            empty.append(fam)
    print(f"window_families {len(WINDOW_FAMILIES)} covered "
          f"{len(WINDOW_FAMILIES) - len(empty)}")
    assert not empty, f"window families with ZERO rows: {empty}"

    corr = sorted(glob.glob("CORRECTNESS_r*.json"))
    if corr:
        last = corr[-1]
        seen = set(json.load(open(last)))
        incoming = [n for n in window if n not in seen]
        retired = [n for n in seen if n not in window]
        print(f"window_diff_vs {last}")
        print(f"  incoming {len(incoming)} {sorted(incoming)}")
        print(f"  retired  {len(retired)} {sorted(retired)}")

    if len(sys.argv) > 1:
        tail = open(sys.argv[1]).read()
        m = re.search(
            r"(\d+) passed(?:, (\d+) skipped)?(?:, \d+ deselected)?"
            r"(?:, (\d+) failed)?[^\n]* in ([0-9.]+)s"
            r"(?: \(([0-9:]+)\))?",
            tail,
        )
        if m:
            passed, skipped, failed, secs, hms = m.groups()
            print(
                f"pytest {passed} passed / {skipped or 0} skipped / "
                f"{failed or 0} failed in {hms or secs + 's'}"
            )
        else:
            print("pytest summary line not found in", sys.argv[1])


if __name__ == "__main__":
    main()

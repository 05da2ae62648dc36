import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.config import get_config
from pemp_tpu.models.hourglass import PoseNet, hg_process_output
from pemp_tpu.models.hrnet import HRNetSpec, PoseHigherResolutionNet, hr_process_output

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


@pytest.fixture(scope="module")
def hrnet_small():
    cfg = get_config()
    spec = HRNetSpec.from_config(cfg)
    model = PoseHigherResolutionNet(spec)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_hrnet_shapes(hrnet_small):
    model, variables = hrnet_small
    x = jnp.ones((2, 128, 128, 3))
    (outs, features) = model.apply(variables, x, train=False)
    # head 0: 1/4 res, 17 heatmaps + 17 tags; head 1: 1/2 res, 17 heatmaps
    assert outs[0].shape == (2, 32, 32, 34)
    assert outs[1].shape == (2, 64, 64, 17)
    # feature fusion avg: 32 channels at 1/2 res
    assert features.shape == (2, 64, 64, 32)

    scoremaps, feats, tags = hr_process_output(outs, features, 17, "avg")
    assert scoremaps.shape == (2, 64, 64, 17)
    assert tags.shape == (2, 64, 64, 17)


def test_hrnet_jits_and_is_finite(hrnet_small):
    model, variables = hrnet_small
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 3), jnp.float32)
    (outs, features) = fwd(variables, x)
    assert bool(jnp.isfinite(outs[0]).all())
    assert bool(jnp.isfinite(outs[1]).all())
    assert bool(jnp.isfinite(features).all())


def test_hrnet_train_mode_updates_batch_stats(hrnet_small):
    model, variables = hrnet_small
    x = jnp.asarray(np.random.RandomState(1).rand(2, 128, 128, 3), jnp.float32)
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(after, before)]
    assert max(diffs) > 0


def test_hrnet_param_count_w32():
    cfg = get_config()
    spec = HRNetSpec.from_config(cfg)
    model = PoseHigherResolutionNet(spec)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    # HigherHRNet-w32 is ~28.6M params
    assert 27e6 < n_params < 30e6, n_params


def test_hrnet_cat_multi_fusion():
    cfg = get_config()
    cfg.defrost()
    cfg.MODEL.HRNET.FEATURE_FUSION = "cat_multi"
    spec = HRNetSpec.from_config(cfg)
    model = PoseHigherResolutionNet(spec)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (_, features) = model.apply(variables, x, train=False)
    # 256 stem + 32 stage2 + 32 stage3 + 32 small = 352 (PoseEstimation.py:63)
    assert features.shape[-1] == 352


def test_hourglass_shapes():
    model = PoseNet(nstack=2, inp_dim=64, oup_dim=68)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    preds, feature = model.apply(variables, x, train=False)
    assert len(preds) == 2
    assert preds[0].shape == (1, 32, 32, 68)
    assert feature.shape == (1, 32, 32, 64)
    scoremaps, feats, tags = hg_process_output(preds, feature)
    assert scoremaps.shape == (1, 32, 32, 17)
    assert tags.shape == (1, 32, 32, 17)
